"""AutoTune: parameter sweeps, operating points, worst-case criterion.

Reference (SURVEY.md §2.3 O29): ``ParameterSpace.explore``
(``Auncel/AutoTune.h:26-203``) sweeps configurations (nprobe, ht,
k_factor, …), records (perf, t) operating points, and keeps the Pareto
front (``OperatingPoints``). Criteria: ``OneRecallAtR`` /
``Intersection``; the bounded-Faiss fork replaces the *average* over
queries with the **worst case** (``faiss/AutoTune.cpp:93-101``:
``n_ok = min(...)``) and force-includes the max-nprobe operating point
(``faiss/AutoTune.cpp:630-634,719-722``) so a bound-satisfying config
always exists. That fork is the "global ELP" strawman (SURVEY §3.2):
one fixed nprobe for all queries vs Auncel's per-query adaptivity.

Spark shape: a driver loop over configs; each config is one IVF search
job + one recall aggregation — embarrassingly parallel across configs
if desired, but sequential keeps cluster pressure predictable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame

from auncel_spark.index.ivf import IVFIndex
from auncel_spark.operators.recall import intersection_recall, threshold_recall


@dataclass
class OperatingPoint:
    nprobe: int
    perf: float  # criterion value (recall-like, higher better)
    t: float  # wall seconds for the batch
    key: str = ""


def one_recall_at_r(result: DataFrame, gt: DataFrame, r: int, worst_case: bool) -> float:
    """OneRecallAtR: is the true rank-1 neighbor within the top-r?
    Averaged (Auncel flavor) or worst-case (bounded-faiss flavor)."""
    from pyspark.sql import functions as F

    gt1 = gt.filter(F.col("pos") == 0).select("qid", F.col("gt_id").alias("id"))
    top_r = result.filter(F.col("pos") < r).select("qid", "id")
    hit = gt1.join(top_r, ["qid", "id"], "left_semi").select("qid").withColumn("ok", F.lit(1))
    per_q = (
        gt1.select("qid")
        .join(hit, "qid", "left")
        .select(F.coalesce(F.col("ok"), F.lit(0)).alias("ok"))
    )
    agg = per_q.agg(F.min("ok").alias("mn"), F.avg("ok").alias("av")).collect()[0]
    return float(agg["mn"] if worst_case else agg["av"])


def intersection_criterion(
    result: DataFrame, gt: DataFrame, k: int, worst_case: bool
) -> float:
    rec = intersection_recall(result, gt, k)
    from pyspark.sql import functions as F

    agg = rec.agg(F.min("recall").alias("mn"), F.avg("recall").alias("av")).collect()[0]
    return float(agg["mn"] if worst_case else agg["av"])


def explore(
    index: IVFIndex,
    queries: DataFrame,
    gt: DataFrame,
    k: int,
    nprobes: list[int] | None = None,
    criterion: str = "intersection",
    worst_case: bool = True,
) -> list[OperatingPoint]:
    """Sweep nprobe; always include nprobe = nlist (the forced
    max-nprobe candidate). Returns all measured operating points."""
    if nprobes is None:
        nprobes = [1, 2, 4, 8, 16, 32, 64, 128]
    nprobes = sorted({min(n, index.nlist) for n in nprobes} | {index.nlist})
    points = []
    for np_ in nprobes:
        t0 = time.perf_counter()
        res = index.search(queries, k, np_)
        res = res.cache()
        res.count()
        dt = time.perf_counter() - t0
        if criterion == "intersection":
            perf = intersection_criterion(res, gt, k, worst_case)
        elif criterion == "one_recall_at_r":
            perf = one_recall_at_r(res, gt, k, worst_case)
        else:
            raise ValueError(criterion)
        points.append(OperatingPoint(np_, perf, dt, key=f"nprobe={np_}"))
        res.unpersist()
    return points


def pareto_front(points: list[OperatingPoint]) -> list[OperatingPoint]:
    """Keep points not dominated in (perf↑, t↓) — ``OperatingPoints``'
    optimal set."""
    out = []
    best_perf = -np.inf
    for p in sorted(points, key=lambda p: (p.t, -p.perf)):
        if p.perf > best_perf:
            out.append(p)
            best_perf = p.perf
    return out


def min_nprobe_for_bound(points: list[OperatingPoint], bound: float) -> int | None:
    """The bounded-faiss selection: smallest nprobe whose worst-case
    criterion meets 1 − bound (§3.2 'global ELP')."""
    ok = [p for p in points if p.perf >= 1.0 - bound]
    return min((p.nprobe for p in ok), default=None)
