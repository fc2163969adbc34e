"""Exact k-NN, range search, and candidate re-ranking.

Reference surface (SURVEY.md §2.3 O1–O5):
- ``knn_L2sqr`` / ``knn_inner_product`` (``Auncel/utils.h:196-207``) —
  brute-force top-k, SIMD or BLAS-GEMM path chosen by a size threshold
  (``Auncel/utils.h:186-187``).
- ``knn_L2sqr_by_idx`` (``Auncel/utils.h:224-235``) — distances only
  against given candidate ids (re-ranking).
- ``range_search_L2sqr`` (``Auncel/utils.h:254-267``) — all ids within
  a radius; CSR result (``AuxIndexStructures.h:31-50``) becomes a plain
  relational (qid, id, dist) table here.

Two physical strategies, mirroring the reference's SIMD-vs-BLAS switch:

``strategy="join"``   broadcast the query table and evaluate the
    distance as a codegen'd SQL expression inside a broadcast
    nested-loop join, then window top-k. Whole plan stays JVM-side;
    right for small query sets / moderate d and for oracle-exact
    float64 semantics.

``strategy="gemm"``   broadcast the query *matrix* (numpy) to
    executors; each base partition does one BLAS GEMM + argpartition
    (Arrow-batched via ``mapInPandas``) and emits only its local top-k
    per query — nq·k rows per partition instead of nq·|partition| —
    then a global window merge. This is the 100 TB path: shuffle volume
    is independent of base size.

Scale note: both strategies scan the base exactly once with only
(id, vec) read from Parquet (column pruning); neither ever collects
vectors to the driver — only the query matrix (≤ a few MB) is broadcast.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auncel_spark.config import Metric
from auncel_spark.functions.vector import dist_expr
from auncel_spark.operators.topk import topk_per_query

RESULT_SCHEMA = "qid bigint, id bigint, dist double"


def _prep_queries(queries: DataFrame, qid_col: str, vec_col: str) -> DataFrame:
    return queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("_qvec"))


def _prep_base(base: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_bvec"))


def knn_exact(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    metric: Metric = Metric.L2,
    strategy: str = "join",
    qid_col: str = "qid",
    q_vec_col: str = "vec",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Brute-force exact top-k. Returns (qid, pos, id, dist), pos 0-based,
    ordered by (dist, id) within each query (deterministic tie-break)."""
    q = _prep_queries(queries, qid_col, q_vec_col)
    b = _prep_base(base, id_col, vec_col)
    if strategy == "join":
        pairs = b.join(F.broadcast(q))
        scored = pairs.select(
            "qid", "id", dist_expr("_qvec", "_bvec", metric).alias("dist")
        )
        return topk_per_query(scored, k).select("qid", "pos", "id", "dist")
    if strategy == "gemm":
        partial = _gemm_partial_topk(q, b, k, metric)
        return topk_per_query(partial, k).select("qid", "pos", "id", "dist")
    raise ValueError(f"unknown strategy {strategy!r}")


def _gemm_partial_topk(q: DataFrame, b: DataFrame, k: int, metric: Metric) -> DataFrame:
    """Per-partition GEMM + argpartition partial top-k (reference BLAS
    path: ``knn_L2sqr_blas``-equivalent, Auncel/utils.cpp; partial
    per-thread heaps ``Heap.h:349-480``)."""
    spark = q.sparkSession
    qrows = q.collect()  # queries only — the small side, like the reference's xq
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["_qvec"] for r in qrows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((qids, qmat))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bq = bc.value
        q_norms = (bq * bq).sum(axis=1)[:, None]
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["_bvec"]), dtype=np.float64)
            dots = bq @ mat.T  # (nq, nb_part)
            if metric == Metric.L2:
                dist = q_norms + (mat * mat).sum(axis=1)[None, :] - 2.0 * dots
            elif metric == Metric.COSINE:
                denom = np.sqrt(q_norms) * np.sqrt((mat * mat).sum(axis=1)[None, :])
                denom[denom == 0] = 1.0
                dist = -dots / denom
            else:
                dist = -dots
            kk = min(k, dist.shape[1])
            # partial top-k MUST use the global (dist, id) order — a
            # bare argpartition breaks ties arbitrarily and can evict a
            # lower-id candidate that belongs in the global top-k
            part = np.lexsort((np.broadcast_to(ids, dist.shape), dist), axis=1)[:, :kk]
            out_qid = np.repeat(bqids, kk)
            out_id = ids[part].ravel()
            out_dist = np.take_along_axis(dist, part, axis=1).ravel()
            yield pd.DataFrame({"qid": out_qid, "id": out_id, "dist": out_dist})

    return b.mapInPandas(scan, schema=RESULT_SCHEMA)


def range_search(
    queries: DataFrame,
    base: DataFrame,
    radius: float,
    metric: Metric = Metric.L2,
    qid_col: str = "qid",
    q_vec_col: str = "vec",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """All base rows with dist < radius (L2: squared-L2 < radius; IP:
    dot > radius, per ``Index.h:146-147`` semantics). Returns
    (qid, id, dist) with dist in the metric's native sign (L2sq or dot).
    """
    q = _prep_queries(queries, qid_col, q_vec_col)
    b = _prep_base(base, id_col, vec_col)
    pairs = b.join(F.broadcast(q))
    d = dist_expr("_qvec", "_bvec", metric)
    if metric == Metric.L2:
        return pairs.select("qid", "id", d.alias("dist")).filter(F.col("dist") < radius)
    # IP: engine dist = -dot; native result keeps the dot product
    return (
        pairs.select("qid", "id", (-d).alias("dist")).filter(F.col("dist") > radius)
    )


def knn_by_ids(
    queries: DataFrame,
    base: DataFrame,
    candidates: DataFrame,
    k: int,
    metric: Metric = Metric.L2,
    qid_col: str = "qid",
    q_vec_col: str = "vec",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Re-rank: exact distances only against given (qid, id) candidate
    pairs (``knn_L2sqr_by_idx``, Auncel/utils.h:224-235; the refine
    stage of ``IndexRefineFlat``, Auncel/IndexFlat.h:101-132).

    ``candidates`` must have columns (qid, id). The join on id prunes
    the base scan to candidate rows before any distance is computed.
    """
    q = _prep_queries(queries, qid_col, q_vec_col)
    b = _prep_base(base, id_col, vec_col)
    cand = candidates.select(F.col(qid_col).alias("qid"), F.col(id_col).alias("id"))
    picked = b.join(cand, "id")  # row-pruning join first
    scored = picked.join(F.broadcast(q), "qid").select(
        "qid", "id", dist_expr("_qvec", "_bvec", metric).alias("dist")
    )
    return topk_per_query(scored, k).select("qid", "pos", "id", "dist")
