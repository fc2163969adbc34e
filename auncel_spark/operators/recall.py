"""Recall / result-quality evaluators.

Reference surface (SURVEY.md §2.3 O17):
- ``ranklist_intersection_size`` (``Auncel/utils.h:326-327``) — sorted
  id-set intersection between a result list and ground truth.
- ``Error_sys::recall`` (``Auncel/profile.cpp:246-280``) — dedup-aware
  intersection / k, averaged or per query.
- ``inter_sec`` (``Auncel/eval/bound.cpp:117-128``) — distance-threshold
  recall: count of returned dists ≤ the true k-th distance. This is the
  criterion behind the paper's worst-case bound check
  (``eval/bound.cpp:404-414``): min over queries ≥ 1 − bound.

Both are joins + aggregations — the relational core of §2.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def intersection_recall(
    result: DataFrame,
    ground_truth: DataFrame,
    k: int,
    qid_col: str = "qid",
    id_col: str = "id",
    gt_id_col: str = "gt_id",
) -> DataFrame:
    """Per-query id-set recall@k: |result_ids ∩ gt_ids[:k]| / k.

    Inputs are row-form result (qid, id) and ground truth
    (qid, pos, gt_id); only gt rows with pos < k count.
    Returns (qid, n_hit, recall).
    """
    gt_k = ground_truth.filter(F.col("pos") < k).select(
        F.col(qid_col).alias("qid"), F.col(gt_id_col).alias("id")
    )
    res = result.select(F.col(qid_col).alias("qid"), F.col(id_col).alias("id"))
    hits = res.join(gt_k, ["qid", "id"]).groupBy("qid").agg(F.count("*").alias("n_hit"))
    all_q = res.select("qid").distinct()
    return (
        all_q.join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(float(k))).alias("recall"),
        )
    )


def threshold_recall(
    result: DataFrame,
    ground_truth: DataFrame,
    k: int,
    qid_col: str = "qid",
    dist_col: str = "dist",
) -> DataFrame:
    """Distance-threshold recall (``inter_sec``, eval/bound.cpp:117-128):
    fraction of returned results whose dist ≤ the true k-th distance.
    Accepts approximate results whose ids differ from GT but whose
    distances are as good — the paper's own bound criterion.

    Returns (qid, recall).
    """
    gt_kth = (
        ground_truth.filter(F.col("pos") < k)
        .groupBy(qid_col)
        .agg(F.max("gt_dist").alias("_gt_kth"))
    )
    eps = 1e-6  # float tolerance, mirroring bound.cpp's exact float compare leniency
    return (
        result.join(gt_kth, qid_col)
        .groupBy(qid_col)
        .agg(
            (
                F.sum(F.when(F.col(dist_col) <= F.col("_gt_kth") + eps, 1).otherwise(0))
                / F.lit(float(k))
            ).alias("recall")
        )
    )


def worst_case_bound_holds(recall_df: DataFrame, bound: float) -> bool:
    """The paper's end-to-end assertion (eval/bound.cpp:404-414):
    min over queries of recall ≥ 1 − bound."""
    row = recall_df.agg(F.min("recall").alias("minf")).collect()[0]
    return row["minf"] is not None and row["minf"] >= 1.0 - bound
