"""The declared query catalog: every operator from SURVEY.md §2 that is
implemented gets (a) a Spark callable (spark, sf_dir) -> DataFrame and
(b) where SQL-expressible, a DuckDB oracle string over the same parquet
tables. The driver hash-matches the two at sf=0.01.

Conventions (driver contract):
- every computed column is aliased identically in Spark and SQL;
- ids/positions are BIGINT; floats are rounded (round(x, 6)) before
  being returned so float64 noise cannot flip the value hash;
- k-NN results return (qid, pos, id) — the distance itself stays out of
  hashed output; ordering is deterministic via (dist, id) tie-break.

Query workload: the `embeddings` table (vec_id BIGINT, embedding
ARRAY<FLOAT> d=64 unit-norm, label INT). Queries are the rows with
vec_id % 20 = 0, searching the full table — self-match included, as in
the reference's recall evaluation convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auncel_spark.config import Metric
from auncel_spark.operators.knn import knn_by_ids, knn_exact, range_search
from auncel_spark.operators.recall import intersection_recall
from auncel_spark.operators.topk import merge_topk

K = 10
QUERY_FILTER = "vec_id % 20 = 0"
RANGE_RADIUS = 1.4  # squared L2; ~1% of pairs on the unit-norm corpus
# GEMM path for the scored catalog queries: float64 BLAS matches the
# float64 SQL oracle to ~1e-13 relative — far tighter than any distance
# gap in continuous random data, so (dist, id) ordering agrees.
STRATEGY = "gemm"


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _emb_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "embeddings")
        .filter(QUERY_FILTER)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("vec"))
    )


def _emb_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


# --- M0: exact search family (SURVEY §2.3 O1-O5, O15-O17) ---------------


def q_exact_knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = knn_exact(
        _emb_queries(spark, sf_dir), _emb_base(spark, sf_dir), K, Metric.L2, STRATEGY
    )
    return res.select("qid", F.col("pos").cast("bigint").alias("pos"), "id")


def q_exact_knn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = knn_exact(
        _emb_queries(spark, sf_dir), _emb_base(spark, sf_dir), K, Metric.IP, STRATEGY
    )
    return res.select("qid", F.col("pos").cast("bigint").alias("pos"), "id")


def q_range_search_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = range_search(
        _emb_queries(spark, sf_dir), _emb_base(spark, sf_dir), RANGE_RADIUS, Metric.L2
    )
    return res.select("qid", "id")


def q_knn_rerank_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/O9: candidate generation by IP top-50, exact L2 re-rank to top-10."""
    q = _emb_queries(spark, sf_dir)
    b = _emb_base(spark, sf_dir)
    cand = knn_exact(q, b, 50, Metric.IP, STRATEGY).select("qid", "id")
    res = knn_by_ids(q, b, cand, K, Metric.L2)
    return res.select("qid", F.col("pos").cast("bigint").alias("pos"), "id")


def q_shard_merge_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O16/O20: shard by id parity, search shards independently, merge.
    Semantically equal to the global top-k — the oracle states that."""
    q = _emb_queries(spark, sf_dir)
    b = _emb_base(spark, sf_dir)
    r0 = knn_exact(q, b.filter("id % 2 = 0"), K, Metric.L2, STRATEGY)
    r1 = knn_exact(q, b.filter("id % 2 = 1"), K, Metric.L2, STRATEGY)
    res = merge_topk(K, r0, r1)
    return res.select("qid", F.col("pos").cast("bigint").alias("pos"), "id")


def q_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O17: recall of IP-ranked top-10 against true L2 top-10."""
    q = _emb_queries(spark, sf_dir)
    b = _emb_base(spark, sf_dir)
    approx = knn_exact(q, b, K, Metric.IP, STRATEGY)
    gt = knn_exact(q, b, K, Metric.L2, STRATEGY).select(
        "qid", "pos", F.col("id").alias("gt_id")
    )
    rec = intersection_recall(approx, gt, K)
    return rec.select("qid", F.round(F.col("recall"), 6).alias("recall"))


# --- oracle SQL (DuckDB dialect, float64 arithmetic) --------------------

_Q_CTE = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE {QUERY_FILTER}
)
"""

_ORACLE_KNN_L2 = (
    _Q_CTE
    + f"""
, d AS (
  SELECT q.qid, b.vec_id AS id,
         list_distance(q.qv, b.embedding::DOUBLE[]) AS dist
  FROM q CROSS JOIN embeddings b
), r AS (
  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn
  FROM d
)
SELECT qid, rn - 1 AS pos, id FROM r WHERE rn <= {K}
"""
)

_ORACLE_KNN_IP = (
    _Q_CTE
    + f"""
, d AS (
  SELECT q.qid, b.vec_id AS id,
         -list_inner_product(q.qv, b.embedding::DOUBLE[]) AS dist
  FROM q CROSS JOIN embeddings b
), r AS (
  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn
  FROM d
)
SELECT qid, rn - 1 AS pos, id FROM r WHERE rn <= {K}
"""
)

_ORACLE_RANGE = (
    _Q_CTE
    + f"""
SELECT q.qid, b.vec_id AS id
FROM q CROSS JOIN embeddings b
WHERE list_distance(q.qv, b.embedding::DOUBLE[]) ** 2 < {RANGE_RADIUS}
"""
)

_ORACLE_RERANK = (
    _Q_CTE
    + f"""
, cand AS (
  SELECT qid, id FROM (
    SELECT q.qid, b.vec_id AS id,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY -list_inner_product(q.qv, b.embedding::DOUBLE[]), b.vec_id
           ) AS rn
    FROM q CROSS JOIN embeddings b
  ) WHERE rn <= 50
), rr AS (
  SELECT c.qid, c.id,
         row_number() OVER (
           PARTITION BY c.qid
           ORDER BY list_distance(q.qv, b.embedding::DOUBLE[]), c.id
         ) AS rn
  FROM cand c
  JOIN embeddings b ON b.vec_id = c.id
  JOIN q ON q.qid = c.qid
)
SELECT qid, rn - 1 AS pos, id FROM rr WHERE rn <= {K}
"""
)

_ORACLE_RECALL = (
    _Q_CTE
    + f"""
, l2 AS (
  SELECT qid, id FROM (
    SELECT q.qid, b.vec_id AS id,
           row_number() OVER (
             PARTITION BY q.qid ORDER BY list_distance(q.qv, b.embedding::DOUBLE[]), b.vec_id
           ) AS rn
    FROM q CROSS JOIN embeddings b
  ) WHERE rn <= {K}
), ip AS (
  SELECT qid, id FROM (
    SELECT q.qid, b.vec_id AS id,
           row_number() OVER (
             PARTITION BY q.qid ORDER BY -list_inner_product(q.qv, b.embedding::DOUBLE[]), b.vec_id
           ) AS rn
    FROM q CROSS JOIN embeddings b
  ) WHERE rn <= {K}
)
SELECT ip.qid, round(count(l2.id) / {K}.0, 6) AS recall
FROM ip LEFT JOIN l2 ON ip.qid = l2.qid AND ip.id = l2.id
GROUP BY ip.qid
"""
)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "exact_knn_l2": q_exact_knn_l2,
    "exact_knn_ip": q_exact_knn_ip,
    "range_search_l2": q_range_search_l2,
    "knn_rerank_subset": q_knn_rerank_subset,
    "shard_merge_topk": q_shard_merge_topk,
    "recall_eval": q_recall_eval,
}

ORACLES: dict[str, str] = {
    "exact_knn_l2": _ORACLE_KNN_L2,
    "exact_knn_ip": _ORACLE_KNN_IP,
    "range_search_l2": _ORACLE_RANGE,
    "knn_rerank_subset": _ORACLE_RERANK,
    "shard_merge_topk": _ORACLE_KNN_L2,  # merge of complete shards == global top-k
    "recall_eval": _ORACLE_RECALL,
}
