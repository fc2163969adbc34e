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

import numpy as np

from auncel_spark.config import Metric
from auncel_spark.index.ivf import IVFIndex
from auncel_spark.index.kmeans import assign_lists
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


# --- M1/M2: IVF build + search family (SURVEY §2.2 B1-B5, §2.3 O6-O7) ---

NLIST = 16  # seed-centroid count for oracle-expressible IVF queries
NPROBE = 4
KM_K = 8  # clusters for the centroid-update query


def _seed_centroids(spark: SparkSession, sf_dir: str, k: int) -> np.ndarray:
    """Deterministic quantizer for oracle-checked queries: centroids are
    the k lowest-vec_id embeddings (init="first_k"); the IVF machinery
    is identical to the trained-k-means path."""
    rows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < k)
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: nearest-centroid assignment of every base vector."""
    cents = _seed_centroids(spark, sf_dir, NLIST)
    out = assign_lists(_emb_base(spark, sf_dir), cents)
    return out.select("id", F.col("list_no").cast("bigint").alias("list_no"))


def q_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 (one Lloyd's half-step): per-cluster per-dimension mean."""
    cents = _seed_centroids(spark, sf_dir, KM_K)
    assigned = assign_lists(_emb_base(spark, sf_dir), cents)
    return (
        assigned.select("list_no", F.posexplode("vec").alias("dim0", "v"))
        .groupBy("list_no", "dim0")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("val"))
        .select(
            F.col("list_no").cast("bigint").alias("list_no"),
            (F.col("dim0") + 1).cast("bigint").alias("dim"),
            "val",
        )
    )


def q_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6+O7: fixed-nprobe IVF-Flat search through the real index path
    (partition-pruned list join + Arrow GEMM scan + window top-k)."""
    cents = _seed_centroids(spark, sf_dir, NLIST)
    idx = IVFIndex.build(_emb_base(spark, sf_dir), nlist=NLIST, centroids=cents)
    res = idx.search(_emb_queries(spark, sf_dir), K, nprobe=NPROBE)
    return res.select("qid", F.col("pos").cast("bigint").alias("pos"), "id")


def q_ivf_list_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O31: posting-list size histogram (imbalance introspection)."""
    cents = _seed_centroids(spark, sf_dir, NLIST)
    out = assign_lists(_emb_base(spark, sf_dir), cents)
    return out.groupBy("list_no").agg(F.count("*").alias("cnt")).select(
        F.col("list_no").cast("bigint").alias("list_no"), "cnt"
    )


# --- M3: error-bounded adaptive search (SURVEY §2.3 O24-O28) ------------

BOUND = 0.1  # error bound: per-query required recall = 1 - BOUND


_PROFILE_CACHE: dict[str, tuple] = {}


def _fitted_profile(spark: SparkSession, sf_dir: str):
    from auncel_spark.profile.error_profile import ErrorProfile

    if sf_dir in _PROFILE_CACHE:
        return _PROFILE_CACHE[sf_dir]
    cents = _seed_centroids(spark, sf_dir, NLIST)
    idx = IVFIndex.build(_emb_base(spark, sf_dir), nlist=NLIST, centroids=cents)
    q = _emb_queries(spark, sf_dir)
    ep = ErrorProfile(idx, max_topk=50)
    ep.fit(q)
    # the top of the multipler grid reaches a full scan (nlist/8 · 8 =
    # nlist), so calibration always has a bound-satisfying fallback
    ep.calibrate(q, K, BOUND, multipler_grid=(1.0, 2.0, 4.0, 8.0), std_m_grid=(1.0, 2.0))
    _PROFILE_CACHE[sf_dir] = (ep, q)
    return ep, q


def q_bounded_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O24-O27: Auncel's flagship — per-query error-bounded adaptive
    kNN. Not SQL-expressible (learned traces + staged iteration) →
    rows-only driver check; the bound itself is asserted by
    ``bounded_knn_bound_check``."""
    ep, q = _fitted_profile(spark, sf_dir)
    res = ep.search(q, K, require_acc=1.0 - BOUND)
    return res.select("qid", F.col("pos").cast("bigint").alias("pos"), "id")


def q_bounded_bound_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paper's end-to-end correctness criterion
    (eval/bound.cpp:404-414) as a single-row assertion: worst-case
    over queries of threshold-recall ≥ 1 − bound. The oracle states
    the criterion must hold; a hash mismatch means the engine broke
    its error contract."""
    from auncel_spark.operators.recall import threshold_recall, worst_case_bound_holds

    ep, q = _fitted_profile(spark, sf_dir)
    res = ep.search(q, K, require_acc=1.0 - BOUND)
    gt = knn_exact(q, _emb_base(spark, sf_dir), K, Metric.L2, STRATEGY).select(
        "qid", "pos", F.col("id").alias("gt_id"), F.col("dist").alias("gt_dist")
    )
    rec = threshold_recall(res, gt, K)
    holds = worst_case_bound_holds(rec, BOUND)
    n = q.count()
    return spark.createDataFrame(
        [(int(n), bool(holds))], "n_queries bigint, bound_holds boolean"
    )


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


_CENT_CTE = f"""
, c AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < {NLIST}
), assign AS (
  SELECT id, list_no FROM (
    SELECT b.vec_id AS id, c.cid AS list_no,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_distance(b.embedding::DOUBLE[], c.cv), c.cid
           ) AS rn
    FROM embeddings b CROSS JOIN c
  ) WHERE rn = 1
)
"""

_ORACLE_ASSIGN = (
    _Q_CTE + _CENT_CTE + "\nSELECT id, list_no::BIGINT AS list_no FROM assign"
)

_ORACLE_KMEANS_UPDATE = f"""
WITH c AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < {KM_K}
), assign AS (
  SELECT id, list_no, emb FROM (
    SELECT b.vec_id AS id, c.cid AS list_no, b.embedding::DOUBLE[] AS emb,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_distance(b.embedding::DOUBLE[], c.cv), c.cid
           ) AS rn
    FROM embeddings b CROSS JOIN c
  ) WHERE rn = 1
)
SELECT list_no::BIGINT AS list_no, r.i::BIGINT AS dim,
       round(avg(emb[r.i]), 6) AS val
FROM assign, range(1, 65) r(i)
GROUP BY list_no, r.i
"""

_ORACLE_IVF_SEARCH = (
    _Q_CTE
    + _CENT_CTE
    + f"""
, probes AS (
  SELECT qid, list_no FROM (
    SELECT q.qid, c.cid AS list_no,
           row_number() OVER (
             PARTITION BY q.qid ORDER BY list_distance(q.qv, c.cv), c.cid
           ) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= {NPROBE}
), cand AS (
  SELECT q.qid, a.id, list_distance(q.qv, b.embedding::DOUBLE[]) AS dist
  FROM probes p
  JOIN assign a ON a.list_no = p.list_no
  JOIN q ON q.qid = p.qid
  JOIN embeddings b ON b.vec_id = a.id
), r AS (
  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn
  FROM cand
)
SELECT qid, rn - 1 AS pos, id FROM r WHERE rn <= {K}
"""
)

_ORACLE_LIST_SIZES = (
    _Q_CTE
    + _CENT_CTE
    + "\nSELECT list_no::BIGINT AS list_no, count(*) AS cnt FROM assign GROUP BY list_no"
)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "exact_knn_l2": q_exact_knn_l2,
    "exact_knn_ip": q_exact_knn_ip,
    "range_search_l2": q_range_search_l2,
    "knn_rerank_subset": q_knn_rerank_subset,
    "shard_merge_topk": q_shard_merge_topk,
    "recall_eval": q_recall_eval,
    "kmeans_assign": q_kmeans_assign,
    "kmeans_update": q_kmeans_update,
    "ivf_search_nprobe": q_ivf_search,
    "ivf_list_sizes": q_ivf_list_sizes,
    "bounded_knn": q_bounded_knn,
    "bounded_knn_bound_check": q_bounded_bound_check,
}

ORACLES: dict[str, str] = {
    "exact_knn_l2": _ORACLE_KNN_L2,
    "exact_knn_ip": _ORACLE_KNN_IP,
    "range_search_l2": _ORACLE_RANGE,
    "knn_rerank_subset": _ORACLE_RERANK,
    "shard_merge_topk": _ORACLE_KNN_L2,  # merge of complete shards == global top-k
    "recall_eval": _ORACLE_RECALL,
    "kmeans_assign": _ORACLE_ASSIGN,
    "kmeans_update": _ORACLE_KMEANS_UPDATE,
    "ivf_search_nprobe": _ORACLE_IVF_SEARCH,
    "ivf_list_sizes": _ORACLE_LIST_SIZES,
    # "bounded_knn": rows-only (iterative learned-trace search; SURVEY §7.3)
    "bounded_knn_bound_check": (
        _Q_CTE + "\nSELECT count(*) AS n_queries, true AS bound_holds FROM q"
    ),
}
