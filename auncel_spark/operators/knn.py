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
    (``mapInArrow`` — the list column's flat values buffer decodes to
    the GEMM matrix in one vectorized pass, no per-row ndarray cells)
    and emits only its local top-k
    per query — nq·k rows per partition instead of nq·|partition| —
    then a global window merge. This is the 100 TB path: shuffle volume
    is independent of base size.

Scale note: both strategies scan the base exactly once with only
(id, vec) read from Parquet (column pruning); neither ever collects
vectors to the driver — only the query matrix (≤ a few MB) is broadcast.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auncel_spark.config import Metric
from auncel_spark.functions.vector import as_matrix, dist_expr
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
    """Per-partition GEMM + top-k (reference BLAS path:
    ``knn_L2sqr_blas``-equivalent, Auncel/utils.cpp; partial per-thread
    heaps ``Heap.h:349-480``). Base rows are processed in blocks sized
    so the (nq × block) distance matrix stays ~tens of MB (the
    reference tiles its BLAS calls the same way, bs_x/bs_y), and each
    task folds blocks into ONE running top-k state, emitting a single
    partial per task — shuffle volume O(tasks·nq·k), any corpus size."""
    spark = q.sparkSession
    qpdf = q.toPandas()  # queries only — the small side, like the reference's xq
    qids = qpdf["qid"].to_numpy(dtype=np.int64)
    qmat = as_matrix(qpdf["_qvec"])
    bc = spark.sparkContext.broadcast((qids, qmat))

    def scan(batches):
        import pyarrow as pa

        from auncel_spark.functions.vector import ids_mat_from_arrow
        from auncel_spark.index.scan import _group_topk, _merge_rows

        bqids, bq = bc.value
        nq = len(bqids)
        q_norms = (bq * bq).sum(axis=1)[:, None]
        block = max(64, 4_000_000 // max(nq, 1))
        state_d = state_i = None
        rows_all = np.arange(nq)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if state_d is None:
                state_d = np.full((nq, k), np.inf)
                state_i = np.full((nq, k), -1, dtype=np.int64)
            ids_b, mat_b = ids_mat_from_arrow(batch)
            for s0 in range(0, len(ids_b), block):
                ids = ids_b[s0 : s0 + block]
                mat = mat_b[s0 : s0 + block]
                dots = bq @ mat.T  # (nq, block)
                if metric == Metric.L2:
                    dist = q_norms + (mat * mat).sum(axis=1)[None, :] - 2.0 * dots
                elif metric == Metric.COSINE:
                    denom = np.sqrt(q_norms) * np.sqrt(
                        (mat * mat).sum(axis=1)[None, :]
                    )
                    denom[denom == 0] = 1.0
                    dist = -dots / denom
                else:
                    dist = -dots
                # partial top-k MUST use the global (dist, id) order — a
                # bare argpartition breaks ties arbitrarily and can evict
                # a lower-id candidate that belongs in the global top-k
                nd, ni = _group_topk(dist, ids, k)
                _merge_rows(state_d, state_i, rows_all, nd, ni)
        if state_d is None:
            return
        keep = (state_i >= 0).ravel()
        yield pa.RecordBatch.from_pydict(
            {
                "qid": np.repeat(bqids, k)[keep],
                "id": state_i.ravel()[keep],
                "dist": state_d.ravel()[keep],
            }
        )

    return b.mapInArrow(scan, schema=RESULT_SCHEMA)


MULTI_SCHEMA = "metric string, qid bigint, id bigint, dist double"


def knn_exact_multi(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    metrics: list[Metric],
    qid_col: str = "qid",
    q_vec_col: str = "vec",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Exact top-k under SEVERAL metrics from ONE base scan: the GEMM
    dot-product block is computed once per (query tile × base block)
    and every metric's distance derives from it (L2 = |q|²+|b|²−2·dots,
    IP/COSINE = ±dots scaling) — the same arithmetic as per-metric
    ``knn_exact(strategy="gemm")``, so each metric's rows are
    bit-identical to the single-metric call. Returns
    (metric, qid, pos, id, dist); metric values are the enum values
    ("l2", "ip", "cosine"). A two-metric workload halves the corpus
    scan and the shuffle (guide §1.2: don't compute things twice)."""
    q = _prep_queries(queries, qid_col, q_vec_col)
    b = _prep_base(base, id_col, vec_col)
    spark = q.sparkSession
    qpdf = q.toPandas()
    qids = qpdf["qid"].to_numpy(dtype=np.int64)
    qmat = as_matrix(qpdf["_qvec"])
    mvals = [m.value for m in metrics]
    bc = spark.sparkContext.broadcast((qids, qmat, mvals))

    def scan(batches):
        import pyarrow as pa

        from auncel_spark.functions.vector import ids_mat_from_arrow
        from auncel_spark.index.scan import _group_topk, _merge_rows

        bqids, bq, bmv = bc.value
        bms = [Metric(v) for v in bmv]
        nq = len(bqids)
        q_norms = (bq * bq).sum(axis=1)[:, None]
        block = max(64, 4_000_000 // max(nq, 1))
        states = None
        rows_all = np.arange(nq)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if states is None:
                states = {
                    m.value: (
                        np.full((nq, k), np.inf),
                        np.full((nq, k), -1, dtype=np.int64),
                    )
                    for m in bms
                }
            ids_b, mat_b = ids_mat_from_arrow(batch)
            for s0 in range(0, len(ids_b), block):
                ids = ids_b[s0 : s0 + block]
                mat = mat_b[s0 : s0 + block]
                dots = bq @ mat.T  # shared across metrics
                for m in bms:
                    if m == Metric.L2:
                        dist = (
                            q_norms + (mat * mat).sum(axis=1)[None, :] - 2.0 * dots
                        )
                    elif m == Metric.COSINE:
                        denom = np.sqrt(q_norms) * np.sqrt(
                            (mat * mat).sum(axis=1)[None, :]
                        )
                        denom[denom == 0] = 1.0
                        dist = -dots / denom
                    else:
                        dist = -dots
                    nd, ni = _group_topk(dist, ids, k)
                    sd, si = states[m.value]
                    _merge_rows(sd, si, rows_all, nd, ni)
        if states is None:
            return
        for mv in bmv:
            sd, si = states[mv]
            keep = (si >= 0).ravel()
            yield pa.RecordBatch.from_pydict(
                {
                    "metric": np.repeat(mv, int(keep.sum())),
                    "qid": np.repeat(bqids, k)[keep],
                    "id": si.ravel()[keep],
                    "dist": sd.ravel()[keep],
                }
            )

    partial = b.mapInArrow(scan, schema=MULTI_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("metric", "qid").orderBy(
        F.col("dist").asc(), F.col("id").asc()
    )
    return (
        partial.withColumn("pos", F.row_number().over(w) - 1)
        .filter(F.col("pos") < k)
        .select("metric", "qid", "pos", "id", "dist")
    )


SHARD_SCHEMA = "shard int, qid bigint, id bigint, dist double"


def knn_exact_shard_partials(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    n_shards: int,
    metric: Metric = Metric.L2,
    qid_col: str = "qid",
    q_vec_col: str = "vec",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Per-task top-k per id-modulo shard from ONE base scan.

    ``shard = id % n_shards``; each task keeps an independent
    (dist, id)-ordered top-k state PER SHARD (the per-shard searches of
    ``knn_exact(q, b.filter(id % n == s))`` folded into one pass), so n
    parity shards cost one corpus read instead of n (guide §1.2/§2.4).
    Rows within a batch are split by shard BEFORE blocking, so each
    shard's blocks see exactly the rows (in scan order) the filtered
    scan would have seen; the distance arithmetic per (query, row) is
    the elementwise GEMM formula and is independent of which other rows
    share a block. Returns task-level partials (shard, qid, id, dist) —
    a superset of each shard's global top-k, suitable for
    ``merge_topk`` (union + min-agg + window keeps the same winners as
    merging the per-shard exact top-k tables, because every per-shard
    top-k member is present in the partials).
    """
    q = _prep_queries(queries, qid_col, q_vec_col)
    b = _prep_base(base, id_col, vec_col)
    spark = q.sparkSession
    qpdf = q.toPandas()
    qids = qpdf["qid"].to_numpy(dtype=np.int64)
    qmat = as_matrix(qpdf["_qvec"])
    bc = spark.sparkContext.broadcast((qids, qmat, int(n_shards)))

    def scan(batches):
        import pyarrow as pa

        from auncel_spark.functions.vector import ids_mat_from_arrow
        from auncel_spark.index.scan import _group_topk, _merge_rows

        bqids, bq, ns = bc.value
        nq = len(bqids)
        q_norms = (bq * bq).sum(axis=1)[:, None]
        block = max(64, 4_000_000 // max(nq, 1))
        states = None
        rows_all = np.arange(nq)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if states is None:
                states = [
                    (
                        np.full((nq, k), np.inf),
                        np.full((nq, k), -1, dtype=np.int64),
                    )
                    for _ in range(ns)
                ]
            ids_b, mat_b = ids_mat_from_arrow(batch)
            shard_b = ids_b % ns
            for s in range(ns):
                mask = shard_b == s
                if not mask.any():
                    continue
                ids_s = ids_b[mask]
                mat_s = mat_b[mask]
                sd, si = states[s]
                for s0 in range(0, len(ids_s), block):
                    ids = ids_s[s0 : s0 + block]
                    mat = mat_s[s0 : s0 + block]
                    dots = bq @ mat.T
                    if metric == Metric.L2:
                        dist = (
                            q_norms + (mat * mat).sum(axis=1)[None, :] - 2.0 * dots
                        )
                    elif metric == Metric.COSINE:
                        denom = np.sqrt(q_norms) * np.sqrt(
                            (mat * mat).sum(axis=1)[None, :]
                        )
                        denom[denom == 0] = 1.0
                        dist = -dots / denom
                    else:
                        dist = -dots
                    nd, ni = _group_topk(dist, ids, k)
                    _merge_rows(sd, si, rows_all, nd, ni)
        if states is None:
            return
        for s in range(ns):
            sd, si = states[s]
            keep = (si >= 0).ravel()
            if not keep.any():
                continue
            yield pa.RecordBatch.from_pydict(
                {
                    "shard": np.repeat(np.int32(s), int(keep.sum())),
                    "qid": np.repeat(bqids, k)[keep],
                    "id": si.ravel()[keep],
                    "dist": sd.ravel()[keep],
                }
            )

    return b.mapInArrow(scan, schema=SHARD_SCHEMA)


def range_search(
    queries: DataFrame,
    base: DataFrame,
    radius: float,
    metric: Metric = Metric.L2,
    qid_col: str = "qid",
    q_vec_col: str = "vec",
    id_col: str = "id",
    vec_col: str = "vec",
    strategy: str = "gemm",
) -> DataFrame:
    """All base rows with dist < radius (L2: squared-L2 < radius; IP:
    dot > radius, per ``Index.h:146-147`` semantics). Returns
    (qid, id, dist) with dist in the metric's native sign (L2sq or dot).

    ``strategy="gemm"`` (default since r10): broadcast the query matrix
    and evaluate the radius filter on BLAS GEMM blocks inside
    mapInPandas — one shuffle-free base scan emitting only qualifying
    pairs (``range_search_L2sqr``'s BLAS path). r09's shape was a
    broadcast nested-loop join materializing every (query, base) pair
    through the row-at-a-time JVM array expression — nq× the scan width
    before the filter. ``strategy="join"`` keeps that plan (the SQL
    oracle shape). Same float64 arithmetic as ``knn_exact`` GEMM.
    """
    q = _prep_queries(queries, qid_col, q_vec_col)
    b = _prep_base(base, id_col, vec_col)
    if strategy == "gemm":
        spark = q.sparkSession
        qpdf = q.toPandas()
        qids = qpdf["qid"].to_numpy(dtype=np.int64)
        qmat = as_matrix(qpdf["_qvec"])
        bc = spark.sparkContext.broadcast((qids, qmat))

        def scan(batches):
            import pyarrow as pa

            from auncel_spark.functions.vector import ids_mat_from_arrow

            bqids, bq = bc.value
            nq = len(bqids)
            q_norms = (bq * bq).sum(axis=1)[:, None]
            block = max(64, 4_000_000 // max(nq, 1))
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                ids_b, mat_b = ids_mat_from_arrow(batch)
                for s0 in range(0, len(ids_b), block):
                    ids = ids_b[s0 : s0 + block]
                    mat = mat_b[s0 : s0 + block]
                    dots = bq @ mat.T
                    if metric == Metric.L2:
                        dist = (
                            q_norms + (mat * mat).sum(axis=1)[None, :] - 2.0 * dots
                        )
                        qi, bi = np.where(dist < radius)
                    else:
                        dist = dots  # native sign: the dot product
                        qi, bi = np.where(dist > radius)
                    if len(qi) == 0:
                        continue
                    yield pa.RecordBatch.from_pydict(
                        {
                            "qid": bqids[qi],
                            "id": ids[bi],
                            "dist": dist[qi, bi],
                        }
                    )

        return b.mapInArrow(scan, schema=RESULT_SCHEMA)
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
    broadcast_candidates: bool = False,
) -> DataFrame:
    """Re-rank: exact distances only against given (qid, id) candidate
    pairs (``knn_L2sqr_by_idx``, Auncel/utils.h:224-235; the refine
    stage of ``IndexRefineFlat``, Auncel/IndexFlat.h:101-132).

    ``candidates`` must have columns (qid, id). The join on id prunes
    the base scan to candidate rows before any distance is computed.

    ``broadcast_candidates``: hash the candidate pairs to every task
    so the base is ONE streamed scan with no shuffle — the right plan
    whenever nq·k·k_factor is driver-bounded (pairs are 16 bytes; even
    6.4M pairs ≈ 100 MB). The default shuffle join remains for
    unbounded candidate sets (e.g. a pair table bigger than memory).
    """
    q = _prep_queries(queries, qid_col, q_vec_col)
    b = _prep_base(base, id_col, vec_col)
    cand = candidates.select(F.col(qid_col).alias("qid"), F.col(id_col).alias("id"))
    if broadcast_candidates:
        cand = F.broadcast(cand)
    picked = b.join(cand, "id")  # row-pruning join first
    scored = picked.join(F.broadcast(q), "qid").select(
        "qid", "id", dist_expr("_qvec", "_bvec", metric).alias("dist")
    )
    return topk_per_query(scored, k).select("qid", "pos", "id", "dist")
