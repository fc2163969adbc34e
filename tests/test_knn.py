from __future__ import annotations

import numpy as np
import pytest

from auncel_spark.config import Metric
from auncel_spark.operators.knn import knn_by_ids, knn_exact, range_search
from auncel_spark.operators.recall import intersection_recall, worst_case_bound_holds
from auncel_spark.operators.topk import merge_topk
from tests.conftest import np_knn

K = 10


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP])
@pytest.mark.parametrize("strategy", ["join", "gemm"])
def test_knn_exact_matches_numpy_oracle(base_df, query_df, tiny_vectors, metric, strategy):
    xb, xq = tiny_vectors
    res = knn_exact(query_df, base_df, K, metric=metric, strategy=strategy)
    got = {
        (r["qid"], r["pos"]): (r["id"], r["dist"])
        for r in res.collect()
    }
    ids, dists = np_knn(xq, xb, K, metric.value)
    assert len(got) == xq.shape[0] * K
    for qi in range(xq.shape[0]):
        for pos in range(K):
            gid, gdist = got[(qi, pos)]
            assert gid == ids[qi, pos], (qi, pos)
            assert abs(gdist - dists[qi, pos]) < 1e-9


def test_range_search_matches_oracle(base_df, query_df, tiny_vectors):
    xb, xq = tiny_vectors
    radius = 1.5  # squared L2
    res = range_search(query_df, base_df, radius, metric=Metric.L2)
    got = {(r["qid"], r["id"]) for r in res.collect()}
    d = ((xq.astype(np.float64)[:, None, :] - xb.astype(np.float64)[None, :, :]) ** 2).sum(-1)
    want = {(qi, bi) for qi, bi in zip(*np.where(d < radius))}
    assert got == want


def test_knn_by_ids_reranks_candidates(base_df, query_df, tiny_vectors, spark):
    xb, xq = tiny_vectors
    # candidates: the true top-30 — re-rank must reproduce the true top-10
    ids30, _ = np_knn(xq, xb, 30, "l2")
    cand = spark.createDataFrame(
        [(int(qi), int(i)) for qi in range(xq.shape[0]) for i in ids30[qi]],
        "qid bigint, id bigint",
    )
    res = knn_by_ids(query_df, base_df, cand, K)
    ids10, _ = np_knn(xq, xb, K, "l2")
    got = {(r["qid"], r["pos"]): r["id"] for r in res.collect()}
    for qi in range(xq.shape[0]):
        for pos in range(K):
            assert got[(qi, pos)] == ids10[qi, pos]


def test_merge_topk_equals_global(base_df, query_df, tiny_vectors):
    xb, xq = tiny_vectors
    # shard the base by id parity, search each shard, merge
    shard0 = base_df.filter("id % 2 = 0")
    shard1 = base_df.filter("id % 2 = 1")
    r0 = knn_exact(query_df, shard0, K)
    r1 = knn_exact(query_df, shard1, K)
    merged = merge_topk(K, r0, r1)
    ids, _ = np_knn(xq, xb, K, "l2")
    got = {(r["qid"], r["pos"]): r["id"] for r in merged.collect()}
    for qi in range(xq.shape[0]):
        for pos in range(K):
            assert got[(qi, pos)] == ids[qi, pos]


def test_shard_partials_single_scan_matches_per_shard_scans(
    base_df, query_df, tiny_vectors
):
    """The one-scan per-shard kernel must reproduce, through merge_topk,
    exactly the rows of the two filtered-scan searches (r10 single-scan
    rewrite of q_shard_merge_topk; kill-switch
    SPARK_GRAFT_SHARD_SINGLESCAN=0)."""
    from auncel_spark.operators.knn import knn_exact_shard_partials

    xb, xq = tiny_vectors
    r0 = knn_exact(query_df, base_df.filter("id % 2 = 0"), K, strategy="gemm")
    r1 = knn_exact(query_df, base_df.filter("id % 2 = 1"), K, strategy="gemm")
    want = (
        merge_topk(K, r0, r1)
        .toPandas()
        .sort_values(["qid", "pos"])
        .reset_index(drop=True)
    )
    p = knn_exact_shard_partials(query_df, base_df, K, 2).localCheckpoint(
        eager=False
    )
    got = (
        merge_topk(
            K,
            p.filter("shard = 0").select("qid", "id", "dist"),
            p.filter("shard = 1").select("qid", "id", "dist"),
        )
        .toPandas()
        .sort_values(["qid", "pos"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    # and the merged result is the global exact top-k
    ids, _ = np_knn(xq, xb, K, "l2")
    for row in got.itertuples(index=False):
        assert row.id == ids[row.qid, row.pos]


def test_recall_and_bound(base_df, query_df, tiny_vectors, spark):
    xb, xq = tiny_vectors
    res = knn_exact(query_df, base_df, K)
    ids, dists = np_knn(xq, xb, K, "l2")
    gt = spark.createDataFrame(
        [
            (int(qi), int(p), int(ids[qi, p]), float(dists[qi, p]))
            for qi in range(xq.shape[0])
            for p in range(K)
        ],
        "qid bigint, pos int, gt_id bigint, gt_dist double",
    )
    rec = intersection_recall(res, gt, K)
    rows = rec.collect()
    assert all(abs(r["recall"] - 1.0) < 1e-12 for r in rows)
    assert worst_case_bound_holds(rec, bound=0.0)


def test_arrow_decode_matches_pandas_decode():
    """ids_mat_from_arrow (the mapInArrow kernels' decoder) must produce
    exactly the matrices as_matrix produced from the pandas route —
    float32→float64 widening is exact under both."""
    import pyarrow as pa

    from auncel_spark.functions.vector import as_matrix, ids_mat_from_arrow

    rng = np.random.default_rng(5)
    n, d = 257, 17
    mat32 = rng.standard_normal((n, d)).astype(np.float32)
    ids = rng.integers(0, 1 << 40, n)
    batch = pa.RecordBatch.from_pydict(
        {
            "id": pa.array(ids, type=pa.int64()),
            "_bvec": pa.array(list(mat32), type=pa.list_(pa.float32())),
        }
    )
    got_ids, got = ids_mat_from_arrow(batch)
    ref = as_matrix(pa.Array.to_pandas(batch.column(1)))
    assert (got_ids == ids).all()
    assert got.dtype == np.float64 and got.shape == (n, d)
    assert (got == ref).all()
    # sliced batches (offset-bearing list arrays) decode correctly too
    sl = batch.slice(3, 100)
    sids, smat = ids_mat_from_arrow(sl)
    assert (sids == ids[3:103]).all()
    assert (smat == ref[3:103]).all()
