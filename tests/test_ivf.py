from __future__ import annotations

import numpy as np
import pytest

from auncel_spark.config import Metric
from auncel_spark.index.ivf import IVFIndex
from auncel_spark.index.kmeans import assign_lists, inter_centroid_matrix, train_kmeans
from auncel_spark.operators.knn import knn_exact
from auncel_spark.operators.recall import intersection_recall
from tests.conftest import np_knn

K = 10
NLIST = 16


def test_kmeans_objective_decreases(base_df):
    cents, hist = train_kmeans(base_df, NLIST, max_iter=8, seed=7)
    assert cents.shape == (NLIST, 16)
    # Lloyd's objective is monotone non-increasing (test_build_blocks.py:14 analogue)
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))


def test_assign_matches_numpy(base_df, tiny_vectors):
    xb, _ = tiny_vectors
    cents = xb[:NLIST].astype(np.float64)
    out = assign_lists(base_df, cents).select("id", "list_no").collect()
    d = ((xb.astype(np.float64)[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    want = d.argmin(axis=1)
    got = {r["id"]: r["list_no"] for r in out}
    assert all(got[i] == want[i] for i in range(len(xb)))


def test_inter_centroid_matrix(tiny_vectors):
    xb, _ = tiny_vectors
    c = xb[:4].astype(np.float64)
    m = inter_centroid_matrix(c, Metric.L2)
    for i in range(4):
        for j in range(4):
            assert abs(m[i, j] - np.linalg.norm(c[i] - c[j])) < 1e-12


def test_ivf_full_probe_equals_exact(base_df, query_df, tiny_vectors):
    xb, xq = tiny_vectors
    idx = IVFIndex.build(base_df, nlist=NLIST, centroids=xb[:NLIST].astype(np.float64))
    res = idx.search(query_df, K, nprobe=NLIST)  # probe everything → exact
    ids, _ = np_knn(xq, xb, K, "l2")
    got = {(r["qid"], r["pos"]): r["id"] for r in res.collect()}
    for qi in range(xq.shape[0]):
        for p in range(K):
            assert got[(qi, p)] == ids[qi, p]


def test_ivf_partial_probe_recall_reasonable(base_df, query_df, tiny_vectors, spark):
    xb, xq = tiny_vectors
    idx = IVFIndex.build(base_df, nlist=NLIST, kmeans_iter=10, seed=3)
    res = idx.search(query_df, K, nprobe=4)
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
    mean_rec = rec.agg({"recall": "avg"}).collect()[0][0]
    assert mean_rec > 0.5  # 4/16 lists on clustered-ish data


def test_ivf_persist_roundtrip(base_df, query_df, tiny_vectors, tmp_path, spark):
    xb, xq = tiny_vectors
    path = str(tmp_path / "ivf")
    idx = IVFIndex.build(base_df, nlist=NLIST, centroids=xb[:NLIST].astype(np.float64), path=path)
    idx2 = IVFIndex.load(spark, path)
    assert idx2.nlist == NLIST and idx2.metric == Metric.L2
    r1 = idx.search(query_df, K, nprobe=NLIST).collect()
    r2 = idx2.search(query_df, K, nprobe=NLIST).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    st = idx2.stats()
    assert st["ntotal"] == xb.shape[0] and st["imbalance_factor"] >= 1.0


def test_remove_ids_anti_join(base_df, tiny_vectors):
    xb, _ = tiny_vectors
    idx = IVFIndex.build(base_df, nlist=NLIST, centroids=xb[:NLIST].astype(np.float64))
    spark = base_df.sparkSession
    drop = spark.createDataFrame([(i,) for i in range(50)], "id bigint")
    kept = idx.remove_ids(drop)
    assert kept.count() == xb.shape[0] - 50
    assert kept.filter("id < 50").count() == 0


def test_search_with_stats(base_df, query_df, tiny_vectors):
    xb, _ = tiny_vectors
    idx = IVFIndex.build(base_df, nlist=NLIST, centroids=xb[:NLIST].astype(np.float64))
    res, st = idx.search_with_stats(query_df, K, nprobe=4)
    assert res.count() > 0
    assert st["nq"] == 20 and st["nprobe"] == 4
    assert 0 < st["nlists_scanned"] <= NLIST
    # every scanned (query, row) pair computed one distance
    assert st["ndis"] > 0
    assert st["search_time_s"] > 0
