"""Broadcast-queries coded scan (index/scan.py scan_window_coded)
equivalence vs the probes-join ADC/decode path.

The two strategies implement the same InvertedListScanner semantics
(``Auncel/IndexIVF.cpp:439-475`` specialized by IndexIVFPQ /
IndexScalarQuantizer scanners); they must return identical neighbor
sets and matching distances for every (metric, residual, codec)
combination."""

from __future__ import annotations

import numpy as np
import pytest

from auncel_spark.config import Metric
from auncel_spark.index.ivfpq import IVFPQIndex, IVFPQRIndex
from auncel_spark.index.ivfsq import IVFSQIndex

K, NPROBE, NLIST = 5, 3, 8


def _rows(df):
    return [
        (r["qid"], r["pos"], r["id"], r["dist"])
        for r in df.orderBy("qid", "pos").collect()
    ]


def _assert_equiv(res_a, res_b, tol=1e-8):
    a, b = _rows(res_a), _rows(res_b)
    assert len(a) == len(b) > 0
    for (qa, pa, ia, da), (qb, pb, ib, db) in zip(a, b):
        assert (qa, pa, ia) == (qb, pb, ib)
        assert da == pytest.approx(db, abs=tol)


@pytest.mark.parametrize("qtype", ["8bit", "4bit", "fp16"])
def test_ivfsq_bcast_matches_join(base_df, query_df, qtype):
    idx = IVFSQIndex.build(base_df, nlist=NLIST, kmeans_iter=5, qtype=qtype)
    _assert_equiv(
        idx.search(query_df, K, NPROBE, strategy="join"),
        idx.search(query_df, K, NPROBE, strategy="bcast"),
    )


@pytest.mark.parametrize(
    "metric,by_residual",
    [(Metric.L2, True), (Metric.L2, False), (Metric.IP, True), (Metric.IP, False)],
)
def test_ivfpq_bcast_matches_join(base_df, query_df, metric, by_residual):
    idx = IVFPQIndex.build(
        base_df, nlist=NLIST, M=4, metric=metric, by_residual=by_residual,
        kmeans_iter=5,
    )
    _assert_equiv(
        idx.search(query_df, K, NPROBE, strategy="join"),
        idx.search(query_df, K, NPROBE, strategy="bcast"),
    )


def test_ivfpq_bcast_without_precomputed_table(base_df, query_df):
    """term2 fallback: the in-task per-list table must equal the
    broadcast precomputed one."""
    idx = IVFPQIndex.build(base_df, nlist=NLIST, M=4, kmeans_iter=5)
    with_t2 = idx.search(query_df, K, NPROBE, strategy="bcast")
    idx.use_precomputed_table = False
    idx._term2 = None
    without = idx.search(query_df, K, NPROBE, strategy="bcast")
    _assert_equiv(with_t2, without)


def test_ivfpqr_search_uses_bcast_candidates(base_df, query_df, tiny_vectors):
    """IVFPQR two-pass search still refines correctly on top of the
    broadcast ADC candidate pass (recall sanity vs exact)."""
    from tests.conftest import np_knn

    xb, xq = tiny_vectors
    idx = IVFPQRIndex.build(base_df, nlist=NLIST, M=4, kmeans_iter=5)
    res = idx.search(query_df, K, NLIST)  # probe everything: recall is PQ-limited only
    gt, _ = np_knn(xq, xb, K)
    got = {}
    for r in res.collect():
        got.setdefault(int(r["qid"]), set()).add(int(r["id"]))
    hits = sum(len(got.get(q, set()) & set(gt[q])) for q in range(len(xq)))
    assert hits / (len(xq) * K) > 0.5
