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


def test_group_topk_exact_under_massive_ties():
    """ADVICE r04: the argpartition fast path keeps k+16 rows before
    the exact lexsort — when >16 elements tie exactly at the k-th
    distance (routine for integral Hamming / duplicate-PQ-code
    distances) the result must STILL be the deterministic (dist, id)
    order. The guard detects tie spill past the margin and redoes
    those rows with the full lexsort."""
    import numpy as np

    from auncel_spark.index.scan import _group_topk

    rng = np.random.default_rng(7)
    nL, k = 500, 10
    ids = rng.permutation(nL).astype(np.int64)

    # worst case: ALL distances identical -> top-k must be the k
    # smallest ids at that distance
    dist = np.full((3, nL), 5.0)
    d, i = _group_topk(dist, ids, k)
    assert (i == np.sort(ids)[:k]).all() and (d == 5.0).all()

    # Hamming-like integral distances with ~60-way ties at the k-th
    dist = rng.integers(0, 8, (16, nL)).astype(np.float64)
    d, i = _group_topk(dist, ids, k)
    ref_sel = np.lexsort((np.broadcast_to(ids, dist.shape), dist), axis=1)[:, :k]
    ref_d = np.take_along_axis(dist, ref_sel, axis=1)
    ref_i = ids[ref_sel]
    assert (d == ref_d).all() and (i == ref_i).all()

    # no-tie case still exact
    dist = rng.standard_normal((8, nL))
    d, i = _group_topk(dist, ids, k)
    ref_sel = np.lexsort((np.broadcast_to(ids, dist.shape), dist), axis=1)[:, :k]
    assert (i == ids[ref_sel]).all()


def test_tiled_topk_list_dimension_chunking():
    """ADVICE r04: a single huge list must be chunked along the list
    dimension too (the 64-query floor alone would allow a multi-GB
    distance block); chunked partial top-k merged via _merge_rows must
    equal the unchunked exact answer."""
    import numpy as np

    import auncel_spark.index.scan as scan_mod
    from auncel_spark.index.scan import _merge_rows, _tiled_topk
    from auncel_spark.operators.knn import Metric

    rng = np.random.default_rng(11)
    nq, nL, d, k = 7, 10000, 8, 5  # nL > the 4096 chunk floor -> 3 list chunks
    bq = rng.standard_normal((nq, d))
    qn = (bq * bq).sum(axis=1)
    mat = rng.standard_normal((nL, d))
    ids = rng.permutation(nL).astype(np.int64)
    sel = np.arange(nq)

    old = scan_mod._TILE_ELEMS
    scan_mod._TILE_ELEMS = 4096  # force both query AND list chunking
    try:
        state_d = np.full((nq, k), np.inf)
        state_i = np.full((nq, k), -1, dtype=np.int64)
        for _, ss, nd, ni in _tiled_topk(bq, qn, sel, mat, ids, Metric.L2, k):
            _merge_rows(state_d, state_i, ss, nd, ni)
    finally:
        scan_mod._TILE_ELEMS = old

    dist = ((bq[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)
    ref_sel = np.lexsort((np.broadcast_to(ids, dist.shape), dist), axis=1)[:, :k]
    assert (state_i == ids[ref_sel]).all()
    assert np.allclose(state_d, np.take_along_axis(dist, ref_sel, axis=1))


def test_group_topk_inf_padding_contract():
    """ADVICE r08 #3: pins the +inf contract of the fast-path guard —
    inf entries are PADDING whose ids carry no meaning (callers mask
    them out; every real scan emits finite distances). A row whose
    kept k-th is +inf is exempt from the exact-tie redo, so the only
    guarantee among inf-tied entries is that every FINITE (dist, id)
    pair ranks correctly ahead of them."""
    import numpy as np

    from auncel_spark.index.scan import _group_topk

    rng = np.random.default_rng(11)
    nL, k = 200, 10
    ids = rng.permutation(nL).astype(np.int64)
    dist = np.full((4, nL), np.inf)
    # give each row fewer-than-k finite entries
    for r in range(4):
        pick = rng.choice(nL, size=3 + r, replace=False)
        dist[r, pick] = rng.standard_normal(len(pick)) ** 2
    d, i = _group_topk(dist, ids, k)
    for r in range(4):
        finite = np.isfinite(dist[r])
        ref = np.lexsort((ids[finite], dist[r][finite]))
        nf = finite.sum()
        # finite prefix exact (dist, id) order; inf tail unordered
        assert (i[r, :nf] == ids[finite][ref]).all()
        assert (d[r, :nf] == dist[r][finite][ref]).all()
        assert np.isinf(d[r, nf:]).all()
