from __future__ import annotations

import numpy as np
import pytest

from auncel_spark.config import Metric
from auncel_spark.index.pq import ProductQuantizer, pq_knn
from auncel_spark.index.sq import ScalarQuantizer
from auncel_spark.operators.knn import knn_by_ids
from tests.conftest import np_knn

K = 10


@pytest.fixture(scope="module")
def sq(base_df):
    return ScalarQuantizer.train(base_df)


@pytest.fixture(scope="module")
def pq(base_df):
    return ProductQuantizer.train(base_df, M=4, n_iter=10, sample_size=400)


def test_sq_roundtrip_error_bounded(base_df, tiny_vectors, sq):
    """Codec round-trip: |decode(encode(x)) − x| ≤ half a quantization
    step per dim (test_build_blocks.py:100 analogue)."""
    xb, _ = tiny_vectors
    coded = sq.encode(base_df)
    dec = sq.decode(coded).select("id", "vec_dec").collect()
    step = sq.vdiff / 255.0
    for r in dec[:50]:
        err = np.abs(np.array(r["vec_dec"]) - xb[r["id"]].astype(np.float64))
        assert np.all(err <= step * 0.51 + 1e-6)


def test_sq_meanstd_train(base_df):
    sq2 = ScalarQuantizer.train(base_df, rangestat="meanstd", rs_arg=2.0)
    assert sq2.d == 16 and np.all(sq2.vdiff > 0)


def test_pq_roundtrip_reduces_error(base_df, tiny_vectors, pq):
    xb, _ = tiny_vectors
    coded = pq.encode(base_df)
    dec = pq.decode(coded).select("id", "vec_dec").collect()
    errs = []
    for r in dec:
        errs.append(((np.array(r["vec_dec"]) - xb[r["id"]]) ** 2).sum())
    # unit vectors: reconstruction error must be far below vector norm
    assert np.mean(errs) < 0.5


def test_pq_codes_deterministic(base_df, pq):
    c1 = {r["id"]: r["code"] for r in pq.encode(base_df).collect()}
    c2 = {r["id"]: r["code"] for r in pq.encode(base_df).collect()}
    assert c1 == c2


def test_pq_gemm_encode_matches_exact(base_df, tiny_vectors, pq):
    """The big-tier build path uses the GEMM argmin (|c|² − 2·s·cᵀ,
    O(n·ksub) memory) instead of the exact |s − c|² broadcast; on
    continuous data the argmin is identical (ties have measure zero).
    Checked both as numpy kernels and through the DataFrame codec."""
    xb, _ = tiny_vectors
    np.testing.assert_array_equal(
        pq.encode_np(xb.astype(np.float64), gemm=True),
        pq.encode_np(xb.astype(np.float64)),
    )
    cg = {r["id"]: r["code"] for r in pq.encode(base_df, gemm=True).collect()}
    ce = {r["id"]: r["code"] for r in pq.encode(base_df).collect()}
    assert cg == ce


def test_pq_knn_recall_vs_exact(base_df, query_df, tiny_vectors, pq):
    """ADC ranking must be a decent approximation (reference asserts
    IVFPQ accuracy vs brute force, test_index.py:20-539)."""
    xb, xq = tiny_vectors
    coded = pq.encode(base_df).select("id", "code")
    res = pq_knn(query_df, coded, pq, K)
    ids_true, _ = np_knn(xq, xb, K, "l2")
    got = {}
    for r in res.collect():
        got.setdefault(r["qid"], set()).add(r["id"])
    recalls = [
        len(got[qi] & set(ids_true[qi].tolist())) / K for qi in range(xq.shape[0])
    ]
    assert np.mean(recalls) > 0.5


def test_pq_then_exact_rerank(base_df, query_df, tiny_vectors, pq):
    """O9: PQ candidates (k·k_factor) + exact re-rank ≈ exact top-k."""
    xb, xq = tiny_vectors
    coded = pq.encode(base_df).select("id", "code")
    cand = pq_knn(query_df, coded, pq, K * 5).select("qid", "id")
    res = knn_by_ids(query_df, base_df, cand, K)
    ids_true, _ = np_knn(xq, xb, K, "l2")
    got = {}
    for r in res.collect():
        got.setdefault(r["qid"], set()).add(r["id"])
    recalls = [
        len(got[qi] & set(ids_true[qi].tolist())) / K for qi in range(xq.shape[0])
    ]
    assert np.mean(recalls) > 0.85


import numpy as np
import pytest


@pytest.mark.parametrize("qtype,tol", [("8bit", 0.006), ("6bit", 0.02), ("4bit", 0.08), ("fp16", 0.002)])
def test_sq_roundtrip_all_widths(spark, base_df, tiny_vectors, qtype, tol):
    """QT_4bit/6bit/8bit/fp16 codec round-trips within each width's
    quantization step (IndexScalarQuantizer.h:34-88)."""
    from auncel_spark.index.sq import ScalarQuantizer

    xb, _ = tiny_vectors
    sq = ScalarQuantizer.train(base_df, qtype=qtype)
    coded = sq.encode(base_df)
    dec = sq.decode(coded)
    got = {r["id"]: np.asarray(r["vec_dec"]) for r in dec.collect()}
    err = np.abs(np.stack([got[i] for i in range(len(xb))]) - xb)
    assert err.max() < tol
    # byte budget: 4bit = d/2, 6bit = 3d/4, 8bit = d, fp16 = 2d
    want_bytes = {"8bit": 16, "6bit": 12, "4bit": 8, "fp16": 32}[qtype]
    one = coded.select("code").first()[0]
    assert len(one) == want_bytes


def test_sq_numpy_pack_unpack_identity():
    from auncel_spark.index.sq import ScalarQuantizer

    rng = np.random.default_rng(0)
    for qtype, levels in [("4bit", 15), ("6bit", 63), ("8bit", 255)]:
        for d in (7, 8, 9, 16):
            sq = ScalarQuantizer(np.zeros(d), np.ones(d), qtype)
            c = rng.integers(0, levels + 1, (20, d)).astype(np.uint8)
            assert (sq._unpack(sq._pack(c)) == c).all()


def test_sq_quantile_rangestat_ignores_outliers(spark):
    from auncel_spark.index.sq import ScalarQuantizer

    rng = np.random.default_rng(1)
    mat = rng.uniform(0, 1, (500, 4)).astype(np.float32)
    mat[0] = 1000.0  # one wild outlier per dim
    df = spark.createDataFrame(
        [(i, [float(v) for v in mat[i]]) for i in range(500)],
        "id bigint, vec array<float>",
    )
    mm = ScalarQuantizer.train(df, rangestat="minmax")
    qs = ScalarQuantizer.train(df, rangestat="quantiles", rs_arg=0.01)
    assert (qs.vdiff < mm.vdiff / 100).all()  # range not stretched by the outlier


def test_factory_sq_variants_end_to_end(base_df, query_df):
    from auncel_spark.index.factory import build_index

    for spec in ("SQ4", "SQfp16", "IVF8,SQ4"):
        si = build_index(base_df, spec)
        res = si.search(query_df, 5, nprobe=8)
        assert res.count() == query_df.count() * 5


def test_sq_optim_rangestat_beats_quantiles(spark, base_df, tiny_vectors):
    """RS_optim (alternating reconstruction-error fit,
    Auncel/IndexScalarQuantizer.cpp:641-693): round-trip works and the
    mean squared reconstruction error on the training data is <= the
    quantiles variant's (it directly minimizes that objective)."""
    xb, _ = tiny_vectors
    x64 = xb.astype(np.float64)
    opt = ScalarQuantizer.train(base_df, rangestat="optim", qtype="4bit")
    qs = ScalarQuantizer.train(
        base_df, rangestat="quantiles", rs_arg=0.05, qtype="4bit"
    )
    assert opt.d == xb.shape[1] and np.all(opt.vdiff > 0)
    err_opt = ((opt.decode_np(opt.encode_np(x64)) - x64) ** 2).mean()
    err_qs = ((qs.decode_np(qs.encode_np(x64)) - x64) ** 2).mean()
    assert err_opt <= err_qs * 1.05  # direct MSE objective should win
    # codec round-trip stays within one step of the trained range
    dec = opt.decode_np(opt.encode_np(x64))
    step = opt.vdiff / opt.levels
    inside = (x64 >= opt.vmin) & (x64 <= opt.vmin + opt.vdiff)
    err = np.abs(dec - x64)
    assert np.all(err[inside] <= np.broadcast_to(step, err.shape)[inside] * 1.01)


def test_ivfpq_build_from_preassigned_lists(base_df, query_df, tiny_vectors):
    """build(assigned=flat.data) must produce the same index as a
    normal build with the same centroids — the 're-encode an existing
    IVF index's lists' path that skips the full-corpus assignment
    GEMM (the dominant build flop at 100M)."""
    import numpy as np

    from auncel_spark.index.ivf import IVFIndex
    from auncel_spark.index.ivfpq import IVFPQIndex

    xb, _ = tiny_vectors
    nlist = 8
    cents = xb[:nlist].astype(np.float64)
    flat = IVFIndex.build(base_df, nlist=nlist, centroids=cents)
    a = IVFPQIndex.build(base_df, nlist=nlist, M=4, centroids=cents, seed=3)
    # share a.pq so the parity check isolates the assignment path
    # (sampled PQ training is order-sensitive across lineages)
    b = IVFPQIndex.build(
        base_df, nlist=nlist, M=4, centroids=cents, seed=3,
        pq=a.pq, assigned=flat.data,
    )
    rows_a = {
        (r["id"], r["list_no"]): bytes(r["code"]) for r in a.data.collect()
    }
    rows_b = {
        (r["id"], r["list_no"]): bytes(r["code"]) for r in b.data.collect()
    }
    assert rows_a == rows_b
    ra = a.search(query_df, 5, nlist).collect()
    rb = b.search(query_df, 5, nlist).collect()
    assert {(r["qid"], r["pos"], r["id"]) for r in ra} == {
        (r["qid"], r["pos"], r["id"]) for r in rb
    }
