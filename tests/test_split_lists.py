"""Refined (split-list) quantizer: nlist → nlist·split with codes
byte-identical to the parent index (index/ivfpq.split_ivfpq_lists).

Reference comparator: lists scale with the corpus in the reference's
distributed mode — IVF1024 per 10M-row shard (Auncel/dist/worker.cpp:83);
the split realizes the same posting-list density on one index without
re-encoding or re-assigning against the full quantizer.
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def split_pair(spark, base_df, tiny_vectors, tmp_path_factory):
    from auncel_spark.index.ivf import IVFIndex
    from auncel_spark.index.ivfpq import IVFPQIndex, split_ivfpq_lists

    xb, _ = tiny_vectors
    nlist = 8
    cents = xb[:nlist].astype(np.float64)
    flat = IVFIndex.build(base_df, nlist=nlist, centroids=cents)
    parent = IVFPQIndex.build(
        base_df, nlist=nlist, M=4, centroids=cents, seed=3, assigned=flat.data
    )
    path = str(tmp_path_factory.mktemp("split") / "ivfpq_s2")
    refined = split_ivfpq_lists(flat, parent, split=2, path=path, seed=11)
    return flat, parent, refined


def test_split_metadata_and_codes_identical(split_pair):
    flat, parent, refined = split_pair
    assert refined.nlist == parent.nlist * 2
    assert refined.enc_of is not None and len(refined.enc_of) == refined.nlist
    assert np.array_equal(refined.enc_of, np.repeat(np.arange(parent.nlist), 2))
    assert np.array_equal(refined.enc_centroids, parent.centroids)
    # codes are byte-identical — the split re-keys, never re-encodes
    par = {r["id"]: bytes(r["code"]) for r in parent.data.collect()}
    ref = {
        r["id"]: (bytes(r["code"]), r["list_no"]) for r in refined.data.collect()
    }
    assert set(par) == set(ref)
    for i, (code, rlist) in ref.items():
        assert par[i] == code
        # refined list sits under the row's original parent cell
        assert refined.enc_of[rlist] == [
            r["list_no"] for r in parent.data.filter(f"id = {i}").collect()
        ][0]


def test_split_full_probe_parity(split_pair, query_df):
    """Probing every child must replay the parent's exhaustive ADC scan
    exactly: same codes, same encoding centroids ⇒ identical distances
    and identical (dist, id) order."""
    _flat, parent, refined = split_pair
    k = 5
    ra = parent.search(query_df, k, nprobe=parent.nlist).collect()
    rb = refined.search(query_df, k, nprobe=refined.nlist).collect()
    key = lambda r: (r["qid"], r["pos"], r["id"], round(r["dist"], 9))
    assert sorted(map(key, ra)) == sorted(map(key, rb))


def test_split_partial_probe_distances_match_parent(split_pair, query_df):
    """At partial nprobe the refined index returns a SUBSET of the
    parent's candidate space with bit-identical ADC distances (the
    enc_of mapping routes term1/term2/LUTs to the parent cell)."""
    _flat, parent, refined = split_pair
    k = 5
    full = {
        (r["qid"], r["id"]): r["dist"]
        for r in parent.search(query_df, 50, nprobe=parent.nlist).collect()
    }
    part = refined.search(query_df, k, nprobe=4).collect()
    assert len(part) > 0
    for r in part:
        assert abs(full[(r["qid"], r["id"])] - r["dist"]) < 1e-9


def test_split_save_load_roundtrip(split_pair, query_df, spark):
    from auncel_spark.index.ivfpq import IVFPQIndex

    _flat, _parent, refined = split_pair
    again = IVFPQIndex.load(spark, refined.data_path)
    assert np.array_equal(again.enc_of, refined.enc_of)
    ra = refined.search(query_df, 5, nprobe=6).collect()
    rb = again.search(query_df, 5, nprobe=6).collect()
    key = lambda r: (r["qid"], r["pos"], r["id"])
    assert sorted(map(key, ra)) == sorted(map(key, rb))


def test_split_guards(split_pair, base_df, tiny_vectors, tmp_path):
    from auncel_spark.index.ivf import IVFIndex
    from auncel_spark.index.ivfpq import IVFPQIndex, split_ivfpq_lists

    flat, parent, refined = split_pair
    with pytest.raises(ValueError, match="already split"):
        split_ivfpq_lists(flat, refined, 2, str(tmp_path / "again"))
    xb, _ = tiny_vectors
    other = IVFIndex.build(
        base_df, nlist=8, centroids=xb[8:16].astype(np.float64)
    )
    with pytest.raises(ValueError, match="quantizers differ"):
        split_ivfpq_lists(other, parent, 2, str(tmp_path / "mismatch"))


def test_split_refine_search(split_pair, query_df, base_df, tiny_vectors):
    """search_refine over the refined index: exact re-rank on top of the
    finer-probed candidates returns true distances."""
    _flat, _parent, refined = split_pair
    xb, xq = tiny_vectors
    res = refined.search_refine(query_df, base_df, 5, nprobe=8, k_factor=4)
    rows = res.collect()
    assert len(rows) == 5 * xq.shape[0]
    for r in rows[:20]:
        d = ((xq[r["qid"]].astype(np.float64) - xb[r["id"]].astype(np.float64)) ** 2).sum()
        assert abs(d - r["dist"]) < 1e-6
