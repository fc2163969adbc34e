"""Property-based tests (hypothesis) for the relational core invariants
the engine relies on everywhere: top-k merge associativity, recall
bounds, trace monotonicity. The reference has no fuzzing (SURVEY §5.1
item 5) — this goes beyond its test strategy on the pieces where a
silent tie-handling bug would corrupt every operator built on top."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from auncel_spark.profile.traces import Trace, kscaling


@st.composite
def dist_tables(draw):
    n = draw(st.integers(5, 40))
    # distances with deliberate ties
    dists = draw(
        st.lists(st.integers(0, 8), min_size=n, max_size=n)
    )
    return np.array(dists, dtype=np.float64)


@given(dist_tables(), st.integers(1, 10), st.integers(1, 5))
@settings(max_examples=50, deadline=None)
def test_partial_topk_merge_associative(dists, k, n_shards):
    """Merging per-shard (dist, id)-ordered top-k partials yields the
    global top-k — the invariant behind merge_topk / partial scans."""
    ids = np.arange(len(dists))
    order = np.lexsort((ids, dists))
    global_topk = [(dists[i], ids[i]) for i in order[:k]]
    # shard by id modulo, take per-shard top-k, merge, re-take top-k
    merged = []
    for s in range(n_shards):
        mask = ids % n_shards == s
        sids, sd = ids[mask], dists[mask]
        if len(sids) == 0:
            continue
        so = np.lexsort((sids, sd))[:k]
        merged.extend((sd[i], sids[i]) for i in so)
    merged.sort()
    assert merged[:k] == global_topk


@given(
    st.lists(st.floats(0.0, 100.0), min_size=10, max_size=400),
    st.integers(10, 300),
)
@settings(max_examples=30, deadline=None)
def test_trace_sb_phi_ascending_and_lookup_bounds(phis, bs):
    phis = np.array(phis)
    us = np.abs(np.sin(phis)) + 1.0
    t = Trace.from_pairs(2, phis, us, bs=bs)
    assert np.all(np.diff(t.phi) >= -1e-12)
    # interior lookups fall within [min(u), max(u)] + margin 0
    if len(t.phi) > 0:
        probe = np.linspace(t.phi[0], t.phi[-1], 7)
        vals = t.search(probe, 0.0)
        assert vals.min() >= t.u.min() - 1e-9
        assert vals.max() <= t.u.max() + 1e-9


@given(st.integers(1, 50), st.integers(1, 50))
@settings(max_examples=30, deadline=None)
def test_kscaling_exact_match_is_identity(n_gt, r):
    """A candidate list identical to ground truth gives U = 1 at every
    collected rank."""
    gt = np.sort(np.random.default_rng(0).uniform(1, 100, n_gt))
    pts = kscaling(gt, gt, max_collect=min(r, n_gt))
    assert all(abs(u - 1.0) < 1e-9 for _, u in pts)
    assert [p[0] for p in pts] == list(range(len(pts)))


@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=60, unique=True),
    st.lists(st.integers(0, 1000), min_size=1, max_size=60, unique=True),
)
@settings(max_examples=50, deadline=None)
def test_recall_set_bounds(result_ids, gt_ids):
    """Intersection recall is |∩| / k and bounded by both set sizes."""
    k = len(gt_ids)
    inter = len(set(result_ids) & set(gt_ids))
    rec = inter / k
    assert 0.0 <= rec <= 1.0
    assert inter <= min(len(result_ids), len(gt_ids))


@given(
    st.integers(min_value=0, max_value=10**12),
    st.integers(min_value=0, max_value=1_000_000),
    st.integers(min_value=0, max_value=1_000_000),
)
@settings(max_examples=200, deadline=None)
def test_sampling_bucket_bounds_and_nesting(doc_id, ppm_a, ppm_b):
    """LCG bucket stays in [0, 2^32); verdicts nest with rate; no
    BIGINT overflow for any non-negative id (sampling.py contract)."""
    from auncel_spark.operators.sampling import LCG_A, LCG_C, MOD, threshold_for_ppm

    bucket = ((doc_id % MOD) * LCG_A + LCG_C) % MOD
    assert 0 <= bucket < MOD
    assert (doc_id % MOD) * LCG_A + LCG_C < 2**63  # engine-safe
    lo, hi = sorted((ppm_a, ppm_b))
    ta, tb = threshold_for_ppm(lo), threshold_for_ppm(hi)
    assert ta <= tb  # monotone => samples nest
    if bucket < ta:
        assert bucket < tb
    assert threshold_for_ppm(0) == 0 and threshold_for_ppm(1_000_000) == MOD


@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)), max_size=60))
@settings(max_examples=100, deadline=None)
def test_union_find_reference_partitions(edges):
    """The pure-python union-find used as the CC test oracle is itself
    a partition: labels are idempotent and minimal per component."""
    from tests.test_components_sampling import _py_components

    lab = _py_components(edges)
    for u, v in edges:
        if u in lab and v in lab:
            assert lab[u] == lab[v]
    for node, root in lab.items():
        assert lab.get(root, root) == root
        assert root <= node
