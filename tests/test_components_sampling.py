"""Connected components (large-star/small-star) and deterministic
sampling operators."""

from __future__ import annotations

import numpy as np
import pytest

from auncel_spark.operators.components import connected_components, dedup_clusters
from auncel_spark.operators.sampling import (
    LCG_A,
    LCG_C,
    MOD,
    domain_mix,
    hash_sample,
    stratified_sample,
    threshold_for_ppm,
)

SF_DIR = "/root/testdata/sf0.01"


def _py_components(edges):
    """Reference union-find."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def test_cc_path_graph(spark):
    # a long path is the worst case for naive propagation; star/star
    # must still converge (O(log n) rounds)
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)] + [(100, 101), (101, 102)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["cluster_id"] for r in connected_components(df).collect()}
    want = _py_components(edges)
    assert got == want
    assert set(got.values()) == {0, 100}


def test_cc_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 200, (300, 2)) if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == _py_components(edges)


def test_dedup_clusters_sizes(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    rows = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in dedup_clusters(df).collect()}
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)}


def test_hash_sample_deterministic_and_consistent(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(r["doc_id"] for r in hash_sample(docs, 300_000).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in hash_sample(docs, 300_000).select("doc_id").collect())
    assert a == b
    # python replay of the LCG agrees row-for-row
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    thr = threshold_for_ppm(300_000)
    want = sorted(i for i in ids if ((i % MOD) * LCG_A + LCG_C) % MOD < thr)
    assert a == want
    # rate is in the right ballpark (LCG is uniform enough at n=500)
    assert 0.2 < len(a) / len(ids) < 0.4


def test_hash_sample_is_nested(spark):
    # a 10% sample is a strict subset of a 30% sample — the property
    # that makes hash sampling safe for incremental corpus re-runs
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    small = {r["doc_id"] for r in hash_sample(docs, 100_000).select("doc_id").collect()}
    big = {r["doc_id"] for r in hash_sample(docs, 300_000).select("doc_id").collect()}
    assert small <= big


def test_stratified_rates(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = stratified_sample(docs, {"en": 1_000_000, "zh": 0, "fr": 500_000})
    by = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    tot = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert by["en"] == tot["en"]  # ppm=1e6 keeps everything
    assert "zh" not in by  # ppm=0 drops everything
    assert "de" not in by  # unlisted stratum -> default_ppm=0
    assert 0.25 < by["fr"] / tot["fr"] < 0.75


def test_domain_mix_proportions(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = domain_mix(docs, {"en": 50, "es": 25, "de": 25}, total_out=120)
    by = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert set(by) == {"en", "es", "de"}
    n = sum(by.values())
    # hash variance at these stratum sizes: generous but meaningful bands
    assert abs(n - 120) < 40
    assert abs(by["en"] / n - 0.5) < 0.2


def test_domain_mix_undersized_stratum_gives_all(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # zh has 75 docs at sf0.01; demanding 90% of 1000 from it caps at 1.0
    out = domain_mix(docs, {"zh": 90, "en": 10}, total_out=1000)
    by = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    tot = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert by["zh"] == tot["zh"]


def test_sampling_plan_has_no_shuffle(spark):
    # stratified_sample must be a pure filter over the scan
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = stratified_sample(docs, {"en": 500_000})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
