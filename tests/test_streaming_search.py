"""Streaming query search (streaming/search.py): per-micro-batch
results over a query stream must equal the batch search over the same
queries (Structured Streaming's batch-equivalence guarantee applied to
the serving loop)."""

from __future__ import annotations

import numpy as np
import pytest

from auncel_spark.index.ivf import IVFIndex
from auncel_spark.streaming.search import stream_ivf_search, stream_search

K, NPROBE, NLIST = 5, 3, 8


@pytest.fixture(scope="module")
def ivf(base_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf_stream") / "idx")
    return IVFIndex.build(base_df, nlist=NLIST, kmeans_iter=5, path=path)


def test_stream_ivf_matches_batch(spark, tmp_path, ivf, query_df):
    sdir, out, ck = (str(tmp_path / p) for p in ("src", "out", "ck"))
    query_df.write.parquet(sdir)
    q = stream_ivf_search(spark, sdir, query_df.schema, ivf, K, NPROBE, out, ck)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    want = ivf.search(query_df, K, NPROBE)
    gw = [(r["qid"], r["pos"], r["id"]) for r in got.orderBy("qid", "pos").collect()]
    ww = [(r["qid"], r["pos"], r["id"]) for r in want.orderBy("qid", "pos").collect()]
    assert gw == ww
    assert "batch_id" in got.columns


def test_stream_bounded_search_matches_batch(spark, tmp_path, ivf, query_df):
    """The ELP bounded search (error-profile adaptive nprobe) runs
    unchanged as the per-micro-batch search_fn — the streaming serving
    loop the reference hand-rolls in eval/bound.cpp."""
    from auncel_spark.profile.error_profile import ErrorProfile

    ep = ErrorProfile(ivf, max_topk=10)
    ep.fit(query_df)
    fn = lambda q: ep.search(q, K, require_acc=0.9)
    sdir, out, ck = (str(tmp_path / p) for p in ("src", "out", "ck"))
    query_df.write.parquet(sdir)
    s = stream_search(spark, sdir, query_df.schema, fn, out, ck)
    s.awaitTermination(180)
    got = spark.read.parquet(out)
    want = fn(query_df)
    gw = [(r["qid"], r["pos"], r["id"]) for r in got.orderBy("qid", "pos").collect()]
    ww = [(r["qid"], r["pos"], r["id"]) for r in want.orderBy("qid", "pos").collect()]
    assert gw == ww


def test_stream_search_custom_fn_multi_batch(spark, tmp_path, ivf, query_df):
    """New query files arriving after the first drain are picked up by a
    restart from the same checkpoint (exactly-once: no duplicated
    results for already-processed batches)."""
    sdir, out, ck = (str(tmp_path / p) for p in ("src", "out", "ck"))
    q1 = query_df.filter("qid < 10")
    q2 = query_df.filter("qid >= 10")
    q1.write.parquet(sdir)
    fn = lambda qdf: ivf.search(qdf, K, NPROBE)
    s = stream_search(spark, sdir, query_df.schema, fn, out, ck)
    s.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    q2.write.mode("append").parquet(sdir)
    s = stream_search(spark, sdir, query_df.schema, fn, out, ck)
    s.awaitTermination(120)
    got = spark.read.parquet(out)
    want = ivf.search(query_df, K, NPROBE)
    assert got.count() == want.count() > n1
    assert (
        got.select("qid").distinct().count()
        == want.select("qid").distinct().count()
    )
