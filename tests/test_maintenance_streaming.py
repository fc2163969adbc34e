from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from auncel_spark.config import Metric
from auncel_spark.index.ivf import IVFIndex
from auncel_spark.index.maintenance import (
    SlidingIndexWindow,
    copy_subset_to,
    merge_from,
    remap_ids,
    reconstruct,
)
from auncel_spark.profile.autotune import (
    explore,
    min_nprobe_for_bound,
    pareto_front,
)
from tests.conftest import np_knn

NLIST = 16
K = 10


@pytest.fixture(scope="module")
def idx_pair(base_df, tiny_vectors):
    xb, _ = tiny_vectors
    cents = xb[:NLIST].astype(np.float64)
    a = IVFIndex.build(base_df.filter("id < 200"), nlist=NLIST, centroids=cents)
    b = IVFIndex.build(base_df.filter("id >= 200"), nlist=NLIST, centroids=cents)
    return a, b


def test_merge_from_equals_full(idx_pair, base_df, query_df, tiny_vectors):
    xb, xq = tiny_vectors
    merged = merge_from(*idx_pair)
    res = merged.search(query_df, K, nprobe=NLIST)
    ids, _ = np_knn(xq, xb, K, "l2")
    got = {(r["qid"], r["pos"]): r["id"] for r in res.collect()}
    for qi in range(xq.shape[0]):
        for p in range(K):
            assert got[(qi, p)] == ids[qi, p]


def test_merge_incompatible_raises(idx_pair, base_df, tiny_vectors):
    xb, _ = tiny_vectors
    other = IVFIndex.build(
        base_df, nlist=8, centroids=xb[:8].astype(np.float64)
    )
    with pytest.raises(ValueError):
        merge_from(idx_pair[0], other)


def test_copy_subset(idx_pair):
    a, _ = idx_pair
    sub = copy_subset_to(a, id_min=50, id_max=100)
    assert sub.data.count() == 50
    modsub = copy_subset_to(a, mod=(4, 1))
    assert modsub.data.filter("id % 4 != 1").count() == 0


def test_remap_and_reconstruct(idx_pair, spark):
    a, _ = idx_pair
    m = spark.createDataFrame(
        [(i, i + 1000) for i in range(200)], "internal_id bigint, external_id bigint"
    )
    fake_res = spark.createDataFrame([(0, 0, 5), (0, 1, 7)], "qid bigint, pos int, id bigint")
    out = {r["pos"]: r["id"] for r in remap_ids(fake_res, m).collect()}
    assert out == {0: 1005, 1: 1007}
    ids = spark.createDataFrame([(3,), (7,)], "id bigint")
    rec = reconstruct(a, ids)
    assert {r["id"] for r in rec.collect()} == {3, 7}
    assert "vec" in rec.columns


def test_sliding_window(idx_pair, base_df, query_df):
    a, _ = idx_pair
    win = SlidingIndexWindow(a, window=2)
    i1 = win.step(base_df.filter("id < 100").select("id", "vec"))
    assert i1.data.count() == 100
    i2 = win.step(base_df.filter("id >= 100 and id < 200").select("id", "vec"))
    assert i2.data.count() == 200
    i3 = win.step(base_df.filter("id >= 200 and id < 300").select("id", "vec"))
    assert i3.data.count() == 200  # oldest batch evicted
    assert i3.data.filter("id < 100").count() == 0


def test_autotune_sweep_and_pareto(base_df, query_df, tiny_vectors, spark):
    xb, xq = tiny_vectors
    idx = IVFIndex.build(base_df, nlist=NLIST, kmeans_iter=8, seed=5)
    ids, dists = np_knn(xq, xb, K, "l2")
    gt = spark.createDataFrame(
        [
            (int(qi), int(p), int(ids[qi, p]), float(dists[qi, p]))
            for qi in range(xq.shape[0])
            for p in range(K)
        ],
        "qid bigint, pos int, gt_id bigint, gt_dist double",
    )
    pts = explore(idx, query_df, gt, K, nprobes=[1, 4], worst_case=True)
    assert any(p.nprobe == NLIST for p in pts)  # forced max-nprobe point
    by_np = {p.nprobe: p.perf for p in pts}
    assert by_np[NLIST] == 1.0  # full probe is exact
    assert by_np[1] <= by_np[4] <= by_np[NLIST] + 1e-9
    front = pareto_front(pts)
    assert front and all(
        front[i].perf < front[i + 1].perf for i in range(len(front) - 1)
    )
    assert min_nprobe_for_bound(pts, bound=0.0) == NLIST or by_np[4] == 1.0


def test_streaming_matches_batch(spark, tmp_path):
    """Structured Streaming windowed agg over the events fixture equals
    the batch expression. Two availableNow runs against one checkpoint:
    run 1 ingests the fixture; run 2 ingests a single far-future sentinel
    row that advances the watermark past every fixture window, so append
    mode flushes them all. The flushed rows must equal the batch plan."""
    from auncel_spark.streaming.ingest import (
        stream_windowed_event_stats,
        windowed_event_stats_expr,
    )

    src = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{src}/events.parquet")
    # stage the fixture into a stream-source dir
    sdir = str(tmp_path / "stream_src")
    events.write.parquet(sdir)
    out = str(tmp_path / "stream_out")
    ck = str(tmp_path / "ck")
    q = stream_windowed_event_stats(spark, sdir, events.schema, out, ck, watermark="1 hour")
    q.awaitTermination(120)
    # second micro-batch: one sentinel event a year past the fixture
    # flushes every fixture window (same raw schema as the source)
    from pyspark.sql import types as T

    shift_expr = (
        (F.col("ts") + F.lit(int(365 * 24 * 3600 * 1e9)))
        if isinstance(events.schema["ts"].dataType, T.LongType)
        else (F.col("ts") + F.expr("INTERVAL 365 DAYS")).cast(
            events.schema["ts"].dataType
        )
    )
    events.orderBy(F.desc("ts")).limit(1).withColumn("ts", shift_expr).write.mode(
        "append"
    ).parquet(sdir)
    q2 = stream_windowed_event_stats(spark, sdir, events.schema, out, ck, watermark="1 hour")
    q2.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"], r["n_events"], round(r["sum_value"], 6))
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["window_start"], r["event_type"], r["n_events"], round(r["sum_value"], 6))
        for r in windowed_event_stats_expr(events).collect()
    }
    assert got == want
    assert len(want) > 0


def test_streaming_ivf_ingest(spark, tmp_path, base_df, tiny_vectors):
    from auncel_spark.streaming.ingest import stream_assign_vectors

    xb, _ = tiny_vectors
    sdir = str(tmp_path / "vec_src")
    base_df.write.parquet(sdir)
    out = str(tmp_path / "ivf_out")
    ck = str(tmp_path / "ivf_ck")
    q = stream_assign_vectors(
        spark, sdir, base_df.schema, xb[:8].astype(np.float64), out, ck
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == xb.shape[0]
    assert set(got.columns) >= {"id", "vec", "list_no"}
    # partitioned layout on disk
    import os

    assert any(p.startswith("list_no=") for p in os.listdir(out))


def test_continuous_topk_matches_batch(spark, tmp_path, base_df, query_df, tiny_vectors):
    """Stateful streaming top-k over two micro-batches equals batch kNN
    over the union — exactly-once state merge."""
    import numpy as np
    from auncel_spark.streaming.stateful_topk import continuous_topk
    from tests.conftest import np_knn

    xb, xq = tiny_vectors
    k = 5
    src = str(tmp_path / "stk_src")
    # two files → two input splits; availableNow drains both
    base_df.filter("id < 200").write.parquet(src)
    base_df.filter("id >= 200").write.mode("append").parquet(src)
    out = str(tmp_path / "stk_out")
    ck = str(tmp_path / "stk_ck")
    q = continuous_topk(spark, src, base_df.schema, query_df, k, out, ck)
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    # take the final (best) state per qid: min dist-sum snapshot == last
    # emitted; since both batches drained in one availableNow run, the
    # final rows per qid reflect the full corpus
    import pandas as pd

    pdf = got.toPandas()
    ids_true, _ = np_knn(xq, xb, k, "l2")
    for qi in range(xq.shape[0]):
        rows = pdf[pdf.qid == qi]
        best = rows.sort_values("dist").drop_duplicates("pos", keep="first")
        top = best.sort_values("pos")["id"].tolist()[:k]
        assert top == ids_true[qi].tolist()
