"""Streaming sessionization == batch sessionization.

Two equivalence tests over the events fixture:

1. ``stream_sessionize_events`` (applyInPandasWithState, per-event
   session ids) across TWO time-split ingests on one checkpoint must
   equal the batch ``sessionize`` operator — i.e. the per-user
   (last_ts, cur_session) state genuinely carries the recurrence over
   the micro-batch boundary.
2. ``stream_session_stats`` (native session_window + watermark) with a
   sentinel flush must equal the shared batch session_window plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.001"
GAP_US = 12 * 3600 * 1_000_000  # 12h, matching the catalog entry


@pytest.fixture(scope="module")
def events_us(spark):
    from auncel_spark.catalog import _events_us

    return _events_us(spark, SRC).select("user_id", "ts_us").cache()


def test_stateful_sessionize_matches_batch(spark, tmp_path, events_us):
    from auncel_spark.operators.temporal import sessionize
    from auncel_spark.streaming.sessionize import stream_sessionize_events

    med = events_us.approxQuantile("ts_us", [0.5], 0.0)[0]
    early = events_us.where(F.col("ts_us") <= med)
    late = events_us.where(F.col("ts_us") > med)
    assert early.count() > 0 and late.count() > 0

    sdir = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    early.write.parquet(sdir)
    q = stream_sessionize_events(
        spark, sdir, "user_id bigint, ts_us bigint", GAP_US, out, ck
    )
    q.awaitTermination(120)
    late.write.mode("append").parquet(sdir)
    q2 = stream_sessionize_events(
        spark, sdir, "user_id bigint, ts_us bigint", GAP_US, out, ck
    )
    q2.awaitTermination(120)

    got = sorted(
        (r["user_id"], r["ts_us"], r["session_id"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["user_id"], r["ts_us"], r["session_id"])
        for r in sessionize(events_us, GAP_US).collect()
    )
    assert got == want
    assert len(want) == events_us.count()
    # multiple sessions actually exist (the gap rule fired)
    assert max(s for _, _, s in want) >= 1


def test_session_window_stream_matches_batch(spark, tmp_path, events_us):
    from auncel_spark.streaming.sessionize import (
        session_stats_window_expr,
        stream_session_stats,
    )

    gap_s = 12 * 3600
    sdir = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    events_us.write.parquet(sdir)
    q = stream_session_stats(
        spark, sdir, "user_id bigint, ts_us bigint", gap_s, out, ck, watermark="1 hour"
    )
    q.awaitTermination(120)
    # sentinel a year ahead advances the watermark past every fixture
    # session; its own (still-open) session stays in state, unemitted
    events_us.orderBy(F.desc("ts_us")).limit(1).withColumn(
        "ts_us", F.col("ts_us") + F.lit(int(365 * 24 * 3600 * 1e6))
    ).write.mode("append").parquet(sdir)
    q2 = stream_session_stats(
        spark, sdir, "user_id bigint, ts_us bigint", gap_s, out, ck, watermark="1 hour"
    )
    q2.awaitTermination(120)

    got = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["n_events"])
        for r in session_stats_window_expr(events_us, gap_s).collect()
    }
    assert got == want
    assert len(want) > 0
