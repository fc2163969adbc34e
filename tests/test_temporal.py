"""Sessionization and as-of join."""

from __future__ import annotations

from pyspark.sql import functions as F

from auncel_spark.operators.temporal import asof_join, session_stats, sessionize


def test_sessionize_boundaries(spark):
    ev = spark.createDataFrame(
        [
            (1, 100, 0),
            (2, 100, 50),     # same session (gap 50 <= 100)
            (3, 100, 250),    # new session (gap 200 > 100)
            (4, 100, 300),
            (5, 200, 10),     # other user: own numbering
        ],
        "event_id bigint, user_id bigint, ts_us bigint",
    )
    out = {r["event_id"]: r["session_id"] for r in sessionize(ev, 100).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}
    st = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration"])
        for r in session_stats(sessionize(ev, 100)).collect()
    }
    assert st[(100, 0)] == (2, 50)
    assert st[(100, 1)] == (2, 50)
    assert st[(200, 0)] == (1, 0)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 7, 100), (2, 7, 200), (3, 7, 50), (4, 8, 500)],
        "event_id bigint, user_id bigint, ts_us bigint",
    )
    right = spark.createDataFrame(
        [(10, 7, 100), (11, 7, 150), (12, 9, 10)],
        "event_id bigint, user_id bigint, ts_us bigint",
    )
    out = {
        r["event_id"]: r["r_event_id"]
        for r in asof_join(left, right, "user_id", "ts_us", ["event_id"]).collect()
    }
    assert out[1] == 10     # equal ts matches (inclusive)
    assert out[2] == 11     # latest prior
    assert out[3] is None   # nothing before
    assert out[4] is None   # no right rows for user 8
    assert len(out) == 4


def test_asof_join_single_shuffle(spark):
    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).alias("user_id"),
        (F.col("id") * 10).alias("ts_us"),
    )
    right = spark.range(20).select(
        (F.col("id") + 1000).alias("event_id"),
        (F.col("id") % 5).alias("user_id"),
        (F.col("id") * 37).alias("ts_us"),
    )
    plan = (
        asof_join(left, right, "user_id", "ts_us", ["event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union-and-window: exactly one exchange (on the key), no join node
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
