"""Stateful streaming sessionization: the Structured Streaming twin of
the batch ``operators/temporal.sessionize`` / ``session_stats`` pair.

The reference has no streaming surface (SURVEY §2.5); this extends the
engine's event-curation family to continuous ingestion, two ways —
deliberately both, because they occupy different points in the design
space:

- ``stream_session_stats``: the idiomatic Spark path. Native
  ``F.session_window`` + watermark gives merged gap-sessions with
  state managed entirely JVM-side (RocksDB-able state store, late-data
  policy for free). Emits per-session aggregates once the watermark
  closes the session. This is the plan you'd run at 100 TB/day: no
  Python in the loop, state keyed by (user, session-window), shuffle
  only on user_id.
- ``stream_sessionize_events``: per-EVENT session-id assignment, which
  ``session_window`` cannot express (it aggregates; it does not tag
  rows). Implemented with ``applyInPandasWithState``: state per user =
  (last event ts, current 0-based session index); each micro-batch
  sorts its rows per key, extends or opens sessions vectorized in
  numpy, and emits every event tagged. Exactly the batch operator's
  running-sum-of-boundaries recurrence, carried across micro-batches
  by the state store. Requires in-order arrival per key across
  micro-batches (the usual caveat for row-tagging without a
  watermark-delay buffer; the aggregate path above is the one with a
  principled late-data story).

Session-boundary rule: new session when ``ts - prev_ts > gap`` —
identical to the batch operator. (Native ``session_window`` uses
``>= gap`` — half-open windows — so equivalence tests pick gaps that
cannot tie on the fixture's micro timestamps.)
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SENTINEL = -(1 << 62)


def _session_assign_fn(gap: int, key_col: str, ts_col: str):
    """Vectorized per-key micro-batch session assigner (state: last_ts,
    cur_session)."""

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, cur = state.get
        else:
            last_ts, cur = _SENTINEL, -1
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        rows = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        ts = np.sort(rows[ts_col].to_numpy(np.int64, copy=True))
        prev = np.concatenate(([last_ts], ts[:-1]))
        sid = cur + np.cumsum((ts - prev) > gap)
        state.update((int(ts[-1]), int(sid[-1])))
        yield pd.DataFrame({key_col: key[0], ts_col: ts, "session_id": sid})

    return fn


def stream_sessionize_events(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    gap: int,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
):
    """Continuous per-event session-id tagging. Returns the started
    StreamingQuery (availableNow drain-and-stop; re-run on a shared
    checkpoint to carry session state across ingests)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(source_dir)
    tagged = stream.groupBy(key_col).applyInPandasWithState(
        _session_assign_fn(int(gap), key_col, ts_col),
        outputStructType=f"{key_col} bigint, {ts_col} bigint, session_id bigint",
        stateStructType="last_ts bigint, cur_session bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        tagged.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def session_stats_window_expr(
    events: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """The shared (batch == streaming) native-session_window plan:
    per-(key, merged gap session) aggregates. ``ts_col`` is integer
    epoch micros (the engine's portable event-time convention)."""
    ev = events.withColumn("_ts", F.timestamp_micros(F.col(ts_col)))
    return (
        ev.groupBy(
            F.session_window("_ts", f"{gap_seconds} seconds").alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
        )
        .select(key_col, "start_ts", "end_ts", "n_events")
    )


def stream_session_stats(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    gap_seconds: int,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    watermark: str = "2 hours",
):
    """Watermarked streaming session aggregates via native
    ``session_window``; append mode emits a session once the watermark
    passes its close."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    ev = stream.withColumn("_ts", F.timestamp_micros(F.col(ts_col))).withWatermark(
        "_ts", watermark
    )
    agg = (
        ev.groupBy(
            F.session_window("_ts", f"{gap_seconds} seconds").alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
        )
        .select(key_col, "start_ts", "end_ts", "n_events")
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
