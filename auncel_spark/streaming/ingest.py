"""Structured Streaming surface: micro-batch ingest + windowed stats.

The reference is batch-only (SURVEY §2.5: "No streaming operators
exist in the reference"); its only streaming-ish construct is
``SlidingIndexWindow`` (O21) — batch partition rotation, covered in
``index/maintenance.py``. This module is the north-star extension
(SURVEY §7.1 M7): continuous ingestion into IVF partitions and
watermarked windowed aggregation over an event stream.

- ``stream_assign_vectors``: readStream over a vector directory →
  broadcast-centroid assignment (the same Arrow kernel as batch B4) →
  writeStream append, ``partitionBy("list_no")`` — i.e. invlist append
  (B5) as a micro-batch sink. Exactly-once via checkpointing.
- ``stream_windowed_event_stats``: watermark + tumbling window counts
  over the ``events`` table schema; the batch DataFrame expression of
  the same query is the oracle (Structured Streaming guarantees the
  same results as the batch plan over the same input — that property
  is what the test asserts).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auncel_spark.config import Metric
from auncel_spark.index.kmeans import assign_lists


def stream_assign_vectors(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    centroids: np.ndarray,
    out_dir: str,
    checkpoint_dir: str,
    metric: Metric = Metric.L2,
):
    """Continuous IVF ingest. Returns the StreamingQuery; callers use
    ``trigger(availableNow=True)`` semantics via ``.awaitTermination()``
    for drain-and-stop runs (tests) or leave it running in production."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    assigned = assign_lists(stream, centroids, metric).select("id", "vec", "list_no")
    return (
        assigned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("list_no")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def normalize_event_ts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """The fixtures store ts as TIMESTAMP(NANOS), which Spark reads as
    an epoch-nano long (see session.py nanosAsLong); convert to a real
    timestamp. A true timestamp column passes through unchanged."""
    from pyspark.sql import types as T

    field = events.schema[ts_col]
    if isinstance(field.dataType, T.LongType):
        return events.withColumn(
            ts_col, F.timestamp_seconds(F.col(ts_col) / F.lit(1e9))
        )
    if isinstance(field.dataType, T.TimestampNTZType):
        # Parquet TIMESTAMP(isAdjustedToUTC=false) reads as TIMESTAMP_NTZ,
        # which withWatermark rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE);
        # session timezone is UTC so the cast is value-preserving.
        return events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def windowed_event_stats_expr(events: DataFrame) -> DataFrame:
    """The shared (batch == streaming) plan: tumbling 1-hour windows
    per event_type with count and value stats."""
    return (
        normalize_event_ts(events).groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_event_stats(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
):
    """Watermarked streaming version of ``windowed_event_stats_expr``;
    append mode emits a window once the watermark passes it (late rows
    beyond the watermark are dropped — standard late-data policy)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_stats_expr(
        normalize_event_ts(stream).withWatermark("ts", watermark)
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
