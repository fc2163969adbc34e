"""Streaming exact dedup: continuous-ingest twin of
``operators/dedup.exact_dedup``.

``dropDuplicates`` on the content digest over a stream is Spark's
built-in stateful dedup: the state store keeps one entry per distinct
digest, so a document admitted in micro-batch 1 suppresses its
re-arrival in micro-batch 40 — exactly the incremental-ingest shape
the Bloom operator (``operators/bloom.py``) approximates when state
must stay o(corpus). This is the exact-state variant: no false
positives, state = one row per distinct doc.

Unbounded state is the documented cost of exactness; when an event-
time column exists, ``within_watermark`` bounds it (duplicates are
only suppressed within the watermark delay — the standard trade)."""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F


def stream_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    within_watermark: tuple[str, str] | None = None,
):
    """Emit each distinct document exactly once across all micro-
    batches (first arrival wins). ``within_watermark=(ts_col, delay)``
    switches to watermark-bounded state."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    hashed = stream.withColumn("_h", F.md5(F.col(text_col)))
    if within_watermark is not None:
        ts_col, delay = within_watermark
        deduped = hashed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["_h"]
        )
    else:
        deduped = hashed.dropDuplicates(["_h"])
    return (
        deduped.drop("_h")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
