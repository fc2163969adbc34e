"""Incremental streaming curation: the continuous-ingest composition
of the batch pipeline (``catalog.q_curation_pipeline``'s first
stages) — the actual shape of a 100 TB/day corpus refresh, where each
arriving shard must be judged against EVERYTHING already accepted
without re-scanning it.

``foreachBatch`` pipeline per micro-batch:

1. in-batch exact dedup (keep-first by id);
2. cross-batch dedup against a STANDING BLOOM STATE — the set-bit
   DataFrame sketch from ``operators/bloom.py``, persisted as parquet
   and appended (never rewritten) after each batch. o(corpus) state:
   at 1% FPR the sketch for 1B accepted docs is ~1.2 GB of bit
   positions, readable + broadcastable per batch, vs re-joining
   petabytes of accepted text;
3. repetition quality gate (``operators/repetition``);
4. append accepted rows to the output table and their bits to the
   state.

Determinism: the hash family is the portable md5 one, so acceptance
decisions are replayable; false positives (novel doc sharing all k
bits with history) drop a bounded, deterministic set of rows — size
the sketch with ``bloom_params``. Exactly-once: Spark retries a
failed micro-batch with the same batch_id, and both sinks are keyed
by that id — each batch writes ``batch_id={id}`` subdirectories with
mode("overwrite"), and a batch whose output AND state subdirs both
carry a ``_SUCCESS`` marker is skipped entirely on replay. A
mid-batch retry therefore overwrites its own partial files instead of
appending duplicates (the parquet-native analogue of Delta's txn
versioning)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from auncel_spark.operators.bloom import bloom_build, bloom_probe
from auncel_spark.operators.dedup import dedup_keep_first
from auncel_spark.operators.repetition import repetition_filter


def curate_batch(
    batch: DataFrame,
    bits: DataFrame | None,
    m: int,
    k: int,
    rep_n: int = 2,
    max_dup_frac: float = 0.30,
    max_top_frac: float = 0.20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One micro-batch's accepted rows (pure function — also the unit
    the equivalence test replays)."""
    b = dedup_keep_first(batch, text_col, id_col)
    if bits is not None:
        flags = bloom_probe(b, bits, text_col, id_col, m, k)
        b = b.join(
            flags.where(F.col("possibly_seen") == 0).select(F.col("id").alias(id_col)),
            id_col,
        )
    gate = repetition_filter(b, rep_n, max_dup_frac, max_top_frac, text_col, id_col)
    return b.join(
        gate.where(F.col("keep") == 1).select(F.col("id").alias(id_col)), id_col
    )


def stream_curate(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    m: int = 1 << 20,
    k: int = 3,
    rep_n: int = 2,
    max_dup_frac: float = 0.30,
    max_top_frac: float = 0.20,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Start the incremental curation stream (availableNow drain;
    re-run on the same checkpoint/state dirs to continue ingestion)."""

    def _fs_exists(s: SparkSession, path: str) -> bool:
        # Hadoop FileSystem probe — works for hdfs://, s3a://, file://
        # alike, unlike os.path.isdir which silently reports "absent"
        # for any non-local scheme (disabling cross-batch dedup).
        jvm = s._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(s._jsc.hadoopConfiguration())
        return bool(fs.exists(p))

    def _fn(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        out_b = f"{out_dir}/batch_id={batch_id}"
        state_b = f"{state_dir}/batch_id={batch_id}"
        if _fs_exists(s, f"{out_b}/_SUCCESS") and _fs_exists(s, f"{state_b}/_SUCCESS"):
            return  # batch fully committed on a previous attempt
        bits = None
        if _fs_exists(s, state_dir):
            try:
                # subdirs are batch_id=N partitions; exclude THIS
                # batch's own subdir (a crashed prior attempt may have
                # committed it — its bits must not make the batch flag
                # itself seen), and keep only the bit column
                # (bloom_probe re-distincts across batches anyway)
                bits = (
                    s.read.parquet(state_dir)
                    .where(F.col("batch_id") != batch_id)
                    .select("bit")
                )
            except Exception:
                # dir exists but holds no readable committed data
                # (e.g. only _temporary from a crashed first batch)
                bits = None
        accepted = curate_batch(
            batch, bits, m, k, rep_n, max_dup_frac, max_top_frac, text_col, id_col
        ).persist()
        # overwrite INTO the batch-keyed subdir: a mid-batch retry
        # replaces its own partial files instead of appending dupes
        accepted.write.mode("overwrite").parquet(out_b)
        bloom_build(accepted, text_col, m, k).write.mode("overwrite").parquet(state_b)
        accepted.unpersist()

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
