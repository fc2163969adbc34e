"""Incremental streaming curation == batch curation over the
concatenated corpus: the standing Bloom state must suppress
cross-batch duplicates, and the per-batch gate must equal the batch
gate (no Bloom false positives at the test's sketch size, so the
equivalence is exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

M, K = 1 << 16, 3


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _corpus():
    uniq = [f"unique doc number {i} with plenty of distinct words" for i in range(30)]
    spam = ["spam spam spam spam spam spam spam spam"] * 1  # gated by repetition
    b1 = [(i, t) for i, t in enumerate(uniq[:20] + spam)]
    # batch 2: 10 cross-batch repeats (new ids), 10 fresh, 1 in-batch dup pair
    b2 = (
        [(100 + i, uniq[i]) for i in range(10)]
        + [(200 + i, uniq[20 + i]) for i in range(10)]
        + [(300, "fresh twin text alpha beta gamma"), (301, "fresh twin text alpha beta gamma")]
    )
    return b1, b2


def test_stream_curation_matches_batch(spark, tmp_path):
    from auncel_spark.operators.dedup import dedup_keep_first
    from auncel_spark.operators.repetition import repetition_filter
    from auncel_spark.streaming.curation import stream_curate

    b1, b2 = _corpus()
    sdir, out, ck, st = (str(tmp_path / p) for p in ("src", "out", "ck", "state"))
    schema = "doc_id bigint, text string"

    _mk(spark, b1).write.parquet(sdir)
    q = stream_curate(spark, sdir, schema, out, ck, st, m=M, k=K)
    q.awaitTermination(180)
    _mk(spark, b2).write.mode("append").parquet(sdir)
    q2 = stream_curate(spark, sdir, schema, out, ck, st, m=M, k=K)
    q2.awaitTermination(180)

    got = {(r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()}

    # batch replay over the concatenation (ids increase with arrival
    # order, so keep-first-by-id == first-arrival-wins)
    full = _mk(spark, b1 + b2)
    d = dedup_keep_first(full)
    gate = repetition_filter(d, 2).where(F.col("keep") == 1).select(
        F.col("id").alias("doc_id")
    )
    want = {(r["doc_id"], r["text"]) for r in d.join(gate, "doc_id").collect()}

    assert got == want
    # sanity on the shape: spam gated, cross-batch repeats suppressed,
    # in-batch dup collapsed, fresh docs admitted
    ids = {i for i, _ in got}
    assert ids.isdisjoint(range(100, 110))  # repeats of batch-1 content
    assert set(range(200, 210)) <= ids  # genuinely new docs
    assert 300 in ids and 301 not in ids  # in-batch dup keeps first
    assert 20 not in ids  # the spam doc


def test_three_batch_duplicate_state_bits(spark, tmp_path):
    """Three batches with a small sketch: the standing state holds the
    SAME bit position set by different batches (the append-only shape
    that fanned out the old probe join into Bloom false negatives).
    Cross-batch repeats must still be suppressed in batch 3."""
    from auncel_spark.streaming.curation import stream_curate

    sdir, out, ck, st = (str(tmp_path / p) for p in ("src", "out", "ck", "state"))
    schema = "doc_id bigint, text string"
    m = 1 << 9  # 512 slots — cross-batch bit collisions certain
    b1 = [(i, f"alpha corpus doc {i} with many distinct words") for i in range(25)]
    b2 = [(100 + i, f"beta corpus doc {i} other content entirely") for i in range(25)]
    # batch 3: repeats of batch-1 AND batch-2 docs under new ids
    b3 = [(200 + i, b1[i][1]) for i in range(10)] + [
        (300 + i, b2[i][1]) for i in range(10)
    ]
    for b in (b1, b2, b3):
        _mk(spark, b).write.mode("append").parquet(sdir)
        stream_curate(spark, sdir, schema, out, ck, st, m=m, k=3).awaitTermination(180)

    # the scenario is real: state holds duplicate bit positions
    bits = spark.read.parquet(st).select("bit")
    assert bits.count() > bits.distinct().count()
    ids = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    # no false negatives: every batch-3 repeat suppressed
    assert ids.isdisjoint(range(200, 210)) and ids.isdisjoint(range(300, 310))


def test_retry_same_batch_is_idempotent(spark, tmp_path):
    """Re-running curate for an already-committed batch_id must not
    duplicate output rows or state bits (the batch-keyed sink's
    exactly-once contract under micro-batch replay)."""
    from auncel_spark.streaming.curation import stream_curate

    b1, _ = _corpus()
    sdir, out, ck, st = (str(tmp_path / p) for p in ("src", "out", "ck", "state"))
    schema = "doc_id bigint, text string"
    _mk(spark, b1).write.parquet(sdir)
    stream_curate(spark, sdir, schema, out, ck, st, m=M, k=K).awaitTermination(180)
    rows1 = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()
    )
    n_bits1 = spark.read.parquet(st).count()
    # replay batch 0 against a FRESH checkpoint (simulates a retry of
    # a batch whose sinks already committed): skip path must fire
    ck2 = str(tmp_path / "ck2")
    stream_curate(spark, sdir, schema, out, ck2, st, m=M, k=K).awaitTermination(180)
    rows2 = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()
    )
    assert rows2 == rows1 and spark.read.parquet(st).count() == n_bits1


def test_bloom_state_accumulates(spark, tmp_path):
    from auncel_spark.streaming.curation import stream_curate

    b1, b2 = _corpus()
    sdir, out, ck, st = (str(tmp_path / p) for p in ("src", "out", "ck", "state"))
    schema = "doc_id bigint, text string"
    _mk(spark, b1).write.parquet(sdir)
    stream_curate(spark, sdir, schema, out, ck, st, m=M, k=K).awaitTermination(180)
    n1 = spark.read.parquet(st).count()
    _mk(spark, b2).write.mode("append").parquet(sdir)
    stream_curate(spark, sdir, schema, out, ck, st, m=M, k=K).awaitTermination(180)
    n2 = spark.read.parquet(st).count()
    assert 0 < n1 < n2  # batch-2 acceptances appended their bits
