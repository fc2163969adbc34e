"""Unit semantics for the repetition metrics, token chunker, and
Bloom incremental dedup (the catalog oracle harness covers fixture
parity; these pin the operator contracts on hand-built corpora)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id bigint, text string"
    )


def test_repetition_stats_hand_values(spark):
    from auncel_spark.operators.repetition import ngram_repetition_stats

    df = _docs(
        spark,
        [
            "a b a b a b",  # 2-grams: ab,ba,ab,ba,ab -> 5 total, 2 distinct
            "u v w x y z",  # 5 distinct 2-grams, no repeats
            "solo",  # < n tokens
        ],
    )
    got = {r["id"]: r.asDict() for r in ngram_repetition_stats(df, 2).collect()}
    assert got[0]["n_ngrams"] == 5 and got[0]["n_distinct"] == 2
    assert got[0]["dup_frac_u"] == 600000  # 3/5
    assert got[0]["top_frac_u"] == 600000  # 'a b' x3 / 5
    assert got[0]["dup_char_frac_u"] == 1000000  # every 2-gram repeats
    assert got[1]["dup_frac_u"] == 0 and got[1]["top_frac_u"] == 200000
    assert got[2]["n_ngrams"] == 0 and got[2]["dup_char_frac_u"] == 0


def test_repetition_filter_gates(spark):
    from auncel_spark.operators.repetition import repetition_filter

    clean = " ".join(f"tok{i}" for i in range(12))  # top 2-gram mass 1/11
    df = _docs(spark, ["spam spam spam spam spam", clean])
    keep = {r["id"]: r["keep"] for r in repetition_filter(df, 2).collect()}
    assert keep[0] == 0 and keep[1] == 1


def test_word_chunks_cover_and_overlap(spark):
    from auncel_spark.operators.repetition import word_chunks

    words = [f"w{i}" for i in range(10)]
    df = _docs(spark, [" ".join(words)])
    out = sorted(
        (r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in word_chunks(df, chunk_size=4, stride=3).collect()
    )
    # starts 0,3,6,9 -> lengths 4,4,4,1
    assert [c[0] for c in out] == [0, 1, 2, 3]
    assert [c[1] for c in out] == [4, 4, 4, 1]
    assert out[0][2] == "w0 w1 w2 w3" and out[3][2] == "w9"
    # overlapping stride reproduces every word at least once, in order
    seen = " ".join(c[2] for c in out).split()
    assert set(seen) == set(words)


def test_bloom_no_false_negatives_and_novel(spark):
    from auncel_spark.operators.bloom import bloom_build, bloom_novel, bloom_probe

    seen = _docs(spark, [f"document number {i}" for i in range(50)])
    # probe: 25 exact repeats + 25 fresh
    probe = spark.createDataFrame(
        [(1000 + i, f"document number {i}") for i in range(25)]
        + [(2000 + i, f"fresh content {i}") for i in range(25)],
        "doc_id bigint, text string",
    )
    m, k = 1 << 14, 3
    bits = bloom_build(seen, "text", m, k)
    flags = {
        r["id"]: r["possibly_seen"]
        for r in bloom_probe(probe, bits, "text", "doc_id", m, k).collect()
    }
    # no false negatives: every repeat flagged
    assert all(flags[1000 + i] == 1 for i in range(25))
    # with m >> kn, the fresh half is (almost surely) unflagged
    fresh_flagged = sum(flags[2000 + i] for i in range(25))
    assert fresh_flagged <= 2
    novel = bloom_novel(probe, seen, "text", "doc_id", m, k)
    ids = {r["doc_id"] for r in novel.collect()}
    assert ids <= {2000 + i for i in range(25)}
    assert len(ids) >= 23


def test_bloom_bits_bounded(spark):
    from auncel_spark.operators.bloom import bloom_build

    seen = _docs(spark, [f"d {i}" for i in range(20)])
    bits = bloom_build(seen, "text", 1 << 10, 4)
    vals = [r["bit"] for r in bits.collect()]
    assert len(vals) == len(set(vals)) <= 80
    assert all(0 <= v < (1 << 10) for v in vals)


def test_bloom_probe_tolerates_duplicate_bits(spark):
    """Duplicate rows in the bit-set (the shape an append-only state
    accumulates when two batches set the same position) must NOT fan
    out the probe join into a false negative — seen rows stay seen."""
    from pyspark.sql import functions as F

    from auncel_spark.operators.bloom import bloom_build, bloom_probe

    seen = _docs(spark, [f"document number {i}" for i in range(40)])
    m, k = 1 << 14, 3
    bits = bloom_build(seen, "text", m, k)
    # triplicate every set bit — worst-case duplication
    dup_bits = bits.union(bits).union(bits)
    assert dup_bits.count() == 3 * bits.count()
    probe = spark.createDataFrame(
        [(1000 + i, f"document number {i}") for i in range(40)],
        "doc_id bigint, text string",
    )
    flags = bloom_probe(probe, dup_bits, "text", "doc_id", m, k)
    assert flags.where(F.col("possibly_seen") == 0).count() == 0


def test_bloom_params_formulas():
    from auncel_spark.operators.bloom import bloom_params

    m, k = bloom_params(1_000_000, 0.01)
    assert 9_500_000 <= m <= 9_700_000 and k == 7  # ~9.59 bits/item
    m2, k2 = bloom_params(1000, 0.001)
    # ~14.38 bits/item for fpr=1e-3: m = ceil(1000*ln(1000)/ln(2)^2)
    assert k2 == 10 and 14_300 <= m2 <= 14_450
    import pytest

    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)
