"""Bloom-filter incremental dedup: "have we already ingested this?"
against a seen-corpus sketch, without joining the full corpus.

The batch dedup family (``operators/dedup.py``) compares a corpus
against itself; continuous ingestion needs the other shape — an
o(corpus) summary of everything already accepted that each new batch
probes. A Bloom filter over content hashes is the standard answer: at
100 TB the seen-set is billions of digests (too big to broadcast-join)
but its Bloom bits at 1% FPR are ~1.2 GB — shippable to executors,
mergeable across shards by OR, and append-only under ingestion.

Representation: the bit-set is a DataFrame of SET bit positions
(distinct bigints), the engine's portable sketch form — unioning
ingest shards = union+distinct, and the probe is a broadcast hash
join, never a driver-side bitmap. Hashing is md5-derived (15 hex
chars → 60-bit int, mod m), the repo's portable-hash idiom, so a SQL
oracle replays bits — including false positives — exactly.

Semantics: ``bloom_probe`` labels a row ``possibly_seen=1`` iff ALL k
of its bit positions are present (classic Bloom: no false negatives;
false-positive rate ≈ (1 - e^{-kn/m})^k, deterministic given the hash
family)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bloom_params(n: int, fpr: float = 0.01) -> tuple[int, int]:
    """Size a filter for ``n`` expected distinct items at a target
    false-positive rate: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2) — the
    standard optima, rounded up. E.g. 1e9 digests at 1% → ~1.2 GB of
    bits, k=7."""
    import math

    if n <= 0 or not (0.0 < fpr < 1.0):
        raise ValueError("need n > 0 and 0 < fpr < 1")
    m = math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))
    k = max(1, round(m / n * math.log(2)))
    return m, k


def bloom_bit(col: Column, seed: int, m: int) -> Column:
    """Bit position for one hash-family member: first 15 hex chars of
    md5(value # seed) as a 60-bit int, mod m. Portable to ANSI SQL as
    ``('0x' || substr(md5(v || '#seed'), 1, 15))::BIGINT % m``."""
    h = F.md5(F.concat_ws("#", col, F.lit(str(seed))))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % m).alias(
        f"bit{seed}"
    )


def bloom_build(
    df: DataFrame, col: str = "text", m: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Distinct set bit positions (single ``bit`` bigint column) for
    the seen corpus. Map-side distinct before the exchange; output is
    at most min(k·n, m) rows."""
    c = F.col(col)
    bits = F.array(*[bloom_bit(c, s, m) for s in range(k)])
    return df.select(F.explode(bits).alias("bit")).distinct()


def bloom_probe(
    df: DataFrame,
    bits: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    m: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """(id, possibly_seen) for each probe row. Explodes each row to its
    k bit positions, broadcast-joins the bit-set, and marks the row
    seen iff all k matched — one narrow shuffle on id (k rows each),
    with the bit-set on the broadcast side."""
    probe = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(*[bloom_bit(F.col(col), s, m) for s in range(k)])).alias(
            "bit"
        ),
    )
    # the bit-set MUST be distinct before the join: duplicate bit rows
    # (e.g. the same position appended by two ingest shards) would fan
    # out the join and push sum(_set) past k, turning a truly-seen row
    # into a false NEGATIVE — the one error Bloom semantics forbid.
    # distinct() here is a shuffle on the small (broadcast) side only.
    bit_set = bits.select("bit").distinct()
    hit = probe.join(
        F.broadcast(bit_set.withColumn("_set", F.lit(1))), "bit", "left"
    ).select("id", F.coalesce(F.col("_set"), F.lit(0)).alias("_set"))
    return hit.groupBy("id").agg(
        (F.sum("_set") == F.lit(k)).cast("int").alias("possibly_seen")
    )


def bloom_novel(
    new_df: DataFrame,
    seen_df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    m: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """One-shot convenience: rows of ``new_df`` that are definitely NOT
    in ``seen_df`` (any bit missing). False positives drop a few novel
    rows (tunable via m, k); false negatives cannot occur."""
    flags = bloom_probe(new_df, bloom_build(seen_df, col, m, k), col, id_col, m, k)
    return (
        new_df.join(
            flags.where(F.col("possibly_seen") == 0).select("id"),
            new_df[id_col] == F.col("id"),
            "inner",
        )
        .drop("id")
    )
