"""Intra-document repetition metrics and token-budget chunking.

Gopher/C4-style quality rules measure how internally repetitive a
document is (boilerplate, keyword stuffing, decode loops) — the
standard pre-training filters alongside the cross-document dedup
family in ``operators/dedup.py``. Everything here is a Catalyst
composition over word n-grams:

- ``ngram_repetition_stats``: per-doc n-gram duplication metrics
  (duplicate-occurrence fraction, top-n-gram mass, duplicate-char
  fraction). One explode + two keyed aggregations, both map-side
  combinable; keys are (doc_id[, ngram]) so the shuffle is
  corpus-linear with no skew beyond document length — the plan holds
  at 100 TB. Fractions are also returned as ``floor(x * 1e6)`` ints
  (``*_u`` columns) so oracle comparison is integer-exact.
- ``repetition_filter``: keep/flag decision from those metrics
  (thresholds follow the Gopher paper's shape, tunable).
- ``word_chunks``: fixed token-budget chunking with stride overlap
  (RAG / context-window prep). Pure per-row array ops + posexplode —
  no shuffle at all; chunk ids are deterministic (doc_id, start).

Tokenization matches ``operators/dedup.tokens`` (lower/trim/split
``\\s+``) so all text operators agree on word boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from auncel_spark.operators.dedup import tokens


def _ngrams_all(tok, n: int):
    """ALL word n-grams (with multiplicity — unlike
    ``_shingles_of_tokens``, which deduplicates for set semantics)."""
    ng = F.transform(
        F.sequence(F.lit(0), F.size(tok) - n),
        lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
    )
    return F.when(F.size(tok) >= n, ng).otherwise(F.array().cast("array<string>"))


def ngram_repetition_stats(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document n-gram repetition metrics.

    Returns (id, n_ngrams, n_distinct, dup_frac_u, top_frac_u,
    dup_char_frac_u) where

    - ``dup_frac``      = 1 - distinct/total occurrences
    - ``top_frac``      = occurrences of the most frequent n-gram / total
    - ``dup_char_frac`` = chars inside n-grams seen more than once /
                          chars inside all n-gram occurrences

    Docs with fewer than ``n`` tokens report zero n-grams and zero
    fractions (nothing to repeat).
    """
    ids = df.select(F.col(id_col).alias("id"))
    # materialize the token array in its own projection BEFORE the
    # n-gram transform: expressions inside higher-order-function
    # lambdas re-evaluate per element, so an inline tokens(text) runs
    # the whole lower/trim/split pipeline once per n-gram (~100×
    # blowup — the word_shingles perf note; measured 3.7 s → 1.0 s for
    # the curation gate at sf0.1)
    if tokens_col is not None:
        toked = df.select(F.col(id_col).alias("id"), F.col(tokens_col).alias("_tok"))
    else:
        toked = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("_tok"))
    exploded = toked.select(
        "id",
        F.explode(_ngrams_all(F.col("_tok"), n)).alias("ng"),
    )
    per_ng = exploded.groupBy("id", "ng").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = per_ng.groupBy("id").agg(
        F.sum("cnt").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("_top_cnt"),
        F.sum(F.col("cnt") * F.length("ng")).alias("_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.length("ng")).otherwise(F.lit(0))
        ).alias("_dup_chars"),
    )
    u = lambda num, den: F.floor(num * F.lit(1_000_000) / den).cast("bigint")  # noqa: E731
    out = per_doc.select(
        "id",
        "n_ngrams",
        "n_distinct",
        u(F.col("n_ngrams") - F.col("n_distinct"), F.col("n_ngrams")).alias(
            "dup_frac_u"
        ),
        u(F.col("_top_cnt"), F.col("n_ngrams")).alias("top_frac_u"),
        u(F.col("_dup_chars"), F.col("_chars")).alias("dup_char_frac_u"),
    )
    cols = ("n_ngrams", "n_distinct", "dup_frac_u", "top_frac_u", "dup_char_frac_u")
    return ids.join(out, "id", "left").select(
        "id", *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c) for c in cols]
    )


def repetition_filter(
    df: DataFrame,
    n: int = 2,
    max_dup_frac: float = 0.30,
    max_top_frac: float = 0.20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, keep) — Gopher-shaped repetition gate: drop documents whose
    duplicate-n-gram fraction or single-top-n-gram mass exceeds the
    thresholds."""
    stats = ngram_repetition_stats(df, n, text_col, id_col)
    return stats.select(
        "id",
        (
            (F.col("dup_frac_u") <= F.lit(int(max_dup_frac * 1e6)))
            & (F.col("top_frac_u") <= F.lit(int(max_top_frac * 1e6)))
        )
        .cast("int")
        .alias("keep"),
    )


def word_chunks(
    df: DataFrame,
    chunk_size: int = 64,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Split each document into token chunks of ``chunk_size`` words,
    stepping ``stride`` words between chunk starts (stride <
    chunk_size ⇒ overlapping chunks). Returns (id, chunk_id, n_tokens,
    chunk_text); the trailing chunk may be short. Shuffle-free."""
    if stride is None:
        stride = chunk_size
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    # tokens_col: reuse an already-materialized token array (shared
    # corpus tokenization) instead of re-splitting the text
    tok_expr = (
        F.col(tokens_col) if tokens_col is not None else tokens(text_col)
    )
    toked = df.select(F.col(id_col).alias("id"), tok_expr.alias("_tok"))
    starts = F.sequence(F.lit(0), F.size("_tok") - 1, F.lit(stride))
    chunked = toked.select(
        "id", "_tok", F.posexplode(starts).alias("chunk_id", "_start")
    )
    chunk = F.slice(F.col("_tok"), F.col("_start") + 1, chunk_size)
    return chunked.select(
        "id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )
