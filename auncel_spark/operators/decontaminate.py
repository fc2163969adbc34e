"""Train/eval decontamination: find training documents that share
word n-gram content with a held-out evaluation set.

The standard pretraining-hygiene step (the "13-gram overlap" rule from
the GPT-3/PaLM data cards): any training document sharing >= min_shared
distinct n-grams with an eval document is flagged (and typically
dropped). No reference analogue — the reference is a vector engine —
but a 100 TB curation pipeline runs this on every refresh.

Scale shape: the eval side is the SMALL side (benchmarks are a few k
docs); its exploded shingle set broadcasts, so the big training corpus
is never shuffled — one scan + broadcast hash join + partial-agg
count. A document-frequency cap on eval shingles (drop shingles that
occur in more than max_eval_df eval docs, e.g. boilerplate headers)
bounds the per-row join fan-out the same way ngram_jaccard's stop-
shingle cap does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from auncel_spark.operators.dedup import with_shingles


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    max_eval_df: int | None = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
    tokens_col: str | None = None,
) -> DataFrame:
    """(train_doc_id, eval_doc_id, n_shared): pairs sharing >=
    min_shared DISTINCT word n-grams, with n_shared the exact count.

    `broadcast_eval=False` falls back to a shuffle hash join for the
    rare case of an eval set too big to broadcast."""
    # join on 64-bit shingle hashes, not strings (the ngram_jaccard
    # pattern): narrower broadcast + cheaper probe; collisions are
    # ~n²/2⁶⁴ and only ever over-flag
    tr = (
        with_shingles(train, n, text_col, id_col, tokens_col=tokens_col)
        .select(F.col("id").alias("train_doc_id"), F.explode("sh").alias("_w"))
        .select("train_doc_id", F.xxhash64("_w").alias("w"))
    )
    ev = (
        with_shingles(eval_df, n, text_col, id_col, tokens_col=tokens_col)
        .select(F.col("id").alias("eval_doc_id"), F.explode("sh").alias("_w"))
        .select("eval_doc_id", F.xxhash64("_w").alias("w"))
    )
    if max_eval_df is not None:
        keep = ev.groupBy("w").agg(
            F.count(F.lit(1)).alias("_df")
        ).where(F.col("_df") < max_eval_df).select("w")
        ev = ev.join(keep, "w")
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        tr.join(ev, "w")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop flagged training docs (left-anti join against the flagged
    id set — the flagged side is pairs-scale, far smaller than the
    corpus, so Spark broadcasts it)."""
    flagged = (
        ngram_overlap(train, eval_df, n, min_shared, text_col=text_col, id_col=id_col)
        .select(F.col("train_doc_id").alias(id_col))
        .distinct()
    )
    return train.join(flagged, id_col, "left_anti")
