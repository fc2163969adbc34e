"""Sequence packing: assign documents to fixed-token-budget training
sequences (the "pack short docs into 2k/4k-token contexts" step of an
LLM data pipeline).

Semantics: documents are laid out in a DETERMINISTIC pseudo-random
order (the sampling LCG — reproducible across runs and engines), then
filled contiguously: seq_id = floor(running_token_offset / budget).
A document may straddle a boundary; the caller's tokenizer splits it
at materialization time (offset_in_seq says where it lands). This is
the contiguous-fill packer (GPT-style concat-then-chunk), chosen over
first-fit-decreasing because it is exactly reproducible, one-pass, and
wastes no tokens.

Scale shape: a global running sum is NOT computed with a single
unpartitioned window (one task at 100 TB). Two-pass distributed prefix
sum instead: bucket docs by the high bits of their order key, compute
per-bucket token totals (tiny aggregate), prefix-sum those on the
driver, broadcast the per-bucket base offsets back, and run the
within-bucket cumsum as a window PARTITIONED BY bucket. Wall cost: one
scan + one small aggregate + one partitioned window — every stage
parallel."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from auncel_spark.operators.sampling import sample_bucket

# NOT a module-level import: functions.text itself imports
# operators.dedup, which triggers this package's __init__ and would
# close an import cycle whenever functions.text is imported first
def token_count(col):  # thin late-binding shim over functions.text
    from auncel_spark.functions.text import token_count as _tc

    return _tc(col)

N_ORDER_BUCKETS = 1024


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_ORDER_BUCKETS,
) -> DataFrame:
    """(doc_id, n_tokens, seq_id, offset_in_seq) for every document.

    Order key = (LCG bucket, id) — a deterministic shuffle, so adjacent
    source docs end up in different sequences (the usual mitigation for
    long runs of same-domain docs in a packed batch)."""
    d = df.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        sample_bucket(id_col).alias("_ord"),
    )
    d = d.withColumn("_bkt", F.pmod(F.col("_ord"), F.lit(int(n_buckets))))
    # pass 1: per-bucket totals -> driver prefix sum (n_buckets values)
    totals = {
        r["_bkt"]: r["t"]
        for r in d.groupBy("_bkt").agg(F.sum("n_tokens").alias("t")).collect()
    }
    base, acc = {}, 0
    for b in range(int(n_buckets)):
        base[b] = acc
        acc += int(totals.get(b, 0))
    base_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(b, base[b]) for b in range(int(n_buckets))], "_bkt bigint, _base bigint"
        )
    )
    # pass 2: within-bucket running sum (exclusive), window partitioned
    # by bucket — parallel across buckets
    w = (
        Window.partitionBy("_bkt")
        .orderBy("_ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = (
        d.join(base_df, "_bkt")
        .withColumn("_off", F.col("_base") + cum)
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"_off div {int(budget)}L").alias("seq_id"),
            F.pmod(F.col("_off"), F.lit(int(budget))).alias("offset_in_seq"),
        )
    )
    return out


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-sequence fill statistics: docs per sequence and tokens
    starting in it (boundary-straddling docs count toward the sequence
    they start in)."""
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_started"),
    )
