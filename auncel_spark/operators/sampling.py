"""Deterministic corpus sampling for training-data pipelines:
per-stratum rate sampling and target-mixture ("domain mix") sampling.

Design constraint: every decision is a PURE INTEGER function of the
row id, so (a) the sample is reproducible run-to-run and
engine-to-engine (the DuckDB oracle replays it exactly — no RNG state,
no float rounding), (b) the filter is a Catalyst column expression
(whole-stage codegen, no UDF, no shuffle), and (c) growing the corpus
never changes the verdict on an existing row — the property that makes
hash-sampling the standard for petabyte-scale corpus work where a
re-run must not churn the training set.

Hash: a 32-bit LCG step on the id, `(id * 1103515245 + 12345) mod
2^32` (the C-standard rand() constants). The multiplier is < 2^31 so
`(id mod 2^32) * A + C` stays under 2^63 — no BIGINT overflow for any
non-negative id, on Spark and DuckDB alike. A row is kept when its
bucket falls below an integer threshold `floor(2^32 * rate)`; all
threshold arithmetic is integer, so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

MOD = 4_294_967_296  # 2^32
LCG_A = 1_103_515_245
LCG_C = 12_345
PPM = 1_000_000


def sample_bucket(id_col: Column | str) -> Column:
    """Uniform pseudo-random bucket in [0, 2^32) from a non-negative
    integer id. SQL-portable: `((id % 4294967296) * 1103515245 + 12345)
    % 4294967296`."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.pmod(c, F.lit(MOD)) * F.lit(LCG_A) + F.lit(LCG_C), F.lit(MOD))


def threshold_for_ppm(ppm: int) -> int:
    """Integer keep-threshold for a rate given in parts-per-million."""
    return MOD * int(ppm) // PPM


def hash_sample(df: DataFrame, ppm: int, id_col: str = "doc_id") -> DataFrame:
    """Keep ~ppm/1e6 of rows, deterministically by id."""
    return df.where(sample_bucket(id_col) < F.lit(threshold_for_ppm(ppm)))


def stratified_sample(
    df: DataFrame,
    rates_ppm: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_ppm: int = 0,
) -> DataFrame:
    """Per-stratum rate sampling (e.g. keep 50% of en, 10% of zh).

    The per-stratum threshold is resolved by a literal CASE chain —
    no join, no shuffle; the filter runs inside the scan's codegen
    stage and combines with parquet row-group pruning.
    """
    thr: Column = F.lit(threshold_for_ppm(default_ppm))
    for stratum, ppm in sorted(rates_ppm.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(threshold_for_ppm(ppm))
        ).otherwise(thr)
    return df.where(sample_bucket(id_col) < thr)


def domain_mix(
    df: DataFrame,
    targets_pct: dict[str, int],
    total_out: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample toward a target domain mixture: stratum g should
    contribute ~targets_pct[g]% of a total_out-row output.

    Per-stratum rate = (pct/100 * total_out) / count_g, capped at 1 —
    an undersized stratum contributes everything it has (the standard
    up-to-availability mixing rule). Thresholds are exact BIGINT
    arithmetic: thr_g = min(2^32, (2^32 * pct * total_out) div
    (100 * count_g)), so the oracle replays them precisely.

    Scale shape: one partial-agg count per stratum (tiny result,
    broadcast back), then the same codegen'd filter as
    stratified_sample. No row-level shuffle of the corpus.
    """
    strata = [s for s in sorted(targets_pct)]
    counts = (
        df.where(F.col(strata_col).isin(strata))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pct_map = F.create_map(
        *[x for s in strata for x in (F.lit(s), F.lit(int(targets_pct[s])))]
    )
    # integer floor-division semantics: Spark's `div`, DuckDB's `//`
    thr = F.least(
        F.lit(MOD),
        F.expr(
            f"({MOD}L * __pct * {int(total_out)}L) div (100L * cnt)"
        ),
    )
    counts = counts.withColumn("__pct", pct_map[F.col(strata_col)]).withColumn(
        "__thr", thr
    )
    return (
        df.join(F.broadcast(counts.select(strata_col, "__thr")), strata_col)
        .where(sample_bucket(id_col) < F.col("__thr"))
        .drop("__thr")
    )


def source_cap(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document cap (RefinedWeb/CC-style anti-dominance
    rule): keep at most ``cap`` docs per source, chosen by a
    deterministic pseudo-random order so the survivors are an unbiased,
    reproducible subsample of each hot source.

    Order key = (LCG bucket of id, id): engine-portable integers, so
    the oracle replays the exact survivor set. One shuffle on
    ``source_col``; the per-source sort is bounded by the largest
    source (for a pathological mega-source at 100 TB, pre-filter with
    ``sample_bucket(id) < t`` for a t slightly above cap/count to
    bound the sorted set before ranking — same survivors, since rank
    order and threshold use the same bucket).

    Returns the capped frame + ``rk`` (1-based rank within source)."""
    w = Window.partitionBy(source_col).orderBy(sample_bucket(id_col), F.col(id_col))
    return (
        df.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= F.lit(int(cap)))
    )
