"""Temporal relational operators for event streams: gap-based
sessionization and as-of (latest-prior) joins.

Neither exists in the reference (a vector engine), but both are core
to event-log curation for training pipelines (conversation/session
assembly, point-in-time feature joins). Both are pure Catalyst
compositions — a keyed window, never a per-key UDF:

- ``sessionize``: session boundary = gap > threshold between
  consecutive events of the same key; session index = running sum of
  boundary flags. One shuffle on the key; windows are per-key, so
  parallelism = #keys (the standard batch equivalent of Structured
  Streaming's ``session_window``).
- ``asof_join``: each left row matched to the latest right row with
  ``right.ts <= left.ts`` on the same key, via the union-and-window
  trick: tag sides, order by (ts, side) with right rows first at equal
  ts (inclusive semantics), carry right values forward with
  ``last(..., ignorenulls=True)``. One shuffle on the key; no range
  explosion, no per-row probe — the plan a 100 TB point-in-time join
  needs. (DuckDB's native ``ASOF JOIN`` is the oracle.)

Timestamps: callers pass an integer column (epoch micros here — the
fixtures' nano timestamps truncate to micros in DuckDB, so the oracle
contract normalizes both engines to ``ts div 1000``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap: int,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add ``session_id`` (per-key running index, 0-based) to every
    event. A new session starts when the gap since the previous event
    of the same key exceeds ``gap`` (same units as ts_col)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) - prev > F.lit(int(gap))), 1
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_id", (F.sum(is_new).over(wcum) - 1).cast("bigint"))


def session_stats(
    sessions: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Per-session aggregates: event count, start/end, duration."""
    return sessions.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """Left rows + the latest right row's values at-or-before each
    left timestamp (backward as-of, inclusive). Right values come back
    as ``{prefix}{col}``; unmatched left rows keep them NULL.

    Requires (key, ts) unique on the right for a deterministic match
    (the usual as-of precondition)."""
    rvals = [f"{prefix}{c}" for c in right_value_cols]
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_value_cols],
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal ts => ts <= semantics
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in rvals:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.where(F.col("_side") == 1).drop("_side")
