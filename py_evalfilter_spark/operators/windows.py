"""Windowed / ordered operators over (conv_id, turn_idx, ts) — SURVEY.md §2.7.

All pure Spark SQL window functions (JVM-side, whole-stage codegen; one
shuffle on conv_id shared by every operator in this module — composing them
reuses the same hash partitioning, so Catalyst plans a single Exchange).

Stable order within a conversation: (turn_idx, ts) — per BASELINE.json
"per-turn text equality under stable (conv_id, turn_idx) ordering".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_S = 1800


def conv_window(by: str = "conv_id", order: tuple[str, ...] = ("turn_idx", "ts")):
    return Window.partitionBy(by).orderBy(*[F.col(c) for c in order])


def with_lag_lead(
    df: DataFrame,
    cols: tuple[str, ...] = ("text",),
    k: int = 1,
    by: str = "conv_id",
) -> DataFrame:
    """lag/lead per conversation (W2)."""
    w = conv_window(by)
    for c in cols:
        df = df.withColumn(f"prev_{c}", F.lag(c, k).over(w))
        df = df.withColumn(f"next_{c}", F.lead(c, k).over(w))
    return df


def with_backfill(
    df: DataFrame,
    col: str = "tool",
    by: str = "conv_id",
    order: tuple[str, ...] = ("turn_idx", "ts"),
) -> DataFrame:
    """Forward-fill last non-null value (W3): last(ignorenulls) over an
    unbounded-preceding frame."""
    w = conv_window(by, order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(f"{col}_ffill", F.last(col, ignorenulls=True).over(w))


def with_rolling_count(
    df: DataFrame,
    k: int = 3,
    out: str = "turns_last3",
    by: str = "conv_id",
    order: tuple[str, ...] = ("turn_idx", "ts"),
) -> DataFrame:
    """Rolling count over the current + k preceding rows (W3)."""
    w = conv_window(by, order).rowsBetween(-k, 0)
    return df.withColumn(out, F.count(F.lit(1)).over(w))


def with_session(
    df: DataFrame,
    gap_s: int = SESSION_GAP_S,
    by: str = "conv_id",
    ts_col: str = "ts",
    order: tuple[str, ...] = ("turn_idx", "ts"),
) -> DataFrame:
    """Gap-based sessionization (W4): new session when the gap from the
    previous turn exceeds ``gap_s`` (first turn starts session 1); running
    sum of starts → per-conversation session sequence → global session_id.
    """
    w = conv_window(by, order)
    # NTZ-safe epoch: TIMESTAMP_NTZ → TIMESTAMP (session tz, pinned UTC) → long
    ep = F.col(ts_col).cast("timestamp").cast("long")
    gap = ep - F.lag(ep, 1).over(w)
    is_start = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    df = df.withColumn("is_session_start", is_start.cast("int"))
    run = F.sum("is_session_start").over(w.rowsBetween(Window.unboundedPreceding, 0))
    df = df.withColumn("session_seq", run.cast("long"))
    return df.withColumn(
        "session_id", F.concat(F.col(by), F.lit("#"), F.col("session_seq").cast("string"))
    )


def with_stable_order(df: DataFrame, by: str = "conv_id") -> DataFrame:
    """row_number over the stable (turn_idx, ts) order (W5) — used by ordering
    invariance checks."""
    return df.withColumn("rn", F.row_number().over(conv_window(by)))


def with_rolling_time(
    df: DataFrame,
    window_s: int = 3600,
    agg_col: str | None = None,
    by: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-based rolling window (W3): count (and optional avg of
    length(agg_col)) over the trailing ``window_s`` seconds — RANGE frame on
    epoch seconds, peers at equal timestamps included."""
    ep = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(by).orderBy(ep).rangeBetween(-window_s, 0)
    out = df.withColumn("turns_in_window", F.count(F.lit(1)).over(w))
    if agg_col is not None:
        out = out.withColumn(
            "avg_len_in_window", F.round(F.avg(F.length(agg_col)).over(w), 4)
        )
    return out
