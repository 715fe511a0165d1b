"""End-to-end feature pipeline (SURVEY.md §3.4): the engine's flagship plan.

transcripts → Arrow feature map → windowed features (one conv_id Exchange)
→ as-of profile merge (bucketed cogroup) → wide per-turn feature rows.

Scale notes (what survives a 1000-executor / 100 TB run):
  * the transcripts derivation's row_number window hash-partitions by user
    across `spark.sql.shuffle.partitions` — the per-turn Arrow feature map
    inherits that balanced partitioning, so mega-conversations can't skew
    the map stage (per-turn features never cross rows → salting-safe);
  * all window features share the derivation's single conv_id Exchange;
  * the as-of union-window adds ONE more full-data conv_id Exchange
    (a Union's output partitioning is unknown to Catalyst, so the as-of
    window must redistribute) plus the profile-side aggregation shuffle —
    the full executed plan is exactly 3 hashpartitioning Exchanges, two of
    them over the big side (pinned in tests/test_plans.py);
  * nothing collects to the driver; output is a DataFrame for the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import textfeats
from ..operators import asof as asof_op
from ..operators import windows as win_op
from . import driver_queries as dq


def feature_pipeline(
    spark: SparkSession,
    sf_dir: str,
    gap_s: int = 1800,
    min_map_partitions: int | None = None,
) -> DataFrame:
    """Full pipeline over the events-derived transcripts at ``sf_dir``."""
    t = dq.transcripts_from_events(
        dq._read(spark, sf_dir, "events"), keep_order_col=True
    )
    if min_map_partitions:
        t = t.repartition(min_map_partitions)
    profile = dq.profile_df(spark, sf_dir)
    return feature_pipeline_from_df(t, profile, gap_s=gap_s)


def feature_pipeline_from_df(
    transcripts: DataFrame,
    profile: DataFrame | None = None,
    gap_s: int = 1800,
) -> DataFrame:
    """Same plan over caller-provided transcript / profile DataFrames
    (e.g. the datagen fixtures or a real Iceberg table).

    Stage order matters at scale: windows + as-of run FIRST on the narrow
    transcript columns, and the 19-column Arrow feature map runs LAST —
    after every shuffle — so feature columns are computed once per final
    row and never serialized through an Exchange (at 10^12 turns the
    windows/as-of shuffles move ~6 columns instead of ~25).  Features
    depend only on ``text``, so the reordering is semantics-preserving.

    Sort reuse: if the transcripts still carry the derivation's sort key
    ``event_id`` (transcripts_from_events(keep_order_col=True)), the window
    chain orders by (ts, event_id) — the identical permutation as
    (turn_idx, ts) — and Catalyst elides the window chain's Sort, reusing
    the derivation WindowExec's output ordering (one fewer full sort of
    the corpus; plan-tested).  The key must stay UNALIASED: renaming breaks
    ordering propagation.
    """
    order = ("ts", "event_id") if "event_id" in transcripts.columns else ("turn_idx", "ts")
    windowed = win_op.with_session(
        win_op.with_rolling_count(
            win_op.with_backfill(transcripts, order=order), order=order
        ),
        gap_s=gap_s,
        order=order,
    )
    if "event_id" in transcripts.columns:
        windowed = windowed.drop("event_id")
    if profile is not None:
        windowed = asof_op.asof_join_union_window(
            windowed, profile, on="ts", by="conv_id", right_ts_alias="profile_ts"
        )
    return textfeats.with_rant_stats(windowed)
