"""Structured-Streaming ingestion path (SURVEY.md §2.9).

The reference is strictly batch and the engine's point-in-time semantics
are enforced by the as-of predicate, not streaming state — but a feature
store at 10^12-turn scale ingests continuously, so this module provides the
streaming front-door: gap sessionization with ``session_window`` +
watermarking for late turns, and a per-turn streaming feature map.

Parity: the batch engine (operators/windows.with_session) assigns per-turn
session SEQUENCE ids; streaming emits one aggregate row per closed session.
``session_agg_matches_batch`` in tests pins that both define the same
session boundaries (same session count and per-session turn counts per
conversation) on identical data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfeats import FEATURE_SCHEMA, with_rant_stats


def streaming_session_agg(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """turns stream → one row per (conv_id, session_window) with turn count
    and span; watermark bounds state for late/out-of-order turns."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("conv_id"), F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
            "first_turn",
            "last_turn",
        )
    )


def streaming_features(stream: DataFrame) -> DataFrame:
    """Per-turn feature map on a stream — the same Arrow mapInPandas stage
    the batch pipeline uses (stateless, so it is streaming-safe as-is)."""
    return with_rant_stats(stream)


CONV_STATE_OUT = (
    "conv_id string, n_turns long, total_chars long, first_ep long, last_ep long"
)
CONV_STATE_SCHEMA = "n long, chars long, first long, last long"


def streaming_conv_state(
    stream: DataFrame, watermark: str = "1 hour", timeout: str | None = None
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-conversation
    running stats — turn count, char mass, first/last timestamp — carried
    ACROSS micro-batches in explicit group state, emitting the updated row
    whenever a conversation receives turns.

    This is the streaming surface the built-in aggregations can't express:
    arbitrary per-key state with user-defined merge logic (the batch
    equivalent is a plain groupBy; parity is pinned in
    tests/test_splits_streaming.py on a multi-micro-batch run).  State per
    key is O(1); pass `timeout` (e.g. "2 hours" processing-time) to evict
    idle conversations at scale."""
    import pandas as pd  # noqa: F811 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # idle eviction: drop the state and emit nothing — falling
            # through would re-arm the timeout and re-emit a stale row on
            # every fire, and the state would never actually be removed
            state.remove()
            return
        n, chars, first, last = state.get if state.exists else (0, 0, None, None)
        for pdf in pdfs:
            if pdf.empty:
                continue
            n += len(pdf)
            chars += int(pdf["text"].str.len().fillna(0).sum())
            # datetime64 unit differs by Arrow path (ns vs us) — go through
            # datetime64[s] so the int64 view is epoch SECONDS either way
            ep = pdf["ts"].astype("datetime64[s]").astype("int64")
            bmin, bmax = int(ep.min()), int(ep.max())
            first = bmin if first is None else min(first, bmin)
            last = bmax if last is None else max(last, bmax)
        if timeout:
            state.setTimeoutDuration(timeout)
        state.update((n, chars, first, last))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [n],
                "total_chars": [chars],
                "first_ep": [first],
                "last_ep": [last],
            }
        )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=CONV_STATE_OUT,
            stateStructType=CONV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
            if timeout
            else GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_once(stream_df: DataFrame, transform, query_name: str, output_mode: str = "append"):
    """Drive a streaming transform over a bounded source to completion via
    the memory sink (local smoke-test harness; real deployments use
    kafka/files + checkpointLocation).  For bounded parity tests of session
    aggregates use output_mode='complete' — in append mode the final
    (never-closed) session per key is withheld until the watermark passes,
    which never happens on a bounded source."""
    out = transform(stream_df)
    q = (
        out.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
