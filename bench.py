#!/usr/bin/env python
"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default all cores).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}

The flagship `pipeline` query is the end-to-end feature pipeline whose
turns/sec is the BASELINE.json headline metric; the rest cover each operator
family.  Timing excludes JVM/session startup (a fixed cost the cluster
amortizes) and includes full query execution to a count/collect action.

Each query is timed best-of-$BENCH_REPEATS (default 2) runs: this VM's
ambient load and occasional degraded JVMs swing single-shot timings by
±15-40% (documented in CLAUDE.md / BENCH/BASELINE.md), and the steady-state
warm number is the one a long-running cluster sees.  (Round 1 was
single-shot; cross-round comparisons should use per-query values.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py_evalfilter_spark.plans import driver_queries as dq  # noqa: E402
from py_evalfilter_spark.plans.pipeline import feature_pipeline  # noqa: E402
from py_evalfilter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("BENCH_REPEATS", "2"))

# Per-query bench aggregations: each consumes at least one column from EVERY
# stage of the query so Catalyst cannot column-prune work out of the timed
# plan.  A bare .count() prunes scalar UDFs entirely, deletes window
# functions (they don't change row counts), and drops the as-of struct fill
# — the same trap the round-1 pipeline bench fell into.  Plan survival of
# each query's characteristic operator is pinned in
# tests/test_plans.py::TestBenchedQueryPlans.
CONSUME: dict[str, list[str]] = {
    "groupby_stats": [
        "count(*) AS n", "sum(revenue) AS a", "sum(n_orders) AS b", "sum(sum_qty) AS c",
    ],
    "broadcast_join_agg": ["count(*) AS n", "sum(total) AS a", "sum(n_orders) AS b"],
    "topk_vocab": ["count(*) AS n", "sum(tf) AS a", "sum(rank) AS b"],
    "lag_lead": [
        "count(*) AS n", "sum(length(prev_text)) AS a",  # lag window
        "sum(length(next_text)) AS b",                   # lead window
        "sum(ts_ep) AS c",
    ],
    "sessionize": [
        "count(*) AS n", "sum(session_seq) AS a",        # session window sum
        "sum(is_session_start) AS b", "sum(length(session_id)) AS c",
    ],
    "session_agg": [
        "count(*) AS n", "sum(n_turns) AS a", "sum(duration_s) AS b", "sum(n_roles) AS c",
    ],
    "asof_join": [
        "count(*) AS n", "sum(profile_ts_ep) AS a",      # as-of struct fill
        "sum(purchase_value) AS b", "sum(ts_ep) AS c",
    ],
    "dedup_fuzzy_window": ["count(*) AS n", "sum(ratio) AS a"],
    "quality_score": [
        "count(*) AS n", "sum(n_tokens) AS a", "sum(avg_token_len) AS b",
        "sum(stopword_ratio) AS c", "sum(punct_ratio) AS d",
    ],
    "knn_cosine": ["count(*) AS n", "sum(sim) AS a", "sum(rank) AS b"],
    "rant_stats_features": [
        "count(*) AS n", "sum(tokens) AS a", "sum(kanji) AS b",  # Arrow UDF
        "sum(avgTokenLength) AS c", "sum(turn_idx) AS d",        # derivation
    ],
    "hashing_vectorize": [
        "count(*) AS n", "sum(index) AS a",   # md5 bucket hash
        "sum(value) AS b",                    # signed-count aggregation
    ],
    "smote": [
        "count(*) AS n", "sum(synth_sum_e4) AS a",  # zip_with interpolation
        "sum(gap_r) AS b", "sum(nbr_id) AS c",      # hash streams + kNN rank
    ],
    "repetition_stats": [
        "count(*) AS n", "sum(n_lines) AS a",            # line explode+agg
        "sum(dup_line_char_frac) AS b",                  # dup-char weighting
        "sum(top_bigram_frac) AS c",                     # bigram explode+agg
    ],
    "decontaminate": [
        "count(*) AS n", "sum(n_shared) AS a",  # n-gram build + broadcast match
        "sum(doc_id) AS b",
    ],
    "mask_pii": [
        "count(*) AS n", "sum(n_email) AS a",   # regexp_count x3
        "sum(n_phone) AS b", "sum(red_len) AS c",  # regexp_replace chain
    ],
    "curation_pipeline": [
        "count(*) AS n", "sum(n_docs) AS a",    # the full 8-stage curation flow
        "sum(n_packs) AS b", "sum(sum_tokens) AS c",
    ],
    "lm_score": [
        "count(*) AS n", "sum(n_tokens) AS a",  # tokenize + broadcast model join
        "sum(avg_logprob) AS b",                # smoothed logprob aggregation
    ],
    "fingerprint": [
        "count(*) AS n", "sum(fingerprint) AS a",  # k-gram md5 winnow (pure JVM)
    ],
    "dsir_weights": [
        "count(*) AS n", "sum(n_grams) AS a",   # two hashed-ngram model fits
        "sum(dsir_logw) AS b",                  # broadcast ratio join + agg
    ],
    "semantic_cluster": [
        "count(*) AS n", "sum(cluster) AS a",   # 2-iter Lloyd's fit + assign
        "sum(dist2) AS b",
    ],
    "dup_spans": [
        "count(*) AS n", "sum(dup_words) AS a",  # 8-gram window count + merge
        "sum(n_spans) AS b", "sum(dup_frac) AS c",
    ],
    "classifier_score": [
        "count(*) AS n", "sum(n_tokens) AS a",  # map-side md5-weight scoring
        "sum(score) AS b",
    ],
    "dedup_incremental": [
        "count(*) AS n", "sum(jaccard) AS a",   # shard-vs-standing LSH + verify
        "sum(dup_id) AS b",
    ],
    "media_digest_dedup": [
        "count(*) AS n", "sum(n_copies) AS a",  # md5-key groupBy over blobs
        "sum(keep_id) AS b",
    ],
    "line_dedup": [
        "count(*) AS n", "sum(n_lines_kept) AS a",  # CCNet line-hash dedup
        "sum(n_lines_dropped) AS b",                # + per-doc text rebuild
    ],
    "token_budget": [
        "count(*) AS n", "sum(n_chars) AS a",  # bucketed exact-budget cumsum
        "sum(doc_id) AS b",
    ],
    "c4_filter": [
        "count(*) AS n", "sum(n_lines_kept) AS a",  # map-only C4 rules
        "sum(n_sentences) AS b",
    ],
    "gopher_quality": [
        "count(*) AS n", "sum(n_words) AS a",  # map-only Gopher quality
        "sum(stopword_hits) AS b",
    ],
    "shard_corpus": [
        "count(*) AS n", "sum(pos) AS a",  # per-shard rank windows
        "sum(shard) AS b",
    ],
    "bloom_dedup": [
        "count(*) AS n", "sum(doc_id) AS a",   # bitmap build + probe + confirm
        "sum(length(text)) AS b",
    ],
    "bm25_search": [
        "count(*) AS n", "sum(bm25) AS a",  # postings + idf join + score agg
        "sum(doc_id) AS b",
    ],
    "bm25_batch": [
        "count(*) AS n", "sum(bm25) AS a",  # one postings pass, 3 queries
        "sum(length(query_id)) AS b",
    ],
    "spine_features": [
        "count(*) AS n", "sum(prof_purchase_value) AS a",  # table-1 as-of fill
        "sum(clk_click_value) AS b",                       # table-2 fill + tolerance
        "sum(ts_ep) AS c", "sum(clk_n_clicks) AS d",
    ],
    "line_dedup_incremental": [
        "count(*) AS n", "sum(n_lines_kept) AS a",  # bloom probe + confirm + rebuild
        "sum(n_lines_dropped) AS b",
    ],
}

BENCH_QUERIES = list(CONSUME)

# the flagship pipeline's consumption set (one column per stage; see
# tests/test_plans.py::test_benched_pipeline_is_not_column_pruned)
PIPELINE_AGGS = [
    "count(*) AS n",
    "sum(tokens) AS s",                      # Arrow feature map
    "sum(turn_idx) AS a",                    # derivation row_number
    "sum(turns_last3) AS b",                 # rolling window
    "sum(session_seq) AS c",                 # sessionization
    "max(tool_ffill) AS d",                  # backfill
    "sum(cast(cast(profile_ts AS timestamp) AS long)) AS e",  # as-of fill
    "sum(purchase_value) AS f",
]


def benched_df(spark, name: str, sf_dir: str = SF_DIR):
    """The exact aggregated DataFrame the bench times for ``name`` —
    exported so plan tests assert the un-pruned shape of what is measured."""
    return dq.QUERIES[name](spark, sf_dir).selectExpr(*CONSUME[name])


def main() -> None:
    spark = get_spark(app_name="bench")
    # warm the JVM + Python workers so fixed startup doesn't pollute timings
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}

    def best_of(fn) -> float:
        best = None
        for _ in range(max(REPEATS, 1)):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return best

    n_turns_box = {}

    def run_pipeline():
        # consume one column from EVERY stage: a bare count() (or an agg
        # referencing only the UDF output) lets Catalyst column-prune the
        # windows/as-of chain out of the physical plan entirely — correct
        # optimizer behavior, but then the bench measures scan+map only.
        # (Round 1 benched exactly that pruned plan; fixed in round 2.)
        row = feature_pipeline(spark, SF_DIR).selectExpr(*PIPELINE_AGGS).collect()[0]
        n_turns_box["n"] = row["n"]

    pipeline_sec = best_of(run_pipeline)
    n_turns = n_turns_box["n"]
    timings["pipeline"] = round(pipeline_sec, 3)

    for name in BENCH_QUERIES:
        # per-query stage-consuming aggregation — see CONSUME above; a bare
        # .count() here timed column-pruned plans through round 2.
        # clearCache between reps: queries that persist intermediates
        # (curation_pipeline's stage boundaries, minhash's banded frame)
        # would otherwise serve rep 2 from rep 1's cache (CacheManager
        # matches by plan equality) and best-of would time a partial run
        def run(name=name):
            spark.catalog.clearCache()
            benched_df(spark, name, SF_DIR).collect()

        timings[name] = round(best_of(run), 3)

    # --- amortized incremental near-dup (the daily-shard regime) ---
    # The catalog's `dedup_incremental` row is the COLD, self-contained
    # mode: it re-signatures the standing corpus every run, which is the
    # one-time store-build cost, not what a pipeline pays per shard.  The
    # regime that matters (and the one scale runs report) keeps the
    # standing signatures in a persisted store built once ever; this row
    # times ONLY the per-shard work (shard signatures + asymmetric banded
    # join + exact verify) against that store, so regressions in the
    # store path are visible round-over-round.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from py_evalfilter_spark.operators import dedup as _dedup

    docs = dq._read(spark, SF_DIR, "documents").select("doc_id", "text")
    sig_dir = tempfile.mkdtemp(prefix="bench_inc_sigs_")
    _dedup.minhash_signatures(
        docs, "doc_id", "text", n=3, num_perm=64
    ).write.mode("overwrite").parquet(sig_dir)  # untimed one-time build
    old_sigs = spark.read.parquet(sig_dir)
    base = docs.filter(F.col("doc_id") % 37 == 0)
    shard = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    ).unionByName(
        base.select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" y")).alias("text"),
        )
    )

    def run_amortized():
        spark.catalog.clearCache()
        _dedup.minhash_lsh_pairs_incremental(
            shard, docs, "doc_id", "text",
            n=3, num_perm=64, bands=16, threshold=0.8, old_sigs=old_sigs,
        ).selectExpr(*CONSUME["dedup_incremental"]).collect()

    timings["dedup_incremental_amortized"] = round(best_of(run_amortized), 3)
    shutil.rmtree(sig_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows": n_turns,
        "turns_per_sec": round(n_turns / pipeline_sec, 1),
        # Single fresh JVM, one lineage: ambient 3-7x JVM degradation and
        # cache-warmth drift are NOT controlled here.  Cross-round deltas on
        # individual rows must be adjudicated against the interleaved-JVM
        # protocol in BENCH/BASELINE.md, not this smoke sample.
        "protocol": "single-lineage smoke",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
