"""Curation robustness at 100x: run curate_corpus over a ~10M-doc corpus
(VERDICT r4 ask: "one replicated-documents run at ~10M docs on local[32] —
wall time, flat memory, stage observe counts").

Corpus synthesis (deterministic, JVM-only): each sf0.1 document is
replicated `--mult` times with a per-(doc, rep) marker token inserted
after every 2nd word.  The insertion density matters a lot: with markers
every 5th word, two replicas of the same base doc still share the
marker-free base trigrams (mutual Jaccard ≈ 0.27), and the 16-band r=4
LSH S-curve admits ~8% of pairs at j=0.27 — ≈160k candidate pairs PER
BASE DOC, ~800M corpus-wide, which flooded the candidate shuffle past
this box's disk (measured).  At every-2nd-word density almost every
trigram contains a replica-specific marker, mutual replica Jaccard drops
to ~0.02, and the banding admits essentially none of the 2M-per-doc
replica pairs — the corpus behaves like ~10M distinct documents, the
realistic web case.  Decontamination stays honest for the same reason:
cross-doc 6-gram matches need an aligned marker collision ((doc*31+rep)
mod 9973) AND matching surrounding words.  A controlled dup fraction
stays in: replicas where (doc_id + rep) % 50 == 0 keep the base text
verbatim, giving exact-dup clusters of width ~mult/50 on 2% of base
docs, and the base corpus's own near-dups survive among those
unperturbed replicas.

Usage:
    python scripts/bench_curation_scale.py [--mult 2000] [--cpus 32]

Prints one JSON line: wall times (synthesis, curation), stage observe
counts, peak RSS.  Never run concurrently with another Spark workload.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one consuming column per packed-output stage: a bare count() lets
# Catalyst prune the tokenize+packing window entirely (CLAUDE.md bench
# rule) — the first version of this script under-measured exactly that
CONSUME_PACKED = [
    "count(*) AS n",
    "sum(n_tokens) AS tok",      # tokenize
    "sum(pack_id) AS pid",       # packing window (cumsum/budget)
    "sum(pack_offset) AS poff",
    "sum(n_email + n_ip + n_phone) AS pii",  # PII scrub counts
]


def jvm_peak_rss_gb() -> float:
    """Peak RSS (VmHWM) across live java processes — the number that
    matters for 'flat memory': the Spark driver JVM holds the heap and
    the pinned/spilled blocks, not this Python launcher."""
    peak = 0
    for status in glob.glob("/proc/[0-9]*/status"):
        try:
            comm = open(status.replace("status", "comm")).read().strip()
            if comm != "java":
                continue
            for line in open(status):
                if line.startswith("VmHWM:"):
                    peak = max(peak, int(line.split()[1]))
                    break
        except OSError:
            continue
    return round(peak / 1e6, 2)


def synthesize_replicated_corpus(
    spark,
    sf_dir: str,
    work: str,
    mult: int,
    partitions: int,
    rep_lo: int = 0,
    out_name: str = "documents.parquet",
):
    """The marker-perturbed mult-fold corpus (module docstring) — shared by
    the 10M robustness run, the scaling pair, and the streaming delta bench
    so the benchmarks can never drift onto different corpora.  `rep_lo`
    shifts the replica index range to [rep_lo, rep_lo + mult): the delta
    bench uses disjoint rep ranges so arriving documents are NEW ids with
    the same dup structure against the standing corpus (the
    (doc_id + rep) % 50 == 0 verbatim replicas keep landing in the standing
    exact-dup clusters)."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # repartition BEFORE the explode: the sf table is one parquet file, and
    # without this the whole mult-fold expansion runs as a single task
    # (single-file input trap, BENCH/BASELINE.md round 3)
    reps = (
        base.repartition(partitions)
        .withColumn(
            "rep",
            F.explode(F.sequence(F.lit(rep_lo), F.lit(rep_lo + mult - 1))),
        )
        .withColumn(
            "new_id",
            F.col("doc_id") + F.col("rep").cast("long") * F.lit(10_000_000),
        )
        # marker projected to a named column BEFORE the HOF lambda (lambda
        # bodies get no subexpression elimination — project conventions)
        .withColumn(
            "marker",
            F.concat(
                F.lit("w"),
                ((F.col("doc_id") * 31 + F.col("rep")) % 9973).cast("string"),
            ),
        )
        # words array materialized outside the lambda for the same reason
        .withColumn("words", F.split("text", " "))
        .withColumn(
            "text",
            F.when(
                (F.col("doc_id") + F.col("rep")) % 50 == 0, F.col("text")
            ).otherwise(
                F.array_join(
                    F.transform(
                        "words",
                        lambda w, i: F.when(
                            i % 2 == 1, F.concat(w, F.lit(" "), F.col("marker"))
                        ).otherwise(w),
                    ),
                    " ",
                )
            ),
        )
        .select(
            F.col("new_id").alias("doc_id"),
            "text",
            "lang",
            "source",
            F.length("text").alias("n_chars"),
        )
    )
    reps.write.mode("overwrite").parquet(f"{work}/{out_name}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work-dir", default="/tmp/curation_scale")
    ap.add_argument(
        "--staged",
        action="store_true",
        help="run curate_corpus_staged (durable parquet stage boundaries) "
        "instead of the in-memory flow.  At ~10M docs on ONE box the "
        "in-memory flow needs >80 GB of SIMULTANEOUS transient storage "
        "(every stage boundary's spilled persist + every shuffle stays "
        "referenced until the single final action), which exceeds the "
        "sandbox disk — measured, see BENCH/BASELINE.md round 4.  The "
        "staged flow is the designed at-scale mode: each boundary commits "
        "to compressed parquet, stage pins release, upstream lineage (and "
        "its shuffle files) becomes collectable between stages.",
    )
    ap.add_argument(
        "--classifier-min",
        type=float,
        default=None,
        help="enable the optional linear-classifier quality stage at this "
        "threshold (r5 stage; map-side md5-uniform weights — adds one "
        "explode + one per-doc aggregate to 'filtered')",
    )
    ap.add_argument(
        "--substring-n",
        type=int,
        default=None,
        help="enable the optional exact-substring span-removal stage at this "
        "word-n-gram length (r5 stage; corpus-wide gram frequency window + "
        "per-doc rebuild — the heaviest new stage, scale-proved here)",
    )
    ap.add_argument(
        "--gopher-min-words", type=int, default=None,
        help="enable the Gopher doc-quality stage (r6; map-only, probes "
        "the synthetic corpus's own function words)",
    )
    ap.add_argument(
        "--line-dedup", action="store_true",
        help="enable the CCNet corpus-wide line-dedup stage (r6)",
    )
    ap.add_argument(
        "--source-token-budget", type=int, default=None,
        help="enable the exact per-source char-budget stage (r6)",
    )
    ap.add_argument(
        "--ingest-dedup", action="store_true",
        help="enable the Bloom ingest-dedup stage 0a (r6): synthesizes an "
        "EQUAL-SIZED standing corpus (disjoint rep range) — the input's "
        "verbatim rows (~2%%: (doc_id+rep)%%50==0 keep the base text) "
        "match the standing corpus's verbatim rows and must be dropped "
        "before any other stage.  Equal-sized standing is the operator's "
        "regime: a broadcastable standing key set would just anti-join",
    )
    args = ap.parse_args()

    # Memory discipline for the 10M-doc run, learned from an OOM-killed
    # first attempt (kernel global OOM at 54 GB JVM RSS): a 48g driver heap
    # fills with the pinned stage boundaries, the tmpfs shuffle dir
    # (/dev/shm) claims host RAM on top, and 32 Python workers add ~20 GB —
    # together past the 125 GB box.  The real-cluster discipline is a
    # BOUNDED heap that spills persist/shuffle blocks to executor-local
    # DISK, so this run pins the heap at 24g and points the local dir at
    # real disk.  (The small-SF benches keep tmpfs — that trade is
    # documented in session.get_spark.)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/tmp/spark-local-big")
    os.makedirs(os.environ["SPARK_LOCAL_DIRS"], exist_ok=True)

    from py_evalfilter_spark.pinning import PinScope
    from py_evalfilter_spark.plans import curation
    from py_evalfilter_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]", shuffle_partitions=2 * args.cpus)

    work = args.work_dir
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    # --- synthesis -------------------------------------------------------
    t0 = time.monotonic()
    n_base = spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()
    synthesize_replicated_corpus(spark, args.sf_dir, work, args.mult, 4 * args.cpus)
    n_total = spark.read.parquet(f"{work}/documents.parquet").count()
    if args.ingest_dedup:
        # standing corpus synthesized OUTSIDE the timed curation section
        synthesize_replicated_corpus(
            spark, args.sf_dir, work, args.mult, 4 * args.cpus,
            rep_lo=args.mult, out_name="standing.parquet",
        )
    synth_sec = time.monotonic() - t0

    # --- curation --------------------------------------------------------
    t1 = time.monotonic()
    if args.staged:
        # every staged boundary is fully WRITTEN to parquet inside
        # run_stage, so nothing is prunable; the final re-read count is a
        # trivial footer scan
        staged_kw = {}
        if args.gopher_min_words is not None:
            staged_kw.update(
                gopher_min_words=args.gopher_min_words,
                gopher_stopwords=("the", "a", "table", "value", "row", "scan"),
            )
        if args.line_dedup:
            staged_kw["line_dedup"] = True
        if args.source_token_budget is not None:
            staged_kw["source_token_budget"] = args.source_token_budget
        if args.ingest_dedup:
            staged_kw["standing_path"] = f"{work}/standing.parquet"
        packed, manifests = curation.curate_corpus_staged(
            spark, work, f"{work}/stages", budget=256,
            classifier_min=args.classifier_min, substring_n=args.substring_n,
            **staged_kw,
        )
        n_packed = packed.count()
        counts = {name: m.get("rows") for name, m in manifests.items()}
        stage_walls = {
            name: m.get("wall_ms") for name, m in manifests.items()
        }
    else:
        stage_walls = None
        r6_kw = {}
        if args.gopher_min_words is not None:
            r6_kw.update(
                gopher_min_words=args.gopher_min_words,
                gopher_stopwords=("the", "a", "table", "value", "row", "scan"),
            )
        if args.line_dedup:
            r6_kw["line_dedup"] = True
        if args.source_token_budget is not None:
            r6_kw["source_token_budget"] = args.source_token_budget
        if args.ingest_dedup:
            r6_kw["standing"] = spark.read.parquet(f"{work}/standing.parquet")
            r6_kw["standing_count"] = n_total
        obs: dict = {}
        with PinScope() as pins:
            out = curation.curate_corpus(
                spark, work, budget=256, observations=obs, pins=pins,
                classifier_min=args.classifier_min, substring_n=args.substring_n,
                **r6_kw,
            )
            n_packed = int(out.selectExpr(*CONSUME_PACKED).collect()[0]["n"])
            counts = {}
            for k, o in obs.items():
                # Observation.get occasionally loses its metrics row on
                # multi-minute runs (toPyRow assertion); a stage count is
                # diagnostics, not the measurement — never let it kill the
                # timed run that already completed
                try:
                    counts[k] = int(o.get["rows"])
                except Exception:
                    counts[k] = None
    curate_sec = time.monotonic() - t1

    py_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        json.dumps(
            {
                "metric": "curation_10M_docs",
                "mode": "staged" if args.staged else "in_memory",
                "classifier_min": args.classifier_min,
                "substring_n": args.substring_n,
                "gopher_min_words": args.gopher_min_words,
                "line_dedup": args.line_dedup,
                "source_token_budget": args.source_token_budget,
                "ingest_dedup": args.ingest_dedup,
                "mult": args.mult,
                "n_base": n_base,
                "n_docs": n_total,
                "synth_sec": round(synth_sec, 1),
                "curate_sec": round(curate_sec, 1),
                "docs_per_sec": round(n_total / curate_sec, 1),
                "n_packed_rows": n_packed,
                "stage_counts": counts,
                "stage_wall_ms": stage_walls,
                "jvm_peak_rss_gb": jvm_peak_rss_gb(),
                "python_peak_rss_gb": round(py_rss_gb, 2),
                "cpus": args.cpus,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
