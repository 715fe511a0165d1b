"""Streaming MinHash near-dup in its INTENDED regime (VERDICT r5 #4):
small arriving deltas against ~1M docs of standing state.

The r5 bulk-backfill bench (bench_streaming_neardup.py) measured the
worst case for this operator — every micro-batch is 125k docs and, with
group coalescing, round-trips most of the accumulated state through
Python.  Real deployments backfill ONCE and then process small deltas
against standing state; this bench measures that: build state from the
full replicated corpus, then restart the SAME checkpoint with 8 delta
files (10k new docs each, maxFilesPerTrigger=1 → one micro-batch per
delta) and record per-batch wall, state churn (numRowsUpdated), and
candidate output.  Finally a batch re-run over standing ∪ deltas proves
candidate parity: every batch-verified near-dup pair touching a delta
doc must have been emitted by the stream.

Delta synthesis reuses synthesize_replicated_corpus with a disjoint
replica range, so arriving docs have the same dup structure as the
standing corpus (2% land verbatim in existing exact-dup clusters — those
are the true positives the state must catch).

The group_coalesce trade this quantifies (streaming/neardup.py): coalesced
groups amortize per-group Python overhead for BULK batches but make a
small delta round-trip ~every group's standing state; uncoalesced
(None) groups are near-singleton, so a delta touches only its own
buckets' state — churn proportional to the delta, not the corpus.

    python scripts/bench_streaming_delta.py [--group-coalesce 8192|none]

One JSON line.  Never run concurrently with another Spark workload.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def run_available_now(cands, out_dir: str, ckpt: str):
    """Start → drain → terminate one Trigger.AvailableNow pass; return
    (wall_sec, per-micro-batch progress dicts).  Parquet sink, NOT memory:
    the memory sink refuses checkpoint recovery, and resuming the standing
    state across the backfill→delta restart is the whole point here."""
    t0 = time.perf_counter()
    q = (
        cands.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    prog = []
    for p in q.recentProgress:
        if p is None or p.get("numInputRows", 0) == 0:
            continue
        so = (p.get("stateOperators") or [{}])[0]
        prog.append(
            {
                "input_rows": p["numInputRows"],
                "batch_sec": round(
                    p.get("durationMs", {}).get("triggerExecution", 0) / 1000.0, 2
                ),
                "state_rows_total": so.get("numRowsTotal", 0),
                "state_rows_updated": so.get("numRowsUpdated", 0),
            }
        )
    return wall, prog


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=200)
    ap.add_argument("--delta-batches", type=int, default=8)
    ap.add_argument("--delta-reps", type=int, default=2,
                    help="replicas per base doc per delta batch (2 → 10k docs)")
    ap.add_argument("--group-coalesce", default="8192",
                    help="'none' or an int — must match between backfill "
                    "and delta phases (the state grouping key)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work-dir", default="/tmp/streaming_delta_bench")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--keep-work", action="store_true",
                    help="keep the work dir (checkpoint state can be tens "
                    "of GB; default removes it once metrics are collected)")
    args = ap.parse_args()
    coalesce = None if args.group_coalesce.lower() == "none" else int(args.group_coalesce)

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/tmp/spark-local-big")
    os.makedirs(os.environ["SPARK_LOCAL_DIRS"], exist_ok=True)

    from bench_curation_scale import synthesize_replicated_corpus
    from pyspark.sql import functions as F

    from py_evalfilter_spark.operators import dedup
    from py_evalfilter_spark.session import get_spark
    from py_evalfilter_spark.streaming import neardup

    spark = get_spark(master=f"local[{args.cpus}]", shuffle_partitions=2 * args.cpus)
    # the HDFS state store retains minBatchesToRetain versions of every
    # partition's state (default 100): with coalesced groups one version is
    # ~entries·sig_bytes ≈ 9 GB at 1M docs, and the first run of this bench
    # filled the disk with 39 GB of retained deltas.  2 is the minimum that
    # still allows a restart from the previous batch.
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
    work = f"{args.work_dir}_{args.group_coalesce}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    # --- corpora: standing (reps 0..mult) + deltas (disjoint rep ranges) --
    t0 = time.perf_counter()
    synthesize_replicated_corpus(spark, args.sf_dir, work, args.mult, 4 * args.cpus)
    src = f"{work}/src"
    os.makedirs(src, exist_ok=True)
    for i, f in enumerate(glob.glob(f"{work}/documents.parquet/part-*")):
        os.link(f, f"{src}/standing_{i:04d}.parquet")
    for b in range(args.delta_batches):
        synthesize_replicated_corpus(
            spark, args.sf_dir, work, args.delta_reps, args.cpus,
            rep_lo=args.mult + b * args.delta_reps, out_name=f"delta_{b}.parquet",
        )
        # one FILE per delta → maxFilesPerTrigger=1 gives one micro-batch
        # per delta; stage outside src until the backfill has committed
        spark.read.parquet(f"{work}/delta_{b}.parquet").coalesce(1).write.parquet(
            f"{work}/delta1_{b}"
        )
        os.link(
            glob.glob(f"{work}/delta1_{b}/part-*")[0],
            f"{work}/staged_delta_{b}.parquet",
        )
    synth_sec = time.perf_counter() - t0
    n_standing = spark.read.parquet(f"{work}/documents.parquet").count()
    schema = spark.read.parquet(f"{work}/documents.parquet").schema

    def restart(max_files: int):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files)
            .parquet(src)
        )
        cands = neardup.streaming_minhash_candidates(
            stream, unit="word", group_coalesce=coalesce
        )
        return run_available_now(cands, f"{work}/out", f"{work}/ckpt")

    # --- phase 1: bulk backfill builds the standing state -----------------
    # ONE availableNow batch: the bulk regime is bench_streaming_neardup's
    # subject; here the backfill exists only to build state, and each extra
    # micro-batch re-writes the full coalesced state to the checkpoint
    n_files = len(glob.glob(f"{src}/standing_*"))
    backfill_wall, backfill_prog = restart(n_files)
    ckpt_bytes_backfill = _du(f"{work}/ckpt")

    # --- phase 2: deltas arrive; SAME checkpoint resumes the state --------
    delta_ids = []
    for b in range(args.delta_batches):
        os.link(f"{work}/staged_delta_{b}.parquet", f"{src}/zdelta_{b}.parquet")
        delta_ids.append(f"{work}/delta_{b}.parquet")
    n_delta = spark.read.parquet(*delta_ids).count()
    delta_wall, delta_prog = restart(1)
    ckpt_bytes_delta = _du(f"{work}/ckpt")

    batch_secs = [p["batch_sec"] for p in delta_prog]
    churn = [p["state_rows_updated"] for p in delta_prog]
    # delta-phase candidates = pairs touching a delta id (standing-phase
    # output cannot contain one: a doc only emits on arrival, and delta ids
    # start at rep=mult → id ≥ mult·10M, above every standing id)
    delta_lim = args.mult * 10_000_000
    emitted = spark.read.parquet(f"{work}/out")
    delta_emitted = emitted.filter(
        (F.col("doc_id") >= delta_lim) | (F.col("dup_id") >= delta_lim)
    )
    out = delta_emitted.agg(
        F.count("*").alias("rows"),
        F.count_distinct(F.struct("doc_id", "dup_id")).alias("pairs"),
    ).collect()[0]

    # --- phase 3: candidate parity vs a full batch re-run ------------------
    t0 = time.perf_counter()
    full = spark.read.parquet(src)
    deltas = spark.read.parquet(*delta_ids).select("doc_id")
    batch_pairs = dedup.minhash_lsh_pairs(full, "doc_id", "text", unit="word")
    # OR-condition semi joins don't hash-join — split into two equi
    # semi-joins (both broadcast the small delta-id side) and union
    pairs_only = batch_pairs.select("doc_id", "dup_id")
    touching = (
        pairs_only.join(
            F.broadcast(deltas), pairs_only.doc_id == deltas.doc_id, "left_semi"
        )
        .union(
            pairs_only.join(
                F.broadcast(deltas), pairs_only.dup_id == deltas.doc_id, "left_semi"
            )
        )
        .distinct()
    )
    streamed = delta_emitted.select("doc_id", "dup_id").distinct()
    n_batch_touching = touching.count()
    n_missed = touching.join(streamed, ["doc_id", "dup_id"], "left_anti").count()
    batch_rerun_sec = time.perf_counter() - t0

    if not args.keep_work:
        shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "streaming_neardup_delta_regime",
                "group_coalesce": coalesce,
                "n_standing": n_standing,
                "n_delta": n_delta,
                "delta_batches": len(delta_prog),
                "synth_sec": round(synth_sec, 1),
                "backfill_sec": round(backfill_wall, 1),
                "delta_phase_sec": round(delta_wall, 1),
                "delta_batch_secs": batch_secs,
                "delta_docs_per_sec": round(
                    n_delta / max(sum(batch_secs), 1e-9), 1
                ),
                "state_rows_updated_per_batch": churn,
                "state_rows_total": delta_prog[-1]["state_rows_total"]
                if delta_prog
                else 0,
                "delta_candidate_rows": out["rows"],
                "delta_distinct_pairs": out["pairs"],
                "batch_pairs_touching_delta": n_batch_touching,
                "batch_pairs_missed_by_stream": n_missed,
                "batch_rerun_sec": round(batch_rerun_sec, 1),
                "ckpt_bytes_after_backfill": ckpt_bytes_backfill,
                "ckpt_bytes_after_deltas": ckpt_bytes_delta,
                "cpus": args.cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
