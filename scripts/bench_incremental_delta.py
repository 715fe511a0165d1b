"""Incremental MinHash-LSH in the delta regime — the batch counterpart of
scripts/bench_streaming_delta.py, on the SAME synthesized corpus and LSH
parameters, so the three delta-regime strategies compare directly:

  1. streaming applyInPandasWithState (bench_streaming_delta.py),
  2. full batch re-run over standing ∪ deltas (that bench's parity stage),
  3. THIS: minhash_lsh_pairs_incremental per arriving shard, with the
     standing signature table persisted once and appended per shard (the
     amortized daily-pipeline mode, `old_sigs`).

Phases:
  A. synthesize standing (mult reps) + delta shards (disjoint rep ranges);
  B. ONE signature pass over the standing corpus, persisted to parquet —
     the analogue of the streaming backfill;
  C. per shard b: dedup shard_b against standing ∪ shards[<b] using the
     persisted signature store, write verified pairs, append shard_b's
     signatures to the store — each shard timed end-to-end (cold plans,
     no cross-shard caching);
  D. parity: a full minhash_lsh_pairs re-run over everything, filtered to
     pairs touching a delta id, must equal the union of per-shard outputs
     exactly (both sides are exact-verified at the same threshold).

Unlike the streaming operator (which emits unverified candidate pairs),
the incremental operator emits exact-Jaccard-verified pairs — it does
strictly MORE work per shard than the stream's state lookup.

    python scripts/bench_incremental_delta.py

One JSON line.  Never run concurrently with another Spark workload.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=200)
    ap.add_argument("--delta-batches", type=int, default=8)
    ap.add_argument("--delta-reps", type=int, default=2,
                    help="replicas per base doc per delta shard (2 -> 10k docs)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work-dir", default="/tmp/incremental_delta_bench")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--no-parity", action="store_true",
                    help="skip phase D (the full batch re-run) — for "
                    "standing-size scaling runs where pair parity is "
                    "already proven at the base size and the batch re-run "
                    "would dominate the wall")
    ap.add_argument("--layout", choices=["parquet", "banded"], default="parquet",
                    help="standing-store layout: 'parquet' = flat signature "
                    "parquet, re-banded per shard (the r6 baseline); "
                    "'banded' = write_neardup_store's pre-banded "
                    "(band,bucket)-bucketed catalog tables + touched-bucket "
                    "prune (the cluster layout)")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/tmp/spark-local-big")
    os.makedirs(os.environ["SPARK_LOCAL_DIRS"], exist_ok=True)

    from bench_curation_scale import synthesize_replicated_corpus
    from pyspark.sql import functions as F

    from py_evalfilter_spark.operators import dedup
    from py_evalfilter_spark.pinning import PinScope
    from py_evalfilter_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]", shuffle_partitions=2 * args.cpus)
    work = args.work_dir
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    # --- A: corpora (identical generator + rep ranges to the stream bench)
    t0 = time.perf_counter()
    synthesize_replicated_corpus(spark, args.sf_dir, work, args.mult, 4 * args.cpus)
    for b in range(args.delta_batches):
        synthesize_replicated_corpus(
            spark, args.sf_dir, work, args.delta_reps, args.cpus,
            rep_lo=args.mult + b * args.delta_reps, out_name=f"delta_{b}.parquet",
        )
    synth_sec = time.perf_counter() - t0
    standing = spark.read.parquet(f"{work}/documents.parquet").select(
        "doc_id", "text"
    )
    n_standing = standing.count()
    deltas = [
        spark.read.parquet(f"{work}/delta_{b}.parquet").select("doc_id", "text")
        for b in range(args.delta_batches)
    ]
    n_delta = sum(d.count() for d in deltas)

    # --- B: one-time standing signature store (the "backfill") ------------
    import uuid

    sig_store = f"{work}/sig_store.parquet"
    store_tbl = f"nd_bench_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    if args.layout == "banded":
        dedup.write_neardup_store(
            dedup.minhash_signatures(standing, "doc_id", "text", unit="word"),
            store_tbl, n_buckets=args.cpus, path=f"{work}/nd_store",
        )
    else:
        dedup.minhash_signatures(
            standing, "doc_id", "text", unit="word"
        ).write.parquet(sig_store)
    backfill_sec = time.perf_counter() - t0

    # --- C: per-shard incremental dedup against the growing store ---------
    shard_secs: list[float] = []
    shard_pairs: list[int] = []
    old_texts = standing
    for b, shard in enumerate(deltas):
        t0 = time.perf_counter()
        with PinScope() as pins:
            if args.layout == "banded":
                s_sigs, s_banded = dedup.read_neardup_store(spark, store_tbl)
                pairs = dedup.minhash_lsh_pairs_incremental(
                    shard, old_texts, "doc_id", "text", unit="word",
                    old_sigs=s_sigs, old_banded=s_banded, pins=pins,
                )
            else:
                pairs = dedup.minhash_lsh_pairs_incremental(
                    shard, old_texts, "doc_id", "text", unit="word",
                    old_sigs=spark.read.parquet(sig_store), pins=pins,
                )
            pairs.write.parquet(f"{work}/pairs_{b}.parquet")
        # append the shard's signatures to the store (part of the shard's
        # cost: the NEXT shard's standing corpus includes this one)
        if args.layout == "banded":
            dedup.append_neardup_store(
                dedup.minhash_signatures(shard, "doc_id", "text", unit="word"),
                store_tbl, n_buckets=args.cpus,
            )
            spark.catalog.refreshTable(f"{store_tbl}_sigs")
            spark.catalog.refreshTable(f"{store_tbl}_banded")
        else:
            dedup.minhash_signatures(
                shard, "doc_id", "text", unit="word"
            ).write.mode("append").parquet(sig_store)
        shard_secs.append(round(time.perf_counter() - t0, 2))
        shard_pairs.append(
            spark.read.parquet(f"{work}/pairs_{b}.parquet").count()
        )
        old_texts = old_texts.unionByName(shard)

    # --- D: parity vs the full batch operator ------------------------------
    if args.no_parity:
        shutil.rmtree(work, ignore_errors=True)
        print(
            json.dumps(
                {
                    "metric": "incremental_lsh_delta_regime",
                    "layout": args.layout,
                    "n_standing": n_standing,
                    "n_delta": n_delta,
                    "delta_batches": args.delta_batches,
                    "synth_sec": round(synth_sec, 1),
                    "sig_backfill_sec": round(backfill_sec, 1),
                    "shard_secs": shard_secs,
                    "delta_docs_per_sec": round(
                        n_delta / max(sum(shard_secs), 1e-9), 1
                    ),
                    "shard_pairs": shard_pairs,
                    "parity": "skipped (--no-parity)",
                    "cpus": args.cpus,
                }
            )
        )
        return
    t0 = time.perf_counter()
    full = standing
    for d in deltas:
        full = full.unionByName(d)
    delta_ids = deltas[0]
    for d in deltas[1:]:
        delta_ids = delta_ids.unionByName(d)
    delta_ids = delta_ids.select("doc_id")
    batch_pairs = dedup.minhash_lsh_pairs(full, "doc_id", "text", unit="word")
    po = batch_pairs.select("doc_id", "dup_id")
    touching = (
        po.join(F.broadcast(delta_ids), po.doc_id == delta_ids.doc_id, "left_semi")
        .union(
            po.join(
                F.broadcast(delta_ids), po.dup_id == delta_ids.doc_id, "left_semi"
            )
        )
        .distinct()
    )
    incr = spark.read.parquet(f"{work}/pairs_*.parquet").select(
        "doc_id", "dup_id"
    ).distinct()
    n_batch_touching = touching.count()
    n_incr = incr.count()
    n_missed = touching.join(incr, ["doc_id", "dup_id"], "left_anti").count()
    n_extra = incr.join(touching, ["doc_id", "dup_id"], "left_anti").count()
    batch_rerun_sec = time.perf_counter() - t0

    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "incremental_lsh_delta_regime",
                "layout": args.layout,
                "n_standing": n_standing,
                "n_delta": n_delta,
                "delta_batches": args.delta_batches,
                "synth_sec": round(synth_sec, 1),
                "sig_backfill_sec": round(backfill_sec, 1),
                "shard_secs": shard_secs,
                "delta_docs_per_sec": round(n_delta / max(sum(shard_secs), 1e-9), 1),
                "shard_pairs": shard_pairs,
                "incremental_pairs_total": n_incr,
                "batch_pairs_touching_delta": n_batch_touching,
                "pairs_missed_vs_batch": n_missed,
                "pairs_extra_vs_batch": n_extra,
                "batch_rerun_sec": round(batch_rerun_sec, 1),
                "cpus": args.cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
