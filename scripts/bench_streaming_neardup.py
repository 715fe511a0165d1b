"""Streaming MinHash near-dup at ~1M docs (SURVEY.md §2.9 at scale): drive
the replicated-document corpus (bench_curation_scale synthesis — same
controlled dup structure as the batch scale runs) through
streaming_minhash_candidates as a file-source stream in bounded
micro-batches, Trigger.AvailableNow, memory sink.

What this measures that the batch runs don't: the stateful path —
applyInPandasWithState carrying per-(band, bucket) signature state across
micro-batches — at a corpus size where state discipline matters
(16 bands × 1M docs = 16M state entries if nothing bounded them; the
FIFO max_bucket_size cap and the banding's occupancy spread are what keep
the state-store rows proportional to docs, not docs²).

    python scripts/bench_streaming_neardup.py [--mult 200] [--batches 8]

One JSON line: wall, docs/s, candidate rows, distinct pairs, micro-batch
count, peak state rows.  Never run concurrently with another Spark job.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=200)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work-dir", default="/tmp/streaming_neardup_bench")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/tmp/spark-local-big")
    os.makedirs(os.environ["SPARK_LOCAL_DIRS"], exist_ok=True)

    from bench_curation_scale import synthesize_replicated_corpus
    from py_evalfilter_spark.session import get_spark
    from py_evalfilter_spark.streaming import neardup

    spark = get_spark(master=f"local[{args.cpus}]", shuffle_partitions=2 * args.cpus)
    work = args.work_dir
    src = f"{work}/documents.parquet"
    if not os.path.exists(src):
        os.makedirs(work, exist_ok=True)
        synthesize_replicated_corpus(
            spark, args.sf_dir, work, args.mult, 4 * args.cpus
        )
    n_docs = spark.read.parquet(src).count()
    files = glob.glob(f"{src}/part-*")
    per_trigger = max(1, len(files) // args.batches)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", per_trigger)
        .parquet(src)
    )
    cands = neardup.streaming_minhash_candidates(stream, unit="word")

    # fresh checkpoint per run: a surviving ckpt dir from a previous
    # invocation has all source offsets committed, so the stream would
    # process ZERO rows and report a near-zero wall as if it were a real
    # measurement (ADVICE r5) — the memory sink is recreated empty either
    # way, so there is nothing to resume.
    ckpt = f"{work}/ckpt_{int(os.environ.get('BENCH_RUN', 0))}"
    shutil.rmtree(ckpt, ignore_errors=True)
    t0 = time.perf_counter()
    q = (
        cands.writeStream.format("memory")
        .queryName("neardup_scale")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0

    n_batches = 0
    peak_state = 0
    for p in q.recentProgress:
        if p is None:
            continue
        n_batches += 1
        for so in p.get("stateOperators", []):
            peak_state = max(peak_state, so.get("numRowsTotal", 0))
    out = spark.sql(
        "SELECT COUNT(*) AS rows, COUNT(DISTINCT struct(doc_id, dup_id)) AS pairs "
        "FROM neardup_scale"
    ).collect()[0]
    print(
        json.dumps(
            {
                "metric": "streaming_neardup_1M",
                "n_docs": n_docs,
                "wall_sec": round(wall, 1),
                "docs_per_sec": round(n_docs / wall, 1),
                "candidate_rows": out["rows"],
                "distinct_pairs": out["pairs"],
                "micro_batches": n_batches,
                "peak_state_rows": peak_state,
                "files_per_trigger": per_trigger,
                "cpus": args.cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
