"""Terminal shard-write stage wall at 10M docs (VERDICT r6 #6): the
shard_corpus docstring's claimed realization — repartition(n_shards,
"shard") + sortWithinPartitions + partitionBy("shard") → one ORDERED
parquet file per training shard — measured at scale, with the re-read
order property spot-verified on a sample of shards.

The input is a synthesized packed-corpus table (the sharded stage is
independent of how `packed` was produced); doc_id values are sparse and
shuffled-looking so the md5 shard assignment does real work.

    python scripts/bench_shard_write.py [--rows 10000000] [--n-shards 64]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--check-shards", type=int, default=4)
    ap.add_argument("--work-dir", default="/tmp/shard_write")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/tmp/spark-local-big")
    os.makedirs(os.environ["SPARK_LOCAL_DIRS"], exist_ok=True)

    from pyspark.sql import functions as F

    from py_evalfilter_spark.operators import corpus as corpus_ops
    from py_evalfilter_spark.session import get_spark
    from py_evalfilter_spark.sources import tables

    spark = get_spark()
    work = args.work_dir
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    n, n_shards = args.rows, args.n_shards
    # packed-corpus shape: sparse ids, a source column, ~100-char text,
    # pack assignment columns — what plans/curation.py's packed stage emits
    packed = (
        spark.range(0, n, 1, 256)
        .select(
            (F.col("id") * 7 + 13).alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 20).cast("string"))
            .alias("source"),
            F.concat(F.lit("document body "),
                     F.md5(F.col("id").cast("string")),
                     F.lit(" "),
                     F.md5((F.col("id") + 1).cast("string"))).alias("text"),
            (F.col("id") % 97 + 3).alias("n_tokens"),
            (F.col("id") % 1000).alias("pack_id"),
        )
    )
    pp = f"{work}/packed.parquet"
    t0 = time.perf_counter()
    packed.write.mode("overwrite").parquet(pp)
    synth_sec = round(time.perf_counter() - t0, 2)
    packed = spark.read.parquet(pp)

    def build():
        return (
            corpus_ops.shard_corpus(packed, n_shards)
            .repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "pos")
        )

    t0 = time.perf_counter()
    m = tables.write_stage(build(), f"{work}/sharded", "sharded",
                           config={"n_shards": n_shards},
                           partition_by=["shard"])
    stage_sec = round(time.perf_counter() - t0, 2)

    shards: dict[int, int] = {}
    files: dict[int, int] = {}
    for p in m["partitions"]:
        k = int(p["file"].split("/", 1)[0].split("=", 1)[1])
        shards[k] = shards.get(k, 0) + p["rows"]
        files[k] = files.get(k, 0) + 1
    assert sum(shards.values()) == n and len(shards) == n_shards
    one_file_per_shard = all(v == 1 for v in files.values())

    # re-read order: pos must be 0..n_k-1 in FILE order, no sort applied
    order_ok = True
    step = max(n_shards // args.check_shards, 1)
    for k in list(range(0, n_shards, step))[: args.check_shards]:
        got = [r["pos"] for r in spark.read.parquet(
            f"{work}/sharded/shard={k}").select("pos").collect()]
        order_ok = order_ok and got == list(range(shards[k]))

    sizes = sorted(shards.values())
    out = {
        "metric": "shard_write_10M",
        "rows": n,
        "n_shards": n_shards,
        "synth_sec": synth_sec,
        "stage_wall_sec": stage_sec,
        "docs_per_sec": round(n / stage_sec, 1),
        "one_file_per_shard": one_file_per_shard,
        "reread_order_ok": order_ok,
        "shard_rows_min": sizes[0],
        "shard_rows_max": sizes[-1],
        "skew_pct": round((sizes[-1] / (n / n_shards) - 1) * 100, 2),
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
