#!/usr/bin/env python
"""ANN probing-quality at scale (VERDICT r4 #7): measured recall@k and
wall time for ann_lsh / ann_ivf probing configurations over >=1M vectors,
against the brute-force ground truth on a query sample.

The catalog gates these operators for EXACTNESS (full-probe == brute
force); this script measures the PROBING quality the exactness gate
cannot see.  Corpus: clustered synthetic embeddings (md5-uniform around C
true centers — LSH/IVF's intended regime; the sf testdata's unclustered
uniforms are the adversarial floor).

    python scripts/bench_ann_recall.py [--n 1000000] [--queries 32]

Prints one JSON line per config plus a recall table summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench_semantic_scale import synthesize  # noqa: E402 — shared corpus


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("qid", "nid").collect():
        out.setdefault(r["qid"], set()).add(r["nid"])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--centers", type=int, default=256)
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--work-dir", default="/tmp/ann_scale")
    args = ap.parse_args()

    from py_evalfilter_spark.operators import similarity
    from py_evalfilter_spark.session import get_spark

    spark = get_spark(shuffle_partitions=64)
    parts = spark.sparkContext.defaultParallelism * 2
    src = f"{args.work_dir}/emb_{args.n}_{args.centers}"
    if not os.path.exists(src):
        synthesize(spark, args.n, args.dim, args.centers, 0, parts).write.mode(
            "overwrite"
        ).parquet(src)
    emb = spark.read.parquet(src).persist()
    n_total = emb.count()
    # deterministic query sample: one per md5-shuffled id prefix
    queries = (
        emb.orderBy(F.md5(F.concat_ws(":", "vec_id", F.lit("q"))))
        .limit(args.queries)
        .persist()
    )
    queries.count()

    t0 = time.perf_counter()
    gt = topk_sets(similarity.brute_force_topk(emb, queries, k=args.k))
    brute_sec = round(time.perf_counter() - t0, 2)
    denom = sum(len(v) for v in gt.values())
    print(
        json.dumps({"config": "brute_force", "n": n_total, "wall_sec": brute_sec}),
        flush=True,
    )

    def recall(approx: dict[int, set[int]]) -> float:
        hit = sum(len(approx.get(q, set()) & s) for q, s in gt.items())
        return round(hit / denom, 4)

    table = {}
    for n_planes, n_tables in [(4, 8), (6, 8), (8, 16), (10, 16)]:
        t0 = time.perf_counter()
        got = topk_sets(
            similarity.lsh_topk(
                emb, queries, k=args.k, n_planes=n_planes, n_tables=n_tables
            )
        )
        row = {
            "config": f"lsh p{n_planes}x t{n_tables}",
            "recall": recall(got),
            "wall_sec": round(time.perf_counter() - t0, 2),
        }
        print(json.dumps(row), flush=True)
        table[row["config"]] = row["recall"]

    for n_centroids, nprobe in [(16, 4), (64, 8), (256, 16), (256, 32)]:
        t0 = time.perf_counter()
        got = topk_sets(
            similarity.ivf_topk(
                emb, queries, k=args.k, n_centroids=n_centroids, nprobe=nprobe
            )
        )
        row = {
            "config": f"ivf c{n_centroids} p{nprobe}",
            "recall": recall(got),
            "wall_sec": round(time.perf_counter() - t0, 2),
        }
        print(json.dumps(row), flush=True)
        table[row["config"]] = row["recall"]

    print(
        json.dumps(
            {
                "metric": "ann_recall_at_scale",
                "n": n_total,
                "k": args.k,
                "n_queries": args.queries,
                "brute_sec": brute_sec,
                "recall": table,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
