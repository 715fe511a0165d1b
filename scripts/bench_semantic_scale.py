#!/usr/bin/env python
"""k-means + SemDeDup at realistic k over >=1M synthetic embeddings
(VERDICT r4 #4 — the '10M-doc curation' treatment applied to the semantic
family): measure fit wall time per k, the centroid-collect size, the
cluster-size skew distribution, and the within-cluster pair stage's wall
and candidate mass.

Corpus: n docs, dim-d embeddings around C true centers (md5-uniform
deterministic — no RNG state), plus `n_dups` injected near-duplicates
(1e-4 perturbation of existing vectors) that semdedup must find.

    python scripts/bench_semantic_scale.py [--n 1000000] [--ks 64,256]

Prints ONE JSON line per k plus a summary line.  Serialized: run nothing
else Spark-side concurrently (CLAUDE.md).
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

_M = 1_000_003


def _u(col):
    """md5-uniform in [-0.5, 0.5) of a string column expression."""
    return (
        F.pmod(F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"), F.lit(_M))
        / F.lit(float(_M))
        - 0.5
    )


def synthesize(spark, n: int, dim: int, centers: int, n_dups: int, parts: int):
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.round(
                _u(F.concat_ws(":", F.lit("c"), F.pmod("id", F.lit(centers)), j))
                + 0.05 * _u(F.concat_ws(":", F.lit("v"), F.col("id"), j)),
                6,
            ),
        ).alias("embedding"),
    )
    dups = base.filter(F.col("vec_id") < n_dups).select(
        (F.col("vec_id") + 2 * n).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x + F.lit(1e-4)).otherwise(x)
        ).alias("embedding"),
    )
    return base.unionByName(dups).repartition(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--centers", type=int, default=128)
    ap.add_argument("--n-dups", type=int, default=500)
    ap.add_argument("--ks", default="64,256,1024")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--threshold", type=float, default=0.999)
    ap.add_argument("--max-cluster-size", type=int, default=100_000)
    ap.add_argument(
        "--max-pairs",
        type=int,
        default=2_000_000_000,
        help="semdedup max_candidate_mass budget: the pairs stage is "
        "SKIPPED (and recorded as infeasible) when its predicted candidate "
        "count exceeds this",
    )
    ap.add_argument(
        "--multi-assigns",
        default="1",
        help="comma list of semdedup multi_assign values to run per k "
        "(VERDICT r5 #8: '1,2' quantifies cross-cluster recall recovered "
        "by top-2 centroid entry vs the extra candidate mass it costs)",
    )
    ap.add_argument("--work-dir", default="/tmp/semantic_scale")
    args = ap.parse_args()

    from py_evalfilter_spark.operators import clustering
    from py_evalfilter_spark.pinning import PinScope
    from py_evalfilter_spark.session import get_spark

    spark = get_spark(shuffle_partitions=64)
    parts = spark.sparkContext.defaultParallelism * 2
    src = f"{args.work_dir}/emb_{args.n}"
    if not os.path.exists(src):
        synthesize(
            spark, args.n, args.dim, args.centers, args.n_dups, parts
        ).write.mode("overwrite").parquet(src)
    emb = spark.read.parquet(src)
    n_total = emb.count()

    results = []
    for k in [int(x) for x in args.ks.split(",")]:
        t0 = time.perf_counter()
        cents = clustering.kmeans_fit(emb, k=k, iters=args.iters, seed=42)
        fit_sec = round(time.perf_counter() - t0, 2)

        per_m = {}
        with PinScope() as pins:
            for m in [int(x) for x in args.multi_assigns.split(",")]:
                t1 = time.perf_counter()
                n_pairs, pairs_sec, infeasible, n_injected_found = (
                    None, None, None, None,
                )
                try:
                    pairs = clustering.semdedup_pairs(
                        emb,
                        cents,
                        threshold=args.threshold,
                        pins=pins,
                        max_cluster_size=args.max_cluster_size,
                        max_candidate_mass=args.max_pairs,
                        multi_assign=m,
                    )
                    # one pass: total pairs + how many of the n_dups
                    # injected (i, i+2n) perturbation pairs were recovered
                    tot = pairs.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum(
                            F.when(
                                (F.col("dup_id") == F.col("doc_id") + 2 * args.n)
                                & (F.col("doc_id") < args.n_dups),
                                1,
                            ).otherwise(0)
                        ).alias("inj"),
                    ).collect()[0]
                    n_pairs, n_injected_found = tot["n"], int(tot["inj"] or 0)
                    pairs_sec = round(time.perf_counter() - t1, 2)
                except ValueError as e:  # candidate-mass guard fired
                    infeasible = str(e)
                per_m[m] = dict(
                    n_pairs=n_pairs,
                    pairs_sec=pairs_sec,
                    infeasible=infeasible,
                    n_injected_found=n_injected_found,
                )
                if m > 1:
                    # the extra candidate mass the top-m entry buys: Σ|b|²
                    # over the REPLICATED occupancies
                    d_ = emb.select(
                        F.col("vec_id").alias("doc_id"),
                        F.transform(
                            "embedding", lambda x: x.cast("double")
                        ).alias("vec"),
                    )
                    per_m[m]["candidate_mass"] = sum(
                        r["n"] * r["n"]
                        for r in clustering._assign_topm(d_, cents, "doc_id", m)
                        .groupBy("cluster")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .collect()
                    )
            n_pairs = per_m[min(per_m)]["n_pairs"]
            pairs_sec = per_m[min(per_m)]["pairs_sec"]
            infeasible = per_m[min(per_m)]["infeasible"]
            n_injected_found = per_m[min(per_m)]["n_injected_found"]

            sizes = sorted(
                r["n"]
                for r in clustering.assign_clusters(emb, cents)
                .groupBy("cluster")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
        qs = lambda p: sizes[min(len(sizes) - 1, int(p * len(sizes)))]
        pair_mass = sum(s * s for s in sizes)
        row = {
            "k": k,
            "n": n_total,
            "dim": args.dim,
            "iters": args.iters,
            "fit_sec": fit_sec,
            "pairs_sec": pairs_sec,
            "n_pairs": n_pairs,
            "pairs_infeasible": infeasible,
            "injected_dup_recall": None
            if n_injected_found is None
            else round(n_injected_found / max(args.n_dups, 1), 4),
            "centroid_floats": k * args.dim,
            "cluster_sizes": {
                "n_clusters": len(sizes),
                "min": sizes[0],
                "p50": qs(0.5),
                "p95": qs(0.95),
                "max": sizes[-1],
            },
            "candidate_mass": pair_mass,
        }
        if len(per_m) > 1:
            row["per_multi_assign"] = {
                str(m): v for m, v in sorted(per_m.items())
            }
        print(json.dumps(row), flush=True)
        results.append(row)

    print(
        json.dumps(
            {
                "metric": "semantic_scale",
                "n": n_total,
                "per_k": {str(r["k"]): {"fit_sec": r["fit_sec"], "pairs_sec": r["pairs_sec"]} for r in results},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
