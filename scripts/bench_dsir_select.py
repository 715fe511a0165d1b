#!/usr/bin/env python
"""DSIR selection at scale (VERDICT r4 #2's bench row): time the
distributed threshold-select picking the top 10% of N weighted docs, and
contrast with the old global-sort path at the smaller N to show why it
was replaced.

Weights are synthesized directly (md5-uniform — the weighting itself is
benched in the per-query suite; THIS measures the selection), so N scales
to 100M rows in-memory without a text corpus.

    python scripts/bench_dsir_select.py [--ns 10000000,100000000]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="10000000,100000000")
    ap.add_argument("--frac", type=float, default=0.1)
    ap.add_argument("--old-path-max-n", type=int, default=10_000_000)
    args = ap.parse_args()

    from py_evalfilter_spark.functions import dsir
    from py_evalfilter_spark.pinning import PinScope
    from py_evalfilter_spark.session import get_spark

    spark = get_spark(shuffle_partitions=64)
    for n in [int(x) for x in args.ns.split(",")]:
        k = int(n * args.frac)
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (
                F.pmod(
                    F.conv(
                        F.substring(F.md5(F.concat_ws(":", "id", F.lit("w"))), 1, 8),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(_M),
                )
                / F.lit(float(_M))
                * 8.0
                - 4.0
            ).alias("dsir_logw"),
        )
        with PinScope() as pins:
            t0 = time.perf_counter()
            out = dsir.dsir_resample(df, k=k, pins=pins)
            n_sel = out.count()
            new_sec = round(time.perf_counter() - t0, 2)
        assert n_sel == k, (n_sel, k)
        row = {
            "n": n,
            "k": k,
            "threshold_select_sec": new_sec,
            "rows_per_sec": round(n / new_sec, 1),
        }
        if n <= args.old_path_max_n:
            ranked = df.withColumn(
                "_gkey", dsir.gumbel_key("dsir_logw", "doc_id", 42)
            )
            t0 = time.perf_counter()
            old = (
                ranked.orderBy(F.col("_gkey").desc(), "doc_id").limit(k).drop("_gkey")
            )
            assert old.count() == k
            row["global_sort_limit_sec"] = round(time.perf_counter() - t0, 2)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
