#!/usr/bin/env python
"""Round-8 session-2: stage dissection of dedup_incremental at driver scale
(sf1.0 clone).  Noop-sink isolation per guide §1.4."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from py_evalfilter_spark.operators import dedup  # noqa: E402
from py_evalfilter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sfgen/sf1.0")


def t(label, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(f"{label}: {best:.2f}s", file=sys.stderr)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="dissect_inc")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
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

    sigs_old = dedup.minhash_signatures(docs, "doc_id", "text", 3, 64)
    t("signatures(old, 50k docs)", lambda: noop(sigs_old))
    sigs_new = dedup.minhash_signatures(shard, "doc_id", "text", 3, 64)
    t("signatures(new, 2.7k docs)", lambda: noop(sigs_new))

    r = 64 // 16
    banded_all_s = (
        dedup.band_buckets(sigs_new, 16, r, keep_signature=True)
        .withColumn("_new", F.lit(True))
        .unionByName(
            dedup.band_buckets(sigs_old, 16, r, keep_signature=True)
            .withColumn("_new", F.lit(False))
        )
    )
    t("banding only (noop, incl. both sig passes)", lambda: noop(banded_all_s))

    from pyspark.sql import types as T
    cands_nodist = dedup._est_passing_pairs(
        banded_all_s, 64, 0.8 - 0.15, T.LongType()
    )
    # _est_passing_pairs ends in .distinct(); time the full cands
    t("cands = kernel + distinct", lambda: noop(cands_nodist))

    full = dedup.minhash_lsh_pairs_incremental(
        shard, docs, "doc_id", "text", n=3, num_perm=64, bands=16,
        threshold=0.8,
    )
    t("FULL operator (adds est-join? no — verify join + UDF)",
      lambda: noop(full))

    import bench
    def run():
        spark.catalog.clearCache()
        bench.benched_df(spark, "dedup_incremental", SF_DIR).collect()
    t("benched query", run)


if __name__ == "__main__":
    main()
