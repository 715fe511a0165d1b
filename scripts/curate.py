#!/usr/bin/env python
"""Corpus-curation CLI: the plans/curation.curate_corpus_staged flow as a
spark-submit job (the engine's analogue of the reference's
deduplicate_rants.py CLI, generalized to the full curation pipeline).

    spark-submit --py-files dist/py_evalfilter_spark.zip scripts/curate.py \
        <sf_dir> <out_dir> [--budget N] [--quality-min F] \
        [--minhash-threshold F] [--semantic-threshold F] [--decontam-n N]

Writes three manifest-checkpointed parquet stages under <out_dir>
(filtered / deduped / packed) — rerunning after a failure resumes from
the last committed stage — and prints one JSON line with per-stage row
counts, resume flags, and wall time.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    from pyspark.sql import SparkSession

    from py_evalfilter_spark.plans import curation

    args = sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]

    def opt(flag: str, default, cast):
        if flag in args:
            return cast(args[args.index(flag) + 1])
        return default

    budget = opt("--budget", 256, int)
    quality_min = opt("--quality-min", 0.5, float)
    minhash_threshold = opt("--minhash-threshold", 0.8, float)
    semantic_threshold = opt("--semantic-threshold", None, float)
    decontam_n = opt("--decontam-n", 6, int)

    spark = SparkSession.builder.appName("curate_corpus").getOrCreate()
    t0 = time.perf_counter()
    packed, manifests = curation.curate_corpus_staged(
        spark,
        sf_dir,
        out_dir,
        budget=budget,
        quality_min=quality_min,
        minhash_threshold=minhash_threshold,
        semantic_threshold=semantic_threshold,
        decontam_n=decontam_n,
    )
    n = packed.count()
    print(
        json.dumps(
            {
                "rows_packed": n,
                "wall_sec": round(time.perf_counter() - t0, 3),
                "stages": {
                    name: {"rows": m.get("rows"), "resumed": m["resumed"]}
                    for name, m in manifests.items()
                },
                "out_dir": out_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
