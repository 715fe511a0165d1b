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

import argparse
import json
import time


def main() -> None:
    from pyspark.sql import SparkSession

    from py_evalfilter_spark.plans import curation

    # argparse, not a hand-rolled flag scan: a forgotten value or a
    # misspelled flag must ERROR, not silently run a data-production job
    # with defaults
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--budget", type=int, default=256)
    ap.add_argument("--quality-min", type=float, default=0.5)
    ap.add_argument("--minhash-threshold", type=float, default=0.8)
    ap.add_argument("--semantic-threshold", type=float, default=None)
    ap.add_argument("--decontam-n", type=int, default=6)
    ap.add_argument("--standing-path", default=None,
                    help="parquet of already-curated documents (text column)"
                    " — ingest-dedup the input against it (Bloom prefilter"
                    " + exact confirm) before any other stage")
    a = ap.parse_args()
    sf_dir, out_dir = a.sf_dir, a.out_dir
    budget, quality_min = a.budget, a.quality_min
    minhash_threshold = a.minhash_threshold
    semantic_threshold = a.semantic_threshold
    decontam_n = a.decontam_n

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
        standing_path=a.standing_path,
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
