#!/usr/bin/env python
"""spark-submit entry for the gvsb dataset-generation workflow — the
reference's actual CLI (generate_dataset_gvsb.py) exercised as ONE packaged
job (VERDICT r2 #6).  Usage:

    python scripts/package_pyfiles.py
    spark-submit --master local[32] \
        --py-files dist/py_evalfilter_spark.zip \
        scripts/submit_gvsb.py <source_dir> <output_dir> ['{"type_max_features": 100, ...}']

Runs generate_gvsb (folds + vocabulary.json + metadata.json on disk), times
the whole job, and prints ONE JSON line:
  {"wall_sec": ..., "n_features": ..., "folds": [...], "fold_rows": [...]}
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    source_dir = sys.argv[1]
    output_dir = sys.argv[2]
    cfg = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}

    spark = (
        SparkSession.builder.appName("py_evalfilter_spark_gvsb")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from py_evalfilter_spark.plans.generate_dataset import generate_gvsb

    t0 = time.perf_counter()
    res = generate_gvsb(spark, source_dir, output_dir, **cfg)
    fold_rows = [spark.read.text(f).count() for f in res["folds"]]
    wall = round(time.perf_counter() - t0, 2)

    # manifest check: metadata must exist and agree with the artifacts
    meta = json.load(open(f"{output_dir}/metadata.json"))
    vocab = json.load(open(f"{output_dir}/vocabulary.json"))
    assert meta["config"]["n_features"] == len(vocab) == res["n_features"]

    print(
        json.dumps(
            {
                "wall_sec": wall,
                "n_features": res["n_features"],
                "folds": res["folds"],
                "fold_rows": fold_rows,
                "rows_per_sec": round(sum(fold_rows) / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
