#!/usr/bin/env python
"""spark-submit entry for the PRICE dataset-generation workflow — the
reference's generate_dataset_price.py CLI exercised as ONE packaged job
(VERDICT r4 #6, mirroring scripts/submit_gvsb.py).  Usage:

    python scripts/package_pyfiles.py
    spark-submit --master local[32] \
        --py-files dist/py_evalfilter_spark.zip \
        scripts/submit_price.py <source_csv> <output_dir> ['{"pos_max_features": 300, ...}']

Runs generate_price (fold + vocabulary.json on disk), times the whole job,
and prints ONE JSON line:
  {"wall_sec": ..., "n_features": ..., "folds": [...], "fold_rows": [...]}
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    source_path = sys.argv[1]
    output_dir = sys.argv[2]
    cfg = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}

    spark = (
        SparkSession.builder.appName("py_evalfilter_spark_price")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from py_evalfilter_spark.plans.generate_dataset import generate_price

    t0 = time.perf_counter()
    res = generate_price(spark, source_path, output_dir, **cfg)
    fold_rows = [spark.read.text(f).count() for f in res["folds"]]
    wall = round(time.perf_counter() - t0, 2)

    # manifest check: the vocabulary header must agree with the matrix
    vocab = json.load(open(f"{output_dir}/vocabulary.json"))
    assert len(vocab) == res["n_features"]

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
