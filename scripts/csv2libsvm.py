#!/usr/bin/env python
"""csv → libsvm converter (SURVEY.md §2.1 S9, reference
src/util/csv2libsvm.py): numeric CSV with a label column → libsvm files.

    python scripts/csv2libsvm.py <in.csv> <out_dir> [label_col] [--skip-header]

Spark-native: read.csv → VectorAssembler → write.format('libsvm'); streams
any size input (the reference converter was a single-threaded line loop).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def convert(spark: SparkSession, in_path: str, out_dir: str, label_col: str | None, header: bool) -> int:
    from pyspark.ml.feature import VectorAssembler

    df = spark.read.option("header", header).option("inferSchema", True).csv(in_path)
    cols = df.columns
    label = label_col or cols[-1]
    feat_cols = [c for c in cols if c != label]
    out = VectorAssembler(inputCols=feat_cols, outputCol="features", handleInvalid="keep").transform(
        df.select(*[F.col(c).cast("double") for c in cols])
    )
    out.select(F.col(label).alias("label"), "features").write.mode("overwrite").format(
        "libsvm"
    ).save(out_dir)
    return out.count()


def main() -> None:
    in_path, out_dir = sys.argv[1], sys.argv[2]
    label_col = sys.argv[3] if len(sys.argv) > 3 and not sys.argv[3].startswith("--") else None
    header = "--skip-header" in sys.argv
    spark = SparkSession.builder.appName("csv2libsvm").getOrCreate()
    n = convert(spark, in_path, out_dir, label_col, header)
    print(f"wrote {n} rows to {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
