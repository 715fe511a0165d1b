#!/usr/bin/env python
"""spark-submit entry job (north_rule: "deployed via spark-submit
--py-files").  Usage:

    python scripts/package_pyfiles.py                # builds dist/py_evalfilter_spark.zip
    spark-submit --master local[8] \
        --py-files dist/py_evalfilter_spark.zip \
        scripts/submit_job.py /root/testdata/sf0.001 /tmp/out

Runs the flagship feature pipeline on the given sf dir and writes the
per-turn feature table + lineage manifest to the output path.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/py_evalfilter_spark_out"

    spark = SparkSession.builder.appName("py_evalfilter_spark_job").getOrCreate()
    from py_evalfilter_spark.plans.pipeline import feature_pipeline
    from py_evalfilter_spark.sources.tables import write_stage

    df = feature_pipeline(spark, sf_dir)
    manifest = write_stage(
        df, out, stage="feature_pipeline", config={"sf_dir": sf_dir},
        input_paths=[sf_dir],
    )
    print(json.dumps({"rows": manifest["rows"], "partitions": len(manifest["partitions"])}))
    spark.stop()


if __name__ == "__main__":
    main()
