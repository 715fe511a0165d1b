"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship end-to-end feature pipeline on sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2).
oracle_sql()   — matching DuckDB SQL for the SQL-expressible subset;
                 Arrow-UDF text features are rows-only and allclose-verified
                 against the golden pandas pipeline in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py_evalfilter_spark.functions import textfeats  # noqa: E402
from py_evalfilter_spark.operators import asof as asof_op  # noqa: E402
from py_evalfilter_spark.operators import windows as win_op  # noqa: E402
from py_evalfilter_spark.plans import driver_queries as dq  # noqa: E402


def _tune(spark: SparkSession) -> SparkSession:
    """Runtime confs the engine's semantics depend on, applied to whatever
    session the driver passes in: UTC session timezone (epoch casts of
    TIMESTAMP_NTZ columns must match DuckDB's naive epochs) and Arrow
    execution for the vectorized UDFs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full point-in-time feature pipeline on sf0.001 transcripts.

    events → transcripts → 19-feature Arrow map → backfill + sessionize →
    as-of merge of the purchase side-table → wide per-turn feature rows.
    """
    from py_evalfilter_spark.plans.pipeline import feature_pipeline

    return feature_pipeline(_tune(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        return lambda spark, sf_dir: fn(_tune(spark), sf_dir)

    return {name: wrap(fn) for name, fn in dq.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(dq.ORACLES)
