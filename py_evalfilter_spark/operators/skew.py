"""Skew handling — SURVEY.md §4.1 / north_rule "skew from mega-conversations
handled by salted repartitioning plus AQE skew-join splitting".

Three tools, by operator class:

* salted_repartition — for PER-ROW map stages (feature map, langid, …):
  partition on (key, salt) where salt = pmod(xxhash64(secondary), S).  A
  mega-conversation spreads over S partitions; safe because per-row maps
  never cross rows.  NOT for window/as-of stages — those need whole keys.
* rebalance — round-robin repartition for key-free map stages (maximum
  balance, loses co-location).
* AQE skew-join splitting is on by default (session.py:
  spark.sql.adaptive.skewJoin.enabled) for the join paths.

skew_report measures per-partition row counts so tests/ops can assert
balance instead of guessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    key: str,
    salt_col: str,
    salt_parts: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Hash-partition on (key, salt) — splits hot keys across salt_parts
    partitions while keeping (key, salt) deterministic for reproducibility."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_parts))
    )
    if num_partitions:
        out = salted.repartition(num_partitions, F.col(key), F.col("__salt"))
    else:
        out = salted.repartition(F.col(key), F.col("__salt"))
    return out.drop("__salt")


def rebalance(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition (no key): perfectly balanced map input."""
    return df.repartition(num_partitions) if num_partitions else df.repartition()


def skew_report(df: DataFrame) -> dict:
    """Per-partition row counts → {n_partitions, max, min, mean, cv}."""
    counts = [
        r["c"]
        for r in df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    if not counts:
        return {"n_partitions": 0, "max": 0, "min": 0, "mean": 0.0, "skew_ratio": 0.0}
    mean = sum(counts) / len(counts)
    return {
        "n_partitions": len(counts),
        "max": max(counts),
        "min": min(counts),
        "mean": round(mean, 1),
        "skew_ratio": round(max(counts) / mean, 2) if mean else 0.0,
    }
