"""Sampling / split operators — SURVEY.md §2.8 X1-X3.

The reference's StratifiedShuffleSplit / KFold(shuffle=True)
(/root/reference/src/generate_dataset_gvsb.py:111-115,
 /root/reference/src/generate_dataset_price.py:159-166) re-expressed as
deterministic, driver-free column math:

* kfold_assign        — fold = pmod(xxhash64(id, seed), k): the shuffled
                        K-fold (hash ≈ shuffle, but reproducible and stable
                        under repartitioning — no RNG state on executors);
* stratified_assign   — per-stratum round-robin over a stable order: every
                        fold gets ⌈n_s/k⌉ or ⌊n_s/k⌋ rows of stratum s
                        (exact stratification, unlike fraction sampling);
* stratified_sample   — sampleBy fractions with seed (approximate, fast,
                        no window shuffle) for when exactness isn't needed;
* train_test_split    — hash-threshold split (stable membership: a row's
                        side never changes when the corpus grows — the
                        property point-in-time feature stores need).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kfold_assign(df: DataFrame, id_col: str, k: int, seed: int = 42, out: str = "fold") -> DataFrame:
    return df.withColumn(
        out, F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(k)).cast("int")
    )


def stratified_assign(
    df: DataFrame,
    label_col: str,
    k: int,
    order_col: str,
    out: str = "fold",
) -> DataFrame:
    w = Window.partitionBy(label_col).orderBy(order_col)
    return df.withColumn(out, ((F.row_number().over(w) - 1) % k).cast("int"))


def stratified_sample(
    df: DataFrame, label_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    labels = [r[0] for r in df.select(label_col).distinct().collect()]
    return df.sampleBy(label_col, {l: fraction for l in labels}, seed=seed)


def train_test_split(
    df: DataFrame,
    id_col: str,
    test_frac: float = 0.2,
    seed: int = 42,
    out: str = "is_test",
) -> DataFrame:
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(10_000))
    return df.withColumn(out, (bucket < int(test_frac * 10_000)).cast("boolean"))
