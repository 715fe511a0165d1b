"""Downstream model consumer — SURVEY.md §2.8 X5.

The reference's good_vs_bad_model.py (GradientBoostingClassifier +
cross_val_score, /root/reference/src/good_vs_bad_model.py:17-25) consumed
the generated folds; this is the Spark ML equivalent so a reference user
can run the same train/eval step on the engine's output: GBTClassifier over
a libsvm fold with k-fold CV accuracy.

Out of ENGINE scope per SURVEY §2.8 (the engine's contract ends at the
numeric matrix + int8 label) — included so the end-to-end reference
workflow (generate folds → fit → CV score) is runnable on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_fold(spark: SparkSession, fold_path: str, num_features: int | None = None) -> DataFrame:
    reader = spark.read.format("libsvm")
    if num_features:
        reader = reader.option("numFeatures", num_features)
    df = reader.load(fold_path)
    # gvb labels are {-1, +1}; Spark classifiers want {0, 1}
    return df.withColumn("label", F.when(F.col("label") > 0, 1.0).otherwise(0.0))


def cross_val_accuracy(
    df: DataFrame, n_folds: int = 3, max_iter: int = 10, max_depth: int = 3, seed: int = 42
) -> float:
    """k-fold CV accuracy of a GBT classifier (cross_val_score analogue)."""
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    df = df.withColumn("__fold", F.pmod(F.xxhash64(F.monotonically_increasing_id(), F.lit(seed)), F.lit(n_folds))).cache()
    evaluator = MulticlassClassificationEvaluator(metricName="accuracy")
    scores = []
    for k in range(n_folds):
        train = df.filter(F.col("__fold") != k)
        test = df.filter(F.col("__fold") == k)
        if test.count() == 0 or train.select("label").distinct().count() < 2:
            continue
        model = GBTClassifier(maxIter=max_iter, maxDepth=max_depth, seed=seed).fit(train)
        scores.append(evaluator.evaluate(model.transform(test)))
    return sum(scores) / len(scores) if scores else float("nan")
