"""Sinks — SURVEY.md §2.1 S5-S12.

* dense CSV with %.3f formatting + trailing target column (dump_csv,
  /root/reference/src/evalfilter/output.py:194-214; header synthesis
  :169-191 is free — DataFrame column names ARE the header)
* svmlight/libsvm (output.py:202-205) via Spark ML's libsvm source
* vocabulary JSON (save_features_json, output.py:158-166)
* run-metadata JSON (save_dataset_metadata, output.py:108-155) — subsumed
  by the lineage manifests in tables.py; kept here for API parity
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_dense_csv(
    df: DataFrame,
    path: str,
    feature_cols: list[str],
    target_col: str | None = "target",
    coalesce: int | None = None,
) -> None:
    """savetxt(fmt='%.3f')-style dense CSV: every feature %.3f-formatted,
    target appended last, header row = column names."""
    cols = [
        F.format_string("%.3f", F.col(f"`{c}`").cast("double")).alias(c)
        for c in feature_cols
    ]
    if target_col is not None:
        cols.append(F.col(target_col).cast("string").alias(target_col))
    out = df.select(*cols)
    if coalesce:
        out = out.coalesce(coalesce)
    out.write.mode("overwrite").option("header", True).csv(path)


def write_libsvm(
    df: DataFrame,
    path: str,
    feature_cols: list[str],
    target_col: str = "target",
    coalesce: int | None = None,
) -> None:
    """svmlight sink: assemble numeric columns → Vector, write libsvm."""
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features", handleInvalid="keep"
    )
    out = assembler.transform(
        df.select(
            F.col(target_col).cast("double").alias("label"),
            *[F.col(f"`{c}`").cast("double").alias(c) for c in feature_cols],
        )
    ).select("label", "features")
    if coalesce:
        out = out.coalesce(coalesce)
    out.write.mode("overwrite").format("libsvm").save(path)


def save_features_json(path: str, feature_names: list[str]) -> None:
    """Vocabulary export (output.py:158-166) — needed for point-in-time
    reproducibility of fitted vectorizers."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fp:
        json.dump(list(feature_names), fp, ensure_ascii=False, indent=1)


def save_dataset_metadata(
    path: str,
    *,
    dataset: str,
    source: str,
    config: dict,
) -> None:
    """Run-metadata JSON (output.py:108-155 shape, minus wall-clock
    dependence — the caller supplies any timestamp in ``config``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fp:
        json.dump({"dataset": dataset, "source": source, "config": config}, fp, indent=1)
