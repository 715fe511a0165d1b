"""Categorical encoders — SURVEY.md §2.5 A6/A7 (encode_categoricals /
categorical_to_binary, /root/reference/src/evalfilter/features.py:250-281).

sklearn parity notes: LabelEncoder assigns codes by SORTED value order —
pyspark.ml.feature.StringIndexer orders by frequency, so these are built
from dense_rank over the sorted distinct values instead.  One-hot columns
are named 'col=value' alpha-sorted, matching DictVectorizer's behavior for
string fields (the convention generate_dataset.py's profile block uses).

Scale: the distinct-value dictionary is tiny (categorical domains) and
broadcast; the encode itself is a broadcast-join — no shuffle of the fact
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_encode(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """sklearn-LabelEncoder parity: code = rank of value in sorted distinct.

    The sorted index over the distinct dictionary uses the distributed
    zipWithIndex (vectorize.with_sorted_index) — no single-partition Window
    even when the domain is high-cardinality."""
    from .vectorize import with_sorted_index

    out = out or f"{col}_code"
    dictionary = with_sorted_index(df.select(col).distinct(), (col,), out)
    return df.join(F.broadcast(dictionary), col, "left")


def one_hot(df: DataFrame, col: str, values: list[str] | None = None) -> DataFrame:
    """One column per category value, named 'col=value', alpha-sorted."""
    if values is None:
        values = sorted(
            r[0] for r in df.select(col).distinct().collect() if r[0] is not None
        )
    exprs = [
        F.when(F.col(col) == v, 1).otherwise(0).cast("int").alias(f"{col}={v}")
        for v in values
    ]
    return df.select("*", *exprs)
