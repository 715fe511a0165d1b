"""PII detection and redaction for training-data pipelines: emails, phone
numbers, IPv4 addresses — pure JVM regexp expressions (regexp_count /
regexp_replace), no Python in the hot path.

Patterns are kept to the Java-regex ∩ RE2 common subset (no lookaround, no
backreferences) so the DuckDB oracle runs the IDENTICAL pattern strings
(plans/driver_queries.py `mask_pii`).  Extend by adding to PII_PATTERNS —
order matters: earlier patterns are redacted first (email before phone so
the digits in a mailbox name are not half-eaten by the phone pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[- ]\d{3,4}[- ]\d{4}\b", "<PHONE>"),
]


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add one `n_<kind>` long column per PII pattern (match counts on the
    ORIGINAL text)."""
    for name, pat, _ in PII_PATTERNS:
        df = df.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        )
    return df


def redact_pii(
    df: DataFrame, text_col: str = "text", out: str | None = None
) -> DataFrame:
    """Replace every PII match with its typed placeholder, in PII_PATTERNS
    order.  `out` defaults to overwriting `text_col`.  Counts should be
    taken first (with_pii_counts) — redaction destroys the matches."""
    col = F.col(text_col)
    for _, pat, rep in PII_PATTERNS:
        col = F.regexp_replace(col, pat, rep)
    return df.withColumn(out or text_col, col)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Counts + redaction in one pass: n_* columns from the original text,
    `text_col` redacted in place."""
    return redact_pii(with_pii_counts(df, text_col), text_col)
