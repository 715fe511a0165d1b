"""Reference-parity CSV loaders — SURVEY.md §2.1 S1-S4 / §2.2 P1-P9.

Reproduces the semantics of /root/reference/src/datasets/fuman_base.py:
quotechar "'", header row skipped, 15-or-16-field arity + int-parse checks
with dropped-row counting (check_row_format, fuman_base.py:40-53), NFKC on
the rant text (:100), gender/bool/age decodes (:17-37), and the two target
functions (:56-66) — all as declarative column expressions so Catalyst can
prune/push them, with drop counts observable via df.observe metrics.

The run date of get_age (fuman_base.py:29-33 uses date.today(), making the
reference non-reproducible) is pinned via ``run_year``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_COLS = 16
_RAW_SCHEMA = T.StructType(
    [T.StructField(f"_c{i}", T.StringType(), True) for i in range(N_COLS)]
)

# fields that must parse as int (check_row_format, fuman_base.py:47-49);
# _c15 (price) required only for 16-column rows
_INT_FIELDS = [1, 2, 3, 4, 6, 7, 8]


def read_raw(spark: SparkSession, path: str) -> DataFrame:
    """csv.reader(delimiter=',', quotechar="'") with header skip."""
    return (
        spark.read.schema(_RAW_SCHEMA)
        .option("header", True)
        .option("quote", "'")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def _valid_row() -> F.Column:
    """check_row_format as a Column: int-parsable required fields.

    Arity: the reference accepts 15 or 16 fields; a 15-field row parses here
    with _c15 null (allowed — price defaults 0 per fuman_base.py:123-126).
    """
    cond = F.lit(True)
    for i in _INT_FIELDS:
        cond = cond & F.col(f"_c{i}").try_cast("int").isNotNull()
    return cond


def decode_gender_col(raw: F.Column) -> F.Column:
    """get_gender (fuman_base.py:17-26): '\\\\0' or unparsable → unk."""
    g = raw.try_cast("int")
    return (
        F.when(raw == "\\0", "unk")
        .when(g == 1, "male")
        .when(g == 2, "female")
        .otherwise("unk")
    )


def age_col(birthyear: F.Column, run_year: int) -> F.Column:
    """get_age with pinned run date (0 sentinel kept, fuman_base.py:29-33)."""
    b = birthyear.try_cast("int")
    return F.when(b == 0, 0).otherwise(F.lit(run_year) - b)


def bool_cat_col(raw: F.Column) -> F.Column:
    """to_binary_categorical (fuman_base.py:36-37): 0/1 → 'False'/'True'."""
    return F.when(raw.try_cast("int") == 1, "True").otherwise("False")


def gvb_target_col(status: F.Column, strict: bool = True) -> F.Column:
    """fuman_gvb_target (fuman_base.py:60-66): 100 → -1; 2xx → +1; else the
    reference raises — strict=True raises at runtime, else NULL."""
    s = status.try_cast("int")
    base = F.when(s == 100, -1).when((s >= 200) & (s < 300), 1)
    if strict:
        return base.otherwise(
            F.raise_error(F.lit("Unexpected value for status"))
        ).cast("int")
    return base.otherwise(F.lit(None)).cast("int")


def load_fuman_userprofile(
    spark: SparkSession, path: str, target: str = "price", run_year: int = 2016
) -> DataFrame:
    """S1 (fuman_base.py:74-106): full row → NFKC rant + userprofile struct +
    target.  Dropped rows counted via observe('parse', ...) metrics."""
    from ..functions.textfeats import nfkc_udf

    raw = read_raw(spark, path)
    raw = raw.observe(
        "parse",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(_valid_row(), 0).otherwise(1)).alias("parse_errors"),
    )
    ok = raw.filter(_valid_row())
    target_col = (
        F.col("_c15").try_cast("int")
        if target == "price"
        else gvb_target_col(F.col("_c6"))
    )
    return ok.select(
        nfkc_udf(F.coalesce(F.col("_c5"), F.lit(""))).alias("rant"),
        F.struct(
            bool_cat_col(F.col("_c1")).alias("hasindustry"),
            bool_cat_col(F.col("_c2")).alias("hasoccupation"),
            bool_cat_col(F.col("_c3")).alias("hascompany"),
            bool_cat_col(F.col("_c4")).alias("hasprodname"),
            bool_cat_col(F.col("_c7")).alias("hasproposal"),
            F.col("_c8").try_cast("int").alias("empathies"),
            age_col(F.col("_c11"), run_year).alias("birthyear"),
            F.col("_c12").alias("state"),
            decode_gender_col(F.col("_c13")).alias("gender"),
            F.col("_c14").alias("job"),
        ).alias("userprofile"),
        F.coalesce(target_col, F.lit(0)).alias("target"),
    )


def load_fuman_rant(
    spark: SparkSession, path: str, strict_target: bool = False
) -> DataFrame:
    """S2 (fuman_base.py:109-132): rant text + gvb target only."""
    from ..functions.textfeats import nfkc_udf

    raw = read_raw(spark, path)
    ok = raw.filter(_valid_row())
    return ok.select(
        nfkc_udf(F.coalesce(F.col("_c5"), F.lit(""))).alias("rant"),
        gvb_target_col(F.col("_c6"), strict=strict_target).alias("target"),
    )


def load_fuman_gvb(
    spark: SparkSession,
    dir_path: str,
    bad_filename: str = "bad-rants.csv",
    good_filename: str = "good-rants.csv",
) -> DataFrame:
    """S3 (fuman_base.py:135-163): bad file (label 1, format-UNchecked like
    the reference) unioned with good file (label -1, format-checked)."""
    from ..functions.textfeats import nfkc_udf

    bad = read_raw(spark, f"{dir_path}/{bad_filename}").select(
        nfkc_udf(F.coalesce(F.col("_c5"), F.lit(""))).alias("rant"),
        F.lit(1).cast("int").alias("target"),
    )
    good_raw = read_raw(spark, f"{dir_path}/{good_filename}")
    good = good_raw.filter(_valid_row()).select(
        nfkc_udf(F.coalesce(F.col("_c5"), F.lit(""))).alias("rant"),
        F.lit(-1).cast("int").alias("target"),
    )
    return bad.unionByName(good)
