"""Arrow-vectorized text feature functions (SURVEY.md §2.3-2.4).

One scalar struct `pandas_udf` computes NFKC + tokenization + the 19-field
feature map per Arrow batch — the tokenize-once discipline that fixes the
reference's repeated re-tokenization (SURVEY.md §4.1 "Common-subexpression
reuse", citing /root/reference/src/evalfilter/features.py:79 and
src/generate_dataset_gvsb.py:72,84).  No per-row Python UDFs: Python runs
only inside Arrow batches (input_hint), and only the text column crosses
the JVM↔Python boundary.

At 100 TB scale this is a narrow map stage — no shuffle, embarrassingly
parallel, and salting-safe because nothing here crosses rows.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import textcore as tc
from .. import textcore_fast as tcf

# Spark schema of the 19-feature struct, in DictVectorizer (alpha-sorted) order.
# Counts are emitted as doubles so the output matrix is uniformly float64
# like the reference's DictVectorizer output.
FEATURE_SCHEMA = T.StructType(
    [T.StructField(name, T.DoubleType(), False) for name in tc.FEATURE_NAMES]
)


def feature_fields() -> list[str]:
    return list(tc.FEATURE_NAMES)


def _stats_frame(texts: pd.Series) -> pd.DataFrame:
    # vectorized path; exact-parity with textcore.rant_stats is pinned by
    # tests/test_textcore_fast.py (fixtures + hypothesis fuzz)
    out = tcf.batch_rant_stats(texts.tolist())
    out.index = texts.index
    return out


@F.pandas_udf(FEATURE_SCHEMA)
def rant_stats_udf(s: pd.Series) -> pd.DataFrame:
    """text → struct of the 19 features (scalar Arrow UDF).

    A scalar struct UDF serializes ONLY the text column to Python and 19
    doubles back — every other column of the surrounding row stays JVM-side.
    The mapInPandas alternative round-trips the entire row through Arrow,
    which measured ~1.5-3x slower on wide pipelines.
    """
    return _stats_frame(s)


def with_rant_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the 19 feature columns to ``df`` (one Arrow pass over text only)."""
    tmp = "__rant_stats"
    out = df.withColumn(tmp, rant_stats_udf(F.col(text_col)))
    return out.select("*", f"{tmp}.*").drop(tmp)


@F.pandas_udf(T.StringType())
def nfkc_udf(s: pd.Series) -> pd.Series:
    """NFKC normalization (fuman_base.py:100) — no Spark SQL builtin exists."""
    return s.map(lambda x: tc.nfkc(x) if isinstance(x, str) else x)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_rant_udf(s: pd.Series) -> pd.Series:
    """Lemma tokens, min_length=2 (analysis.py:22-23 contract)."""
    return s.map(lambda x: tc.tokenize_rant(x, 2) if isinstance(x, str) else [])


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_rant1_udf(s: pd.Series) -> pd.Series:
    """Lemma tokens, min_length=1 (feature-map tokens, features.py:79)."""
    return s.map(lambda x: tc.tokenize_rant(x, 1) if isinstance(x, str) else [])


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pos_udf(s: pd.Series) -> pd.Series:
    """POS-class tag sequence (analysis.py:26-27 contract)."""
    return s.map(lambda x: tc.tokenize_pos(x) if isinstance(x, str) else [])


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_token_type_udf(s: pd.Series) -> pd.Series:
    """Token-type sequence (analysis.py:30-32 contract)."""
    return s.map(lambda x: tc.tokenize_token_type(x) if isinstance(x, str) else [])


def analyzer_udf(
    tokenizer_name: str,
    ngram_range: tuple[int, int],
    stop_words: frozenset | None = None,
):
    """sklearn-parity analyzer (preprocess → tokenize → stopwords → ngrams)
    as a pandas UDF.

    ``tokenizer_name`` ∈ {'rant','pos','token_type'} — the three tokenizers
    the reference ships (SURVEY.md §2.10).  ``stop_words``: e.g.
    ``textcore.STOPWORDS_JA`` (the reference's shipped list, analysis.py:8-13
    — dormant in its entry points but part of the vectorizer surface).
    """
    tokenizers = {
        "rant": tc.tokenize_rant,
        "pos": lambda s: tc.tokenize_pos(s),
        "token_type": tc.tokenize_token_type,
    }
    tok = tokenizers[tokenizer_name]
    lo, hi = ngram_range
    sw = frozenset(stop_words) if stop_words else None

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _analyze(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: tc.analyze(x, tok, (lo, hi), sw) if isinstance(x, str) else []
        )

    return _analyze
