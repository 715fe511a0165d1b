"""Corpus vectorizers with sklearn-0.16 parity — SURVEY.md §2.5 A1-A4.

The reference's CountVectorizer / TfidfVectorizer calls
(/root/reference/src/generate_dataset_gvsb.py:72-86,
 /root/reference/src/generate_dataset_price.py:104-130) re-expressed as
DataFrame aggregations:

  fit   = explode(ngrams) → groupBy(term){tf=count, df=countDistinct(doc)}
          → df >= min_df → top-max_features by (tf desc, term asc)
          → lexicographic vocabulary index
  tfidf = smooth idf ln((1+n)/(1+df)) + 1, l2 row norm (0.16 defaults)

Deterministic divergence from sklearn (documented, mirrored by golden.py):
tf ties in the max_features cut break by term asc; sklearn 0.16 used an
unstable argsort.  pyspark.ml.feature.CountVectorizer is NOT used because it
orders vocabulary by frequency, not lexicographically — column order would
diverge from DictVectorizer/CountVectorizer parity.

Point-in-time discipline (north_rule): ``cutoff_ts`` restricts the FIT to
rows with ts <= cutoff; transform may run on any rows — the fitted state
never sees the future (models vectorise_text_fit, features.py:239-247).

Scale: fit is two shuffles over exploded terms (partial aggs map-side);
the vocabulary (< max_features rows) broadcasts for transform, so transform
adds one broadcast-join + one groupBy(doc) shuffle.  No driver collection of
corpus-sized data.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textfeats import analyzer_udf


def _terms(df: DataFrame, text_col: str, id_cols: list[str], tokenizer: str, ngram_range):
    ana = analyzer_udf(tokenizer, ngram_range)
    return df.select(*id_cols, F.explode(ana(F.col(text_col))).alias("term"))


def terms_df(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    tokenizer: str = "rant",
    ngram_range: tuple[int, int] = (1, 1),
    cache: bool = True,
) -> DataFrame:
    """Tokenize ONCE into an exploded (id..., term) frame shared by fit and
    transform — the tokenize-once discipline that fixes the reference's
    repeated re-tokenization (SURVEY.md §4.1: every sklearn vectorizer
    re-ran MeCab over the full corpus; fit_transform tokenized twice more).
    Pass the result as ``terms`` to fit_vocabulary/transform_counts."""
    out = _terms(df, text_col, id_cols or ["conv_id", "turn_idx"], tokenizer, ngram_range)
    return out.cache() if cache else out


def fit_vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    tokenizer: str = "rant",
    ngram_range: tuple[int, int] = (1, 1),
    min_df: int = 1,
    max_features: int | None = None,
    cutoff_ts=None,
    ts_col: str = "ts",
    terms: DataFrame | None = None,
) -> DataFrame:
    """Fit → DataFrame(term, tf, docfreq, index) with lexicographic index.

    ``id_cols`` identify a document for doc-frequency (default
    [conv_id, turn_idx]).  ``cutoff_ts`` makes the fit point-in-time.
    ``terms``: pre-tokenized (id..., term) frame from :func:`terms_df`
    (the tokenize-once path; ignored when cutoff_ts is set, since the
    cutoff filter needs the ts column).
    """
    id_cols = id_cols or ["conv_id", "turn_idx"]
    fit_df = df.filter(F.col(ts_col) <= F.lit(cutoff_ts)) if cutoff_ts is not None else df
    n_docs = fit_df.count()

    doc_key = F.concat_ws("", *[F.col(c).cast("string") for c in id_cols])
    if terms is not None and cutoff_ts is None:
        terms = terms.withColumn("doc", doc_key)
    else:
        terms = _terms(fit_df, text_col, id_cols, tokenizer, ngram_range).withColumn(
            "doc", doc_key
        )
    stats = terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"), F.countDistinct("doc").alias("docfreq")
    )
    vocab = stats.filter(F.col("docfreq") >= min_df)
    if max_features is not None and max_features > 0:
        w = Window.orderBy(F.col("tf").desc(), F.col("term"))
        vocab = vocab.withColumn("r", F.row_number().over(w)).filter(
            F.col("r") <= max_features
        ).drop("r")
    widx = Window.orderBy("term")
    vocab = vocab.withColumn("index", (F.row_number().over(widx) - 1).cast("int"))
    # idf uses the smooth sklearn-0.16 formula; n_docs baked in at fit time
    return vocab.withColumn(
        "idf", F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("docfreq"))) + 1.0
    )


def transform_counts(
    df: DataFrame,
    vocabulary: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    tokenizer: str = "rant",
    ngram_range: tuple[int, int] = (1, 1),
    tfidf: bool = False,
    terms: DataFrame | None = None,
) -> DataFrame:
    """Transform → long-format (id_cols..., index, value) sparse matrix.

    ``tfidf=True`` applies idf then l2-normalizes each document row, exactly
    as sklearn-0.16 TfidfVectorizer(norm='l2', smooth_idf=True).  Long
    format IS the sparse representation — assemble to vectors only at the
    sink if a consumer needs it.
    """
    id_cols = id_cols or ["conv_id", "turn_idx"]
    if terms is None:
        terms = _terms(df, text_col, id_cols, tokenizer, ngram_range)
    vocab = F.broadcast(vocabulary.select("term", "index", "idf"))
    counts = (
        terms.join(vocab, "term")
        .groupBy(*id_cols, "index", "idf")
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
    )
    if not tfidf:
        return counts.select(*id_cols, "index", "value")
    weighted = counts.withColumn("value", F.col("value") * F.col("idf"))
    wnorm = Window.partitionBy(*id_cols)
    norm = F.sqrt(F.sum(F.col("value") * F.col("value")).over(wnorm))
    return weighted.withColumn(
        "value", F.col("value") / F.when(norm == 0.0, 1.0).otherwise(norm)
    ).select(*id_cols, "index", "value")


def vocabulary_to_list(vocabulary: DataFrame) -> list[str]:
    """Small-vocab convenience for tests/exports (index order)."""
    return [r["term"] for r in vocabulary.orderBy("index").select("term").collect()]
