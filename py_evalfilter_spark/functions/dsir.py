"""DSIR-style importance resampling for pretraining-data selection
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — public paper; no reference-repo analogue, this is an engine
extension per SURVEY.md §2.11).

The estimator is deliberately the paper's cheap one: bag-of-hashed-n-grams
unigram models over a TARGET (trusted) corpus and the RAW corpus, and a
per-document importance weight

    log w(doc) = Σ_{g ∈ ngrams(doc)} [ log p_target(b(g)) − log p_raw(b(g)) ]

with b(g) an md5 bucket in [0, B).  Selection is Gumbel-top-k on
log w + g_i, which samples WITHOUT replacement proportionally to w — the
Gumbel noise comes from an md5-uniform per doc, so the whole pipeline is
deterministic, engine-portable, and DuckDB-oracle-able end to end.

Scale shape: both model fits are one explode + groupBy each (map-side
combinable, bucket-bounded output ≤ B rows); scoring is one explode + a
broadcast join against the ≤B-row ratio model + one groupBy.  B is a cap
parameter (default 10k), so the broadcast is bounded BY CONSTRUCTION —
unlike a raw vocabulary it cannot grow with the corpus (the lesson of the
unigram-LM broadcast gate, textanalysis.py)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textanalysis import WORD_RE

_M = 1_000_003  # md5-uniform modulus shared with operators/corpus.py mixing


def _hashed_ngram_buckets(df: DataFrame, text_col: str, n_max: int, buckets: int):
    """(id-preserving) explode of word {1..n_max}-gram md5 buckets.
    The words array and each n-gram array are projected to NAMED columns
    before any HOF consumes them — lambda bodies get no subexpression
    elimination (project conventions)."""
    out = df.withColumn(
        "_words", F.filter(F.split(F.lower(F.col(text_col)), WORD_RE), lambda x: x != "")
    )

    def gram_of(n: int):
        # closure factory, NOT `lambda i, n=n`: PySpark treats a
        # two-parameter HOF lambda as (value, index) and would bind the
        # array INDEX to n — producing growing slices (measured)
        return lambda i: F.array_join(F.slice(F.col("_words"), i, n), " ")

    gram_cols = [F.col("_words")]
    for n in range(2, n_max + 1):
        col = f"_grams{n}"
        out = out.withColumn(
            col,
            # guard: Spark's sequence(1, 0) DESCENDS to [1, 0] rather than
            # being empty, so docs shorter than n need the explicit branch
            F.when(
                F.size("_words") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("_words") - (n - 1)), gram_of(n)
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
        gram_cols.append(F.col(col))
    exploded = out.withColumn("_gram", F.explode(F.concat(*gram_cols)))
    return exploded.withColumn(
        "bucket",
        F.pmod(
            F.conv(F.substring(F.md5("_gram"), 1, 8), 16, 10).cast("long"),
            F.lit(buckets),
        ),
    ).drop("_words", "_gram", *[f"_grams{n}" for n in range(2, n_max + 1)])


def dsir_log_ratio_model(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_max: int = 2,
    buckets: int = 10_000,
    smoothing: float = 1.0,
    pins=None,
) -> tuple[DataFrame, float]:
    """Fit the (bucket, log_ratio) model: log_ratio = log p_t(b) − log p_r(b)
    with additive smoothing over all B buckets.  Returns (model frame of at
    most B rows, the default log-ratio for buckets unseen on BOTH sides).
    Two single-row collects bound the scalars (totals), like the LM fit.

    The per-side count frames are pinned (≤B rows each): the totals
    collect AND the final model join both read them, and without the pin
    each side's corpus explode re-executes — measured 2.9 → 1.5 s at
    sf0.1.  Pass a PinScope to own eviction (pinning.py)."""
    from ..pinning import pin as _pin

    t_counts = _pin(
        _hashed_ngram_buckets(target, text_col, n_max, buckets)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("tc")),
        pins,
    )
    r_counts = _pin(
        _hashed_ngram_buckets(raw, text_col, n_max, buckets)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("rc")),
        pins,
    )
    n_t = int(t_counts.agg(F.sum("tc")).collect()[0][0] or 0)
    n_r = int(r_counts.agg(F.sum("rc")).collect()[0][0] or 0)
    td, rd = n_t + smoothing * buckets, n_r + smoothing * buckets
    model = (
        t_counts.join(r_counts, "bucket", "full")
        .select(
            "bucket",
            (
                F.log((F.coalesce("tc", F.lit(0)) + smoothing) / F.lit(td))
                - F.log((F.coalesce("rc", F.lit(0)) + smoothing) / F.lit(rd))
            ).alias("log_ratio"),
        )
    )
    default = math.log(smoothing / td) - math.log(smoothing / rd)
    return model, default


def with_dsir_weight(
    df: DataFrame,
    model: DataFrame,
    default_log_ratio: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_max: int = 2,
    buckets: int = 10_000,
    out: str = "dsir_logw",
) -> DataFrame:
    """Per-document log importance weight.  The model side is ≤ `buckets`
    rows by construction, so the broadcast hint is safe (contrast the
    gated unigram-LM broadcast).  Zero-n-gram docs get weight 0.0 (no
    evidence either way)."""
    grams = _hashed_ngram_buckets(
        df.select(id_col, text_col), text_col, n_max, buckets
    ).select(id_col, "bucket")
    scored = grams.join(F.broadcast(model), "bucket", "left").select(
        id_col,
        F.coalesce("log_ratio", F.lit(default_log_ratio)).alias("lr"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"), F.round(F.sum("lr"), 4).alias(out)
    )
    return df.join(per_doc, id_col, "left").select(
        df["*"],
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce(out, F.lit(0.0)).alias(out),
    )


def dsir_resample(
    df: DataFrame,
    k: int,
    weight_col: str = "dsir_logw",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Gumbel-top-k selection: keep the k docs maximizing
    logw + Gumbel(md5-uniform) — a without-replacement sample with
    P(select) ∝ exp(logw) (Efraimidis-Spirakis via Gumbel keys).  The
    noise is md5-derived, so selection is deterministic and replayable;
    the top-k is a TakeOrderedAndProject-shaped rank, never a global
    sort materialization."""
    u = (
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.col(id_col), F.lit(seed))), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(_M),
        )
        + F.lit(0.5)
    ) / F.lit(float(_M))
    key = F.col(weight_col) + (-F.log(-F.log(u)))
    ranked = df.withColumn("_gkey", key)
    # deterministic tie-break on id; the continuous Gumbel key makes real
    # ties measure-zero, the id term makes tests replayable regardless
    w = ranked.orderBy(F.col("_gkey").desc(), F.col(id_col)).limit(k)
    return w.drop("_gkey")
