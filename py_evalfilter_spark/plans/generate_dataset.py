"""End-to-end dataset generation — the reference's entry points as plans.

Mirrors /root/reference/src/generate_dataset_gvsb.py (good-vs-bad) and
src/generate_dataset_price.py (price regression): load labeled rants →
FeatureUnion of [RantStats dict-features | token-type n-gram BoW | POS
n-gram BoW (count or tfidf) | word-token TF-IDF (rant_bow)] → fold split →
dump folds + vocabulary JSON + metadata.  Same defaults as the reference
CLIs (gvsb: type (1,3)/min_df 25/max 500, pos (1,2)/min_df 25/max 4000;
price: pos max 3000/min_df 25, type max 1000/min_df 10, word_max_features
0 ⇒ rant_bow off, as in generate_dataset_price.py:38-45,124-130).

Block layout parity (FeatureUnion hstack order, generate_dataset_gvsb.py:74-90):
  [ rant_stats (19, alpha-sorted) | type_vec vocab | pos_vec vocab | word_vec vocab ]

Spark shape: every block stays LONG/sparse as an array<struct<index,value>>
column of ONE DataFrame (positional hstack ≡ row identity — SURVEY.md §2.6
J1); block concatenation is an index-shifted JVM array concat, and the
svmlight sink formats lines with pure string expressions.  Nothing
densifies (the reference's hstack().todense() OOM hazard, output.py:208,
does not exist here) and NO row-at-a-time Python UDF exists anywhere in
the plan — the only Python is the Arrow-vectorized analyzer/stats UDFs.
Downstream ML consumers read the written files with the JVM libsvm parser
(plans/train_eval.load_fold), so VectorUDT never materializes in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textfeats
from ..operators import splits, vectorize
from ..sources import rants_csv, sinks

ENTRY_TYPE = "array<struct<index:int,value:double>>"


def _with_doc_id(df: DataFrame) -> DataFrame:
    """Stable row id for block joins + fold assignment.

    monotonically_increasing_id is stable within one job's lineage (all
    blocks derive from this cached frame), which is all positional hstack
    needs; it is NOT reproducible across re-reads — ids never leave the job.
    """
    return df.withColumn("doc_id", F.monotonically_increasing_id()).cache()


def _entry_struct(index_col, value_col):
    return F.struct(index_col.cast("int").alias("index"), value_col.alias("value"))


def _shift_entries(entries_col, offset: int):
    """Re-base a sorted entries array onto a block offset (JVM transform)."""
    return F.transform(
        entries_col, lambda e: _entry_struct(e["index"] + F.lit(offset), e["value"])
    )


def _numeric_cols_entries(col_names: list[str]):
    """Dense numeric columns → sorted sparse entries (zeros dropped), all
    JVM array expressions: the DictVectorizer block without a Python UDF."""
    arr = F.array(*[F.col(f"`{c}`").cast("double") for c in col_names])
    return F.filter(
        F.transform(arr, lambda x, i: _entry_struct(i, x)),
        lambda e: e["value"] != 0.0,
    )


def _sparse_block(
    data: DataFrame,
    tokenizer: str,
    ngram_range: tuple[int, int],
    min_df: int,
    max_features: int,
    tfidf: bool,
    out_col: str,
) -> tuple[DataFrame, list[str]]:
    """Fit vocab + transform → (doc_id, sorted entries array), vocab terms."""
    # tokenize ONCE; fit and transform share the exploded terms frame
    shared_terms = vectorize.terms_df(
        data, text_col="rant", id_cols=["doc_id"],
        tokenizer=tokenizer, ngram_range=ngram_range,
    )
    vocab = vectorize.fit_vocabulary(
        data,
        text_col="rant",
        id_cols=["doc_id"],
        tokenizer=tokenizer,
        ngram_range=ngram_range,
        min_df=min_df,
        max_features=max_features,
        terms=shared_terms,
    )
    terms = vectorize.vocabulary_to_list(vocab)
    long = vectorize.transform_counts(
        data,
        vocab,
        text_col="rant",
        id_cols=["doc_id"],
        tokenizer=tokenizer,
        ngram_range=ngram_range,
        tfidf=tfidf,
        terms=shared_terms,
    )
    entries = long.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(_entry_struct(F.col("index"), F.col("value")))
        ).alias(out_col)
    )
    # left join: docs with no in-vocab terms get an empty entries array
    joined = data.select("doc_id").join(entries, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col(out_col), F.expr(f"CAST(array() AS {ENTRY_TYPE})")).alias(out_col),
    )
    return joined, terms


def build_feature_matrix(
    data: DataFrame,
    type_ngram: int = 3,
    type_min_df: int = 25,
    type_max_features: int = 500,
    pos_ngram: int = 2,
    pos_min_df: int = 25,
    pos_max_features: int = 4000,
    pos_vec_type: str = "count",
    word_min_df: int = 25,
    word_max_features: int = 0,
) -> tuple[DataFrame, list[str]]:
    """FeatureUnion: df with (doc_id, target/pass-through cols, 19 stats
    cols, features_entries sorted sparse array), full header in block order
    [stats | type | pos | word].

    ``word_max_features`` > 0 enables the reference's ``rant_bow`` block —
    TfidfVectorizer(tokenizer=tokenize_rant) over word tokens
    (generate_dataset_price.py:124-130; default 0 = off, matching the CLI).
    """
    data = _with_doc_id(data)
    out = textfeats.with_rant_stats(data, text_col="rant")

    header = list(textfeats.feature_fields())
    entries_cols = [_numeric_cols_entries(list(textfeats.feature_fields()))]
    block_specs = [
        ("type_vec", "token_type", (1, type_ngram), type_min_df, type_max_features, False),
        ("pos_vec", "pos", (1, pos_ngram), pos_min_df, pos_max_features,
         pos_vec_type == "tfidf"),
        ("word_vec", "rant", (1, 1), word_min_df, word_max_features, True),
    ]
    for out_col, tok, ng, mdf, mfeat, tfidf in block_specs:
        if not mfeat:
            continue
        block, terms = _sparse_block(data, tok, ng, mdf, mfeat, tfidf, out_col)
        out = out.join(block, "doc_id")
        entries_cols.append(_shift_entries(F.col(out_col), len(header)))
        header += terms
    features = entries_cols[0]
    for e in entries_cols[1:]:
        features = F.concat(features, e)
    # per-block arrays are index-sorted and offsets increase monotonically,
    # so the concat is globally sorted — the svmlight invariant
    return out.withColumn("features_entries", features), header


def _svmlight_lines(df: DataFrame, label_col: str, entries_col: str = "features_entries"):
    """label idx+1:value ... — pure JVM string expressions (svmlight is
    1-based; zeros were dropped at entry construction)."""
    parts = F.transform(
        F.col(entries_col),
        lambda e: F.concat(
            (e["index"] + 1).cast("string"), F.lit(":"), e["value"].cast("string")
        ),
    )
    return df.select(
        F.concat_ws(" ", F.col(label_col).cast("double").cast("string"), parts).alias("value")
    )


def write_svmlight_entries(
    df: DataFrame, path: str, label_col: str, entries_col: str = "features_entries"
) -> None:
    _svmlight_lines(df, label_col, entries_col).write.mode("overwrite").text(path)


def generate_gvsb(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    n_folds: int = 3,
    n_folds_max: int = 2,
    type_ngram: int = 3,
    type_min_df: int = 25,
    type_max_features: int = 500,
    pos_ngram: int = 2,
    pos_min_df: int = 25,
    pos_max_features: int = 4000,
    pos_vec_type: str = "count",
    word_min_df: int = 25,
    word_max_features: int = 0,
) -> dict:
    """The generate_dataset_gvsb.py entry point (defaults match its CLI)."""
    data = rants_csv.load_fuman_gvb(spark, source_dir)
    matrix, header = build_feature_matrix(
        data,
        type_ngram, type_min_df, type_max_features,
        pos_ngram, pos_min_df, pos_max_features, pos_vec_type,
        word_min_df, word_max_features,
    )
    matrix = splits.stratified_assign(matrix, "target", n_folds, order_col="doc_id")
    written = []
    for i in range(min(n_folds, n_folds_max)):
        fold_path = f"{output_dir}/gvsb-fold-{i + 1}"
        write_svmlight_entries(
            matrix.filter(F.col("fold") == i), fold_path, label_col="target"
        )
        written.append(fold_path)
    sinks.save_features_json(f"{output_dir}/vocabulary.json", header)
    sinks.save_dataset_metadata(
        f"{output_dir}/metadata.json",
        dataset="goodvsbad",
        source=source_dir,
        config={
            "n_folds": n_folds,
            "type": {"ngram": type_ngram, "min_df": type_min_df, "max_features": type_max_features},
            "pos": {"ngram": pos_ngram, "min_df": pos_min_df, "max_features": pos_max_features,
                    "vec_type": pos_vec_type},
            "word": {"min_df": word_min_df, "max_features": word_max_features},
            "n_features": len(header),
        },
    )
    return {"folds": written, "n_features": len(header)}


def generate_price(
    spark: SparkSession,
    source_path: str,
    output_dir: str,
    n_folds: int = 1,
    pos_min_df: int = 25,
    pos_max_features: int = 3000,
    type_min_df: int = 10,
    type_max_features: int = 1000,
    word_min_df: int = 25,
    word_max_features: int = 0,
    **kwargs,
) -> dict:
    """The generate_dataset_price.py entry point: price target + userprofile
    block (profile categoricals one-hot like DictVectorizer) + text blocks
    (incl. the optional rant_bow word TF-IDF, --word-max-features).

    Defaults match the reference price CLI (generate_dataset_price.py:38-45:
    pos 3000/min_df 25, type 1000/min_df 10, word off) — only the TYPE
    block is 1000/10; the POS block keeps the gvsb-style 25 min_df with a
    3000-feature cap."""
    data = rants_csv.load_fuman_userprofile(spark, source_path, target="price")
    # DictVectorizer semantics on the profile: numeric fields pass through,
    # string categoricals one-hot with 'field=value' names, alpha-sorted
    prof = data.select("userprofile.*")
    cat_cols = ["hasindustry", "hasoccupation", "hascompany", "hasprodname",
                "hasproposal", "state", "gender", "job"]
    num_cols = ["empathies", "birthyear"]
    # one aggregation pass collects every categorical domain (collect_set
    # drops NULLs) — not one driver job per column
    dom = prof.select([F.collect_set(c).alias(c) for c in cat_cols]).first()
    cat_values = {c: sorted(dom[c]) for c in cat_cols}
    onehot_names = sorted(
        [f"{c}={v}" for c in cat_cols for v in cat_values[c]] + num_cols
    )
    exprs = []
    for name in onehot_names:
        if "=" in name:
            c, v = name.split("=", 1)
            exprs.append(
                F.when(F.col(f"userprofile.{c}") == v, 1.0).otherwise(0.0).alias(name)
            )
        else:
            exprs.append(F.col(f"userprofile.{name}").cast("double").alias(name))
    flat = data.select("rant", "target", *exprs)

    matrix, header = build_feature_matrix(
        flat,
        pos_min_df=pos_min_df,
        pos_max_features=pos_max_features,
        type_min_df=type_min_df,
        type_max_features=type_max_features,
        word_min_df=word_min_df,
        word_max_features=word_max_features,
        **kwargs,
    )
    # profile block first: its entries occupy [0, len(onehot_names)), the
    # text blocks shift up — an index-shifted JVM concat, no assembler
    full = matrix.withColumn(
        "features_entries",
        F.concat(
            _numeric_cols_entries(onehot_names),
            _shift_entries(F.col("features_entries"), len(onehot_names)),
        ),
    )
    header = onehot_names + header
    out_path = f"{output_dir}/price-fold-1"
    write_svmlight_entries(full, out_path, label_col="target")
    sinks.save_features_json(f"{output_dir}/vocabulary.json", header)
    return {"folds": [out_path], "n_features": len(header)}
