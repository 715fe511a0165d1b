"""End-to-end dataset generation — the reference's entry points as plans.

Mirrors /root/reference/src/generate_dataset_gvsb.py (good-vs-bad) and
src/generate_dataset_price.py (price regression): load labeled rants →
FeatureUnion of [RantStats dict-features | token-type n-gram BoW | POS
n-gram BoW (count or tfidf)] → fold split → dump folds + vocabulary JSON +
metadata.  Same defaults as the reference CLIs (gvsb: type (1,3)/min_df 25/
max 500, pos (1,2)/min_df 25/max 4000; price: pos max 1000/min_df 10).

Block layout parity (FeatureUnion hstack order, generate_dataset_gvsb.py:74-90):
  [ rant_stats (19, alpha-sorted) | type_vec vocab (sorted) | pos_vec vocab (sorted) ]

Spark shape: all three blocks are columns of ONE DataFrame (positional
hstack ≡ row identity — SURVEY.md §2.6 J1); BoW blocks stay sparse
(long-format → ml SparseVector) and VectorAssembler concatenates them, so
nothing densifies (the reference's hstack().todense() OOM hazard,
output.py:208, does not exist here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import textfeats
from ..operators import splits, vectorize
from ..sources import rants_csv, sinks


def _with_doc_id(df: DataFrame) -> DataFrame:
    """Stable row id for block joins + fold assignment.

    monotonically_increasing_id is stable within one job's lineage (all
    blocks derive from this cached frame), which is all positional hstack
    needs; it is NOT reproducible across re-reads — ids never leave the job.
    """
    return df.withColumn("doc_id", F.monotonically_increasing_id()).cache()


def _sparse_block(
    data: DataFrame,
    tokenizer: str,
    ngram_range: tuple[int, int],
    min_df: int,
    max_features: int,
    tfidf: bool,
    out_col: str,
) -> tuple[DataFrame, list[str]]:
    """Fit vocab + transform → (doc_id, SparseVector column), vocab terms."""
    from pyspark.ml.linalg import SparseVector, VectorUDT

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
    size = len(terms)
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
        F.sort_array(F.collect_list(F.struct("index", "value"))).alias("entries")
    )

    @F.udf(VectorUDT())
    def to_vec(entries):
        entries = entries or []
        return SparseVector(size, [e["index"] for e in entries], [e["value"] for e in entries])

    vec = entries.select("doc_id", to_vec("entries").alias(out_col))
    # left join: docs with no in-vocab terms get an empty sparse vector
    empty = F.udf(lambda: SparseVector(size, [], []), VectorUDT())
    joined = data.select("doc_id").join(vec, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col(out_col), empty()).alias(out_col)
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
) -> tuple[DataFrame, list[str]]:
    """FeatureUnion: (df with doc_id, target, 19 stats cols, type_vec,
    pos_vec, features vector), full header list in block order."""
    from pyspark.ml.feature import VectorAssembler

    data = _with_doc_id(data)
    stats = textfeats.with_rant_stats(data, text_col="rant")

    out = stats
    header = list(textfeats.feature_fields())
    blocks: list[str] = []
    if type_max_features:
        type_block, type_terms = _sparse_block(
            data, "token_type", (1, type_ngram), type_min_df, type_max_features,
            tfidf=False, out_col="type_vec",
        )
        out = out.join(type_block, "doc_id")
        header += type_terms
        blocks.append("type_vec")
    if pos_max_features:
        pos_block, pos_terms = _sparse_block(
            data, "pos", (1, pos_ngram), pos_min_df, pos_max_features,
            tfidf=(pos_vec_type == "tfidf"), out_col="pos_vec",
        )
        out = out.join(pos_block, "doc_id")
        header += pos_terms
        blocks.append("pos_vec")

    stat_cols = [f"`{c}`" for c in textfeats.feature_fields()]
    assembler = VectorAssembler(
        inputCols=textfeats.feature_fields() + blocks, outputCol="features"
    )
    return assembler.transform(out), header


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
) -> dict:
    """The generate_dataset_gvsb.py entry point (defaults match its CLI)."""
    data = rants_csv.load_fuman_gvb(spark, source_dir)
    matrix, header = build_feature_matrix(
        data,
        type_ngram, type_min_df, type_max_features,
        pos_ngram, pos_min_df, pos_max_features, pos_vec_type,
    )
    matrix = splits.stratified_assign(matrix, "target", n_folds, order_col="doc_id")
    written = []
    for i in range(min(n_folds, n_folds_max)):
        fold_path = f"{output_dir}/gvsb-fold-{i + 1}"
        matrix.filter(F.col("fold") == i).select(
            F.col("target").cast("double").alias("label"), "features"
        ).write.mode("overwrite").format("libsvm").save(fold_path)
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
            "n_features": len(header),
        },
    )
    return {"folds": written, "n_features": len(header)}


def generate_price(
    spark: SparkSession,
    source_path: str,
    output_dir: str,
    n_folds: int = 1,
    pos_min_df: int = 10,
    pos_max_features: int = 1000,
    **kwargs,
) -> dict:
    """The generate_dataset_price.py entry point: price target + userprofile
    block (profile categoricals one-hot like DictVectorizer) + text blocks."""
    data = rants_csv.load_fuman_userprofile(spark, source_path, target="price")
    # DictVectorizer semantics on the profile: numeric fields pass through,
    # string categoricals one-hot with 'field=value' names, alpha-sorted
    prof = data.select("userprofile.*")
    cat_cols = ["hasindustry", "hasoccupation", "hascompany", "hasprodname",
                "hasproposal", "state", "gender", "job"]
    num_cols = ["empathies", "birthyear"]
    cat_values = {
        c: sorted(r[0] for r in prof.select(c).distinct().collect() if r[0] is not None)
        for c in cat_cols
    }
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
        **kwargs,
    )
    from pyspark.ml.feature import VectorAssembler

    full = VectorAssembler(
        inputCols=[f"{n}" for n in onehot_names] + ["features"], outputCol="all_features"
    ).transform(matrix)
    header = onehot_names + header
    out_path = f"{output_dir}/price-fold-1"
    full.select(
        F.col("target").cast("double").alias("label"),
        F.col("all_features").alias("features"),
    ).write.mode("overwrite").format("libsvm").save(out_path)
    sinks.save_features_json(f"{output_dir}/vocabulary.json", header)
    return {"folds": [out_path], "n_features": len(header)}
