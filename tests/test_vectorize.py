"""Spark vectorizers vs golden sklearn-0.16-parity implementation."""

import numpy as np
import pandas as pd
import pytest

from py_evalfilter_spark import golden
from py_evalfilter_spark import textcore as tc
from py_evalfilter_spark.operators import vectorize

CFG = dict(tokenizer="token_type", ngram_range=(1, 3), min_df=5, max_features=50)


def _golden_vocab(texts, cfg=CFG):
    return golden.fit_vocabulary(
        texts,
        tc.tokenize_token_type,
        ngram_range=cfg["ngram_range"],
        min_df=cfg["min_df"],
        max_features=cfg["max_features"],
    )


def _dense_from_long(long_pdf, n_docs, n_vocab, id_to_row):
    X = np.zeros((n_docs, n_vocab))
    for _, r in long_pdf.iterrows():
        X[id_to_row[(r["conv_id"], r["turn_idx"])], int(r["index"])] = r["value"]
    return X


class TestVectorizeSpark:
    def test_vocab_matches_golden(self, spark, transcripts_sdf, transcripts_pdf):
        vocab = vectorize.fit_vocabulary(transcripts_sdf, **CFG)
        got = vectorize.vocabulary_to_list(vocab)
        want = _golden_vocab(transcripts_pdf["text"].tolist())
        assert got == want

    def test_counts_match_golden(self, spark, transcripts_sdf, transcripts_pdf):
        vocab = vectorize.fit_vocabulary(transcripts_sdf, **CFG)
        tcfg = {k: CFG[k] for k in ("tokenizer", "ngram_range")}
        long_pdf = vectorize.transform_counts(transcripts_sdf, vocab, **tcfg).toPandas()
        terms = vectorize.vocabulary_to_list(vocab)
        keys = list(zip(transcripts_pdf["conv_id"], transcripts_pdf["turn_idx"]))
        id_to_row = {k: i for i, k in enumerate(keys)}
        X = _dense_from_long(long_pdf, len(keys), len(terms), id_to_row)
        want = golden.transform_counts(
            transcripts_pdf["text"].tolist(), terms, tc.tokenize_token_type, CFG["ngram_range"]
        )
        assert np.allclose(X, want)

    def test_tfidf_matches_golden(self, spark, transcripts_sdf, transcripts_pdf):
        vocab = vectorize.fit_vocabulary(transcripts_sdf, **CFG)
        tcfg = {k: CFG[k] for k in ("tokenizer", "ngram_range")}
        long_pdf = vectorize.transform_counts(
            transcripts_sdf, vocab, tfidf=True, **tcfg
        ).toPandas()
        terms = vectorize.vocabulary_to_list(vocab)
        texts = transcripts_pdf["text"].tolist()
        keys = list(zip(transcripts_pdf["conv_id"], transcripts_pdf["turn_idx"]))
        id_to_row = {k: i for i, k in enumerate(keys)}
        X = _dense_from_long(long_pdf, len(keys), len(terms), id_to_row)
        idf = golden.idf_vector(texts, terms, tc.tokenize_token_type, CFG["ngram_range"])
        want = golden.transform_tfidf(texts, terms, idf, tc.tokenize_token_type, CFG["ngram_range"])
        assert np.allclose(X, want, atol=1e-12)

    def test_point_in_time_fit(self, spark, transcripts_sdf, transcripts_pdf):
        cutoff = transcripts_pdf["ts"].quantile(0.4)
        vocab = vectorize.fit_vocabulary(transcripts_sdf, cutoff_ts=cutoff, **CFG)
        got = vectorize.vocabulary_to_list(vocab)
        want = golden.fit_vocabulary_asof(
            transcripts_pdf,
            cutoff,
            tokenizer=tc.tokenize_token_type,
            ngram_range=CFG["ngram_range"],
            min_df=CFG["min_df"],
            max_features=CFG["max_features"],
        )
        assert got == want

    def test_point_in_time_leakage_property(self, spark, transcripts_pdf):
        """Mutating texts after the cutoff must not change the fitted vocab."""
        cutoff = transcripts_pdf["ts"].quantile(0.4)
        base = spark.createDataFrame(transcripts_pdf)
        v1 = vectorize.vocabulary_to_list(
            vectorize.fit_vocabulary(base, cutoff_ts=cutoff, **CFG)
        )
        mutated = transcripts_pdf.copy()
        fut = mutated["ts"] > cutoff
        assert fut.any()
        mutated.loc[fut, "text"] = "MUTATEDFUTURETEXT 毎回 違う"
        v2 = vectorize.vocabulary_to_list(
            vectorize.fit_vocabulary(spark.createDataFrame(mutated), cutoff_ts=cutoff, **CFG)
        )
        assert v1 == v2

    def test_min_df_and_max_features_edges(self, spark):
        pdf = pd.DataFrame(
            {
                "conv_id": ["c"] * 4,
                "turn_idx": pd.array(range(4), dtype="int32"),
                "text": ["a a b", "a c", "a b", "d"],
                "ts": pd.to_datetime([1, 2, 3, 4], unit="s"),
            }
        )
        sdf = spark.createDataFrame(pdf)
        cfg = dict(tokenizer="rant", ngram_range=(1, 1), min_df=2)
        # note: tokenizer 'rant' min_length=2 drops 1-char tokens; use 2-char
        pdf2 = pdf.assign(text=["aa aa bb", "aa cc", "aa bb", "dd"])
        sdf2 = spark.createDataFrame(pdf2)
        got = vectorize.vocabulary_to_list(vectorize.fit_vocabulary(sdf2, **cfg))
        assert got == ["aa", "bb"]
        got_top1 = vectorize.vocabulary_to_list(
            vectorize.fit_vocabulary(sdf2, tokenizer="rant", ngram_range=(1, 1), min_df=1, max_features=2)
        )
        assert got_top1 == ["aa", "bb"]  # tf desc, term asc tie-break


def test_fit_vocabulary_stop_words(spark):
    """stop_words threads through analyzer_udf → fit/transform (the
    reference's STOPWORDS surface, analysis.py:8-13)."""
    import pandas as pd

    from py_evalfilter_spark import textcore as tc
    from py_evalfilter_spark.operators import vectorize

    pdf = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c"],
            "turn_idx": pd.array([0, 0, 0], dtype="int32"),
            # これ/for/etc are in STOPWORDS_JA and accent-stable under the
            # analyzer's sklearn strip_accents preprocessing (which runs
            # BEFORE the stopword cut, so e.g. です→てす would NOT match)
            "text": ["これ test for data", "test data etc これ", "data for test"],
        }
    )
    sdf = spark.createDataFrame(pdf)
    vocab = vectorize.fit_vocabulary(sdf, min_df=1, stop_words=tc.STOPWORDS_JA)
    terms = vectorize.vocabulary_to_list(vocab)
    assert "これ" not in terms and "for" not in terms and "etc" not in terms
    assert "test" in terms and "data" in terms
    out = vectorize.transform_counts(sdf, vocab, stop_words=tc.STOPWORDS_JA).toPandas()
    assert len(out) > 0


def test_transform_hashing_fit_free_alignment(spark):
    """HashingVectorizer semantics: same term -> same index with NO shared
    fitted state (the cross-corpus alignment CountVectorizer can't give),
    indexes bounded by n_features, values exact signed counts."""
    import pandas as pd

    from py_evalfilter_spark.operators import vectorize

    def corpus(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "conv_id": [f"c{i}" for i in range(len(rows))],
                    "turn_idx": pd.array([0] * len(rows), dtype="int32"),
                    "text": rows,
                }
            )
        )

    a = vectorize.transform_hashing(
        corpus(["alpha beta beta", "gamma alpha"]), n_features=64, tokenizer="rant"
    ).toPandas()
    b = vectorize.transform_hashing(
        corpus(["beta delta", "alpha epsilon"]), n_features=64, tokenizer="rant"
    ).toPandas()
    assert (a["index"] >= 0).all() and (a["index"] < 64).all()
    # doc c0 of corpus A has beta twice: its bucket's |value| for that doc is 2
    # (signs are per-term constants, so repeats accumulate, never cancel)
    assert 2 in a["value"].abs().values
    # alignment: alpha hashes to the same bucket in both corpora
    def bucket_of(pdf, doc, exclude=()):
        sub = pdf[pdf["conv_id"] == doc]
        return set(sub["index"]) - set(exclude)

    a_c1 = bucket_of(a, "c1")  # gamma alpha
    b_c1 = bucket_of(b, "c1")  # alpha epsilon
    assert a_c1 & b_c1  # the shared term (alpha) lands in the same bucket

    # l2 norm path: per-doc vector norms are 1
    n = vectorize.transform_hashing(
        corpus(["alpha beta gamma"]), n_features=64, tokenizer="rant", l2_norm=True
    ).toPandas()
    assert abs((n["value"] ** 2).sum() - 1.0) < 1e-9
