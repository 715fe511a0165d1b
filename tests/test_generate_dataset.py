"""End-to-end dataset generation vs a golden hstack of all blocks."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from py_evalfilter_spark import golden
from py_evalfilter_spark import textcore as tc
from py_evalfilter_spark.datagen import make_transcripts
from py_evalfilter_spark.plans import generate_dataset

HEADER = ",".join(f"col{i}" for i in range(16))


def _rant_csv_rows(texts, statuses):
    rows = []
    for i, (t, s) in enumerate(zip(texts, statuses)):
        safe = t.replace("\n", " ").replace("\r", " ").replace("'", "")
        rows.append(f"{i},1,0,1,0,'{safe}',{s},1,5,x,y,1990,tokyo,1,eng,100")
    return rows


@pytest.fixture(scope="module")
def gvsb_dir(tmp_path_factory):
    texts = make_transcripts(n_convs=25, seed=9)["text"].tolist()
    texts = [t if t.strip() else "ダミー text" for t in texts][:120]
    half = len(texts) // 2
    d = tmp_path_factory.mktemp("gvsb")
    (d / "bad-rants.csv").write_text(
        "\n".join([HEADER] + _rant_csv_rows(texts[:half], [250] * half)), encoding="utf-8"
    )
    (d / "good-rants.csv").write_text(
        "\n".join([HEADER] + _rant_csv_rows(texts[half:], [100] * (len(texts) - half))),
        encoding="utf-8",
    )
    return str(d), texts


CFG = dict(
    type_ngram=3, type_min_df=5, type_max_features=50,
    pos_ngram=2, pos_min_df=5, pos_max_features=100,
    word_min_df=3, word_max_features=40,  # the reference's rant_bow block ON
)


def test_gvsb_end_to_end_matches_golden(spark, gvsb_dir, tmp_path):
    src, _ = gvsb_dir
    out_dir = str(tmp_path / "out")
    res = generate_dataset.generate_gvsb(
        spark, src, out_dir, n_folds=3, n_folds_max=2, **CFG
    )
    header = json.load(open(f"{out_dir}/vocabulary.json"))
    assert res["n_features"] == len(header)
    assert header[:19] == list(tc.FEATURE_NAMES)  # rant_stats block first

    # reload every written fold and compare the union against golden hstack
    from py_evalfilter_spark.sources import rants_csv

    data = rants_csv.load_fuman_gvb(spark, src).toPandas()
    texts = [tc.nfkc(t) for t in data["rant"]]  # loader already NFKC'd; idempotent
    stats = golden.golden_rant_stats(__import__("pandas").Series(data["rant"])).to_numpy()
    type_vocab = golden.fit_vocabulary(
        texts, tc.tokenize_token_type, ngram_range=(1, 3), min_df=5, max_features=50
    )
    type_X = golden.transform_counts(texts, type_vocab, tc.tokenize_token_type, (1, 3))
    pos_vocab = golden.fit_vocabulary(
        texts, lambda s: tc.tokenize_pos(s), ngram_range=(1, 2), min_df=5, max_features=100
    )
    pos_X = golden.transform_counts(texts, pos_vocab, lambda s: tc.tokenize_pos(s), (1, 2))
    # rant_bow: word-token TF-IDF (generate_dataset_price.py:124-130)
    word_vocab = golden.fit_vocabulary(
        texts, tc.tokenize_rant, ngram_range=(1, 1), min_df=3, max_features=40
    )
    word_idf = golden.idf_vector(texts, word_vocab, tc.tokenize_rant, (1, 1))
    word_X = golden.transform_tfidf(texts, word_vocab, word_idf, tc.tokenize_rant, (1, 1))
    want = np.hstack([stats, type_X, pos_X, word_X])
    assert header[19 : 19 + len(type_vocab)] == type_vocab
    assert header[19 + len(type_vocab) : 19 + len(type_vocab) + len(pos_vocab)] == pos_vocab
    assert header[19 + len(type_vocab) + len(pos_vocab) :] == word_vocab

    got_rows = []
    for fold in res["folds"]:
        back = spark.read.format("libsvm").option("numFeatures", len(header)).load(fold)
        got_rows += [(r["label"], r["features"].toArray()) for r in back.collect()]
    # folds are a partition of a subset of rows; every written row must match
    # some golden row exactly (same label, allclose features)
    want_by_label = {}
    for i in range(len(texts)):
        want_by_label.setdefault(data["target"][i], []).append(want[i])
    matched = 0
    for label, vec in got_rows:
        cands = want_by_label[int(label)]
        assert any(np.allclose(vec, w) for w in cands), f"row not in golden set (label={label})"
        matched += 1
    assert matched == len(got_rows) > 0
    # 2 of 3 folds written → roughly 2/3 of rows
    assert len(got_rows) == pytest.approx(len(texts) * 2 / 3, abs=6)


def test_price_end_to_end_runs(spark, gvsb_dir, tmp_path):
    src, texts = gvsb_dir
    # price loader wants a single csv with 16 cols incl. price
    import os

    price_csv = str(tmp_path / "rants-price.csv")
    half = len(texts) // 2
    rows = _rant_csv_rows(texts[:40], [250] * 40)
    open(price_csv, "w", encoding="utf-8").write("\n".join([HEADER] + rows))
    out_dir = str(tmp_path / "pout")
    res = generate_dataset.generate_price(
        spark, price_csv, out_dir,
        type_ngram=2, type_min_df=3, type_max_features=30,
        pos_ngram=2, pos_min_df=3, pos_max_features=40,
    )
    header = json.load(open(f"{out_dir}/vocabulary.json"))
    assert res["n_features"] == len(header)
    back = spark.read.format("libsvm").option("numFeatures", len(header)).load(res["folds"][0])
    rows_back = back.collect()
    assert len(rows_back) == 40
    assert all(r["label"] == 100.0 for r in rows_back)  # price target
    # profile one-hots present and alpha-sorted before the text blocks
    onehots = [h for h in header if "=" in h or h in ("empathies", "birthyear")]
    assert onehots == sorted(onehots)
    assert "gender=male" in header


def test_generate_plan_has_no_row_python_udf(spark, gvsb_dir):
    """The dataset-assembly plan must contain zero row-at-a-time Python
    (BatchEvalPython); the only Python stages are Arrow-vectorized
    (ArrowEvalPython: analyzer + rant-stats UDFs)."""
    from py_evalfilter_spark.sources import rants_csv

    src, _ = gvsb_dir
    data = rants_csv.load_fuman_gvb(spark, src)
    matrix, header = generate_dataset.build_feature_matrix(data, **CFG)
    lines = generate_dataset._svmlight_lines(matrix, label_col="target")
    plan = lines._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_svmlight_line_format(spark):
    import pandas as pd

    pdf = pd.DataFrame({"target": [1], "rant": ["dummy"]})
    df = spark.createDataFrame(pdf).selectExpr(
        "target",
        f"CAST(array(struct(0 AS index, 2.5 AS value), struct(3 AS index, 1.0 AS value)) AS {generate_dataset.ENTRY_TYPE}) AS features_entries",
    )
    lines = generate_dataset._svmlight_lines(df, "target").collect()
    assert lines[0]["value"] == "1.0 1:2.5 4:1.0"
