"""X5 downstream consumer (train/eval) + S9 csv2libsvm converter."""

import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_on_generated_fold(spark, tmp_path):
    """generate folds → GBT CV — the reference's full workflow on Spark.
    The gvsb labels are learnable here because bad/good rants get different
    text distributions in the fixture."""
    from py_evalfilter_spark.plans import generate_dataset, train_eval

    header = ",".join(f"col{i}" for i in range(16))
    # two clearly separable text populations
    bad_rows = [
        f"{i},1,0,1,0,'カタカナ クレーム 怒り {i}!!',250,1,5,x,y,1990,tokyo,1,eng,100"
        for i in range(40)
    ]
    good_rows = [
        f"{i},1,0,1,0,'nice plain english praise {i}',100,1,5,x,y,1990,tokyo,1,eng,100"
        for i in range(40)
    ]
    d = tmp_path / "src"
    d.mkdir()
    (d / "bad-rants.csv").write_text("\n".join([header] + bad_rows), encoding="utf-8")
    (d / "good-rants.csv").write_text("\n".join([header] + good_rows), encoding="utf-8")
    out = str(tmp_path / "folds")
    res = generate_dataset.generate_gvsb(
        spark, str(d), out, n_folds=2, n_folds_max=1,
        type_ngram=2, type_min_df=2, type_max_features=30,
        pos_ngram=2, pos_min_df=2, pos_max_features=40,
    )
    df = train_eval.load_fold(spark, res["folds"][0], num_features=res["n_features"])
    acc = train_eval.cross_val_accuracy(df, n_folds=3, max_iter=5, max_depth=2)
    assert acc > 0.9, f"separable fixture should be learnable, acc={acc}"


def test_csv2libsvm_converter(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("f1,f2,label\n1.0,2.0,1\n0.5,0.25,0\n")
    out = str(tmp_path / "svm")
    sys.path.insert(0, f"{REPO}/scripts")
    from csv2libsvm import convert

    n = convert(spark, str(src), out, label_col="label", header=True)
    assert n == 2
    back = spark.read.format("libsvm").load(out).collect()
    got = {(r["label"], tuple(r["features"].toArray())) for r in back}
    assert (1.0, (1.0, 2.0)) in got and (0.0, (0.5, 0.25)) in got
