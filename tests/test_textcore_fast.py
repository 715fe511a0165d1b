"""Exact-parity tests: vectorized batch_rant_stats ≡ reference rant_stats."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from py_evalfilter_spark import textcore as tc
from py_evalfilter_spark import textcore_fast as tcf
from py_evalfilter_spark.datagen import make_transcripts


def _slow(texts):
    rows = [tc.rant_stats(tc.nfkc(t if isinstance(t, str) else "")) for t in texts]
    return pd.DataFrame(rows, columns=list(tc.FEATURE_NAMES)).astype("float64")


def _assert_equal(texts):
    fast = tcf.batch_rant_stats(texts)
    slow = _slow(texts)
    if not np.allclose(fast.to_numpy(), slow.to_numpy(), equal_nan=True):
        diff = (fast - slow).abs().max()
        raise AssertionError(f"mismatch:\n{diff[diff > 0]}\non texts={texts!r}")


def test_edge_cases():
    _assert_equal(
        [
            "",
            " ",
            "　",
            "!",
            "！？",
            "ー",
            "ーー",
            "\n",
            "\\n",
            "a\\nb",
            "a\nb\rc",
            "²³",  # OTHER-class but str.isdigit() → digit token type
            "½",
            "スパークspark 123です！。",
            "Ｆｕｌｌｗｉｄｔｈ１２３",
            "ｽﾋﾟｰﾄﾞ",
            "変わる毎日",
            '{"k": 87}',
            "\x00\x01",
            "漢字とひらがなとカタカナとlatinと123と!?と。、",
            "a" * 5000,
        ]
    )


def test_datagen_corpus():
    df = make_transcripts(n_convs=40, seed=42)
    _assert_equal(df["text"].tolist())


def test_empty_batch():
    out = tcf.batch_rant_stats([])
    assert out.shape == (0, 19)


def test_none_handling():
    _assert_equal(["abc"])
    fast = tcf.batch_rant_stats([None, "abc"])
    slow = _slow([None, "abc"])
    assert np.allclose(fast.to_numpy(), slow.to_numpy())


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0, max_codepoint=0x30FF),
            max_size=60,
        ),
        max_size=8,
    )
)
def test_fuzz_bmp_low(texts):
    _assert_equal(texts)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0x2000, max_codepoint=0x110FF),
            max_size=40,
        ),
        max_size=5,
    )
)
def test_fuzz_high_planes(texts):
    _assert_equal(texts)
