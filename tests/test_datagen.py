"""Datagen determinism + coverage of the feature-map edge cases (FIXTURES.md §1-2)."""

import pandas as pd

from py_evalfilter_spark import datagen
from py_evalfilter_spark import textcore as tc


def test_deterministic():
    a = datagen.make_transcripts(n_convs=10, seed=42)
    b = datagen.make_transcripts(n_convs=10, seed=42)
    pd.testing.assert_frame_equal(a, b)
    pa = datagen.make_profile_events(a)
    pb = datagen.make_profile_events(b)
    pd.testing.assert_frame_equal(pa, pb)


def test_schema_and_coverage():
    df = datagen.make_transcripts(n_convs=40, seed=42)
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df["turn_idx"].dtype == "int32"
    assert str(df["ts"].dtype).startswith("datetime64")
    all_text = "".join(df["text"])
    # every char class the feature map counts must be present
    assert tc.count_unicode_chars(all_text, tc.KATAKANA) > 0
    assert tc.count_unicode_chars(all_text, tc.HIRAGANA) > 0
    assert tc.count_unicode_chars(all_text, tc.KANJI) > 0
    assert tc.count_unicode_chars(all_text, tc.ALPHA) > 0
    assert tc.count_unicode_chars(all_text, tc.DIGIT) > 0
    assert tc.count_chars_in_set(all_text, tc.MARKS) > 0
    assert tc.count_chars_in_set(all_text, tc.PUNCT) > 0
    assert "\n" in all_text and "\\n" in all_text and "\r" in all_text
    assert (df["text"] == "").any()  # zero-token edge
    assert df["tool"].isna().any()  # backfill edge
    # skew: at least one mega-conversation
    sizes = df.groupby("conv_id").size()
    assert sizes.max() > 60
    # session gaps exist
    d = df.sort_values(["conv_id", "turn_idx"])
    gaps = d.groupby("conv_id")["ts"].diff().dt.total_seconds()
    assert (gaps > datagen.SESSION_GAP_S).any()
    # out-of-order jitter exists (ts not monotone in turn_idx for some conv)
    assert (gaps < 0).any()


def test_profile_events_leakage_traps_and_unique_ts():
    t = datagen.make_transcripts(n_convs=40, seed=42)
    p = datagen.make_profile_events(t)
    assert not p.duplicated(["conv_id", "ts"]).any()
    last_turn = t.groupby("conv_id")["ts"].max()
    merged = p.join(last_turn.rename("last_ts"), on="conv_id")
    assert (merged["ts"] > merged["last_ts"]).any()  # future versions exist
