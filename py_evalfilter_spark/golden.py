"""Golden reference pipeline — pure pandas/numpy, no Spark.

Implements the reference's semantics (SURVEY.md §2.4/§2.5/§2.7, citing
/root/reference/src/evalfilter/features.py and src/generate_dataset_gvsb.py)
verbatim on small in-memory tables.  The Spark engine's output must be
``numpy.allclose`` to this at every (conv_id, turn_idx, ts) — this module IS
the correctness oracle for everything the DuckDB driver check can't express
(Arrow-UDF text features, vectorizers, as-of semantics on transcripts).
"""

from __future__ import annotations


import numpy as np
import pandas as pd

from . import textcore as tc

# ---------------------------------------------------------------------------
# per-turn feature map (features.py:70-115)
# ---------------------------------------------------------------------------


def golden_rant_stats(texts: pd.Series) -> pd.DataFrame:
    """One row per input text: the 19 features, columns alpha-sorted
    (DictVectorizer order, generate_dataset_gvsb.py:69-71)."""
    rows = [tc.rant_stats(tc.nfkc(t)) for t in texts]
    out = pd.DataFrame(rows, index=texts.index)
    return out[list(tc.FEATURE_NAMES)].astype("float64")


# ---------------------------------------------------------------------------
# windowed features over (conv_id, turn_idx, ts) — SURVEY.md §2.7 W2-W4
# ---------------------------------------------------------------------------


def golden_windowed(df: pd.DataFrame, session_gap_s: int = 1800) -> pd.DataFrame:
    """lag/lead, rolling count, tool backfill, gap sessionization.

    Order within a conversation: (turn_idx, ts) — the engine's stable order.
    """
    df = df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort").reset_index(drop=True)
    g = df.groupby("conv_id", sort=False)
    out = df.copy()
    out["prev_text"] = g["text"].shift(1)
    out["next_text"] = g["text"].shift(-1)
    out["prev_ts"] = g["ts"].shift(1)
    out["tool_ffill"] = g["tool"].ffill()
    gap = (out["ts"] - out["prev_ts"]).dt.total_seconds()
    out["is_session_start"] = ((gap > session_gap_s) | gap.isna()).astype("int32")
    out["session_seq"] = out.groupby("conv_id", sort=False)["is_session_start"].cumsum().astype("int64")
    out["session_id"] = out["conv_id"] + "#" + out["session_seq"].astype(str)
    out["turns_last3"] = (
        g["turn_idx"].rolling(window=4, min_periods=1).count().reset_index(level=0, drop=True).astype("int64")
    )
    return out


# ---------------------------------------------------------------------------
# as-of merge (SURVEY.md §2.6 J3): latest profile row with profile.ts <= turn.ts
# ---------------------------------------------------------------------------


def golden_asof(transcripts: pd.DataFrame, profiles: pd.DataFrame) -> pd.DataFrame:
    """Backward as-of, exact matches allowed; zero leakage by construction."""
    left = transcripts.sort_values("ts", kind="mergesort").reset_index(drop=True)
    right = profiles.sort_values("ts", kind="mergesort").reset_index(drop=True)
    merged = pd.merge_asof(
        left,
        right.rename(columns={"ts": "profile_ts"}),
        left_on="ts",
        right_on="profile_ts",
        by="conv_id",
        direction="backward",
        allow_exact_matches=True,
    )
    return merged.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)


# ---------------------------------------------------------------------------
# sklearn-0.16-parity vectorizers (SURVEY.md §2.5 A1-A4)
# ---------------------------------------------------------------------------


def fit_vocabulary(
    docs: list[str],
    tokenizer,
    ngram_range: tuple[int, int] = (1, 1),
    min_df: int = 1,
    max_features: int | None = None,
    stop_words: frozenset | None = None,
) -> list[str]:
    """CountVectorizer.fit vocabulary with sklearn semantics:

    * doc-frequency filter ``df >= min_df``;
    * ``max_features`` = top-k by total term frequency.  sklearn 0.16 breaks
      tf ties by unstable argsort; we pin the deterministic tie-break
      (tf desc, term asc) — documented divergence;
    * final vocabulary ordering: lexicographic (sklearn sorts at fit end).
    """
    df_counts: dict[str, int] = {}
    tf_counts: dict[str, int] = {}
    for doc in docs:
        terms = tc.analyze(doc, tokenizer, ngram_range, stop_words)
        for t in terms:
            tf_counts[t] = tf_counts.get(t, 0) + 1
        for t in set(terms):
            df_counts[t] = df_counts.get(t, 0) + 1
    terms = [t for t, d in df_counts.items() if d >= min_df]
    if max_features is not None and max_features > 0 and len(terms) > max_features:
        terms = sorted(terms, key=lambda t: (-tf_counts[t], t))[:max_features]
    return sorted(terms)


def transform_counts(
    docs: list[str],
    vocabulary: list[str],
    tokenizer,
    ngram_range: tuple[int, int] = (1, 1),
    stop_words: frozenset | None = None,
) -> np.ndarray:
    """CountVectorizer.transform → dense (n_docs, n_vocab) float64 counts."""
    index = {t: i for i, t in enumerate(vocabulary)}
    X = np.zeros((len(docs), len(vocabulary)), dtype="float64")
    for r, doc in enumerate(docs):
        for t in tc.analyze(doc, tokenizer, ngram_range, stop_words):
            i = index.get(t)
            if i is not None:
                X[r, i] += 1.0
    return X


def idf_vector(docs: list[str], vocabulary: list[str], tokenizer, ngram_range=(1, 1)) -> np.ndarray:
    """sklearn-0.16 smooth idf: ln((1+n)/(1+df)) + 1."""
    n = len(docs)
    df = np.zeros(len(vocabulary), dtype="float64")
    index = {t: i for i, t in enumerate(vocabulary)}
    for doc in docs:
        for t in set(tc.analyze(doc, tokenizer, ngram_range)):
            i = index.get(t)
            if i is not None:
                df[i] += 1.0
    return np.log((1.0 + n) / (1.0 + df)) + 1.0


def transform_tfidf(
    docs: list[str],
    vocabulary: list[str],
    idf: np.ndarray,
    tokenizer,
    ngram_range=(1, 1),
) -> np.ndarray:
    """tf*idf then l2 row normalization (sklearn 0.16 defaults: smooth_idf,
    norm='l2', sublinear_tf=False)."""
    X = transform_counts(docs, vocabulary, tokenizer, ngram_range) * idf
    norms = np.sqrt((X * X).sum(axis=1))
    norms[norms == 0.0] = 1.0
    return X / norms[:, None]


# ---------------------------------------------------------------------------
# point-in-time vectorizer fit: vocabulary from docs with ts <= cutoff only
# ---------------------------------------------------------------------------


def fit_vocabulary_asof(
    df: pd.DataFrame,
    cutoff_ts: pd.Timestamp,
    text_col: str = "text",
    ts_col: str = "ts",
    **kwargs,
) -> list[str]:
    """Leakage-free fit (SURVEY.md §2.5 point-in-time caveat): the fitted
    state sees only rows at or before the cutoff, mirroring
    vectorise_text_fit's fit/transform split (features.py:239-247)."""
    fit_docs = df.loc[df[ts_col] <= cutoff_ts, text_col].tolist()
    return fit_vocabulary(fit_docs, **kwargs)


# ---------------------------------------------------------------------------
# reference target/decode functions (fuman_base.py:17-66)
# ---------------------------------------------------------------------------


def gvb_target(status: int) -> int:
    if status == 100:
        return -1
    if 200 <= status < 300:
        return 1
    raise ValueError("Unexpected value for status")


def decode_gender(raw: str) -> str:
    gender_map = {0: "unk", 1: "male", 2: "female"}
    if raw == "\\0":
        return "unk"
    try:
        g = int(raw)
    except ValueError:
        return "unk"
    return gender_map.get(g, "unk")


def derive_age(birthyear: int, run_year: int) -> int:
    """get_age with the run date pinned (fuman_base.py:29-33; 0 sentinel kept)."""
    if birthyear == 0:
        return 0
    return run_year - birthyear
