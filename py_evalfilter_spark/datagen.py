"""Seeded synthetic transcript + profile-event generator (FIXTURES.md §1-2).

Deterministic (numpy RandomState, fixed epoch base — never wall-clock).
Produces the `input_hint` schema:
    transcripts(conv_id:string, turn_idx:int32, role:string, text:string,
                tool:string, ts:timestamp)
plus the slowly-changing side table:
    profile_events(conv_id, ts, empathies:int, hasproposal:boolean,
                   state:string, gender:string, birthyear:int, job:string)

Text mixes every character class the feature map counts (katakana, hiragana,
kanji, latin, digits, marks, punct, full-width latin/digits and half-width
kana for NFKC edges), embedded newline variants, near-empty texts, and
consecutive near-duplicates; conversation sizes are Zipf-skewed so a few
mega-conversations exercise salting/AQE; timestamps have ties, small
out-of-order jitter, and gaps larger than the session threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EPOCH_BASE = 1704067200  # 2024-01-01T00:00:00Z, pinned (never now())
SESSION_GAP_S = 1800  # 30 min session gap used across tests/engine defaults

_KATA = ["カタカナ", "テスト", "スパーク", "データ", "ｽﾋﾟｰﾄﾞ", "パイプライン"]
_HIRA = ["これは", "です", "ながれ", "とても", "すごい", "はやい"]
_KANJI = ["変換", "日本語", "処理", "分散", "計算", "集計"]
_LATIN = ["spark", "Feature", "pipeline", "JOIN", "Ｆｕｌｌ", "ｗｉｄｔｈ", "token"]
_DIGIT = ["123", "42", "２０２４", "7", "100000"]
_MARK = ["!", "?", "！", "？", "!?"]
_PUNCT = ["、", "。", "「", "」", "（", "）", "＆", "ー", "-", "＃", "￥"]
_WS = [" ", "  ", "　", "\n", "\\n", "\r"]
_POOLS = [_KATA, _HIRA, _KANJI, _LATIN, _DIGIT, _MARK, _PUNCT]

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "exec", "browse", "none"]
STATES = ["tokyo", "osaka", "kyoto", "nagoya", "fukuoka"]
JOBS = ["eng", "sales", "student", "none"]
GENDERS = ["unk", "male", "female"]


def _make_text(rng: np.random.RandomState) -> str:
    n = int(rng.randint(1, 14))
    parts: list[str] = []
    for _ in range(n):
        pool = _POOLS[int(rng.randint(0, len(_POOLS)))]
        parts.append(pool[int(rng.randint(0, len(pool)))])
        if rng.rand() < 0.6:
            parts.append(_WS[int(rng.randint(0, len(_WS)))])
    return "".join(parts)


def make_transcripts(n_convs: int = 40, seed: int = 42, mega_every: int = 13) -> pd.DataFrame:
    """Deterministic transcript table; every ``mega_every``-th conversation is
    a mega-conversation (skew)."""
    rng = np.random.RandomState(seed)
    rows = []
    for ci in range(n_convs):
        conv_id = f"conv_{ci:06d}"
        n_turns = int(rng.zipf(1.6) % 30) + 3
        if mega_every and ci % mega_every == 0:
            n_turns += int(rng.randint(60, 120))  # mega-conversation
        t = EPOCH_BASE + int(rng.randint(0, 30 * 86400))
        for ti in range(n_turns):
            gap = int(rng.randint(1, 120))
            if rng.rand() < 0.06:
                gap = SESSION_GAP_S + int(rng.randint(60, 7200))  # session break
            if rng.rand() < 0.05:
                gap = 0  # timestamp tie
            t += gap
            jitter = -int(rng.randint(1, 30)) if rng.rand() < 0.04 else 0
            text = _make_text(rng)
            r = rng.rand()
            if r < 0.02:
                text = ""  # zero-token doc (avgTokenLength divergence edge)
            elif r < 0.04:
                text = _MARK[int(rng.randint(0, len(_MARK)))]
            elif r < 0.07 and rows and rows[-1][0] == conv_id:
                text = rows[-1][3] + "!"  # near-duplicate of previous turn
            tool = TOOLS[int(rng.randint(0, len(TOOLS)))] if rng.rand() < 0.35 else None
            rows.append(
                (
                    conv_id,
                    ti,
                    ROLES[int(rng.randint(0, len(ROLES)))],
                    text,
                    tool,
                    t + jitter,
                )
            )
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    return df


def make_profile_events(transcripts: pd.DataFrame, seed: int = 43) -> pd.DataFrame:
    """Slowly-changing side table keyed (conv_id, ts); unique ts per conv_id.

    Some versions are stamped *after* the conversation's last turn — the
    leakage trap: an as-of join must never surface them to earlier turns.
    """
    rng = np.random.RandomState(seed)
    spans = transcripts.groupby("conv_id")["ts"].agg(["min", "max"])
    rows = []
    for conv_id, (ts_min, ts_max) in spans.iterrows():
        lo = int(ts_min.timestamp())
        hi = int(ts_max.timestamp())
        n_versions = int(rng.randint(1, 5))
        offs = set()
        for v in range(n_versions):
            if v == n_versions - 1 and rng.rand() < 0.3:
                off = hi + int(rng.randint(60, 86400))  # future version: leakage trap
            else:
                off = lo + int(rng.randint(-3600, max(hi - lo, 1)))
            while off in offs:
                off += 1
            offs.add(off)
            rows.append(
                (
                    conv_id,
                    off,
                    int(rng.randint(0, 50)),
                    bool(rng.rand() < 0.5),
                    STATES[int(rng.randint(0, len(STATES)))],
                    GENDERS[int(rng.randint(0, len(GENDERS)))],
                    0 if rng.rand() < 0.1 else int(rng.randint(1950, 2010)),
                    JOBS[int(rng.randint(0, len(JOBS)))],
                )
            )
    df = pd.DataFrame(
        rows,
        columns=["conv_id", "ts", "empathies", "hasproposal", "state", "gender", "birthyear", "job"],
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    return df.sort_values(["conv_id", "ts"]).reset_index(drop=True)
