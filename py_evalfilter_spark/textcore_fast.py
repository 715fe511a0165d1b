"""Vectorized (numpy) implementation of the 19-field feature map.

Semantics are IDENTICAL to textcore.rant_stats (the readable reference
implementation, itself pinned to /root/reference/src/evalfilter/features.py
per SURVEY.md §2.4); tests/test_textcore_fast.py asserts exact equality on
fixtures, edge cases, and hypothesis-fuzzed unicode.

Why this exists: the straightforward per-char Python path costs ~50µs/turn
and dominates the pipeline; this path classifies codepoints in bulk
(np.unique + cached dict), derives script runs with array diffs, and reduces
per-document with bincount — ~10-40x faster inside the same Arrow batch.

Key identities making this exact (derived from textcore semantics):
  * tokenize_rant LOWERCASES each run surface (textcore.py:165, mirroring
    reference analysis.py:16-19) BEFORE token_counts / token_type_counts, so
    token lengths and type predicates must be evaluated on the lowercase
    expansion, not the raw run: per codepoint we precompute
    ``chr(cp).lower()``'s length and its all-chars predicate flags
    (kata / hira / kanji-or-hira / alpha / isdigit); a token's predicate is
    then the AND (min-reduce) of its codepoints' flags and its length the
    SUM of expansion lengths.  This matters for codepoints whose lowercase
    crosses a script-name or length boundary (U+0130 'İ'→'i̇' len 2,
    U+212A KELVIN→'k', U+212B ANGSTROM→'å', U+2183 'Ↄ'→LATIN-named 'ↄ').
  * Python's str.lower() is context-sensitive only for U+03A3 (final
    sigma): 'σ' vs 'ς' have identical length and identical values for all
    five predicates, so the per-codepoint expansion is feature-exact even
    though it is not string-exact (pinned by test_sigma_context).
  * segmentation (run boundaries, SPACE-drop) uses RAW char classes — the
    reference segments before lowercasing;
  * char-level counts run on the RAW normalized text:
    kata/hira/kanji/alpha/digit name-prefix counts equal class counts
    (precedence can't steal: only 'ー' is both KATAKANA-named and
    PUNCT-set, and it classes KATA); punct = PUNCT-class count + 'ー'
    count; marks = MARK-class count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import textcore as tc

# class ids (order matters only for readability)
KATA, HIRA, KANJI, ALPHA, DIGIT, SPACE, MARK, PUNCT, OTHER = range(9)
_CLS_TO_ID = {
    "KATA": KATA,
    "HIRA": HIRA,
    "KANJI": KANJI,
    "ALPHA": ALPHA,
    "DIGIT": DIGIT,
    "SPACE": SPACE,
    "MARK": MARK,
    "PUNCT": PUNCT,
    "OTHER": OTHER,
}

_PROLONGED = 0x30FC  # 'ー'

# per-process lazy codepoint cache:
# cp -> (raw class_id, lowercase-expansion length,
#        low all-kata, low all-hira, low all-(kanji|hira), low all-alpha,
#        low isdigit)
_cp_props: dict[int, tuple[int, int, bool, bool, bool, bool, bool]] = {}


def _lookup(cp: int) -> tuple[int, int, bool, bool, bool, bool, bool]:
    p = _cp_props.get(cp)
    if p is None:
        ch = chr(cp)
        # token-level predicates and lengths run on the LOWERCASE expansion
        # (tokenize_rant lowercases before token_counts/token_type_counts);
        # the raw class drives segmentation and char counts only.
        low = ch.lower()
        p = (
            _CLS_TO_ID[tc._char_class(ch)],
            len(low),
            all(tc.is_katakana(c) for c in low),
            all(tc.is_hiragana(c) for c in low),
            all(tc.is_kanji(c) or tc.is_hiragana(c) for c in low),
            all(tc.is_alphabet(c) for c in low),
            low.isdigit(),
        )
        _cp_props[cp] = p
    return p


def _encode(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate texts → (codepoint array, per-text lengths)."""
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    joined = "".join(texts)
    # surrogatepass: lone surrogates can't appear in Arrow-delivered strings,
    # but don't let a malformed driver-side string crash the batch
    codes = np.frombuffer(joined.encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
    return codes, lens


def _classify(codes: np.ndarray) -> tuple[np.ndarray, ...]:
    """codes → (raw class ids, low length, low kata/hira/kanji|hira/alpha
    flags, low isdigit flags) using the lazy codepoint cache."""
    if codes.size == 0:
        e8 = np.empty(0, np.int8)
        eb = np.empty(0, bool)
        return e8, np.empty(0, np.int16), eb, eb.copy(), eb.copy(), eb.copy(), eb.copy()
    uniq, inv = np.unique(codes, return_inverse=True)
    m = len(uniq)
    cls_u = np.empty(m, np.int8)
    len_u = np.empty(m, np.int16)
    flag_u = np.empty((m, 5), bool)
    for i, cp in enumerate(uniq.tolist()):
        c, ln, lk, lh, lkh, la, ld = _lookup(cp)
        cls_u[i] = c
        len_u[i] = ln
        flag_u[i, 0] = lk
        flag_u[i, 1] = lh
        flag_u[i, 2] = lkh
        flag_u[i, 3] = la
        flag_u[i, 4] = ld
    f = flag_u[inv]
    return cls_u[inv], len_u[inv], f[:, 0], f[:, 1], f[:, 2], f[:, 3], f[:, 4]


def batch_rant_stats(texts) -> pd.DataFrame:
    """Vectorized rant_stats over an iterable of raw (pre-NFKC) strings.

    Returns a DataFrame with the 19 FEATURE_NAMES columns (float64), row
    order matching the input.
    """
    normed = [tc.nfkc(t) if isinstance(t, str) else "" for t in texts]
    n = len(normed)
    out = np.zeros((n, len(tc.FEATURE_NAMES)), dtype="float64")
    col = {name: i for i, name in enumerate(tc.FEATURE_NAMES)}

    # ---- char counts on the normalized, UNscrubbed text -------------------
    codes, lens = _encode(normed)
    cls = _classify(codes)[0]
    if codes.size:
        doc = np.repeat(np.arange(n, dtype=np.int64), lens)
        cc = np.bincount(doc * 9 + cls, minlength=n * 9).reshape(n, 9)
        prolonged = np.bincount(doc[codes == _PROLONGED], minlength=n)
    else:
        cc = np.zeros((n, 9), dtype=np.int64)
        prolonged = np.zeros(n, dtype=np.int64)
    out[:, col["kata"]] = cc[:, KATA]
    out[:, col["hira"]] = cc[:, HIRA]
    out[:, col["kanji"]] = cc[:, KANJI]
    out[:, col["alpha"]] = cc[:, ALPHA]
    out[:, col["digit"]] = cc[:, DIGIT]
    out[:, col["marks"]] = cc[:, MARK]
    out[:, col["punct"]] = cc[:, PUNCT] + prolonged

    # ---- token stats on the scrubbed text ---------------------------------
    scrubbed = [tc.scrub_newlines(t) for t in normed]
    s_codes, s_lens = _encode(scrubbed)
    if s_codes.size:
        s_cls, s_llen, s_lk, s_lh, s_lkh, s_la, s_ld = _classify(s_codes)
        s_doc = np.repeat(np.arange(n, dtype=np.int64), s_lens)
        start = np.empty(len(s_codes), dtype=bool)
        start[0] = True
        np.not_equal(s_cls[1:], s_cls[:-1], out=start[1:])
        start[1:] |= s_doc[1:] != s_doc[:-1]
        starts = np.flatnonzero(start)
        run_cls = s_cls[starts]
        run_doc = s_doc[starts]
        # token length = length of the LOWERCASED surface (sum of per-char
        # lowercase-expansion lengths; 'İ' expands to 2 chars)
        run_len = np.add.reduceat(s_llen.astype(np.int64), starts)
        # per-token all(...) predicate ⇔ min over run of per-char flags,
        # evaluated on the lowercase expansion (textcore.py:165 lowers first)
        def _run_all(flags: np.ndarray) -> np.ndarray:
            return np.minimum.reduceat(flags.astype(np.int8), starts).astype(bool)

        run_kata = _run_all(s_lk)
        run_hira = _run_all(s_lh)
        run_kanji = _run_all(s_lkh)
        run_alpha = _run_all(s_la)
        run_isdig = _run_all(s_ld)

        keep = run_cls != SPACE
        run_doc, run_len = run_doc[keep], run_len[keep]
        run_kata, run_hira, run_kanji, run_alpha, run_isdig = (
            run_kata[keep],
            run_hira[keep],
            run_kanji[keep],
            run_alpha[keep],
            run_isdig[keep],
        )
        capped = np.minimum(run_len, 5)

        hist = np.bincount(run_doc * 5 + (capped - 1), minlength=n * 5).reshape(n, 5)
        total = hist.sum(axis=1)
        out[:, col["1char"]] = hist[:, 0]
        out[:, col["2char"]] = hist[:, 1]
        out[:, col["3char"]] = hist[:, 2]
        out[:, col["4char"]] = hist[:, 3]
        out[:, col["5+char"]] = hist[:, 4]
        out[:, col["tokens"]] = total

        weighted = np.bincount(run_doc, weights=capped, minlength=n)
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = np.where(total > 0, weighted / np.maximum(total, 1), 0.0)
        out[:, col["avgTokenLength"]] = avg

        def _type_count(mask: np.ndarray) -> np.ndarray:
            return np.bincount(run_doc[mask], minlength=n)

        t_kata = _type_count(run_kata)
        t_hira = _type_count(run_hira)
        t_kanji = _type_count(run_kanji)
        t_alpha = _type_count(run_alpha)
        t_digit = _type_count(run_isdig)
        safe_total = np.maximum(total, 1)
        for name, tcnt in (
            ("kataTokensRatio", t_kata),
            ("hiraTokensRatio", t_hira),
            ("kanjiTokensRatio", t_kanji),
            ("alphaTokensRatio", t_alpha),
            ("digitTokensRatio", t_digit),
        ):
            out[:, col[name]] = np.where(total > 0, tcnt / safe_total, 0.0)

    return pd.DataFrame(out, columns=list(tc.FEATURE_NAMES))
