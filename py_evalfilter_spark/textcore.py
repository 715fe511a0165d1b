"""Pure-Python text semantics core.

Reproduces the reference's character-class / tokenization / per-record
feature-map semantics (see /root/reference/src/evalfilter/features.py:11-226
and /root/reference/src/evalfilter/analysis.py:16-32) as pure functions with
no Spark dependency.  Both the pandas "golden" pipeline (``golden.py``) and
the Spark Arrow UDF layer (``functions/textfeats.py``) call into this module,
so Spark output is allclose-comparable to the golden fixtures by
construction of the plumbing, while these functions themselves are pinned by
hand-computed unit tests (tests/test_textcore.py).

Reference-parity notes
----------------------
* Char classes are ``unicodedata.name(c)`` *prefix* tests (KATAKANA /
  HIRAGANA / CJK / LATIN / DIGIT), NOT regex script properties — e.g. the
  prolonged-sound mark ``ー`` has name ``KATAKANA-HIRAGANA PROLONGED SOUND
  MARK`` and therefore counts as katakana (features.py:130-135), and a
  ``ValueError`` from unnamed codepoints means False (features.py:162-167).
* MARKS / PUNCT sets match features.py:16-17 exactly.
* The reference tokenizes with MeCab (analysis.py:7), which is not a
  reproducible dependency; per SURVEY.md §2.3/T1 we substitute a
  deterministic script-run segmenter with the identical downstream contract
  (list of lowercased tokens, ``min_length`` filter, newline scrub order of
  analysis.py:17).  "lemma" = the run's text, "pos" = the run's script class.
* ``token_type_counts`` uses independent ``if`` tests, so one token can
  count toward several types (features.py:215-225); ``map_to_token_type``
  is first-match-wins in the reference's exact order (features.py:190-205).
* Documented divergence: the reference's ``avg_token_length`` raises
  ZeroDivisionError on zero-token documents due to the ``if not
  token_counts`` bug (features.py:83-87); we define 0.0.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

KATAKANA = "KATAKANA"
HIRAGANA = "HIRAGANA"
KANJI = "CJK"
ALPHA = "LATIN"
DIGIT = "DIGIT"
MARKS = frozenset({"!", "?", "！", "？"})
PUNCT = frozenset({"、", "。", "「", "」", "（", "）", "＆", "ー", "-", "＃", "￥"})

# ---------------------------------------------------------------------------
# char classes (features.py:118-175)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=65536)
def _uni_name(c: str) -> str:
    try:
        return unicodedata.name(c)
    except ValueError:
        return ""


def is_katakana(c: str) -> bool:
    return _uni_name(c).startswith(KATAKANA)


def is_hiragana(c: str) -> bool:
    return _uni_name(c).startswith(HIRAGANA)


def is_kanji(c: str) -> bool:
    return _uni_name(c).startswith(KANJI)


def is_alphabet(c: str) -> bool:
    return _uni_name(c).startswith(ALPHA)


def is_digit(c: str) -> bool:
    return _uni_name(c).startswith(DIGIT)


def is_mark(c: str) -> bool:
    return c in MARKS


def is_punct(c: str) -> bool:
    return c in PUNCT


def count_unicode_chars(text: str, prefix: str) -> int:
    """Count chars whose unicodedata.name starts with ``prefix`` (features.py:170-171)."""
    return sum(1 for c in text if _uni_name(c).startswith(prefix))


def count_chars_in_set(text: str, charset: frozenset) -> int:
    return sum(1 for c in text if c in charset)


# ---------------------------------------------------------------------------
# deterministic tokenizer (MeCab stand-in; contract of analysis.py:16-32)
# ---------------------------------------------------------------------------

# segmentation classes in map_to_token_type precedence order
_CLS_KATA = "KATA"
_CLS_HIRA = "HIRA"
_CLS_KANJI = "KANJI"
_CLS_ALPHA = "ALPHA"
_CLS_DIGIT = "DIGIT"
_CLS_SPACE = "SPACE"
_CLS_MARK = "MARK"
_CLS_PUNCT = "PUNCT"
_CLS_OTHER = "OTHER"


@lru_cache(maxsize=65536)
def _char_class(c: str) -> str:
    name = _uni_name(c)
    if name.startswith(KATAKANA):
        return _CLS_KATA
    if name.startswith(HIRAGANA):
        return _CLS_HIRA
    if name.startswith(KANJI):
        return _CLS_KANJI
    if name.startswith(ALPHA):
        return _CLS_ALPHA
    if name.startswith(DIGIT):
        return _CLS_DIGIT
    if c.isspace():
        return _CLS_SPACE
    if c in MARKS:
        return _CLS_MARK
    if c in PUNCT:
        return _CLS_PUNCT
    return _CLS_OTHER


def scrub_newlines(text: str) -> str:
    """Exact scrub order of analysis.py:17."""
    return text.replace("\n", " ").replace("\\n", " ").replace("\r", "")


def segment(text: str) -> list[tuple[str, str]]:
    """Split scrubbed text into maximal same-script runs → [(surface, class)].

    Whitespace runs are dropped.  This is the deterministic stand-in for the
    MeCab morphological parse (analysis.py:18): each run plays the role of
    one morpheme, its script class plays the role of the POS tag.
    """
    out: list[tuple[str, str]] = []
    cur: list[str] = []
    cur_cls = ""
    for c in scrub_newlines(text):
        cls = _char_class(c)
        if cls == cur_cls:
            cur.append(c)
            continue
        if cur and cur_cls != _CLS_SPACE:
            out.append(("".join(cur), cur_cls))
        cur = [c]
        cur_cls = cls
    if cur and cur_cls != _CLS_SPACE:
        out.append(("".join(cur), cur_cls))
    return out


def tokenize_rant(text: str, min_length: int = 2) -> list[str]:
    """Lemma tokens, lowercased, length-filtered (analysis.py:22-23 contract)."""
    return [s.lower() for s, _ in segment(text) if len(s) >= min_length]


def tokenize_pos(text: str) -> list[str]:
    """POS-tag sequence (analysis.py:26-27 contract): one class tag per token."""
    return [cls for _, cls in segment(text)]


def map_to_token_type(word: str) -> str:
    """First-match-wins token-type mapping (features.py:190-205, same order)."""
    if all(is_katakana(c) for c in word):
        return "kata"
    if all(is_hiragana(c) for c in word):
        return "hira"
    if all(is_kanji(c) or is_hiragana(c) for c in word):
        return "kanji"
    if all(is_alphabet(c) for c in word):
        return "alpha"
    if word.isdigit():
        return "digit"
    if all(is_punct(c) for c in word):
        return "punct"
    if all(is_mark(c) for c in word):
        return "mark"
    return "other"


def tokenize_token_type(text: str, min_length: int = 1) -> list[str]:
    """analysis.py:30-32 contract: lemma tokens (min_length=1) → type classes."""
    return [map_to_token_type(t) for t in tokenize_rant(text, min_length=min_length)]


# ---------------------------------------------------------------------------
# per-record feature map (features.py:70-115, 178-226)
# ---------------------------------------------------------------------------


def token_counts(tokens: list[str]) -> dict[int, int]:
    """Token-length histogram capped at 5; zero-length bucket removed (features.py:178-187)."""
    counts: dict[int, int] = {}
    for t in tokens:
        n = min(len(t), 5)
        counts[n] = counts.get(n, 0) + 1
    counts.pop(0, None)
    return counts


def token_type_counts(tokens: list[str]) -> dict[str, int]:
    """Independent-if type counts — a token may count toward several types
    (features.py:208-226)."""
    tc = {"kata": 0, "hira": 0, "kanji": 0, "alpha": 0, "digit": 0}
    for t in tokens:
        if all(is_katakana(c) for c in t):
            tc["kata"] += 1
        if all(is_hiragana(c) for c in t):
            tc["hira"] += 1
        if all(is_kanji(c) or is_hiragana(c) for c in t):
            tc["kanji"] += 1
        if all(is_alphabet(c) for c in t):
            tc["alpha"] += 1
        if t.isdigit():
            tc["digit"] += 1
    return tc


# DictVectorizer column order = alphabetically sorted feature names
# (generate_dataset_gvsb.py:69-71 + sklearn DictVectorizer semantics).
FEATURE_NAMES: tuple[str, ...] = (
    "1char",
    "2char",
    "3char",
    "4char",
    "5+char",
    "alpha",
    "alphaTokensRatio",
    "avgTokenLength",
    "digit",
    "digitTokensRatio",
    "hira",
    "hiraTokensRatio",
    "kanji",
    "kanjiTokensRatio",
    "kata",
    "kataTokensRatio",
    "marks",
    "punct",
    "tokens",
)
assert list(FEATURE_NAMES) == sorted(FEATURE_NAMES)


def rant_stats(text: str) -> dict[str, float]:
    """The 19-field per-record feature dict (features.py:94-113).

    Counts run over the full (NFKC-normalized, newline-containing) text;
    tokens come from tokenize_rant(text, min_length=1) with empties dropped
    (features.py:79-80).  ``avgTokenLength`` is 0.0 for zero-token documents
    (documented divergence from the reference's ZeroDivisionError bug,
    features.py:83-87).
    """
    tokens = [t for t in tokenize_rant(text, min_length=1) if t != ""]
    counts = token_counts(tokens)
    types = token_type_counts(tokens)
    total = sum(counts.values())

    def ratio(n: int) -> float:
        if n == 0 or total == 0:
            return 0.0
        return n / total

    avg = 0.0 if total == 0 else sum(k * v for k, v in counts.items()) / total
    return {
        "kata": count_unicode_chars(text, KATAKANA),
        "hira": count_unicode_chars(text, HIRAGANA),
        "kanji": count_unicode_chars(text, KANJI),
        "alpha": count_unicode_chars(text, ALPHA),
        "digit": count_unicode_chars(text, DIGIT),
        "marks": count_chars_in_set(text, MARKS),
        "punct": count_chars_in_set(text, PUNCT),
        "kataTokensRatio": ratio(types["kata"]),
        "hiraTokensRatio": ratio(types["hira"]),
        "kanjiTokensRatio": ratio(types["kanji"]),
        "alphaTokensRatio": ratio(types["alpha"]),
        "digitTokensRatio": ratio(types["digit"]),
        "tokens": total,
        "1char": counts.get(1, 0),
        "2char": counts.get(2, 0),
        "3char": counts.get(3, 0),
        "4char": counts.get(4, 0),
        "5+char": counts.get(5, 0),
        "avgTokenLength": avg,
    }


def nfkc(text: str) -> str:
    """NFKC normalization applied at load time (fuman_base.py:100)."""
    return unicodedata.normalize("NFKC", text)


# ---------------------------------------------------------------------------
# sklearn-0.16-parity text preprocessing for vectorizers (SURVEY.md §2.5)
# ---------------------------------------------------------------------------


def strip_accents_unicode(s: str) -> str:
    """sklearn's strip_accents='unicode': NFKD + drop combining chars."""
    return "".join(
        c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c)
    )


def vectorizer_preprocess(s: str) -> str:
    """sklearn build_preprocessor with lowercase=True + strip_accents='unicode'."""
    return strip_accents_unicode(s.lower())


def word_ngrams(tokens: list[str], min_n: int, max_n: int) -> list[str]:
    """sklearn VectorizerMixin._word_ngrams: space-joined n-grams, n in
    [min_n, min(max_n, len(tokens))]."""
    if min_n == 1 and max_n == 1:
        return list(tokens)
    out: list[str] = []
    n_tokens = len(tokens)
    for n in range(min_n, min(max_n, n_tokens) + 1):
        for i in range(n_tokens - n + 1):
            out.append(" ".join(tokens[i : i + n]))
    return out


# The reference's shipped Japanese stopword list (analysis.py:8-13) —
# dormant there (no entry point passes it) but part of the public surface;
# pass as ``stop_words`` to :func:`analyze` / the vectorizers to enable.
STOPWORDS_JA: frozenset = frozenset(
    {
        "の", "が", "て", "、", "する", "ある", "です", "ます", "た", "から",
        "れる", "いる", "「", "　", "」", "と", "くる", "で", "ない", "を",
        "に", "なる", "。", "だ", "のに", "でる", "は", "よう", "も", "しか",
        "いう", "う", "・", "ので", "けど", "こと", "など", "ば", "すでに",
        "によって", "くらい", "さ", "－", "一", "か", "\\", "n", "etc.", "etc",
        "すぎる", "これ", "それ", "あれ", "この", "その", "あの", "もっとも",
        "もっと", "に関し", "に関して", "あなたと", "あなた", "あなたに",
        "打ち合せ", "打合せ", "いただき", "それぞれに", "それぞれ", "よって",
        "として", "for", "や", "のもの", "そのもの", "つくれる", "くれる",
        "明らか", "てる",
    }
)


def analyze(
    text: str,
    tokenizer,
    ngram_range: tuple[int, int] = (1, 1),
    stop_words: frozenset | None = None,
) -> list[str]:
    """Full sklearn-style analyzer: preprocess → tokenize → stopwords → ngrams."""
    tokens = tokenizer(vectorizer_preprocess(text))
    if stop_words:
        tokens = [t for t in tokens if t not in stop_words]
    return word_ngrams(tokens, ngram_range[0], ngram_range[1])
