"""Text-analysis primitives for large-scale training-data pipelines.

Language ID (stopword/n-gram heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (rolling hash). All pure + deterministic; the vectorized Ray
stages and the DuckDB oracle SQL (where expressible) implement the same
definitions — see __ray_entry__.oracle_sql().
"""

from __future__ import annotations

import re

# BPE-ish word tokenizer: letter runs, digit runs, single non-alnum-non-space
WORD_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
LETTER_RUN_RE = re.compile(r"[a-z]+")
PUNCT_RE = re.compile(r"[^\w\s]", re.ASCII)

# Small closed stopword sets per language (heuristic language ID).
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it for on with as are was be this".split()),
    "fr": frozenset("le la les de des du et un une que pour dans est sont au aux par".split()),
    "nl": frozenset("de het een van en dat die in voor met op is zijn niet aan te".split()),
}
ALL_STOPWORDS = frozenset().union(*STOPWORDS.values())


def whitespace_token_count(text: str) -> int:
    """Number of maximal non-whitespace runs (== len(text.split()))."""
    return len(text.split())


def word_token_count(text: str) -> int:
    """BPE-ish token count: letter runs + digit runs + single punct chars."""
    return len(WORD_RE.findall(text))


def letter_words(text: str) -> list[str]:
    return LETTER_RUN_RE.findall(text.lower())


def detect_language(text: str) -> str:
    """Argmax of per-language stopword hits over lowercase letter runs.

    Ties (or zero hits) → 'und'. Tie-break order en < fr < nl is irrelevant
    because a strict-max is required.
    """
    words = letter_words(text)
    best_lang, best_count = "und", 0
    tied = False
    for lang in ("en", "fr", "nl"):
        count = sum(1 for w in words if w in STOPWORDS[lang])
        if count > best_count:
            best_lang, best_count, tied = lang, count, False
        elif count == best_count and count > 0:
            tied = True
    if best_count == 0 or tied:
        return "und"
    return best_lang


def quality_metrics(text: str) -> dict:
    """Deterministic quality features + a boolean keep flag."""
    n_chars = len(text)
    n_tokens = whitespace_token_count(text)
    n_punct = len(PUNCT_RE.findall(text))
    words = letter_words(text)
    n_words = len(words)
    n_stop = sum(1 for w in words if w in ALL_STOPWORDS)
    punct_ratio = n_punct / n_chars if n_chars else 0.0
    stop_ratio = n_stop / n_words if n_words else 0.0
    mean_token_len = (n_chars / n_tokens) if n_tokens else 0.0
    keep = bool(n_chars >= 20 and n_tokens >= 5 and punct_ratio <= 0.3 and mean_token_len <= 25.0)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "mean_token_len": mean_token_len,
        "keep": keep,
    }


_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a64(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def document_fingerprint(text: str, window: int = 64) -> int:
    """Winnowing-style fingerprint: min FNV hash over rolling character
    windows (whole-text hash when shorter than one window)."""
    data = text.encode("utf-8")
    if len(data) <= window:
        return fnv1a64(data)
    return min(fnv1a64(data[i : i + window]) for i in range(0, len(data) - window + 1, 16))
