"""Text-analysis kernels: tokenization, quality stats, language-ID heuristic.

Generalizes the reference's log-mining normalizer/regex pipeline
(/root/reference/src/cdrc_logs.py:7-38, SURVEY.md M1/M2) into the text
operators a training-data pipeline needs. All deterministic, stdlib+regex
only.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"\S+")
# BPE-ish subword split: runs of letters, runs of digits, single punctuation
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
PUNCT_RE = re.compile(r"[^\w\s]")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that with "
    "for on as at by from".split())

# tiny per-language stopword profiles for the n-gram/stopword langid heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "a"},
    "es": {"el", "la", "de", "que", "y", "en", "un"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht"},
    "fr": {"le", "la", "de", "et", "un", "est", "que"},
    "zh": set(),  # CJK detected by script, not stopwords
}
_CJK_RE = re.compile(r"[一-鿿]")


def ws_tokens(text: str) -> list[str]:
    return TOKEN_RE.findall(text)


def bpe_ish_tokens(text: str) -> list[str]:
    return BPE_RE.findall(text)


def quality_stats(text: str) -> dict:
    toks = ws_tokens(text)
    n_chars = len(text)
    n_tokens = len(toks)
    punct = len(PUNCT_RE.findall(text))
    stop = sum(1 for t in toks if t.lower() in STOPWORDS)
    # ratios are SINGLE int/int divisions — bit-identical across engines
    # (never round here: round-half-even vs half-up would diverge from SQL)
    return {
        "n_chars_calc": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": sum(map(len, toks)) / n_tokens if n_tokens else 0.0,
        "punct_ratio": punct / n_chars if n_chars else 0.0,
        "stopword_ratio": stop / n_tokens if n_tokens else 0.0,
    }


def langid(text: str) -> tuple[str, float]:
    """Cheap deterministic language-ID: CJK script check, then stopword-profile
    voting. Returns (lang, confidence in [0,1])."""
    if _CJK_RE.search(text):
        return "zh", 1.0
    toks = [t.lower() for t in ws_tokens(text)]
    if not toks:
        return "und", 0.0
    scores = {
        lang: sum(1 for t in toks if t in prof)
        for lang, prof in _LANG_PROFILES.items() if prof
    }
    best = max(sorted(scores), key=lambda k: scores[k])
    total = sum(scores.values())
    if scores[best] == 0:
        return "und", 0.0
    return best, round(scores[best] / total, 6)
