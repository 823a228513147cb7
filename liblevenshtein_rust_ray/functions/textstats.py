"""Text-analysis scalar kernels: quality scoring, n-gram language ID,
rolling-hash document fingerprinting.

These are the training-data-pipeline text ops (task brief) layered on the
same deterministic hashing as the rest of the engine.
"""

import re

import numpy as np

from .simhash import hash64
from .tokenize import tokenize

# re.ASCII pins \w/\s to their RE2 (Arrow kernels / DuckDB oracle)
# semantics so the scalar, vectorized and SQL implementations agree on
# non-ASCII input
_PUNCT_RE = re.compile(r"[^\w\s]", re.ASCII)
_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been for on with as at by it "
    "this that from not have has had but they you we he she его der die das le "
    "la les un une et en de du dans est sont".split()
)

# Tiny deterministic character-trigram profiles for language ID. Built from
# high-frequency function-word trigrams; good enough as the n-gram heuristic
# the brief asks for (a real model would be plugged into the same actor stage).
_LANG_PROFILES = {
    "en": {" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ", " to", "to ", "ion", " is", "is "},
    "de": {" de", "der", "er ", " un", "und", "nd ", "ie ", "ein", "ich", "ch ", "sch", " di", "die", "das", "as "},
    "fr": {" le", "le ", " de", "de ", "es ", " la", "la ", "ent", "nt ", "et ", " et", "ion", " un", "une", "ne "},
    "es": {" de", "de ", " la", "la ", "os ", "as ", " el", "el ", "que", " qu", "ue ", "ión", " en", "en ", "ar "},
}


def quality_scores(text: str) -> dict:
    """Length / punctuation / stopword / token heuristics (mirrorable in SQL
    for the correctness oracle)."""
    toks = tokenize(text)
    n_chars = len(text)
    n_tokens = len(toks)
    n_punct = len(_PUNCT_RE.findall(text))
    n_stop = sum(1 for t in toks if t in _STOPWORDS)
    mean_tok = (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "stopword_ratio": (n_stop / n_tokens) if n_tokens else 0.0,
        "mean_token_len": mean_tok,
    }


def langid_ngram(text: str) -> str:
    """Character-trigram overlap heuristic; returns the best profile or
    ``und`` when nothing scores."""
    # ASCII \s and the ' \t\n\r' trim set pin the normalization to the
    # RE2/DuckDB semantics shared by langid_scores_batch and the SQL oracle
    t = " " + re.sub(r"\s+", " ", text.lower().strip(" \t\n\r"), flags=re.ASCII)[:400] + " "
    if len(t) < 5:
        return "und"
    grams = {t[i : i + 3] for i in range(len(t) - 2)}
    best, best_score = "und", 0
    for lang, prof in _LANG_PROFILES.items():
        score = len(grams & prof)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score >= 3 else "und"


def rolling_fingerprint(text: str, window: int = 32, keep: int = 8) -> list[int]:
    """Winnowing-style document fingerprint: blake2b over sliding character
    windows, keep the ``keep`` smallest hashes (order-free, mergeable)."""
    if len(text) <= window:
        return [hash64(text)] if text else []
    hs = {hash64(text[i : i + window]) for i in range(0, len(text) - window + 1, 4)}
    return sorted(hs)[:keep]


def fingerprint64(text: str) -> int:
    """Single 64-bit exact-content hash (exact-dedup key)."""
    return hash64(text)
