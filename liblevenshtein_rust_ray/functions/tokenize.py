"""Tokenization / shingling — byte-vs-char duality mirrors the reference's
``CharUnit`` axis (/root/reference/src/dictionary/char_unit.rs:30-165)."""

import re

# lowercase alnum runs — matches DuckDB's regexp_extract_all(lower(text), '[a-z0-9]+')
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    """Lowercase alphanumeric tokens. The canonical tokenizer for word
    frequency, quality stats and shingles; SQL-mirrorable for the oracle."""
    return _TOKEN_RE.findall(text.lower())


def token_count(text: str) -> int:
    return len(tokenize(text))


def shingles(tokens: list[str], k: int = 3) -> list[str]:
    """Word k-shingles (joined by a space); falls back to the token list when
    the document is shorter than k tokens."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def char_ngrams(text: str, n: int = 3) -> list[str]:
    if len(text) < n:
        return [text] if text else []
    return [text[i : i + n] for i in range(len(text) - n + 1)]
