"""Stateless per-record scalar functions (SURVEY.md §2.7).

Everything here is deterministic and process-independent (no Python ``hash``,
which is salted per process) so pipeline output is byte-identical across runs
and parallelism levels — the per-row invariant of BASELINE.json's input_hint.
"""

from .tokenize import tokenize, token_count, shingles, char_ngrams
from .simhash import simhash64, simhash_bands, hamming64
from .minhash import minhash_signature, minhash_bands
from .typogen import TypoGenerator
from .textstats import quality_scores, langid_ngram, rolling_fingerprint
from .phonetic import phonetic_normalize, PHONETIC_RULES

__all__ = [
    "tokenize",
    "token_count",
    "shingles",
    "char_ngrams",
    "simhash64",
    "simhash_bands",
    "hamming64",
    "minhash_signature",
    "minhash_bands",
    "TypoGenerator",
    "quality_scores",
    "langid_ngram",
    "rolling_fingerprint",
    "phonetic_normalize",
    "PHONETIC_RULES",
]
