"""Deterministic scalar functions (no Ray)."""

import numpy as np

from liblevenshtein_rust_ray.functions import (
    tokenize,
    token_count,
    shingles,
    char_ngrams,
    simhash64,
    simhash_bands,
    hamming64,
    minhash_signature,
    minhash_bands,
    TypoGenerator,
    quality_scores,
    langid_ngram,
    rolling_fingerprint,
    phonetic_normalize,
)
from liblevenshtein_rust_ray.functions.minhash import jaccard_estimate
from liblevenshtein_rust_ray.kernel import standard_distance


def test_tokenize():
    assert tokenize("Hello, World! 123") == ["hello", "world", "123"]
    assert token_count("") == 0
    assert shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert shingles(["a"], 3) == ["a"]
    assert char_ngrams("abcd", 3) == ["abc", "bcd"]


def test_simhash_deterministic_and_similar():
    a = simhash64(char_ngrams("the quick brown fox jumps", 3))
    b = simhash64(char_ngrams("the quick brown fox jumps", 3))
    assert a == b  # deterministic across calls (and processes: blake2b)
    c = simhash64(char_ngrams("the quick brown fox jumped", 3))
    d = simhash64(char_ngrams("completely different text here", 3))
    assert hamming64(a, c) < hamming64(a, d)
    assert len(simhash_bands(a, 4)) == 4
    assert sum(b << (16 * i) for i, b in enumerate(simhash_bands(a, 4))) == a


def test_minhash_jaccard():
    s1 = set(shingles(tokenize("a b c d e f g h i j k l m n o p"), 2))
    s2 = set(shingles(tokenize("a b c d e f g h i j k l m n o q"), 2))
    sig1 = minhash_signature(sorted(s1))
    sig2 = minhash_signature(sorted(s2))
    true_j = len(s1 & s2) / len(s1 | s2)
    est = jaccard_estimate(sig1, sig2)
    assert abs(est - true_j) < 0.3
    assert jaccard_estimate(sig1, sig1) == 1.0
    assert len(minhash_bands(sig1, 16)) == 16
    assert minhash_bands(sig1, 16) == minhash_bands(sig1, 16)


def test_typogen_deterministic_distance():
    g1 = TypoGenerator(seed=7)
    g2 = TypoGenerator(seed=7)
    w = "reference"
    assert g1.generate_typos(w, 2) == g2.generate_typos(w, 2)
    for d in (1, 2):
        t = TypoGenerator(seed=d).generate_typos(w, d)
        assert standard_distance(w, t) <= d
    v = TypoGenerator().all_distance_1("ab")
    assert all(standard_distance("ab", x) == 1 for x in v)
    assert "aab" in v and "b" in v and "ac" in v


def test_quality_scores():
    q = quality_scores("The quick brown fox, it jumps!")
    assert q["n_tokens"] == 6
    assert q["n_chars"] == 30
    assert 0 < q["punct_ratio"] < 0.2
    assert q["stopword_ratio"] > 0
    assert quality_scores("")["n_tokens"] == 0


def test_langid():
    assert langid_ngram("the cat and the dog are in the house of things") == "en"
    assert langid_ngram("der hund und die katze sind schön in einem haus") == "de"
    assert langid_ngram("xz") == "und"


def test_fingerprint():
    fp = rolling_fingerprint("some document text " * 20)
    assert fp == rolling_fingerprint("some document text " * 20)
    assert len(fp) <= 8
    assert rolling_fingerprint("") == []


def test_phonetic():
    assert phonetic_normalize("phone") == "fon"       # ph->f, final e dropped
    assert phonetic_normalize("night") == "nit"       # gh silent
    assert phonetic_normalize("cent") == "sent"       # c->s before front vowel
    assert phonetic_normalize("cat") == "kat"         # c->k elsewhere
    assert phonetic_normalize("queen") == "kween"     # qu->kw
    # normalize-then-match: variants collapse
    assert phonetic_normalize("fone") == phonetic_normalize("phone")
