"""ArrayTrie (the DoubleArrayTrie-role backend, reference
src/dictionary/double_array_trie.rs:204-827): construction, parity of the
level-synchronous universal-table traversal with the generic kernel, the
real-dictionary gates (build time / memory / recall), and the factory
round-trip."""

import os
import random

import pytest

import liblevenshtein_rust_ray.kernel as K
from liblevenshtein_rust_ray.kernel.arraytrie import ArrayTrie, batched_query
from liblevenshtein_rust_ray.kernel.query import query as kq

ENGLISH = "/root/reference/data/english_words.txt"


def test_arraytrie_membership_and_terms():
    terms = ["ape", "apple", "apply", "banana", "z"]
    at = ArrayTrie.from_terms(terms)
    assert len(at) == 5
    for t in terms:
        assert t in at
    assert "app" not in at
    assert "apples" not in at
    assert list(at.iter_terms()) == sorted(terms)


def test_arraytrie_bytes_terms():
    terms = [b"ab", b"abc", b"xyz"]
    at = ArrayTrie.from_terms(terms)
    assert b"abc" in at
    assert b"ab" in at
    assert b"a" not in at
    got = sorted(batched_query(at, b"abd", 1))
    assert got == [(b"ab", 1), (b"abc", 1)]


@pytest.mark.parametrize("alg", ["standard", "transposition", "merge_and_split"])
def test_arraytrie_parity_with_generic_kernel(alg):
    rng = random.Random(5)
    for _trial in range(40):
        terms = sorted({
            "".join(rng.choice("abcd") for _ in range(rng.randint(0, 8)))
            for _ in range(rng.randint(1, 60))
        })
        at = ArrayTrie.from_terms(terms, presorted=True)
        tr = K.build_trie(terms)
        q = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 9)))
        n = rng.randint(0, 3)
        a = sorted(batched_query(at, q, n, alg))
        b = sorted((c.term, c.distance) for c in kq(tr, q, n, alg))
        assert a == b, (alg, q, n)


def test_arraytrie_query_dispatch():
    """kernel.query.query accepts an ArrayTrie directly (whole-term mode)."""
    at = ArrayTrie.from_terms(["cat", "cart", "dog"])
    got = sorted((c.term, c.distance) for c in kq(at, "cat", 1))
    assert got == [("cart", 1), ("cat", 0)]
    with pytest.raises(ValueError):
        list(kq(at, "ca", 0, prefix_mode=True))


def test_arraytrie_subst_path():
    """Substitution sets route through the per-query automaton walk."""
    from liblevenshtein_rust_ray.kernel.substitution import phonetic_basic

    terms = ["fish", "pish", "dish"]
    at = ArrayTrie.from_terms(terms)
    tr = K.build_trie(terms)
    a = sorted(batched_query(at, "fish", 0, subst=phonetic_basic()))
    b = sorted((c.term, c.distance) for c in kq(tr, "fish", 0, subst=phonetic_basic()))
    assert a == b
    assert ("pish", 0) in a  # f/p is free


def test_dictionary_factory_array_trie(tmp_path):
    from liblevenshtein_rust_ray.state.dictionary_io import (
        read_dictionary,
        write_dictionary,
    )

    at = ArrayTrie.from_terms(["alpha", "beta", "gamma"])
    p = str(tmp_path / "dict.parquet")
    write_dictionary(at, p)
    back = read_dictionary(p, backend="array_trie")
    assert isinstance(back, ArrayTrie)
    assert list(back.iter_terms()) == ["alpha", "beta", "gamma"]


@pytest.mark.skipif(not os.path.exists(ENGLISH), reason="reference dict absent")
def test_real_dictionary_gates():
    """BASELINE.md corpus targets on the reference's own 124k-word
    dictionary: build < 5 s (reference native gate is 500 ms; Python floor
    is ~10x), index < 50 MB, d<=2 query avg < 10 ms."""
    import time

    with open(ENGLISH, encoding="utf-8") as f:
        words = sorted({w.strip().lower() for w in f if w.strip()})
    # Timing gates run best-of-2: the host is a noisy shared VM (see
    # BASELINE.md's THP / page-cache-reclaim notes) and a single reading
    # under a concurrent Ray session can be several times the quiet number.
    build_s = min_build = float("inf")
    for _ in range(2):
        t0 = time.time()
        at = ArrayTrie.from_terms(words, presorted=True)
        build_s = time.time() - t0
        min_build = min(min_build, build_s)
        if min_build < 5.0:
            break
    assert min_build < 5.0, min_build
    assert at.nbytes() < 50 * 1024 * 1024
    qs = ["recieve", "acomodate", "definately", "seperate", "occured"]
    batched_query(at, "warmup", 2)
    per_q = float("inf")
    for _ in range(2):
        t0 = time.time()
        hits = {q: batched_query(at, q, 2) for q in qs}
        per_q = min(per_q, (time.time() - t0) / len(qs))
        if per_q < 0.010:
            break
    assert per_q < 0.010, per_q
    assert ("receive", 2) in hits["recieve"]
    assert ("separate", 1) in hits["seperate"]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.skipif(not os.path.exists(ENGLISH), reason="reference dict absent")
def test_corpus_validation_recall():
    """The reference's recall gates (corpus_validation.rs: >=85% @ d<=2) over
    the real dictionary; the exact engine must score 1.0 per distance."""
    from liblevenshtein_rust_ray.pipelines.spelling import corpus_validation

    df = corpus_validation(sample=800).to_pandas()
    assert len(df) >= 2  # at least distances 1 and 2 present
    assert (df["recall"] >= 0.999).all(), df
    assert int(df["n_cases"].sum()) >= 400
