"""Bloom membership filter: no false negatives, useful FP rate, backend
composition parity (the reference's DynamicDawg bloom option,
dynamic_dawg.rs with_config / CHANGELOG.md:399-402)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from liblevenshtein_rust_ray.kernel.arraytrie import ArrayTrie
from liblevenshtein_rust_ray.kernel.bloom import BloomBackedDict, BloomFilter
from liblevenshtein_rust_ray.kernel.dawg import Trie


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=12), max_size=60))
def test_no_false_negatives(terms):
    f = BloomFilter.from_terms(terms)
    if terms:
        assert f.contains_batch(terms).all()


def test_false_positive_rate_bounded():
    rng = np.random.default_rng(5)
    members = [f"member-{i}-{rng.integers(1 << 30)}" for i in range(20_000)]
    probes = [f"absent-{i}-{rng.integers(1 << 30)}" for i in range(20_000)]
    f = BloomFilter.from_terms(members)
    fp = f.contains_batch(probes).mean()
    # theory ~0.8% at 10 bits/term, k=7; allow slack
    assert fp < 0.03, fp
    assert f.nbytes < 40_000  # ~10 bits/term


def test_backed_dict_parity_all_backends():
    terms = sorted({"apple", "apply", "ape", "banana", "band", "bandit"})
    probes = terms + ["absent", "app", "bananaz", "", "zzz"]
    for backend in (Trie(terms), ArrayTrie.from_terms(terms, presorted=True)):
        b = BloomBackedDict(backend)
        for p in probes:
            assert (p in b) == (p in backend), (type(backend), p)
        np.testing.assert_array_equal(
            b.contains_batch(probes), np.array([p in backend for p in probes])
        )


def test_deterministic_across_builds():
    terms = [f"t{i}" for i in range(1000)]
    a = BloomFilter.from_terms(terms)
    b = BloomFilter.from_terms(terms)
    np.testing.assert_array_equal(a.bits, b.bits)
