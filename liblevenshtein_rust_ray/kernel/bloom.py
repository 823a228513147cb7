"""Bloom-filter negative-lookup acceleration for dictionary membership.

Capability parity with the reference's DynamicDawg Bloom option
(/root/reference/src/dictionary/dynamic_dawg.rs ``with_config`` bloom
filter; CHANGELOG.md:399-402: ``contains()`` ~38 µs → ~3 µs, 10-12×, by
rejecting misses before the trie walk).  Here the filter is a numpy bit
array probed with double hashing — ``h1 + i*h2 (mod m)`` (Kirsch &
Mitzenmacher 2006: two independent hashes simulate k), with both base
hashes computed VECTORIZED over a whole batch of probe terms (pandas
siphash with two fixed keys — deterministic across processes, so a filter
built once can be broadcast via ``ray.put`` and probed in every worker).

No false negatives by construction (property-tested); false-positive rate
≈ (1 - e^{-kn/m})^k, ~0.8% at the default 10 bits/term, k=7.

Distributed role: a ``BloomFilter`` over a dictionary's terms is tiny
(10 bits/term ≈ 160 KB per 128k-word dictionary vs the multi-MB trie), so
it ships to every actor for membership prefilters — e.g. skipping the
automaton walk for query terms that cannot be within distance 0, or
pre-screening a corpus column against a denylist before the real lookup.
"""

import numpy as np

_KEY1 = b"llr-bloom-h1-key"  # 16 bytes, pandas hash_key contract
_KEY2 = b"llr-bloom-h2-key"


def _hash2(terms) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hash vectors over a sequence of strings,
    computed in C (pandas siphash13 with fixed distinct keys)."""
    import pandas as pd

    arr = np.asarray(terms, dtype=object)
    h1 = pd.util.hash_array(arr, hash_key=_KEY1.decode(), categorize=False)
    h2 = pd.util.hash_array(arr, hash_key=_KEY2.decode(), categorize=False)
    return h1, h2


class BloomFilter:
    """``BloomFilter.from_terms(terms)`` → probe with ``contains`` /
    ``contains_batch``.  ``maybe=True`` can be wrong (false positive);
    ``maybe=False`` is definite."""

    def __init__(self, bits: np.ndarray, n_hashes: int):
        self.bits = bits  # uint64[m/64]
        self.n_hashes = int(n_hashes)
        self.m = bits.size * 64

    @classmethod
    def from_terms(cls, terms, bits_per_term: int = 10, n_hashes: int = 7):
        terms = list(terms)
        m = max(64, int(len(terms) * bits_per_term + 63) // 64 * 64)
        bits = np.zeros(m // 64, dtype=np.uint64)
        if terms:
            h1, h2 = _hash2(terms)
            for i in range(n_hashes):
                idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
                np.bitwise_or.at(
                    bits, (idx >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (idx & np.uint64(63)),
                )
        f = cls(bits, n_hashes)
        return f

    def contains_batch(self, terms) -> np.ndarray:
        """bool[n]: False = definitely absent, True = maybe present."""
        terms = list(terms)
        if not terms:
            return np.zeros(0, dtype=bool)
        h1, h2 = _hash2(terms)
        out = np.ones(len(terms), dtype=bool)
        m = np.uint64(self.m)
        for i in range(self.n_hashes):
            idx = (h1 + np.uint64(i) * h2) % m
            word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return out

    def contains(self, term) -> bool:
        return bool(self.contains_batch([term])[0])

    @property
    def nbytes(self) -> int:
        return int(self.bits.nbytes)


class BloomBackedDict:
    """Membership wrapper: Bloom prefilter in front of any dictionary
    backend (Trie/Dawg/MappedTrie/ArrayTrie) — the reference's
    DynamicDawg-with-bloom composition.  ``contains`` short-circuits
    definite misses without touching the backend; hits fall through to the
    real structure (so there are never false positives at the surface)."""

    def __init__(self, backend, terms=None):
        self.backend = backend
        if terms is None:
            it = getattr(backend, "iter_terms", None)
            terms = list(it()) if it is not None else list(backend)
        self.bloom = BloomFilter.from_terms(terms)

    def __contains__(self, term) -> bool:
        if not self.bloom.contains(term):
            return False
        return term in self.backend

    def contains_batch(self, terms) -> np.ndarray:
        terms = list(terms)
        maybe = self.bloom.contains_batch(terms)
        out = np.zeros(len(terms), dtype=bool)
        for i in np.nonzero(maybe)[0]:
            out[i] = terms[i] in self.backend
        return out

    def __getattr__(self, name):
        return getattr(self.backend, name)
