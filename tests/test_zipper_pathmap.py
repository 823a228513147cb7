"""Zipper prefix navigation (reference prefix_zipper.rs / zipper.rs:279),
MappedTrie (reference pathmap.rs PathMapDictionary<V>), and the optimized
LRU policy (reference lru_optimized.rs)."""

import random

import pytest

import liblevenshtein_rust_ray.kernel as K
from liblevenshtein_rust_ray.kernel.cache import LruOptimizedCache, cached
from liblevenshtein_rust_ray.kernel.pathmap import MappedTrie
from liblevenshtein_rust_ray.kernel.zipper import Zipper, with_prefix

TERMS = ["process", "processUser", "produce", "product", "quark"]


# ----------------------------------------------------------------- zipper
@pytest.mark.parametrize("make", [
    lambda: K.build_trie(TERMS),
    lambda: K.build_dawg(TERMS),
    lambda: K.build_array_trie(TERMS),
    lambda: MappedTrie((t, i) for i, t in enumerate(TERMS)),
])
def test_with_prefix_matches_reference_doc_example(make):
    d = make()
    got = [t for t, _v in with_prefix(d, "proc")]
    assert got == ["process", "processUser"]  # prefix_zipper.rs:27-31
    assert [t for t, _ in with_prefix(d, "")] == sorted(TERMS)
    assert with_prefix(d, "zzz") is None
    assert with_prefix(d, "processX") is None


def test_with_prefix_equals_filter_scan_random():
    rng = random.Random(7)
    for _ in range(30):
        terms = sorted({
            "".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
            for _ in range(rng.randint(1, 80))
        })
        prefix = "".join(rng.choice("abc") for _ in range(rng.randint(0, 3)))
        expect = [t for t in terms if t.startswith(prefix)]
        for d in (K.build_trie(terms), K.build_array_trie(terms, presorted=True)):
            it = with_prefix(d, prefix)
            got = [] if it is None else [t for t, _ in it]
            assert got == expect, (prefix, terms)


def test_zipper_navigation_surface():
    z = Zipper(K.build_trie(TERMS))
    assert z.descend_prefix("prod")
    assert z.path == "prod" and z.depth == 4
    assert z.edges() == ["u"]
    assert not z.at_final
    assert z.descend("u") and z.descend("c")
    assert z.ascend() and z.path == "produ"
    z.reset()
    assert z.depth == 0 and z.path == ""
    assert not z.descend("x")


def test_zipper_bytes_terms():
    d = K.build_trie([b"ab", b"abc", b"b"])
    got = [t for t, _ in with_prefix(d, b"ab")]
    assert got == [b"ab", b"abc"]
    at = K.build_array_trie([b"ab", b"abc", b"b"])
    assert [t for t, _ in with_prefix(at, b"ab")] == [b"ab", b"abc"]


# --------------------------------------------------------------- pathmap
def test_mapped_trie_values_and_mutation():
    m = MappedTrie({"cat": 1, "cart": 2})
    assert m.get("cat") == 1 and m.get("cart") == 2
    assert m.get("ca", default=-1) == -1 and "ca" not in m
    m.insert("cat", 10)  # overwrite keeps len
    assert m.get("cat") == 10 and len(m) == 2
    assert m.remove("cat") and "cat" not in m and len(m) == 1
    assert not m.remove("cat")
    assert m.iter_items() == [("cart", 2)]


def test_mapped_trie_fuzzy_query_and_value_resolution():
    """The PathMapDictionary<u32> role: fuzzy hits resolve scope ids."""
    m = MappedTrie({"apple": 7, "apply": 8, "angle": 9})
    hits = sorted((c.term, c.distance) for c in K.query(m, "appl", 1))
    assert hits == [("apple", 1), ("apply", 1)]
    assert [m.get(t) for t, _ in hits] == [7, 8]


def test_mapped_trie_parquet_round_trip(tmp_path):
    from liblevenshtein_rust_ray.state.dictionary_io import (
        read_dictionary,
        write_dictionary,
    )

    m = MappedTrie({"a": 1, "b": None, "c": 3})
    p = str(tmp_path / "mapped.parquet")
    write_dictionary(m, p)
    back = read_dictionary(p, backend="path_map")
    assert isinstance(back, MappedTrie)
    assert back.iter_items() == [("a", 1), ("b", None), ("c", 3)]


# ---------------------------------------------------------- lru_optimized
def test_lru_optimized_hits_and_bounded_size():
    calls = []
    c = cached(lambda x: calls.append(x) or x * 2, policy="lru_optimized",
               max_size=4, sample=4)
    for x in [1, 2, 3, 4, 1, 2]:
        assert c(x) == x * 2
    assert c.hits == 2 and c.misses == 4 and len(calls) == 4
    c(5)  # evicts the stalest of the first 4 stamps (3 or 4: 1,2 refreshed)
    assert len(c._d) == 4
    assert (3,) not in c._d or (4,) not in c._d
    assert c.recency(1) is not None


def test_lru_optimized_coarse_clock_advances():
    c = LruOptimizedCache(lambda x: x, max_size=10)
    for i in range(LruOptimizedCache.CLOCK_STRIDE * 3):
        c(i % 10)
    assert c._tick >= 2
