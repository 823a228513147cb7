"""Composable per-actor cache policies — the eviction-wrapper family
(SURVEY.md §2.9; reference /root/reference/src/cache/eviction/: Noop,
Lru, Lfu, Ttl, CostAware, MemoryPressure decorators over a shared map).

In the Ray-Data engine these wrap expensive per-key computations INSIDE a
long-lived actor (``map_batches(Cls, concurrency=N)``); Ray's object store
and streaming executor own memory pressure at block granularity, so the
policies here only bound per-actor heap.

``cached_fn = <Policy>(fn, ...)`` — call like ``fn``; ``.hits`` /
``.misses`` mirror the reference's cache statistics.
"""

import time
from collections import OrderedDict


class NoopCache:
    """Pass-through (reference noop.rs): measure the baseline."""

    def __init__(self, fn):
        self.fn = fn
        self.hits = 0
        self.misses = 0

    def __call__(self, *key):
        self.misses += 1
        return self.fn(*key)


class LruCache:
    """Least-recently-used (reference lru.rs / lru_optimized.rs)."""

    def __init__(self, fn, max_size: int = 65536):
        self.fn = fn
        self.max = max_size
        self._d: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def __call__(self, *key):
        got = self._d.get(key)
        if got is not None:
            self.hits += 1
            self._d.move_to_end(key)
            return got
        self.misses += 1
        v = self.fn(*key)
        self._d[key] = v
        if len(self._d) > self.max:
            self._d.popitem(last=False)
        return v


class LfuCache:
    """Least-frequently-used (reference lfu.rs): evict the coldest entry
    when full (ties broken by insertion order)."""

    def __init__(self, fn, max_size: int = 65536):
        self.fn = fn
        self.max = max_size
        self._d: dict = {}
        self._freq: dict = {}
        self.hits = 0
        self.misses = 0

    def __call__(self, *key):
        if key in self._d:
            self.hits += 1
            self._freq[key] += 1
            return self._d[key]
        self.misses += 1
        v = self.fn(*key)
        if len(self._d) >= self.max:
            cold = min(self._freq, key=self._freq.get)
            del self._d[cold], self._freq[cold]
        self._d[key] = v
        self._freq[key] = 1
        return v


class TtlCache:
    """Time-to-live (reference ttl.rs): entries expire after ``ttl_s``."""

    def __init__(self, fn, ttl_s: float = 300.0, max_size: int = 65536,
                 clock=time.monotonic):
        self.fn = fn
        self.ttl = ttl_s
        self.max = max_size
        self.clock = clock
        self._d: OrderedDict = OrderedDict()  # key -> (expires_at, value)
        self.hits = 0
        self.misses = 0

    def __call__(self, *key):
        now = self.clock()
        got = self._d.get(key)
        if got is not None and got[0] > now:
            self.hits += 1
            return got[1]
        self.misses += 1
        v = self.fn(*key)
        self._d[key] = (now + self.ttl, v)
        if len(self._d) > self.max:
            self._d.popitem(last=False)
        return v


POLICIES = {"noop": NoopCache, "lru": LruCache, "lfu": LfuCache, "ttl": TtlCache}


def cached(fn, policy: str = "lru", **kwargs):
    """Factory (the reference's eviction-strategy composition arg)."""
    return POLICIES[policy](fn, **kwargs)
