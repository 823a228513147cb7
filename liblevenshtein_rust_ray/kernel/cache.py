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


class AgeCache:
    """Oldest-first / FIFO eviction (reference age.rs:84): insertion time
    decides the victim, independent of access pattern."""

    def __init__(self, fn, max_size: int = 65536):
        self.fn = fn
        self.max = max_size
        self._d: OrderedDict = OrderedDict()  # insertion-ordered
        self.hits = 0
        self.misses = 0

    def __call__(self, *key):
        if key in self._d:
            self.hits += 1
            return self._d[key]  # NO move_to_end — age, not recency
        self.misses += 1
        v = self.fn(*key)
        self._d[key] = v
        if len(self._d) > self.max:
            self._d.popitem(last=False)
        return v


class LazyInitCache:
    """Lazy default initialization (reference lazy_init.rs:94): keys
    without a computed value resolve through ``default_fn`` WITHOUT being
    stored — default values cost no cache space; explicit ``put`` (or a
    non-default compute) populates the map."""

    def __init__(self, fn=None, default_fn=None, max_size: int = 65536):
        self.fn = fn
        self.default_fn = default_fn if default_fn is not None else (lambda *k: None)
        self.max = max_size
        self._d: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def put(self, key, value):
        self._d[key if isinstance(key, tuple) else (key,)] = value
        if len(self._d) > self.max:
            self._d.popitem(last=False)

    def __call__(self, *key):
        got = self._d.get(key)
        if got is not None:
            self.hits += 1
            return got
        self.misses += 1
        if self.fn is not None:
            v = self.fn(*key)
            self._d[key] = v
            if len(self._d) > self.max:
                self._d.popitem(last=False)
            return v
        return self.default_fn(*key)


class CostAwareCache:
    """Cost-based eviction (reference cost_aware.rs:101): each entry
    carries (age, size, hits); the victim minimizes
    ``hits * cost / size`` — cheap-to-regenerate, rarely-hit, large
    entries go first.  ``cost_fn(key, value) -> float`` defaults to 1."""

    def __init__(self, fn, max_size: int = 65536, cost_fn=None, size_fn=None):
        import sys

        self.fn = fn
        self.max = max_size
        self.cost_fn = cost_fn or (lambda k, v: 1.0)
        self.size_fn = size_fn or (lambda v: max(1, sys.getsizeof(v)))
        self._d: dict = {}
        self._meta: dict = {}  # key -> [hits, cost, size, seq]
        self._seq = 0
        self.hits = 0
        self.misses = 0

    def _score(self, key):
        h, c, s, seq = self._meta[key]
        return (h * c / s, seq)  # ties: oldest first

    def __call__(self, *key):
        if key in self._d:
            self.hits += 1
            self._meta[key][0] += 1
            return self._d[key]
        self.misses += 1
        v = self.fn(*key)
        if len(self._d) >= self.max:
            victim = min(self._meta, key=self._score)
            del self._d[victim], self._meta[victim]
        self._d[key] = v
        self._seq += 1
        self._meta[key] = [0, self.cost_fn(key, v), self.size_fn(v), self._seq]
        return v


class MemoryPressureCache:
    """Byte-budgeted eviction (reference memory_pressure.rs:104): bounded
    by TOTAL size, not entry count; under pressure the largest
    lowest-hit-rate entries leave first (score = size / (hits + 1))."""

    def __init__(self, fn, max_bytes: int = 64 * 1024 * 1024, size_fn=None):
        import sys

        self.fn = fn
        self.max_bytes = max_bytes
        self.size_fn = size_fn or (lambda v: max(1, sys.getsizeof(v)))
        self._d: dict = {}
        self._meta: dict = {}  # key -> [hits, size]
        self.total_bytes = 0
        self.hits = 0
        self.misses = 0

    def __call__(self, *key):
        if key in self._d:
            self.hits += 1
            self._meta[key][0] += 1
            return self._d[key]
        self.misses += 1
        v = self.fn(*key)
        sz = self.size_fn(v)
        while self._d and self.total_bytes + sz > self.max_bytes:
            victim = max(self._meta, key=lambda k: self._meta[k][1] / (self._meta[k][0] + 1))
            self.total_bytes -= self._meta[victim][1]
            del self._d[victim], self._meta[victim]
        if sz <= self.max_bytes:
            self._d[key] = v
            self._meta[key] = [0, sz]
            self.total_bytes += sz
        return v


class LruOptimizedCache:
    """Approximate LRU with coarse timestamps + sampled eviction (reference
    lru_optimized.rs:198 — compact metadata, coarse-grained clock to avoid a
    syscall per access, eviction by scanning a bounded candidate sample
    rather than maintaining a strict recency list).  Per-access cost is one
    dict probe + one int store; eviction is O(sample) instead of O(1), the
    standard approximated-LRU trade (cf. lru_optimized.rs feature flags
    ``eviction-coarse-timestamps`` / ``eviction-compact-metadata``)."""

    #: bump the coarse clock every this many calls (the "coarse timestamp
    #: thread" analogue, lru_optimized.rs:40 init_coarse_timestamp_thread)
    CLOCK_STRIDE = 64

    def __init__(self, fn, max_size: int = 65536, sample: int = 16):
        self.fn = fn
        self.max = max_size
        self.sample = sample
        self._d: dict = {}
        self._stamp: dict = {}  # key -> coarse tick of last access
        self._tick = 0
        self._calls = 0
        self.hits = 0
        self.misses = 0

    def _now(self) -> int:
        self._calls += 1
        if self._calls % self.CLOCK_STRIDE == 0:
            self._tick += 1
        return self._tick

    def recency(self, *key):
        """Coarse last-access tick (reference lru_optimized.rs:283)."""
        return self._stamp.get(key)

    def __call__(self, *key):
        now = self._now()
        got = self._d.get(key)
        if got is not None:
            self.hits += 1
            # re-insert so dict order approximates access order: coarse
            # stamps tie constantly, and the sampled scan below starts from
            # the front of the dict — refreshed keys must leave the sample.
            del self._stamp[key]
            self._stamp[key] = now
            return got
        self.misses += 1
        v = self.fn(*key)
        if len(self._d) >= self.max:
            # sampled approximate-LRU victim (find_lru over a candidate
            # slice, lru_optimized.rs:309): deterministic sample — iterate
            # the first `sample` keys in dict order (insertion-ordered in
            # CPython, so old entries are scanned first) and evict the
            # stalest stamp among them.
            it = iter(self._stamp)
            cands = [k for k, _ in zip(it, range(self.sample))]
            victim = min(cands, key=self._stamp.get)
            del self._d[victim], self._stamp[victim]
        self._d[key] = v
        self._stamp[key] = now
        return v


POLICIES = {
    "noop": NoopCache,
    "lru": LruCache,
    "lru_optimized": LruOptimizedCache,
    "lfu": LfuCache,
    "ttl": TtlCache,
    "age": AgeCache,
    "lazy_init": LazyInitCache,
    "cost_aware": CostAwareCache,
    "memory_pressure": MemoryPressureCache,
}


def cached(fn, policy: str = "lru", **kwargs):
    """Factory (the reference's eviction-strategy composition arg)."""
    return POLICIES[policy](fn, **kwargs)
