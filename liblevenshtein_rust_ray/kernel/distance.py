"""Direct pairwise edit-distance functions (the DP oracle).

Mirrors /root/reference/src/distance/mod.rs:

* ``standard_distance``        — classic two-row Wagner-Fischer (mod.rs:244-288)
* ``transposition_distance``   — adds adjacent-transposition (optimal string
  alignment three-row DP, mod.rs:304-359)
* ``merge_and_split_distance`` — adds merge (2 source chars -> 1 target char)
  and split (1 source char -> 2 target chars), each cost 1.  The reference
  implements this as a memoized greedy recursion (mod.rs:624-730): when the
  leading characters match it takes ONLY the match branch.  The DP below
  replicates that greedy-match rule exactly so results are identical.

These are the property-test oracle for the automaton kernel (the reference
cross-validates the same way, tests/proptest_automaton_distance_cross_validation.rs)
and the vectorized verification kernel for tiny blocks where building an index
is overkill (SURVEY.md §2.3).
"""

from .algorithm import STANDARD, TRANSPOSITION, MERGE_AND_SPLIT


def strip_common_affixes(a: str, b: str):
    """Return ``(prefix_len, core_a_len, core_b_len)``
    (reference mod.rs:111-147)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0, la, lb
    m = min(la, lb)
    p = 0
    while p < m and a[p] == b[p]:
        p += 1
    if p == m:
        return p, la - p, lb - p
    s = 0
    while s < (m - p) and a[la - 1 - s] == b[lb - 1 - s]:
        s += 1
    return p, la - p - s, lb - p - s


def standard_distance(source, target) -> int:
    m, n = len(source), len(target)
    if m == 0:
        return n
    if n == 0:
        return m
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        sc = source[i - 1]
        curr = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if sc == target[j - 1] else 1
            curr[j] = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + cost)
        prev = curr
    return prev[n]


def transposition_distance(source, target) -> int:
    m, n = len(source), len(target)
    if m == 0:
        return n
    if n == 0:
        return m
    two_ago = [0] * (n + 1)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        sc = source[i - 1]
        curr = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if sc == target[j - 1] else 1
            d = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + cost)
            if i > 1 and j > 1 and sc == target[j - 2] and source[i - 2] == target[j - 1]:
                d = min(d, two_ago[j - 2] + 1)
            curr[j] = d
        two_ago, prev = prev, curr
    return prev[n]


def merge_and_split_distance(source, target) -> int:
    """Greedy-match DP with merge/split ops, equal to the reference's
    memoized recursion (mod.rs:624-730): on a character match only the match
    branch is taken (cost 0); otherwise min(insert, delete, substitute,
    merge, split) + 1."""
    m, n = len(source), len(target)
    if m == 0:
        return n
    if n == 0:
        return m
    INF = m + n + 1
    # d[i][j] = distance between source[i:] and target[j:] (suffix DP mirrors
    # the reference's head-first recursion)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][n] = m - i
    for j in range(n + 1):
        d[m][j] = n - j
    for i in range(m - 1, -1, -1):
        si = source[i]
        row = d[i]
        nxt = d[i + 1]
        for j in range(n - 1, -1, -1):
            if si == target[j]:
                row[j] = nxt[j + 1]  # greedy match only
            else:
                best = nxt[j]          # delete source char
                v = row[j + 1]         # insert target char
                if v < best:
                    best = v
                v = nxt[j + 1]         # substitute
                if v < best:
                    best = v
                if j + 2 <= n:         # split: 1 source char -> 2 target chars
                    v = nxt[j + 2]
                    if v < best:
                        best = v
                if i + 2 <= m:         # merge: 2 source chars -> 1 target char
                    v = d[i + 2][j + 1]
                    if v < best:
                        best = v
                row[j] = best + 1
                if row[j] > INF:
                    row[j] = INF
    return d[0][0]


_DISTANCES = {
    STANDARD: standard_distance,
    TRANSPOSITION: transposition_distance,
    MERGE_AND_SPLIT: merge_and_split_distance,
}


def distance_fn(algorithm: str):
    return _DISTANCES[algorithm]


class MemoCache:
    """Symmetric-pair memo cache for repeated pair distances — the per-actor
    analogue of the reference's thread-safe ``MemoCache``
    (mod.rs:153-226; SymmetricPair keys mod.rs:37-72).  Bounded LRU-ish:
    clears when ``max_size`` is exceeded (simple and allocation-friendly for
    long-lived actors)."""

    def __init__(self, algorithm: str = STANDARD, max_size: int = 1_000_000):
        self._fn = distance_fn(algorithm)
        self._cache: dict = {}
        self._max = max_size
        self.hits = 0
        self.misses = 0

    def distance(self, a: str, b: str) -> int:
        key = (a, b) if a <= b else (b, a)
        got = self._cache.get(key)
        if got is not None:
            self.hits += 1
            return got
        self.misses += 1
        if len(self._cache) >= self._max:
            self._cache.clear()
        d = self._fn(a, b)
        self._cache[key] = d
        return d
