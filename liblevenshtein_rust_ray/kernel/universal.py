"""Parametric universal Levenshtein automaton A^∀_n (Mitankin 2005; the
reference's /root/reference/src/transducer/universal/automaton.rs:67-927).

Unlike the per-query automaton (kernel.automaton), the universal automaton is
built ONCE for a distance bound n and works for ANY word pair: its input is
the sequence of characteristic bit-vectors of the candidate word against a
sliding window of the query, so the transition table depends only on n.
States are subsumption-reduced sets of RELATIVE positions ``(offset, errors)``
with offset ∈ [-n, n] taken against the current input column.

This is the broadcast-once scoring table of SURVEY.md §2.4: ``ray.put`` the
``UniversalAutomaton`` object and every scorer actor shares the same
precomputed tables (they are tiny: |states| ≈ 15 for n=1, ≈ 80 for n=2).

``accepts(query, word)`` decides distance(query, word) <= n for the STANDARD
algorithm; ``distance(query, word, cap)`` extracts the exact distance by
probing n' = 0..cap (each probe is a table walk).  Cross-validated against
the DP oracle by Hypothesis (tests/test_kernel_universal.py).
"""

from functools import lru_cache

from .distance import standard_distance  # noqa: F401 (oracle partner, for docs)


class UniversalAutomaton:
    """Precomputed transition tables for one distance bound ``n``.

    State encoding: frozenset of ``(offset, errors)`` — position ``i#e``
    relative to input column ``j`` stored as ``offset = i - j`` (so the
    window of query characters that matter for column ``j+1`` is
    ``query[j-n : j+n+1]``, i.e. offsets ``-n .. n``).
    """

    def __init__(self, n: int):
        if n < 0:
            raise ValueError("n must be >= 0")
        self.n = n
        self.width = 2 * n + 1
        init = frozenset({(0, 0)})  # 0#0; multi-char deletions live in the table
        self._states = {init: 0}
        self._table: list[dict[tuple, int | None]] = []
        self._state_list = [init]
        # BFS over every characteristic vector of every width 0..2n+1:
        # shorter vectors occur near the end of the query window
        queue = [init]
        while queue:
            st = queue.pop(0)
            sid = self._states[st]
            while len(self._table) <= sid:
                self._table.append({})
            for w in range(self.width + 1):
                for bits in range(1 << w):
                    cv = tuple((bits >> b) & 1 for b in range(w))
                    nxt = self._step(st, cv)
                    if nxt is None:
                        self._table[sid][cv] = None
                        continue
                    if nxt not in self._states:
                        self._states[nxt] = len(self._state_list)
                        self._state_list.append(nxt)
                        queue.append(nxt)
                    self._table[sid][cv] = self._states[nxt]
        self.start = 0

    # ------------------------------------------------------------------
    def _reduce(self, positions):
        """Subsumption-minimal frozenset: i#e subsumes j#f iff e < f and
        |i - j| <= f - e (standard-algorithm rule)."""
        pos = set(positions)
        out = []
        for p in pos:
            if any(
                q != p and q[1] < p[1] and abs(q[0] - p[0]) <= p[1] - q[1]
                for q in pos
            ):
                continue
            out.append(p)
        return frozenset(out) if out else None

    def _step(self, state, cv):
        """One input character (word char at column j, producing column
        j+1).  ``cv[b]`` says whether that character equals
        ``query[j + (b - n)]``; a SHORT cv means the query window is
        truncated by the query's right boundary, so ``slot >= len(cv)``
        ⟺ the position has consumed the whole query (only insertions
        remain).  Offsets are ``i - j``; every transition consumes one word
        char, so: match/substitute keep the offset, insert lowers it by 1,
        a k-deletion block raises it by k (Schulz-Mihov Table 4.1 in
        relative coordinates, reference transition.rs:176-245)."""
        n = self.n
        nxt = []
        for off, e in state:
            slot = off + n  # window slot of query[i] for this position
            if slot < len(cv):
                if cv[slot]:
                    nxt.append((off, e))  # match
                elif e < n:
                    nxt.append((off, e + 1))      # substitution
                    nxt.append((off - 1, e + 1))  # insertion
                    for k in range(1, len(cv) - slot):
                        if cv[slot + k] and e + k <= n:
                            nxt.append((off + k, e + k))  # k deletions + match
            else:
                # query exhausted for this position: insertions only
                if e < n:
                    nxt.append((off - 1, e + 1))
        kept = [(off, e) for off, e in nxt if -n <= off <= n and e <= n]
        return self._reduce(kept)

    # ------------------------------------------------------------------
    def _cv(self, query: str, j: int, ch: str) -> tuple:
        """Characteristic vector of word char ``ch`` (consumed at column
        j, 0-based) against query window ``query[j-n .. j+n]``, truncated
        at both query boundaries.  Slot b corresponds to query index
        j + (b - n); out-of-range-left slots are kept (always 0) so slot
        arithmetic stays aligned; the right boundary truncates."""
        n = self.n
        out = []
        for b in range(self.width):
            qi = j + (b - n)
            if qi >= len(query):
                break
            out.append(1 if 0 <= qi < len(query) and query[qi] == ch else 0)
        return tuple(out)

    def accepts(self, query: str, word: str) -> bool:
        """distance(query, word) <= n under the standard algorithm."""
        n = self.n
        if abs(len(query) - len(word)) > n:
            return False
        sid = self.start
        for j, ch in enumerate(word):
            sid = self._table[sid].get(self._cv(query, j, ch))
            if sid is None:
                return False
        # acceptance: some position i#e with i + (n - e) >= |query| and the
        # remaining (|query| - i) insertions-to-match within budget:
        # final cost = e + (|query| - i) where i = |word| + off
        m = len(query)
        w = len(word)
        for off, e in self._state_list[sid]:
            i = w + off
            if 0 <= i <= m and e + (m - i) <= n:
                return True
        return False

    def distance(self, query: str, word: str, cap: int | None = None) -> int:
        """Exact distance via probes at n'=0..cap (cap defaults to n);
        returns cap+1 when the distance exceeds cap."""
        cap = self.n if cap is None else cap
        for k in range(0, cap + 1):
            if _get(k).accepts(query, word):
                return k
        return cap + 1

    @property
    def state_count(self) -> int:
        return len(self._state_list)


@lru_cache(maxsize=8)
def _get(n: int) -> "UniversalAutomaton":
    return UniversalAutomaton(n)


def universal_automaton(n: int) -> UniversalAutomaton:
    """Cached constructor — the broadcast object for scorer actors."""
    return _get(n)
