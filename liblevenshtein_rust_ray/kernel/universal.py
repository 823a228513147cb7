"""Parametric universal Levenshtein automaton A^∀_n (Mitankin 2005; the
reference's /root/reference/src/transducer/universal/automaton.rs:67-927,
position variants universal/position.rs:130-819).

Unlike the per-query automaton (kernel.automaton), the universal automaton is
built ONCE for a distance bound n and works for ANY word pair: its input is
the sequence of characteristic bit-vectors of the candidate word against a
sliding window of the query, so the transition table depends only on
``(n, algorithm)``.  States are subsumption-reduced sets of RELATIVE
positions ``(offset, errors, is_special)`` with ``offset = i - j`` taken
against the current input column; specials are transpositions-in-progress
(the reference's I/M-typed universal positions).

This is the broadcast-once scoring table of SURVEY.md §2.4: ``ray.put`` the
``UniversalAutomaton`` object and every scorer actor shares the same
precomputed tables (tiny: 8 states at n=1 standard, 50 at n=2).

``accepts(query, word)`` decides distance(query, word) <= n under the
chosen algorithm (standard or transposition/OSA); ``distance(query, word,
cap)`` extracts the exact distance by probing n' = 0..cap.  Cross-validated
against the DP oracles by Hypothesis (tests/test_kernel_universal.py).
"""

from functools import lru_cache

from .algorithm import STANDARD, TRANSPOSITION, MERGE_AND_SPLIT


class UniversalAutomaton:
    """Precomputed transition tables for one ``(n, algorithm)``.

    Position encoding: ``(offset, errors, special)`` — ``i#e`` relative to
    input column ``j`` as ``offset = i - j``; the window of query chars
    that matter for a column is ``query[j-n : j+n+1]`` (slots 0..2n).
    All three algorithms are covered (reference
    universal/position.rs:130-819): specials are
    transpositions-in-progress (await q[i]) or splits-in-progress
    (complete on any character).
    """

    def __init__(self, n: int, algorithm: str = STANDARD):
        if n < 0:
            raise ValueError("n must be >= 0")
        if algorithm not in (STANDARD, TRANSPOSITION, MERGE_AND_SPLIT):
            raise ValueError(f"unknown algorithm {algorithm!r}")
        self.n = n
        self.algorithm = algorithm
        self.width = 2 * n + 1
        init = frozenset({(0, 0, False)})  # 0#0; multi-char deletions live in the table
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
    def _subsumes(self, p, q) -> bool:
        """Subsumption in relative coordinates, mirroring kernel.position
        (incl. the soundness fix: transposition specials never subsume
        normals): standard formula for normal-normal; merge_and_split
        requires STRICTLY fewer errors and lets normals subsume specials
        (reference position.rs:159-172)."""
        i, e, s = p
        j, f, t = q
        if e > f:
            return False
        if self.algorithm == MERGE_AND_SPLIT:
            if s and not t:
                return False
            if e == f:
                return False
            return abs(i - j) <= f - e
        if not s and not t:
            return abs(i - j) <= f - e
        if s and t:
            adj = (i - j - 1) if j < i else (j - i + 1)
            return adj <= f - e
        return False

    def _reduce(self, positions):
        pos = set(positions)
        out = []
        for p in pos:
            if any(q != p and self._subsumes(q, p) for q in pos):
                continue
            out.append(p)
        return frozenset(out) if out else None

    def _step(self, state, cv):
        """One input character (word char at column j → column j+1).
        ``cv[b]`` ⇔ that char equals ``query[j + (b - n)]``; short cv ⇔ the
        window is truncated at the query's right boundary, so
        ``slot >= len(cv)`` ⇔ the position consumed the whole query.
        Offsets are ``i - j``: match/substitute keep the offset, insert
        lowers by 1, a k-deletion block raises by k; a transposition starts
        as a special at offset-1 when the NEXT window slot matches
        (Table 7.1), and completes on its own slot's match two query chars
        ahead (offset+1, errors unchanged)."""
        n = self.n
        trans = self.algorithm == TRANSPOSITION
        if self.algorithm == MERGE_AND_SPLIT:
            return self._step_merge_split(state, cv)
        nxt = []
        for off, e, sp in state:
            slot = off + n
            if sp:
                # transposition-in-progress: complete on q[i] or die
                if 0 <= slot < len(cv) and cv[slot]:
                    nxt.append((off + 1, e, False))
                continue
            if slot < len(cv):
                if cv[slot]:
                    nxt.append((off, e, False))  # match
                elif e < n:
                    nxt.append((off, e + 1, False))      # substitution
                    nxt.append((off - 1, e + 1, False))  # insertion
                    for k in range(1, len(cv) - slot):
                        if cv[slot + k] and e + k <= n:
                            nxt.append((off + k, e + k, False))  # k dels + match
                    if trans and slot + 1 < len(cv) and cv[slot + 1]:
                        # saw q[i+1]; await q[i] (special, Table 7.1)
                        nxt.append((off - 1, e + 1, True))
            else:
                # query exhausted for this position: insertions only
                if e < n:
                    nxt.append((off - 1, e + 1, False))
        kept = [(o, e, s) for o, e, s in nxt if -n - 1 <= o <= n and e <= n]
        return self._reduce(kept)

    def _step_merge_split(self, state, cv):
        """Table 8.1 in relative coordinates (reference
        universal/position.rs merge-split arm): a split-in-progress
        completes on ANY character (i+1, errors unchanged); merge consumes
        two query chars for one word char (offset +1); no multi-char
        deletion scan — remaining query chars are unit deletions at
        acceptance time, exactly like the per-query kernel
        (transition.py::transition_merge_split)."""
        n = self.n
        nxt = []
        for off, e, sp in state:
            slot = off + n
            if sp:
                nxt.append((off, e, False))  # split completes on any char
                continue
            rem = len(cv) - slot  # query chars remaining at this position
            if rem >= 1 and cv[slot]:
                nxt.append((off, e, False))  # match (other ops subsumed)
            elif e < n:
                nxt.append((off - 1, e + 1, False))      # insertion
                if rem >= 1:
                    nxt.append((off, e + 1, False))      # substitution
                    nxt.append((off - 1, e + 1, True))   # split start
                if rem >= 2:
                    nxt.append((off + 1, e + 1, False))  # merge
        kept = [(o, e, s) for o, e, s in nxt if -n - 1 <= o <= n and e <= n]
        return self._reduce(kept)

    # ------------------------------------------------------------------
    def _cv(self, query: str, j: int, ch: str) -> tuple:
        """Characteristic vector of word char ``ch`` (column j, 0-based)
        against ``query[j-n .. j+n]``; left-out-of-range slots stay 0 to
        keep alignment, the right boundary truncates."""
        n = self.n
        out = []
        for b in range(self.width):
            qi = j + (b - n)
            if qi >= len(query):
                break
            out.append(1 if 0 <= qi < len(query) and query[qi] == ch else 0)
        return tuple(out)

    def accepts(self, query: str, word: str) -> bool:
        """distance(query, word) <= n under the configured algorithm."""
        n = self.n
        if abs(len(query) - len(word)) > n:
            return False
        sid = self.start
        for j, ch in enumerate(word):
            sid = self._table[sid].get(self._cv(query, j, ch))
            if sid is None:
                return False
        m, w = len(query), len(word)
        for off, e, sp in self._state_list[sid]:
            if sp:
                continue  # in-progress transpositions never accept
            i = w + off
            if 0 <= i <= m and e + (m - i) <= n:
                return True
        return False

    def distance(self, query: str, word: str, cap: int | None = None) -> int:
        """Exact distance via probes at n'=0..cap (cap defaults to n);
        returns cap+1 when the distance exceeds cap."""
        cap = self.n if cap is None else cap
        for k in range(0, cap + 1):
            if _get(k, self.algorithm).accepts(query, word):
                return k
        return cap + 1

    @property
    def state_count(self) -> int:
        return len(self._state_list)


@lru_cache(maxsize=16)
def _get(n: int, algorithm: str = STANDARD) -> "UniversalAutomaton":
    return UniversalAutomaton(n, algorithm)


def universal_automaton(n: int, algorithm: str = STANDARD) -> UniversalAutomaton:
    """Cached constructor — the broadcast object for scorer actors."""
    return _get(n, algorithm)
