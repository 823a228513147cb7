"""Approximate substring search (the suffix-automaton capability).

The reference's ``SuffixAutomaton`` answers "which documents contain a
substring within edit distance n of the pattern, and where"
(/root/reference/src/dictionary/suffix_automaton.rs:457-758,
``match_positions`` -> (doc_id, pos)).  Our per-document kernel is the
numpy-vectorized Sellers DP (free match start: row 0 all zeros), which is the
right shape for a ``map_batches`` stage — O(|pattern| x |text|) with all
|text|-length operations in C.

``substring_mode`` trie queries (kernel.query) cover the automaton-style
variant for term dictionaries; this module covers long free text.
"""

import numpy as np


def substring_match_ends(pattern: str, text: str, max_distance: int):
    """End positions (exclusive) and distances of approximate occurrences:
    all j where some substring ending at j matches ``pattern`` within
    ``max_distance``.  Returns (ends: int64[], dists: int64[])."""
    m, L = len(pattern), len(text)
    if m == 0:
        return np.arange(L + 1, dtype=np.int64), np.zeros(L + 1, dtype=np.int64)
    if L == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)

    tarr = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    idx = np.arange(L + 1, dtype=np.int64)
    row = np.zeros(L + 1, dtype=np.int64)  # D[0][j] = 0 (free start)
    for i in range(1, m + 1):
        pc = ord(pattern[i - 1])
        cost = np.ones(L, dtype=np.int64)
        cost[tarr == pc] = 0
        tmp = np.empty(L + 1, dtype=np.int64)
        tmp[0] = i
        # deletion (up) and substitution/match (diag), vectorized
        tmp[1:] = np.minimum(row[1:] + 1, row[:-1] + cost)
        # insertion (left) via the prefix-min trick:
        # final[j] = min_k<=j (tmp[k] + (j - k)) = idx[j] + cummin(tmp - idx)
        row = np.minimum.accumulate(tmp - idx) + idx
    ends = np.nonzero(row <= max_distance)[0]
    return ends.astype(np.int64), row[ends]


def best_substring_match(pattern: str, text: str, max_distance: int):
    """(best_distance, end_pos) of the best approximate occurrence, or
    ``None`` when nothing is within ``max_distance`` (smallest distance,
    then leftmost end)."""
    ends, dists = substring_match_ends(pattern, text, max_distance)
    if len(ends) == 0:
        return None
    k = int(np.lexsort((ends, dists))[0])
    return int(dists[k]), int(ends[k])
