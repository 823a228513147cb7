"""Automaton states: sorted, subsumption-minimal collections of positions.

A state is represented as a plain Python list of ``(i, e, s)`` tuples kept in
sorted order; the canonical (hashable) form is ``tuple(state)``.  Semantics
mirror the reference's ``State`` (/root/reference/src/transducer/state.rs):
online subsumption on insert, ``infer_distance`` (final-node distance with
query-suffix penalty, skipping special positions), ``min_distance`` (substring
mode) and ``infer_prefix_distance`` (prefix mode).
"""

import bisect

from .position import subsumes


def state_insert(positions: list, position: tuple, algorithm: str, query_length: int) -> None:
    """Insert ``position`` into sorted ``positions`` with online subsumption.

    Mirrors ``State::insert`` (/root/reference/src/transducer/state.rs:107-125):
    skip if subsumed by an existing position; drop existing positions the new
    one subsumes; keep sorted order (i asc, e asc, special False < True).
    """
    for existing in positions:
        if subsumes(existing, position, algorithm, query_length):
            return
    # Remove positions the new one subsumes (also removes exact duplicates?
    # no — a duplicate is caught above because a position subsumes itself
    # under standard/transposition; merge_and_split requires e < f so an
    # exact duplicate is NOT self-subsumed there: guard explicitly).
    if position in positions:
        return
    positions[:] = [p for p in positions if not subsumes(position, p, algorithm, query_length)]
    bisect.insort(positions, position)


def min_distance(positions) -> int | None:
    """Smallest ``num_errors`` in the state (substring-mode distance)."""
    if not positions:
        return None
    return min(p[1] for p in positions)


def infer_distance(positions, query_length: int) -> int | None:
    """Final-node distance: ``min(e + remaining query chars)`` over
    non-special positions (special positions are in-progress transposition /
    split states and never contribute; reference state.rs:230-254)."""
    best = None
    for i, e, s in positions:
        if s:
            continue
        d = e + (query_length - i if query_length > i else 0)
        if best is None or d < best:
            best = d
    return best


def infer_prefix_distance(positions, query_length: int) -> int | None:
    """Prefix-mode distance: min over positions of
    ``errors + max(0, query_length - consumed)`` — the cheapest way to
    finish consuming the query at this node (remaining query chars as
    deletions).

    The reference filters to fully-consumed positions only
    (state.rs:264-281: ``term_index >= query_length``), which is UNSOUND
    under subsumption-minimal states: standard subsumption keeps
    ``e + (|q| - i)`` dominated, not ``i`` itself, so a fully-consumed
    position can be subsumed away by a partial one with the same inferred
    cost and the reference then reports NO match (e.g. query ``aaaba``,
    term ``aaacb``, n=2: the ``(5,2)`` position is subsumed by ``(4,1)``
    and ``infer_prefix_distance`` returns None although the best prefix
    alignment costs 2 — found by the Hypothesis prefix-DP sweep,
    tests/test_kernel_property.py).  The inferred form below is exactly
    ``min_k dp(query, term_prefix[:k])`` under prefix-mode transitions
    and is invariant under subsumption; it agrees with the reference
    wherever the reference is sound (and at n=0 always)."""
    best = None
    for i, e, s in positions:
        if s:
            continue  # in-progress transposition/split never finalizes
        d = e + (query_length - i if i < query_length else 0)
        if best is None or d < best:
            best = d
    return best
