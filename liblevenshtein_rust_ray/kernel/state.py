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
    """Prefix-mode distance: min errors among positions that consumed the
    whole query (reference state.rs:264-281)."""
    best = None
    for i, e, _s in positions:
        if i >= query_length:
            if best is None or e < best:
                best = e
    return best
