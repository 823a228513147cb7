"""Positions of the Levenshtein automaton and subsumption rules.

A position is a tuple ``(i, e, s)``: ``i`` query characters consumed,
``e`` accumulated errors, ``s`` special flag (transposition-in-progress or
split-in-progress for the extended algorithms).

Subsumption semantics follow the reference exactly, including its two
documented corrections of the C++/Java lineage
(/root/reference/src/transducer/position.rs:82-180):

* Transposition: a normal position must NEVER subsume a special position.
* MergeAndSplit: subsumption requires STRICTLY fewer errors (``e < f``), and a
  special position cannot subsume a normal one.
"""

from .algorithm import STANDARD, TRANSPOSITION, MERGE_AND_SPLIT

Position = tuple  # (i: int, e: int, s: bool)


def subsumes(lhs: Position, rhs: Position, algorithm: str, query_length: int) -> bool:
    """True if ``lhs`` covers everything reachable from ``rhs``.

    ``query_length`` plays the role of ``n`` in the reference's signature
    (/root/reference/src/transducer/position.rs:82); it only matters for the
    transposition special-vs-normal case.
    """
    i, e, s = lhs
    j, f, t = rhs

    if e > f:
        return False

    if algorithm == STANDARD:
        return abs(i - j) <= (f - e)

    if algorithm == TRANSPOSITION:
        if s:
            if t:
                return i == j
            # lhs special, rhs normal: NEVER subsume.  The reference
            # (position.rs:104-113, from C++ subsumes.cpp) allows it when
            # f == query_length and i == j, but that is unsound: a special
            # awaits q[i] and completes to (i+2, e), while the normal at
            # max errors can still accept the exact tail q[j:] — e.g.
            # query "cb", term "abcb", n=2: (0,2,special) would wrongly
            # subsume (0,2,normal), whose match-match path is the ONLY
            # accepting one.  Keeping both is conservative (never loses a
            # match) and the automaton ≡ DP property test pins it.
            return False
        if t:
            # lhs normal, rhs special: cannot subsume (transposition-in-progress
            # paths must stay alive; see reference position.rs:116-144)
            return False
        return abs(i - j) <= (f - e)

    if algorithm == MERGE_AND_SPLIT:
        if s and not t:
            return False
        if e >= f:
            # strictly fewer errors required (reference position.rs:159-172)
            return False
        return abs(i - j) <= (f - e)

    raise ValueError(f"unknown algorithm {algorithm!r}")
