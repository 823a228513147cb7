"""State transition tables of the Levenshtein automaton.

Ports the Schulz & Mihov (2002) transition semantics exactly as the reference
implements them (/root/reference/src/transducer/transition.rs):

* ``transition_standard``      — Table 4.1 (+ multi-character deletion via the
  first-match index in the characteristic vector)
* ``transition_transposition`` — Table 7.1 (adjacent swap via special positions)
* ``transition_merge_split``   — Table 8.1 (merge / split via special positions)
* ``epsilon_closure``          — deletion-reachable positions added before each
  character transition (reference transition.rs:502-534)
* ``initial_state``            — {(0,0)} plus initial deletions, subsumed away
  where applicable (reference transition.rs:716-728)

The characteristic vector window is ``max_distance + 1`` capped at 8, exactly
like the reference's stack buffer (transition.rs:44-67).
"""

from .algorithm import STANDARD, TRANSPOSITION, MERGE_AND_SPLIT
from .state import state_insert

_CV_CAP = 8  # reference uses a fixed [bool; 8] buffer


def characteristic_vector(dict_unit, query, window_size: int, offset: int, subst=None) -> tuple:
    """Which of ``query[offset : offset + window]`` match ``dict_unit``.

    ``subst`` is an optional substitution policy with
    ``is_allowed(dict_unit, query_unit) -> bool`` granting zero-cost
    substitutions (reference substitution sets, §2.4 of SURVEY.md).
    """
    w = min(window_size, _CV_CAP)
    n = len(query)
    out = []
    for k in range(w):
        qi = offset + k
        if qi < n:
            qu = query[qi]
            out.append(qu == dict_unit or (subst is not None and subst.is_allowed(dict_unit, qu)))
        else:
            out.append(False)
    return tuple(out)


def _index_of_match(cv, start: int, limit: int):
    for j in range(limit):
        k = start + j
        if k < len(cv) and cv[k]:
            return j
    return None


def transition_standard(position, cv, query_length: int, max_distance: int, prefix_mode: bool):
    i, e, _s = position
    w = len(cv)
    out = []

    if prefix_mode and i >= query_length:
        return [(i, e, False)]

    if e < max_distance:
        if 2 <= w:
            k = min(max_distance - e + 1, w)
            j = _index_of_match(cv, 0, k)
            if j == 0:
                out.append((i + 1, e, False))
            elif j is not None:
                out.append((i, e + 1, False))          # insertion
                out.append((i + 1, e + 1, False))      # substitution
                out.append((i + j + 1, e + j, False))  # multi-char deletion
            else:
                out.append((i, e + 1, False))
                out.append((i + 1, e + 1, False))
        elif w == 1:
            if cv[0]:
                out.append((i + 1, e, False))
            else:
                out.append((i, e + 1, False))
                out.append((i + 1, e + 1, False))
        else:
            out.append((i, e + 1, False))
    elif e == max_distance and 0 < w and cv[0]:
        out.append((i + 1, max_distance, False))

    return out


def transition_transposition(position, cv, query_length: int, max_distance: int, prefix_mode: bool):
    i, e, t = position
    w = len(cv)
    out = []

    if prefix_mode and i >= query_length:
        return [(i, e, False)]

    if e == 0 and max_distance > 0:
        if 2 <= w:
            k = min(max_distance + 1, w)
            j = _index_of_match(cv, 0, k)
            if j == 0:
                out.append((i + 1, 0, False))
            elif j == 1:
                out.append((i, 1, False))          # insertion
                out.append((i, 1, True))           # transposition start
                out.append((i + 1, 1, False))      # substitution
                out.append((i + 2, 1, False))      # matched one past: delete+match
            elif j is not None:
                out.append((i, 1, False))
                out.append((i + 1, 1, False))
                out.append((i + j + 1, j, False))  # multi-char deletion
            else:
                out.append((i, 1, False))
                out.append((i + 1, 1, False))
        elif w == 1:
            if cv[0]:
                out.append((i + 1, 0, False))
            else:
                out.append((i, 1, False))
                out.append((i + 1, 1, False))
        else:
            out.append((i, 1, False))
    elif 1 <= e < max_distance:
        if 2 <= w:
            if not t:
                k = min(max_distance - e + 1, w)
                j = _index_of_match(cv, 0, k)
                if j == 0:
                    out.append((i + 1, e, False))
                elif j == 1:
                    out.append((i, e + 1, False))
                    out.append((i, e + 1, True))
                    out.append((i + 1, e + 1, False))
                    out.append((i + 2, e + 1, False))
                elif j is not None:
                    out.append((i, e + 1, False))
                    out.append((i + 1, e + 1, False))
                    out.append((i + j + 1, e + j, False))
                else:
                    out.append((i, e + 1, False))
                    out.append((i + 1, e + 1, False))
            else:
                if cv[0]:
                    # complete the transposition
                    out.append((i + 2, e, False))
        elif w == 1:
            if cv[0]:
                out.append((i + 1, e, False))
            else:
                out.append((i, e + 1, False))
                out.append((i + 1, e + 1, False))
        else:
            out.append((i, e + 1, False))
    elif e == max_distance:
        if 0 < w and not t:
            if cv[0]:
                out.append((i + 1, max_distance, False))
        elif 2 <= w and t and cv[0]:
            out.append((i + 2, max_distance, False))

    return out


def transition_merge_split(position, cv, query_length: int, max_distance: int, prefix_mode: bool):
    i, e, s = position
    w = len(cv)
    out = []

    if prefix_mode and i >= query_length:
        return [(i, e, False)]

    if e == 0 and max_distance > 0:
        if 2 <= w:
            if cv[0]:
                out.append((i + 1, e, False))
            else:
                out.append((i, e + 1, False))            # insertion
                if i < query_length:
                    out.append((i, e + 1, True))         # split start
                out.append((i + 1, e + 1, False))        # substitution
                if i + 2 <= query_length:
                    out.append((i + 2, e + 1, False))    # merge
        elif w == 1:
            if cv[0]:
                out.append((i + 1, e, False))
            else:
                out.append((i, e + 1, False))
                if i < query_length:
                    out.append((i, e + 1, True))
                out.append((i + 1, e + 1, False))
        else:
            out.append((i, e + 1, False))
    elif e < max_distance:
        if 2 <= w:
            if not s:
                if cv[0]:
                    out.append((i + 1, e, False))
                else:
                    out.append((i, e + 1, False))
                    if i < query_length:
                        out.append((i, e + 1, True))
                    out.append((i + 1, e + 1, False))
                    if i + 2 <= query_length:
                        out.append((i + 2, e + 1, False))
            else:
                out.append((i + 1, e, False))            # complete split
        elif w == 1:
            if not s:
                if cv[0]:
                    out.append((i + 1, e, False))
                else:
                    out.append((i, e + 1, False))
                    if i < query_length:
                        out.append((i, e + 1, True))
                    out.append((i + 1, e + 1, False))
            else:
                out.append((i + 1, e, False))
        else:
            out.append((i, e + 1, False))
    elif e == max_distance and 0 < w:
        if not s:
            if cv[0]:
                out.append((i + 1, max_distance, False))
        else:
            out.append((i + 1, e, False))                # complete split at max

    return out


_TRANSITIONS = {
    STANDARD: transition_standard,
    TRANSPOSITION: transition_transposition,
    MERGE_AND_SPLIT: transition_merge_split,
}


def transition_position(position, cv, query_length, max_distance, algorithm, prefix_mode):
    return _TRANSITIONS[algorithm](position, cv, query_length, max_distance, prefix_mode)


def epsilon_closure(positions: list, query_length: int, max_distance: int, algorithm: str) -> list:
    """Add deletion-reachable positions (skip query chars without consuming a
    dictionary char).  Mutates and returns ``positions``."""
    todo = list(positions)
    idx = 0
    while idx < len(todo):
        i, e, _s = todo[idx]
        idx += 1
        if e < max_distance and i < query_length:
            deleted = (i + 1, e + 1, False)
            before = len(positions)
            state_insert(positions, deleted, algorithm, query_length)
            if len(positions) > before:
                todo.append(deleted)
    return positions


def transition_state(
    positions,
    dict_unit,
    query,
    max_distance: int,
    algorithm: str,
    prefix_mode: bool = False,
    subst=None,
):
    """Transition a whole state on one dictionary character.

    Returns the next state (sorted list of positions) or ``None`` when empty —
    mirrors ``transition_state_pooled`` (reference transition.rs:651-710).
    """
    window = max_distance + 1
    qlen = len(query)

    expanded = list(positions)
    epsilon_closure(expanded, qlen, max_distance, algorithm)

    nxt: list = []
    for pos in expanded:
        cv = characteristic_vector(dict_unit, query, window, pos[0], subst)
        for np in transition_position(pos, cv, qlen, max_distance, algorithm, prefix_mode):
            state_insert(nxt, np, algorithm, qlen)

    return nxt if nxt else None


def initial_state(query_length: int, max_distance: int, algorithm: str) -> list:
    state: list = []
    state_insert(state, (0, 0, False), algorithm, query_length)
    for i in range(1, min(max_distance, query_length) + 1):
        state_insert(state, (i, i, False), algorithm, query_length)
    return state
