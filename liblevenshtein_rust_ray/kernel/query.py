"""Intersected automaton-dictionary traversal (fuzzy query).

Port of the reference's ``QueryIterator`` BFS
(/root/reference/src/transducer/query.rs:68-229) and the ordering contract of
``OrderedQueryIterator`` (/root/reference/src/transducer/ordered_query.rs:64-340):
results sorted distance-ascending, then lexicographic within a distance level.

Matching modes (mirroring the reference API):

* default           — whole-term matching; final-node distance is
  ``infer_distance`` (errors + unconsumed query suffix)
* ``prefix_mode``   — autocomplete: dictionary terms whose PREFIX matches the
  query; transitions treat positions past the query end as free matches and
  finality uses ``infer_prefix_distance``
  (ordered_query.rs:320-325, 381-419)
* ``substring_mode``— suffix-automaton style: don't penalize unmatched query
  suffix; finality uses ``min_distance`` (query.rs:147-156)
"""

from collections import deque
from typing import Iterator, NamedTuple, Union

from .algorithm import STANDARD
from .automaton import LevenshteinAutomaton
from .dawg import _join


class Candidate(NamedTuple):
    term: Union[str, bytes]
    distance: int


def query(
    dictionary,
    query_term,
    max_distance: int,
    algorithm: str = STANDARD,
    *,
    prefix_mode: bool = False,
    substring_mode: bool = False,
    subst=None,
) -> Iterator[Candidate]:
    """Yield all ``(term, distance)`` within ``max_distance`` of ``query_term``.

    ``dictionary`` is a :class:`Trie` / :class:`Dawg` (or any object with a
    ``root`` node exposing ``edges`` / ``final``), or an :class:`ArrayTrie`
    (whole-term mode only — the vectorized backend).  Results stream in BFS
    order (use :func:`ordered_query` for the sorted contract).
    """
    from .arraytrie import ArrayTrie, batched_query

    if isinstance(dictionary, ArrayTrie):
        if prefix_mode or substring_mode:
            raise ValueError(
                "ArrayTrie supports whole-term queries; use Trie/Dawg for "
                "prefix/substring modes"
            )
        for term, d in batched_query(dictionary, query_term, max_distance,
                                     algorithm, subst=subst):
            yield Candidate(term, d)
        return
    root = getattr(dictionary, "root", dictionary)
    aut = LevenshteinAutomaton(
        query_term,
        max_distance,
        algorithm,
        prefix_mode=prefix_mode or substring_mode,
        subst=subst,
    )

    start = aut.start()
    if start is None:
        return
    # frontier entries: (node, state_id, path labels)
    pending = deque([(root, start, [])])
    while pending:
        node, state_id, path = pending.popleft()
        if node.final:
            if substring_mode:
                d = aut.substring_distance(state_id)
            elif prefix_mode:
                d = aut.prefix_distance(state_id)
            else:
                d = aut.distance(state_id)
            if d is not None and d <= max_distance:
                yield Candidate(_join(path), d)
        for label, child in node.edges.items():
            nxt = aut.step(state_id, label)
            if nxt is not None:
                pending.append((child, nxt, path + [label]))


def ordered_query(
    dictionary,
    query_term,
    max_distance: int,
    algorithm: str = STANDARD,
    *,
    prefix_mode: bool = False,
    substring_mode: bool = False,
    subst=None,
    limit: int | None = None,
    predicate=None,
) -> list[Candidate]:
    """All matches sorted (distance asc, term lexicographic) — the ordering
    contract of the reference's ``query_ordered`` (transducer/mod.rs:390-427).
    ``limit`` truncates after ordering (``QueryBuilder::limit`` semantics);
    ``predicate(term) -> bool`` filters before the limit (the ordered-query
    filter hook, ordered_query.rs:295)."""
    hits = query(
        dictionary,
        query_term,
        max_distance,
        algorithm,
        prefix_mode=prefix_mode,
        substring_mode=substring_mode,
        subst=subst,
    )
    if predicate is not None:
        hits = [c for c in hits if predicate(c.term)]
    out = sorted(hits, key=lambda c: (c.distance, c.term))
    if limit is not None:
        out = out[:limit]
    return out
