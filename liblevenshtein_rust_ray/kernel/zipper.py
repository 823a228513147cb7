"""Zipper navigation: O(k) descent to a prefix, O(m) subtree iteration.

Capability parity with the reference's zipper family
(/root/reference/src/dictionary/zipper.rs:279, prefix_zipper.rs:1-50:
``with_prefix(prefix)`` navigates a dictionary cursor to a prefix in O(k)
and iterates the m matching terms in O(m) — versus O(n) full iteration
with ``starts_with`` filtering when m << n).

Two implementations, one per storage family:

* :class:`Zipper` — cursor over any node-surface dictionary (``Trie``,
  ``Dawg``, ``MappedTrie``): explicit descend/ascend with the path held as
  a breadcrumb stack (that IS the zipper structure), plus subtree
  iteration from the cursor.
* ArrayTrie ``with_prefix`` — the CSR trie stores its terms sorted, so the
  prefix subtree is the contiguous slice ``[bisect_left(p),
  bisect_left(p + MAX))``; O(log n) + O(m) with zero traversal.

``with_prefix(d, prefix)`` dispatches on the dictionary type (the
reference's per-backend ``*Zipper`` impls collapse into this one function).
"""

from bisect import bisect_left

from .arraytrie import ArrayTrie


class Zipper:
    """Cursor into a node-surface dictionary (reference zipper.rs:279).

    ``descend(unit)`` moves into an edge and returns ``True`` on success;
    ``ascend()`` pops back up; ``path`` is the term prefix at the cursor;
    ``at_final`` / ``value`` inspect the current node; ``iter_subtree()``
    yields every ``(term, value)`` at-or-below the cursor in sorted order
    (value is ``None`` for unmapped backends).
    """

    def __init__(self, dictionary):
        self._d = dictionary
        self._stack = [dictionary.root]  # breadcrumbs: nodes from root
        self._path = []                  # units taken from root

    # -- navigation ------------------------------------------------------
    def descend(self, unit) -> bool:
        child = self._stack[-1].edges.get(unit)
        if child is None:
            return False
        self._stack.append(child)
        self._path.append(unit)
        return True

    def descend_prefix(self, prefix) -> bool:
        """Descend a whole prefix; on failure the cursor is left where the
        walk stopped (call ``reset`` to go back to the root)."""
        for u in prefix:
            if not self.descend(u):
                return False
        return True

    def ascend(self) -> bool:
        if len(self._stack) == 1:
            return False
        self._stack.pop()
        self._path.pop()
        return True

    def reset(self) -> None:
        del self._stack[1:]
        del self._path[:]

    # -- inspection ------------------------------------------------------
    @property
    def depth(self) -> int:
        return len(self._path)

    @property
    def path(self):
        from .dawg import _join

        return _join(self._path)

    @property
    def at_final(self) -> bool:
        return self._stack[-1].final

    @property
    def value(self):
        return getattr(self._stack[-1], "value", None)

    def edges(self):
        """Outgoing edge labels at the cursor, sorted."""
        return sorted(self._stack[-1].edges)

    # -- iteration ---------------------------------------------------------
    def iter_subtree(self):
        """Yield ``(term, value)`` for every final node at-or-below the
        cursor, sorted; terms are full terms (root-relative), matching the
        reference's ``with_prefix`` paths (prefix_zipper.rs:27-31)."""
        from .dawg import _join

        def walk(node, prefix):
            if node.final:
                yield _join(prefix), getattr(node, "value", None)
            for label in sorted(node.edges):
                prefix.append(label)
                yield from walk(node.edges[label], prefix)
                prefix.pop()

        yield from walk(self._stack[-1], list(self._path))


def _arraytrie_prefix_slice(at: ArrayTrie, prefix):
    """Contiguous [lo, hi) slice of ``at.terms`` sharing ``prefix``."""
    lo = bisect_left(at.terms, prefix)
    if isinstance(prefix, bytes):
        hi_key = prefix + b"\xff" * 4
        # bytes compare lexicographically; \xff-padding is not a strict
        # upper bound for arbitrary content, so scan-extend if needed
        hi = bisect_left(at.terms, hi_key, lo)
        while hi < len(at.terms) and at.terms[hi].startswith(prefix):
            hi += 1
    else:
        hi = bisect_left(at.terms, prefix + "\U0010ffff", lo)
        while hi < len(at.terms) and at.terms[hi].startswith(prefix):
            hi += 1
    return lo, hi


def with_prefix(dictionary, prefix):
    """O(k)+O(m) prefix iteration over any backend (the reference's
    ``PrefixZipper::with_prefix``, prefix_zipper.rs): returns an iterator
    of ``(term, value)`` for terms starting with ``prefix``, or ``None``
    when no term has the prefix (matching the reference's Option)."""
    if isinstance(dictionary, ArrayTrie):
        lo, hi = _arraytrie_prefix_slice(dictionary, prefix)
        if lo >= hi:
            return None
        return iter((t, None) for t in dictionary.terms[lo:hi])
    z = Zipper(dictionary)
    if not z.descend_prefix(prefix):
        return None
    return z.iter_subtree()
