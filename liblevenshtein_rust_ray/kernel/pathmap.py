"""Mapped dictionary: terms → arbitrary values, with online mutation.

Capability parity with the reference's ``PathMapDictionary<V>``
(/root/reference/src/dictionary/pathmap.rs:44-60: a trie-backed
``MappedDictionary`` where every term can carry a value — ``()`` for plain
membership, ``u32`` scope ids, ``Vec<String>`` metadata — with concurrent
reads and exclusive-write mutation).  The pathmap crate's structural sharing
is a Rust memory optimization; the *capability* is the mapped-dictionary
surface, which here is a nested-dict trie whose final nodes hold a value.

``MappedTrie`` exposes the same node surface as :class:`~.dawg.Trie`
(``root`` / ``edges`` / ``final``), so every kernel query path — fuzzy
``query``, ``ordered_query``, prefix mode, zippers — works over it
unchanged, and fuzzy hits can resolve their mapped values via ``get``.

In the Ray engine a ``MappedTrie`` is per-actor state (built once in
``__init__`` from a broadcast term/value table) — the same role the
reference gives ``PathMapDictionary<u32>`` in contextual completion
(src/contextual/engine.rs uses term→scope-id maps).
"""

from .dawg import _Node, _join, _units


class _MappedNode(_Node):
    __slots__ = ("value",)

    def __init__(self):
        super().__init__()
        self.value = None


class MappedTrie:
    """Trie mapping terms to values (reference ``PathMapDictionary<V>``).

    ``insert(term, value)`` / ``remove(term)`` are online (the reference's
    interior-mutability insert/remove, pathmap.rs); ``get(term)`` returns
    the mapped value or ``default``; ``iter_items()`` yields
    ``(term, value)`` sorted by term.
    """

    is_suffix_based = False

    def __init__(self, items=None):
        self.root = _MappedNode()
        self._len = 0
        if items is not None:
            if isinstance(items, dict):
                items = items.items()
            for term, value in items:
                self.insert(term, value)

    # -- mutation ------------------------------------------------------
    def insert(self, term, value=None) -> None:
        node = self.root
        for u in _units(term):
            nxt = node.edges.get(u)
            if nxt is None:
                nxt = _MappedNode()
                node.edges[u] = nxt
            node = nxt
        if not node.final:
            node.final = True
            self._len += 1
        node.value = value

    def remove(self, term) -> bool:
        path = [(None, None, self.root)]
        node = self.root
        for u in _units(term):
            nxt = node.edges.get(u)
            if nxt is None:
                return False
            path.append((node, u, nxt))
            node = nxt
        if not node.final:
            return False
        node.final = False
        node.value = None
        self._len -= 1
        for parent, label, child in reversed(path[1:]):
            if child.edges or child.final:
                break
            del parent.edges[label]
        return True

    # -- lookup ----------------------------------------------------------
    def _node(self, term):
        node = self.root
        for u in _units(term):
            node = node.edges.get(u)
            if node is None:
                return None
        return node

    def __contains__(self, term) -> bool:
        node = self._node(term)
        return node is not None and node.final

    def get(self, term, default=None):
        node = self._node(term)
        if node is None or not node.final:
            return default
        return node.value

    def __len__(self) -> int:
        return self._len

    # -- iteration ---------------------------------------------------------
    def iter_terms(self):
        return [t for t, _v in self.iter_items()]

    def iter_items(self):
        out = []

        def walk(node, prefix):
            if node.final:
                out.append((_join(prefix), node.value))
            for label in sorted(node.edges):
                prefix.append(label)
                walk(node.edges[label], prefix)
                prefix.pop()

        walk(self.root, [])
        return out


def build_mapped_trie(items) -> MappedTrie:
    return MappedTrie(items)
