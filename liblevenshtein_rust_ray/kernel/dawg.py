"""Trie and minimal-DAWG dictionaries over term sequences.

Capability parity with the reference's dictionary backends
(/root/reference/src/dictionary/: DawgDictionary dawg.rs:45-210,
DoubleArrayTrie double_array_trie.rs:204-827 — 10 interchangeable backends all
exposing root() / is_final() / edges() / transition()).  We keep two:

* ``Trie``  — plain nested-dict trie; fastest to build, used by per-block
  scorers (the reference's comparison table shows build time is negligible:
  ~3 ms / 10k terms, docs/benchmarks/FINAL_BACKEND_COMPARISON.md).
* ``Dawg``  — classic incremental minimal DAWG from SORTED terms
  (common-prefix reuse + suffix-registry minimization, reference
  dawg.rs:108-162).  Same query semantics, smaller memory for large blocks.

Terms may be ``str`` (char-level, Unicode-correct — the reference's ``*Char``
backends) or ``bytes`` (byte-level).  Edge iteration order is lexicographic
(insertion order from sorted input), which makes traversals deterministic.
"""


class _Node:
    __slots__ = ("edges", "final")

    def __init__(self):
        self.edges = {}
        self.final = False

    # -- DAWG minimization helpers -------------------------------------
    def signature(self):
        return (self.final, tuple((label, id(child)) for label, child in self.edges.items()))


class Trie:
    """Prefix trie.  ``root`` exposes ``edges: dict[label, node]`` and
    ``final: bool`` — the whole Dictionary/DictionaryNode surface we need."""

    is_suffix_based = False

    def __init__(self, terms=None):
        self.root = _Node()
        self._len = 0
        if terms:
            for t in terms:
                self.insert(t)

    def insert(self, term) -> None:
        node = self.root
        for u in _units(term):
            nxt = node.edges.get(u)
            if nxt is None:
                nxt = _Node()
                node.edges[u] = nxt
            node = nxt
        if not node.final:
            node.final = True
            self._len += 1

    def __contains__(self, term) -> bool:
        node = self.root
        for u in _units(term):
            node = node.edges.get(u)
            if node is None:
                return False
        return node.final

    def remove(self, term) -> bool:
        """Online removal (the reference's DynamicDawg remove capability,
        /root/reference/src/dictionary/dynamic_dawg.rs): unmark the final
        node and prune the now-dead suffix path.  Returns whether the term
        was present.  With ``insert`` this makes Trie the mutable
        dictionary backend (a trie is its own minimal form under
        mutation — no re-minimization step needed)."""
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
        self._len -= 1
        # prune childless non-final suffix nodes bottom-up
        for parent, label, child in reversed(path[1:]):
            if child.edges or child.final:
                break
            del parent.edges[label]
        return True

    def __len__(self) -> int:
        return self._len

    def iter_terms(self):
        """Enumerate terms in lexicographic order (edge insertion order for
        sorted input; sorted explicitly otherwise)."""
        stack = [(self.root, [])]
        out = []

        def walk(node, prefix):
            if node.final:
                out.append(_join(prefix))
            for label in sorted(node.edges):
                prefix.append(label)
                walk(node.edges[label], prefix)
                prefix.pop()

        del stack
        walk(self.root, [])
        return out


class Dawg:
    """Minimal DAWG built incrementally from sorted terms.

    Requires sorted input exactly like the reference builder
    (dawg.rs:105-108 panics on unsorted input; we raise ``ValueError``).
    """

    is_suffix_based = False

    def __init__(self, sorted_terms):
        self.root = _Node()
        self._len = 0
        self._registry = {}
        self._prev = None
        # unchecked stack of (parent, label, child) awaiting minimization
        self._unchecked = []
        for t in sorted_terms:
            self._insert_sorted(t)
        self._minimize(0)
        self._registry = None  # release
        self._unchecked = None

    def _insert_sorted(self, term) -> None:
        units = list(_units(term))
        if self._prev is not None:
            if units < self._prev:
                raise ValueError("Dawg requires sorted input terms")
            if units == self._prev:
                return
        # longest common prefix with previous word
        common = 0
        if self._prev is not None:
            for a, b in zip(units, self._prev):
                if a != b:
                    break
                common += 1
        self._minimize(common)
        node = self._unchecked[-1][2] if self._unchecked else self.root
        for u in units[common:]:
            child = _Node()
            node.edges[u] = child
            self._unchecked.append((node, u, child))
            node = child
        node.final = True
        self._len += 1
        self._prev = units

    def _minimize(self, down_to: int) -> None:
        while len(self._unchecked) > down_to:
            parent, label, child = self._unchecked.pop()
            sig = child.signature()
            existing = self._registry.get(sig)
            if existing is not None:
                parent.edges[label] = existing
            else:
                self._registry[sig] = child

    def __contains__(self, term) -> bool:
        node = self.root
        for u in _units(term):
            node = node.edges.get(u)
            if node is None:
                return False
        return node.final

    def __len__(self) -> int:
        return self._len

    def node_count(self) -> int:
        seen = set()
        stack = [self.root]
        while stack:
            n = stack.pop()
            if id(n) in seen:
                continue
            seen.add(id(n))
            stack.extend(n.edges.values())
        return len(seen)

    def iter_terms(self):
        """Enumerate all accepted terms in sorted order (the reference's
        ``DictionaryIterator`` / ``iter_terms``, src/dictionary/iterator.rs:190).
        DAG sharing is fine: traversal is by path, not by node identity."""

        def walk(node, prefix):
            if node.final:
                yield _join(prefix)
            for u in sorted(node.edges):
                prefix.append(u)
                yield from walk(node.edges[u], prefix)
                prefix.pop()

        yield from walk(self.root, [])


def _units(term):
    """Iterate character units: codepoints for str, byte ints for bytes."""
    return term


def _join(units):
    if not units:
        return ""
    if isinstance(units[0], int):
        return bytes(units)
    return "".join(units)


def build_trie(terms) -> Trie:
    return Trie(terms)


def build_dawg(terms, presorted: bool = False) -> Dawg:
    if not presorted:
        terms = sorted(set(terms))
    return Dawg(terms)
