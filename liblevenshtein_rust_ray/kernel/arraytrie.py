"""Array-encoded trie with level-synchronous (vectorized) fuzzy traversal.

This fills the role of the reference's default/fastest backend, the
``DoubleArrayTrie`` (/root/reference/src/dictionary/double_array_trie.rs:204-827,
README.md:400-429): a flat array encoding of the trie that replaces pointer
chasing with index arithmetic.  Rather than porting the base/check scheme, the
numpy-idiomatic equivalent is a CSR layout —

* ``edge_start[node] .. edge_start[node+1]`` — the node's slice into
* ``edge_label`` (uint32 codepoints / byte values) and ``edge_child``
* ``term_id[node]``   — ordinal of the accepted term (-1 when not final);
  DFS construction from sorted input makes term ids the sorted order.

and the fuzzy query (``batched_query``) walks the intersection of the trie
and a :class:`LevenshteinAutomaton` one LEVEL at a time: the whole BFS
frontier is expanded with numpy gathers, the characteristic-vector bits for
every (state, edge) pair are computed in one vectorized shift/mask, and only
cache-missing transitions fall back to the per-state Python kernel (a few
dozen per query — the interned state space is small).  A trie is a tree, so
no frontier entry is ever duplicated.

Memory: ~16 bytes/edge — a 124k-word English dictionary is ~6 MB (the
reference gates <50 MB for the same corpus, BASELINE.md)."""

from functools import lru_cache

import numpy as np

from .algorithm import STANDARD, TRANSPOSITION
from .automaton import LevenshteinAutomaton


class ArrayTrie:
    is_suffix_based = False

    __slots__ = ("edge_start", "edge_label", "edge_child", "term_id", "terms",
                 "_bytes")

    def __init__(self, edge_start, edge_label, edge_child, term_id, terms, is_bytes):
        self.edge_start = edge_start
        self.edge_label = edge_label
        self.edge_child = edge_child
        self.term_id = term_id
        self.terms = terms
        self._bytes = is_bytes

    # ------------------------------------------------------------------
    @classmethod
    def from_terms(cls, terms, presorted: bool = False) -> "ArrayTrie":
        """Build directly from (sorted, distinct) terms via the LCP stack —
        no intermediate dict nodes, O(total characters)."""
        if not presorted:
            terms = sorted(set(terms))
        is_bytes = bool(terms) and isinstance(terms[0], bytes)

        node_edges: list[list] = [[]]   # per-node [(label, child), ...]
        term_of: list[int] = [-1]
        path = [0]                      # node ids along the previous term
        prev = terms[0][:0] if terms else ""
        for tid, term in enumerate(terms):
            units = list(term) if is_bytes else [ord(c) for c in term]
            # longest common prefix with the previous term
            lcp = 0
            for a, b in zip(prev, term):
                if a != b:
                    break
                lcp += 1
            del path[lcp + 1:]
            node = path[-1]
            for u in units[lcp:]:
                nid = len(node_edges)
                node_edges.append([])
                term_of.append(-1)
                node_edges[node].append((u, nid))
                path.append(nid)
                node = nid
            term_of[node] = tid
            prev = term

        counts = np.fromiter((len(e) for e in node_edges), np.int64,
                             count=len(node_edges))
        edge_start = np.zeros(len(node_edges) + 1, dtype=np.int64)
        np.cumsum(counts, out=edge_start[1:])
        n_edges = int(edge_start[-1])
        edge_label = np.empty(n_edges, dtype=np.uint32)
        edge_child = np.empty(n_edges, dtype=np.int64)
        k = 0
        for edges in node_edges:
            for u, c in edges:
                edge_label[k] = u
                edge_child[k] = c
                k += 1
        return cls(edge_start, edge_label, edge_child,
                   np.asarray(term_of, dtype=np.int64), list(terms), is_bytes)

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.terms)

    def __contains__(self, term) -> bool:
        node = 0
        for c in term:
            u = c if self._bytes else ord(c)
            lo, hi = self.edge_start[node], self.edge_start[node + 1]
            labels = self.edge_label[lo:hi]
            j = np.searchsorted(labels, u)
            if j >= labels.size or labels[j] != u:
                return False
            node = int(self.edge_child[lo + j])
        return self.term_id[node] >= 0

    def iter_terms(self):
        return iter(self.terms)

    def nbytes(self) -> int:
        return (self.edge_start.nbytes + self.edge_label.nbytes
                + self.edge_child.nbytes + self.term_id.nbytes)


# ----------------------------------------------------------------------
@lru_cache(maxsize=16)
def _dense_tables(n: int, algorithm: str):
    """Dense numpy views of the parametric universal automaton A^∀_n
    (kernel.universal): ``T[sid, w, bits] -> next sid | -1`` over every
    characteristic vector, and ``D[sid, r + n + 1] -> final distance`` for
    remaining-query-length ``r = len(query) - depth`` (min over the state's
    non-special positions of ``e + (r - off)`` — the infer_distance formula
    in relative coordinates; subsumption never hides a better value).
    Query-INDEPENDENT: built once per (n, algorithm), shared by every query
    and every actor — the reference's precomputed-table design
    (universal/automaton.rs:67-927)."""
    from .universal import universal_automaton

    ua = universal_automaton(n, algorithm)
    W = ua.width  # 2n + 1
    S = ua.state_count
    T = np.full((S, W + 1, 1 << W), -1, dtype=np.int64)
    for sid, row in enumerate(ua._table):
        for cv, nxt in row.items():
            bits = 0
            for i, b in enumerate(cv):
                bits |= b << i
            T[sid, len(cv), bits] = -1 if nxt is None else nxt
    R = 3 * n + 2  # r in [-(n+1) .. 2n]
    D = np.full((S, R), n + 1, dtype=np.int64)
    for sid, st in enumerate(ua._state_list):
        for ri, r in enumerate(range(-(n + 1), 2 * n + 1)):
            best = n + 1
            for off, e, sp in st:
                if not sp and off <= r:
                    best = min(best, e + (r - off))
            D[sid, ri] = best
    return T, D


def _universal_batched(trie: ArrayTrie, query_term, n: int, algorithm: str):
    """Table-driven level-synchronous traversal: every transition is one
    gather into the dense universal table — no per-query automaton at all."""
    T, D = _dense_tables(n, algorithm)
    W = 2 * n + 1
    m = len(query_term)
    if trie._bytes:
        qcp = np.frombuffer(query_term, dtype=np.uint8).astype(np.int64)
    else:
        qcp = np.fromiter((ord(c) for c in query_term), np.int64, m)
    shifts = np.arange(W, dtype=np.int64)

    out = []
    nodes = np.array([0], dtype=np.int64)
    states = np.zeros(1, dtype=np.int64)
    j = 0
    while nodes.size:
        # -- final nodes at depth j ------------------------------------
        r = m - j
        if -(n + 1) <= r <= 2 * n:
            tids = trie.term_id[nodes]
            fin = np.nonzero(tids >= 0)[0]
            if fin.size:
                d = D[states[fin], r + n + 1]
                ok = d <= n
                for i, dd in zip(fin[ok], d[ok]):
                    out.append((trie.terms[int(tids[i])], int(dd)))

        # -- expand ----------------------------------------------------
        lo = trie.edge_start[nodes]
        cnt = trie.edge_start[nodes + 1] - lo
        total = int(cnt.sum())
        if not total:
            break
        ramp = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        pos = np.repeat(lo, cnt) + ramp
        labels = trie.edge_label[pos].astype(np.int64)
        children = trie.edge_child[pos]
        st_rep = np.repeat(states, cnt)

        # characteristic bits at column j: slot b reads query[j - n + b]
        w_j = min(W, max(0, r + n))
        qlo = j - n
        win = np.full(W, -1, dtype=np.int64)
        b0, b1 = max(0, -qlo), min(W, m - qlo)
        if b1 > b0:
            win[b0:b1] = qcp[qlo + b0: qlo + b1]
        uniq, inv = np.unique(labels, return_inverse=True)
        bits_u = ((win[None, :] == uniq[:, None]) << shifts[None, :]).sum(axis=1)
        nxt = T[st_rep, w_j, bits_u[inv]]
        alive = nxt >= 0
        nodes = children[alive]
        states = nxt[alive]
        j += 1
    return out


def batched_query(trie: ArrayTrie, query_term, max_distance: int,
                  algorithm: str = STANDARD, subst=None):
    """All ``(term, distance)`` with distance <= ``max_distance`` — identical
    output to the generic traversal (pinned by tests), but the frontier is
    expanded level-synchronously with numpy.  For standard/transposition
    without substitution sets the transitions come from the dense
    query-independent universal tables; otherwise the per-query interned
    automaton drives the same level-synchronous walk."""
    if subst is None and max_distance <= 3:
        return _universal_batched(trie, query_term, max_distance, algorithm)
    aut = LevenshteinAutomaton(query_term, max_distance, algorithm, subst=subst)
    qlen = len(query_term)
    cv_width_bits = 24
    # the uint64 shift fast path needs every mask bit below 64
    if qlen + max_distance + aut._window >= 63:
        return _generic_fallback(trie, aut, max_distance)

    start = aut.start()
    if start is None:
        return []

    # growing per-state span arrays, synced with the automaton's intern table
    span_base = np.zeros(0, dtype=np.uint64)
    span_width = np.zeros(0, dtype=np.uint64)

    def sync_spans():
        nonlocal span_base, span_width
        k = span_base.size
        if len(aut._spans) > k:
            extra = aut._spans[k:]
            span_base = np.concatenate(
                [span_base, np.fromiter((b for b, _ in extra), np.uint64, len(extra))]
            )
            span_width = np.concatenate(
                [span_width, np.fromiter((w for _, w in extra), np.uint64, len(extra))]
            )

    # label -> characteristic mask, filled lazily per distinct codepoint
    mask_cache: dict[int, int] = {}
    trans_cache: dict[int, int] = {}  # packed (state << 24 | cv) -> next | -1

    out = []
    nodes = np.array([0], dtype=np.int64)
    states = np.array([start], dtype=np.int64)
    while nodes.size:
        # -- final nodes at this level ---------------------------------
        tids = trie.term_id[nodes]
        fin = np.nonzero(tids >= 0)[0]
        for i in fin:
            d = aut.distance(int(states[i]))
            if d is not None and d <= max_distance:
                out.append((trie.terms[int(tids[i])], d))

        # -- expand every edge of the frontier -------------------------
        lo = trie.edge_start[nodes]
        cnt = trie.edge_start[nodes + 1] - lo
        total = int(cnt.sum())
        if not total:
            break
        # positions of all edges: repeat each start and add a per-entry ramp
        ramp = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        pos = np.repeat(lo, cnt) + ramp
        labels = trie.edge_label[pos]
        children = trie.edge_child[pos]
        st_rep = np.repeat(states, cnt)

        # characteristic bits, vectorized over the frontier's edges
        uniq_labels, label_inv = np.unique(labels, return_inverse=True)
        for u in uniq_labels:
            iu = int(u)
            if iu not in mask_cache:
                unit = iu if trie._bytes else chr(iu)
                mask_cache[iu] = aut._mask(unit)
        mask_arr = np.fromiter(
            (mask_cache[int(u)] for u in uniq_labels), np.uint64, uniq_labels.size
        )
        sync_spans()
        m = mask_arr[label_inv]
        st_u = st_rep.astype(np.uint64)
        cv = (m >> span_base[st_rep]) & ((np.uint64(1) << span_width[st_rep]) - np.uint64(1))
        key = (st_u << np.uint64(cv_width_bits)) | cv

        uk, first_ix, key_inv = np.unique(key, return_index=True, return_inverse=True)
        mapped_u = np.empty(uk.size, dtype=np.int64)
        for j in range(uk.size):
            k_int = int(uk[j])
            nxt = trans_cache.get(k_int)
            if nxt is None:
                i0 = int(first_ix[j])
                unit = int(labels[i0]) if trie._bytes else chr(int(labels[i0]))
                r = aut.step(int(st_rep[i0]), unit)
                nxt = -1 if r is None else r
                trans_cache[k_int] = nxt
            mapped_u[j] = nxt
        nxt_states = mapped_u[key_inv]
        alive = nxt_states >= 0
        nodes = children[alive]
        states = nxt_states[alive]
    return out


def build_array_trie(terms, presorted: bool = False) -> ArrayTrie:
    return ArrayTrie.from_terms(terms, presorted=presorted)


def _generic_fallback(trie: ArrayTrie, aut: LevenshteinAutomaton, n: int):
    """Scalar BFS for queries too long for the uint64 mask fast path."""
    out = []
    stack = [(0, aut.start())]
    while stack:
        node, sid = stack.pop()
        tid = int(trie.term_id[node])
        if tid >= 0:
            d = aut.distance(sid)
            if d is not None and d <= n:
                out.append((trie.terms[tid], d))
        lo, hi = int(trie.edge_start[node]), int(trie.edge_start[node + 1])
        for k in range(lo, hi):
            u = int(trie.edge_label[k])
            unit = u if trie._bytes else chr(u)
            nxt = aut.step(sid, unit)
            if nxt is not None:
                stack.append((int(trie.edge_child[k]), nxt))
    return out
