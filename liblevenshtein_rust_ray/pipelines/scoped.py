"""Scoped (contextual) fuzzy completion — the contextual-engine capability
as a distributed pipeline.

The reference's ``ContextualCompletionEngine`` (/root/reference/
src/contextual/engine.rs:61, complete() engine.rs:1058-1174) resolves a
query against the terms VISIBLE from a scope: the union of the scope's own
terms and every ancestor scope's terms.  Ray-Data-native formulation:

* scope tree = small broadcast table ``(scope, parent)``;
* terms = Dataset ``(scope, term)`` rows;
* visibility is materialized by exploding each term DOWN to every
  descendant scope (equivalent to looking UP the ancestor chain at query
  time, but join-shaped: one explode + one groupby instead of a per-query
  graph walk);
* per-scope completion = prefix-mode automaton query over the visible
  term set (kernel prefix mode ≡ ``OrderedQueryIterator::prefix()``,
  reference src/transducer/ordered_query.rs:320).

Output: ``(scope, prefix, term, distance)`` for every distinct
``prefix_len``-character prefix of the scope's visible terms.
"""

import pandas as pd
import pyarrow as pa

from ..kernel import STANDARD, build_trie
from ..kernel.query import query as kernel_query


def _descendants(tree: dict) -> dict:
    """scope -> list of scopes whose ancestor chain contains it (incl. self)."""
    out: dict = {}
    for s in tree:
        cur = s
        while cur is not None:
            out.setdefault(cur, []).append(s)
            cur = tree.get(cur)
    return out


def scoped_fuzzy_complete(
    terms_ds,
    tree: dict,
    scope_col: str = "scope",
    term_col: str = "term",
    prefix_len: int = 4,
    n: int = 0,
    algorithm: str = STANDARD,
):
    """``terms_ds``: Dataset[(scope, term)]; ``tree``: {scope: parent|None}
    (small, broadcast by closure capture — scope trees are metadata-sized).

    Per LEAF-VISIBLE scope: every distinct prefix of its visible terms is
    completed against the visible set with a prefix-mode automaton at
    distance ``n``."""
    desc = _descendants(tree)

    def explode(t: pa.Table) -> pa.Table:
        out_s, out_t = [], []
        for s, term in zip(
            t.column(scope_col).to_pylist(), t.column(term_col).to_pylist()
        ):
            if term is None:
                continue
            for d in desc.get(s, [s]):
                out_s.append(d)
                out_t.append(term)
        return pa.table(
            {
                "scope": pa.array(out_s, type=pa.string()),
                "term": pa.array(out_t, type=pa.string()),
            }
        )

    def complete(g: pd.DataFrame) -> pd.DataFrame:
        vis = sorted(set(g["term"]))
        trie = build_trie(vis)
        prefixes = sorted({t[:prefix_len] for t in vis if len(t) >= prefix_len})
        s_out, p_out, t_out, d_out = [], [], [], []
        scope = g["scope"].iloc[0]
        for p in prefixes:
            for cand in kernel_query(trie, p, n, algorithm, prefix_mode=True):
                s_out.append(scope)
                p_out.append(p)
                t_out.append(cand.term)
                d_out.append(cand.distance)
        return pd.DataFrame(
            {
                "scope": pd.Series(s_out, dtype="object"),
                "prefix": pd.Series(p_out, dtype="object"),
                "term": pd.Series(t_out, dtype="object"),
                "distance": pd.Series(d_out, dtype="int64"),
            }
        )

    return (
        terms_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("scope")
        .map_groups(complete, batch_format="pandas")
    )
