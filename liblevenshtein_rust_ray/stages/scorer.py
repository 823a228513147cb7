"""Per-block pairwise scoring — the heart of the engine.

``BlockScorer`` is the stateful stage run as
``groupby("block_key").map_groups(BlockScorer(...), batch_format="pandas")``:
per group it dedups the block's strings, builds a trie over the distinct
strings (cheap — the reference builds 10k-term indexes in ~3 ms,
docs/benchmarks/FINAL_BACKEND_COMPARISON.md:19-26) and runs the intersected
automaton-trie traversal per distinct string, emitting canonical edges
``(url_a, url_b, distance)`` with ``url_a < url_b``.

Scale design decisions (north rule):

* **Identical strings collapse.**  k urls sharing one string produce a
  distance-0 STAR (k-1 edges to the lexicographically-smallest url), not
  k(k-1)/2 pairs — transitively equivalent for clustering and linear, not
  quadratic, in block size.
* **Cross-string matches connect representatives.**  One edge per matching
  string pair (min-url of each side).  ``emit_all_pairs=True`` restores the
  full quadratic pair set for small-scale parity checks.
* **In-group salting.**  A group whose distinct-string count exceeds
  ``max_block_strings`` is subdivided by additional simhash bits
  (recall-preserving for near-identical strings, which agree on most bits);
  the subdivision happens in-memory on the worker that already owns the
  group, so no extra shuffle.  Sub-block membership is replicated across
  2 rotations to keep boundary pairs.
* Traversal state (automaton transition memos) is per-query; the trie is
  per-group.  Parallelism is across groups (Ray actor pool), never inside
  a traversal (reference pool.rs:43-47).
"""

import pandas as pd

from ..kernel import STANDARD, LevenshteinAutomaton, build_trie
from ..kernel.query import query as kernel_query
from ..functions.simhash import simhash64
from ..functions.tokenize import char_ngrams

EDGE_COLUMNS = ["url_a", "url_b", "distance"]


def _empty_edges() -> pd.DataFrame:
    return pd.DataFrame({"url_a": pd.Series(dtype="object"),
                         "url_b": pd.Series(dtype="object"),
                         "distance": pd.Series(dtype="int32")})


class BlockScorer:
    """Callable class for ``map_groups`` (actor pool when ``concurrency`` is
    set on the enclosing ``map_batches``)."""

    def __init__(
        self,
        max_distance: int = 2,
        algorithm: str = STANDARD,
        max_block_strings: int = 512,
        emit_all_pairs: bool = False,
        subst=None,
    ):
        self.n = max_distance
        self.algorithm = algorithm
        self.cap = max_block_strings
        self.emit_all_pairs = emit_all_pairs
        self.subst = subst

    # -- public: one co-located block ----------------------------------
    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        strings = group["key_string"].to_numpy()
        urls = group["url"].to_numpy()

        by_string: dict[str, list] = {}
        for s, u in zip(strings, urls):
            by_string.setdefault(s, []).append(u)
        for v in by_string.values():
            v.sort()

        out_a, out_b, out_d = [], [], []

        # distance-0 stars for identical strings
        for s, us in by_string.items():
            if len(us) > 1:
                seen = set()
                rep = us[0]
                for u in us[1:]:
                    if u not in seen:
                        seen.add(u)
                        out_a.append(rep)
                        out_b.append(u)
                        out_d.append(0)

        distinct = sorted(by_string)
        if len(distinct) > 1:
            for sub in self._subdivide(distinct):
                self._score_distinct(sub, by_string, out_a, out_b, out_d)

        if not out_a:
            return _empty_edges()
        df = pd.DataFrame({"url_a": out_a, "url_b": out_b, "distance": out_d})
        df["distance"] = df["distance"].astype("int32")
        return df

    # -- salting: subdivide oversized groups by extra simhash bits -----
    def _subdivide(self, distinct: list) -> list[list]:
        if len(distinct) <= self.cap:
            return [distinct]
        # two rotated 8-bit views of the strings' simhash: a pair of
        # near-identical strings lands together in at least one view with
        # high probability even when one view's bits straddle a flip
        subs: dict[tuple, list] = {}
        for s in distinct:
            sh = simhash64(char_ngrams(s, 3))
            for view, shift in enumerate((24, 52)):
                key = (view, (sh >> shift) & 0xFF)
                subs.setdefault(key, []).append(s)
        return list(subs.values())

    # -- automaton-trie scoring over distinct strings ------------------
    def _score_distinct(self, distinct, by_string, out_a, out_b, out_d):
        if len(distinct) < 2:
            return
        trie = build_trie(distinct)
        for q in distinct:
            for cand in kernel_query(trie, q, self.n, self.algorithm, subst=self.subst):
                t = cand.term
                if t <= q:
                    continue  # canonical ordering: each string pair once
                if self.emit_all_pairs:
                    for ua in by_string[q]:
                        for ub in by_string[t]:
                            a, b = (ua, ub) if ua < ub else (ub, ua)
                            out_a.append(a)
                            out_b.append(b)
                            out_d.append(cand.distance)
                else:
                    ua, ub = by_string[q][0], by_string[t][0]
                    a, b = (ua, ub) if ua < ub else (ub, ua)
                    out_a.append(a)
                    out_b.append(b)
                    out_d.append(cand.distance)


def score_block_pandas(group: pd.DataFrame, **kwargs) -> pd.DataFrame:
    """Function wrapper for quick use in ``map_groups`` without an actor."""
    return BlockScorer(**kwargs)(group)
