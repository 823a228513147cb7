"""Hashed n-gram language-model perplexity scoring — the CCNet-style
quality filter (Wenzek et al. 2020 filter corpora by LM perplexity
against a clean reference; KenLM replaced here by an exactly-specified
hashed bigram model so scores are deterministic and SQL-reproducible).

Model (all hashing = md5 family == DuckDB ``md5_number_lower``):
- unigram buckets  u(w) = md5(w) % B1           (dense int64[B1])
- bigram buckets   g(v,w) = ((md5(v) % 2^20) * 2^20 + md5(w) % 2^20) % B2
  (dense int64[B2]; derived ARITHMETICALLY from the two token hashes so
  md5 runs once per DISTINCT token, never per bigram — the direct
  md5(v||' '||w) form cost 136 s at sf1.0 vs 13.1 s for this one, and
  the products stay < 2^40 so DuckDB's non-wrapping UBIGINT arithmetic
  reproduces it exactly)
- context counts   C_ctx[u(v)] = #train bigram occurrences with
  context v (NOT the raw unigram count — a document's last token is a
  context of nothing; both engines compute it identically)
- p1(w)     = (C1[u(w)] + 1) / (T1 + B1)            add-1 smoothing
- p(w | v)  = (C2[g(v,w)] + alpha * p1(w)) / (C_ctx[u(v)] + alpha)
  (a bigram MLE interpolated toward the smoothed unigram; alpha is the
  interpolation pseudo-count)
- per doc: logp = ln p1(w_1) + sum_{i>=2} ln p(w_i | w_{i-1});
  ppl = exp(-logp / max(n_tokens, 1)); empty docs score (0, 0.0, 1.0).

Scale shape — identical skeleton to stages/selection.py (DSIR):
- TRAIN side is the small clean reference; its three count tables are
  built with (bucket, count) partial combiners (nothing doc-sized is
  exchanged) and broadcast once via ``ray.put`` as dense numpy arrays
  (B1=65,536 + B2=4,194,304 int64 ≈ 34 MB — one object-store entry,
  zero-copy views in every task).
- Scoring is ONE stateless ``map_batches`` pass: tokenize, hash the
  DISTINCT tokens/bigrams of the batch (factorize first), gather the
  three count arrays, one ``np.bincount`` per doc.  Filtering on ppl
  composes as a pure per-row rule, so the whole filter streams.
"""

import pyarrow as pa

__all__ = ["lm_score", "lm_filter"]


def _doc_tokens(t: pa.Table, text_col: str):
    """(parent_row_idx int64[], tokens: pa.Array) — the shared
    tokenization (lower + [a-z0-9]+) via the columnar kernel
    (``functions.tokenize.tokenize_column``), one entry per token
    occurrence in document order."""
    import numpy as np

    from ..functions.tokenize import tokenize_column

    tokens, offs = tokenize_column(t.column(text_col))
    parent = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                       np.diff(offs))
    return parent, tokens


_M20 = 1 << 20  # bigram-combine truncation: products stay < 2^40


def _hash64(values: "pa.Array"):
    """Full md5_hash64 per value, uint64 — md5 runs once per DISTINCT
    value in the batch (C dictionary-encode first)."""
    import numpy as np

    from ..functions.simhash import md5_hash64

    de = values.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False)
    lut = np.fromiter((md5_hash64(u) for u in de.dictionary.to_pylist()),
                      dtype=np.uint64, count=len(de.dictionary))
    return lut[codes] if len(codes) else np.zeros(0, dtype=np.uint64)


def _batch_hashes(t: pa.Table, text_col: str, b1: int, b2: int):
    """One tokenize + one distinct-token md5 sweep → everything the LM
    needs: (parent, u_buckets, first_mask, bigram_parent, g_buckets,
    ctx_buckets).  Bigram/context buckets are pure numpy arithmetic on
    the per-token hashes."""
    import numpy as np

    parent, toks = _doc_tokens(t, text_col)
    h = _hash64(toks)
    u = (h % np.uint64(b1)).astype(np.int64)
    first = np.ones(len(parent), dtype=bool)
    if len(parent):
        first[1:] = parent[1:] != parent[:-1]
    same = ~first[1:] if len(parent) else np.zeros(0, dtype=bool)
    hm = h % np.uint64(_M20)
    g = (((hm[:-1] * np.uint64(_M20) + hm[1:]) % np.uint64(b2))
         .astype(np.int64)[same]) if len(parent) > 1 else \
        np.zeros(0, dtype=np.int64)
    cu = u[:-1][same] if len(parent) > 1 else np.zeros(0, dtype=np.int64)
    gp = parent[:-1][same] if len(parent) > 1 else \
        np.zeros(0, dtype=np.int64)
    return parent, u, first, gp, g, cu


def _train_counts(train, text_col: str, b1: int, b2: int):
    """(C1, C2, C_ctx, T1) dense train-count arrays.

    ``train``: iterable of strings (driver-side) or a Dataset with
    ``text_col`` (streamed via (bucket, count) partial combiners)."""
    import numpy as np

    def batch_counts(t: pa.Table):
        _, u, _, _, g, cu = _batch_hashes(t, text_col, b1, b2)
        return (np.bincount(u, minlength=b1).astype(np.int64),
                np.bincount(g, minlength=b2).astype(np.int64),
                np.bincount(cu, minlength=b1).astype(np.int64))

    if hasattr(train, "map_batches"):
        # one PACKED int64 exchange key — unigram [0,b1), context
        # [b1,2·b1), bigram [2·b1, 2·b1+b2) — instead of a (string tag,
        # int) pair: the string-keyed sort/aggregate cost 4.7 s of a
        # 5.6 s sf0.1 run; the packed key cuts the whole train pass ~3x
        def partial(t: pa.Table) -> pa.Table:
            # sparse np.unique per stream (no dense b2-sized alloc/scan
            # per batch — that cost ~1 s of the sf0.1 train pass)
            _, u, _, _, g, cu = _batch_hashes(t, text_col, b1, b2)
            keys, cnts = [], []
            for off, arr in ((0, u), (b1, cu), (2 * b1, g)):
                vals, c = np.unique(arr, return_counts=True)
                keys.append(vals + off)
                cnts.append(c.astype(np.int64))
            return pa.table({
                "k": pa.array(np.concatenate(keys), type=pa.int64()),
                "n": pa.array(np.concatenate(cnts), type=pa.int64()),
            })

        agg = (train.map_batches(partial, batch_format="pyarrow")
               .groupby("k").sum("n").to_pandas())
        dense = np.zeros(2 * b1 + b2, dtype=np.int64)
        if len(agg):
            dense[agg["k"].to_numpy()] = agg["sum(n)"].to_numpy()
        c1, cc, c2 = dense[:b1], dense[b1:2 * b1], dense[2 * b1:]
    else:
        t = pa.table({text_col: pa.array(list(train), type=pa.string())})
        c1, c2, cc = batch_counts(t)
    return c1, c2, cc, int(c1.sum())


def lm_score(ds, train, text_col: str = "text", id_col: str = "doc_id",
             b1: int = 65536, b2: int = 4_194_304, alpha: float = 1.0):
    """Dataset[(id_col, n_tokens, logp, ppl)] — hashed-bigram LM score
    of every document under a model counted from ``train`` (the small
    clean-reference side).  Low ``ppl`` ⇒ the document reads like the
    reference corpus; filter with :func:`lm_filter` or any threshold.

    Float-reporting contract: ``logp`` / ``ppl`` are QUANTIZED to 4
    decimals (np.round here, ROUND(...,4) in the oracle SQL) — per-doc
    logp is a float sum whose accumulation order (np.bincount, doc
    order) differs from a SQL engine's aggregate order, so raw values
    can diverge in the last ulp, and a 6-decimal value hash would flip
    whenever a raw value sat within an ulp of a 6dp boundary.
    Quantizing both sides two decimals coarser than the hash shrinks
    the boundary-straddle window by ~100x; scoring itself is
    unaffected (deltas are >> 1e-4).  Engine output is block-order
    independent by construction (each doc's sum runs in its own token
    order) — pinned by a permutation test."""
    import numpy as np
    import ray

    c1, c2, cc, t1 = _train_counts(train, text_col, b1, b2)
    refs = [ray.put(np.ascontiguousarray(a)) for a in (c1, c2, cc)]
    id_type = ds.schema().base_schema.field(id_col).type

    def score(t: pa.Table) -> pa.Table:
        C1, C2, CC = (ray.get(r) for r in refs)  # zero-copy views
        parent, u, first, gp, g, cu = _batch_hashes(t, text_col, b1, b2)
        n_tok = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
        p1 = (C1[u] + 1.0) / (t1 + b1)
        logp = np.zeros(t.num_rows, dtype=np.float64)
        if len(parent):
            # first token of every doc: ln p1
            logp += np.bincount(parent[first], weights=np.log(p1[first]),
                                minlength=t.num_rows)
        if len(g):
            # p1 of the FOLLOWING token: bigram second elements are
            # exactly the non-first tokens, in doc order
            cond = (C2[g] + alpha * p1[~first]) / (CC[cu] + alpha)
            logp += np.bincount(gp, weights=np.log(cond),
                                minlength=t.num_rows)
        ppl = np.exp(-logp / np.maximum(n_tok, 1))
        return pa.table({
            id_col: t.column(id_col).combine_chunks()
            if isinstance(t.column(id_col), pa.ChunkedArray)
            else t.column(id_col),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "logp": pa.array(np.round(logp, 4), type=pa.float64()),
            "ppl": pa.array(np.round(ppl, 4), type=pa.float64()),
        }, schema=pa.schema([(id_col, id_type), ("n_tokens", pa.int64()),
                             ("logp", pa.float64()), ("ppl", pa.float64())]))

    return ds.map_batches(score, batch_format="pyarrow")


def lm_filter(ds, train, max_ppl: float, text_col: str = "text",
              id_col: str = "doc_id", b1: int = 65536,
              b2: int = 4_194_304, alpha: float = 1.0):
    """Corpus rows (full schema) with LM perplexity ≤ ``max_ppl`` — the
    CCNet keep rule as a stateless streaming filter."""
    import numpy as np
    import ray

    c1, c2, cc, t1 = _train_counts(train, text_col, b1, b2)
    refs = [ray.put(np.ascontiguousarray(a)) for a in (c1, c2, cc)]

    def keep(t: pa.Table) -> pa.Table:
        C1, C2, CC = (ray.get(r) for r in refs)
        parent, u, first, gp, g, cu = _batch_hashes(t, text_col, b1, b2)
        n_tok = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
        p1 = (C1[u] + 1.0) / (t1 + b1)
        logp = np.zeros(t.num_rows, dtype=np.float64)
        if len(parent):
            logp += np.bincount(parent[first], weights=np.log(p1[first]),
                                minlength=t.num_rows)
        if len(g):
            cond = (C2[g] + alpha * p1[~first]) / (CC[cu] + alpha)
            logp += np.bincount(gp, weights=np.log(cond),
                                minlength=t.num_rows)
        ppl = np.exp(-logp / np.maximum(n_tok, 1))
        return t.filter(pa.array(ppl <= max_ppl, type=pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")
