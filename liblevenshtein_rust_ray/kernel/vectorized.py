"""Vectorized banded pairwise edit distances — the numpy analogue of the
reference's SIMD distance-matrix kernels (/root/reference/src/distance/simd.rs,
src/transducer/simd.rs: AVX2/SSE4.1 batched DP with scalar fallback).

``batch_distances(queries, terms, n, algorithm)`` computes, for P string
pairs at once, the reference's edit distance clamped at ``n + 1``
(``> n`` ⇒ ``n + 1``), using an Ukkonen band of width ``2n + 1`` so work is
O(P · maxlen · n) numpy ops instead of per-pair Python DP:

* band cell ``k`` of row ``i`` holds D[i][j] with ``j = i + k - n`` —
  the source-char loop is the only Python loop; every row update is a
  handful of vector ops over a ``(P, 2n+1)`` matrix;
* values saturate at ``n + 1``: DP values are non-decreasing along any
  path, so a cell ``> n`` can never produce a final result ``≤ n`` and the
  clamp is exact for all reported distances;
* algorithms mirror kernel.distance exactly (standard two-row
  Wagner-Fischer mod.rs:244-288; transposition/OSA three-row mod.rs:304-359;
  merge-and-split greedy-match recursion mod.rs:624-730 — run forward over
  REVERSED strings, which is the suffix DP in prefix coordinates);
* ``subst`` (standard algorithm only): zero-cost characteristic-vector
  matches for allowed (dict_char, query_char) pairs, as
  substitution_set.rs:156-640.

Used by the block scorer for all-pairs scoring of co-blocked strings and by
the fuzzy-join stages; cross-validated against the per-pair DP oracle by
Hypothesis (tests/test_kernel_property.py).
"""

import numpy as np

from .algorithm import STANDARD, TRANSPOSITION, MERGE_AND_SPLIT


def encode_strings(strings, reverse: bool = False):
    """Unit matrix (P, maxlen) uint32, zero-padded, + lengths: UTF-32
    codepoints for ``str`` terms, raw bytes for ``bytes`` terms (the
    reference's CharUnit axis, char_unit.rs:30-78)."""
    P = len(strings)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=P)
    maxlen = int(lens.max()) if P else 0
    out = np.zeros((P, max(maxlen, 1)), dtype=np.uint32)
    for i, s in enumerate(strings):
        if s:
            if isinstance(s, bytes):
                cp = np.frombuffer(s, dtype=np.uint8).astype(np.uint32)
            else:
                cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            out[i, : len(cp)] = cp[::-1] if reverse else cp
    return out, lens


def encode_concat(strings, reverse: bool = False, lens=None):
    """Vectorized ``encode_strings`` for str-only inputs: ONE utf-32 encode
    of the concatenation + a single scatter fill replaces the per-string
    Python loop (~2 s / 600k strings on the sandbox host).  Returns
    ``(ENC, lens, buf)`` where ``buf`` is the flat codepoint stream
    (callers reuse it for char-histogram bounds).  Pass precomputed
    ``lens`` to skip the per-string len() sweep."""
    P = len(strings)
    if lens is None:
        lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=P)
    buf = (
        np.frombuffer("".join(strings).encode("utf-32-le"), dtype=np.uint32)
        if P
        else np.zeros(0, dtype=np.uint32)
    )
    maxlen = int(lens.max()) if P else 0
    ENC = np.zeros((P, max(maxlen, 1)), dtype=np.uint32)
    if len(buf):
        rows = np.repeat(np.arange(P), lens)
        cols = np.arange(len(buf), dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        if reverse:
            cols = np.repeat(lens, lens) - 1 - cols
        ENC[rows, cols] = buf
    return ENC, lens, buf


def _banded_pairs(ENC, ulen, qi, ti, n: int, algorithm: str, subst=None):
    """Distances for pre-encoded pairs: ``ENC``/``ulen`` index distinct
    strings, ``qi``/``ti`` are per-pair row indices.  The chunked
    max-length-grouped band loop shared by :func:`batch_distances` and the
    ER bucket scorer (which encodes each bucket's distinct strings once)."""
    P = len(qi)
    out = np.full(P, n + 1, dtype=np.int32)
    if P == 0:
        return out
    qlen, tlen = ulen[qi], ulen[ti]
    idx = np.flatnonzero(np.abs(qlen - tlen) <= n)
    if idx.size == 0:
        return out
    CHUNK = 65536
    maxlens = np.maximum(qlen[idx], tlen[idx])
    for lo, hi in ((-1, 16), (16, 32), (32, 64), (64, 1 << 60)):
        grp = idx[(maxlens > lo) & (maxlens <= hi)]
        for s in range(0, grp.size, CHUNK):
            sel = grp[s : s + CHUNK]
            width = min(int(np.maximum(qlen[sel], tlen[sel]).max()), ENC.shape[1])
            Q = ENC[qi[sel], :width]
            T = ENC[ti[sel], :width]
            if algorithm == MERGE_AND_SPLIT:
                res = _band_merge_split_enc(Q, qlen[sel], T, tlen[sel], n)
            else:
                res = _band_standard_enc(Q, qlen[sel], T, tlen[sel], n, algorithm, subst)
            out[sel] = res
    return out


def _subst_keys(subst):
    """Allowed (dict_char, query_char) pairs as packed uint64 keys."""
    pairs = getattr(subst, "_pairs", None)
    if not pairs:
        return None
    return np.fromiter(
        ((ord(a) << 32) | ord(b) for a, b in pairs), dtype=np.uint64, count=len(pairs)
    )


def batch_distances(queries, terms, n: int, algorithm: str = STANDARD, subst=None):
    """Distances (clamped at n+1) for ``zip(queries, terms)``; the query is
    the automaton-side string, the term the dictionary-side string (matters
    only for directional ``subst`` sets)."""
    P = len(queries)
    out = np.full(P, n + 1, dtype=np.int32)
    if P == 0:
        return out
    if subst is not None and algorithm != STANDARD:
        # restricted substitutions are defined on the characteristic vector;
        # outside the standard tables fall back to the exact automaton kernel
        from . import build_trie
        from .query import query as _kquery

        for i in range(P):
            trie = build_trie([terms[i]])
            hits = list(_kquery(trie, queries[i], n, algorithm, subst=subst))
            out[i] = hits[0].distance if hits else n + 1
        return out

    # encode each DISTINCT string once (pairs repeat strings heavily in
    # all-pairs blocks), then gather rows per pair; process pairs in
    # max-length groups so short pairs don't pay the longest pair's row loop
    reverse = algorithm == MERGE_AND_SPLIT
    import pandas as pd

    qarr = np.asarray(queries, dtype=object)
    tarr = np.asarray(terms, dtype=object)
    inv, uniq = pd.factorize(np.concatenate([qarr, tarr]), sort=False)
    terms_list = uniq.tolist()
    if any(isinstance(s, bytes) for s in terms_list):
        ENC, ulen = encode_strings(terms_list, reverse=reverse)
    else:
        ENC, ulen, _ = encode_concat(terms_list, reverse=reverse)
    # ~64k-pair chunks keep every (P,) band column in L2 — measured 3.4x
    # over one monolithic pass at 400k pairs (inside _banded_pairs)
    return _banded_pairs(ENC, ulen, inv[:P], inv[P:], n, algorithm, subst)


def _cost_vec(qc, tc, skeys):
    """0/1 substitution cost; zero also for allowed (dict, query) pairs."""
    cost = (qc != tc).astype(np.int32)
    if skeys is not None:
        packed = (tc.astype(np.uint64) << np.uint64(32)) | qc.astype(np.uint64)
        cost[np.isin(packed, skeys)] = 0
    return cost


def _band_standard(qs, ts, n, algorithm, subst):
    """Forward band DP over string lists (test/compat entry point)."""
    Q, qlen = encode_strings(qs)
    T, tlen = encode_strings(ts)
    return _band_standard_enc(Q, qlen, T, tlen, n, algorithm, subst)


def _band_standard_enc(Q, qlen, T, tlen, n, algorithm, subst):
    """Forward band DP; handles STANDARD and TRANSPOSITION (OSA).

    Row update is fully matrix-shaped: band cell k of row i holds D[i][j]
    with j = i + k - n, so the W dictionary chars a row compares against
    are the CONTIGUOUS columns [i-n-1, i+n) of T — one padded slice per
    row instead of a Python loop over band offsets."""
    P = Q.shape[0]
    maxq = int(qlen.max()) if P else 0
    maxt = T.shape[1]
    W = 2 * n + 1
    INF = np.int32(n + 1)
    skeys = _subst_keys(subst)
    trans = algorithm == TRANSPOSITION

    # rows with one INF guard column each side: band index k in [1, W];
    # prev[:, k+1] = (i-1, j), prev[:, k] = (i-1, j-1).  The k loop stays
    # per-column on purpose: (P,) slices fit cache, a (P, W) matrix
    # formulation measured ~40% slower at large P (memory-bound).
    prev = np.full((P, W + 2), INF, dtype=np.int32)
    for k in range(1, W + 1):
        j = k - 1 - n  # row i=0: D[0][j] = j
        if 0 <= j <= n:
            prev[:, k] = np.where(tlen >= j, min(j, n + 1), INF)
    prev2 = np.full((P, W + 2), INF, dtype=np.int32)

    res = np.full(P, INF, dtype=np.int32)
    done0 = qlen == 0
    if done0.any():
        res[done0] = np.minimum(tlen[done0], n + 1)

    curr = np.full((P, W + 2), INF, dtype=np.int32)
    E = np.full((P, W + 2), INF, dtype=np.int32)
    for i in range(1, maxq + 1):
        qc = Q[:, i - 1]
        curr[:, 0] = INF
        curr[:, W + 1] = INF
        for k in range(1, W + 1):
            j = i + (k - 1) - n
            if j < 0:
                E[:, k] = INF
                continue
            if j == 0:
                E[:, k] = min(i, n + 1)
                continue
            if j - 1 < maxt:
                tc = T[:, j - 1]
                cost = _cost_vec(qc, tc, skeys)
                e = np.minimum(prev[:, k] + cost, prev[:, k + 1] + 1)
                if trans and i >= 2 and j >= 2:
                    swap = (qc == T[:, j - 2]) & (Q[:, i - 2] == tc)
                    e = np.where(swap, np.minimum(e, prev2[:, k] + 1), e)
                E[:, k] = np.where(j <= tlen, e, INF)
            else:
                E[:, k] = INF
        # insertion chain along the band (ascending k)
        curr[:, 1] = E[:, 1]
        for k in range(2, W + 1):
            np.minimum(E[:, k], curr[:, k - 1] + 1, out=curr[:, k])
        np.minimum(curr, INF, out=curr)

        hit = qlen == i
        if hit.any():
            kk = (tlen[hit] - i + n + 1).astype(np.int64)
            res[hit] = curr[np.flatnonzero(hit), kk]
        if trans:
            prev2, prev, curr = prev, curr, prev2
        else:
            prev, curr = curr, prev
    return np.minimum(res, INF)


def _band_merge_split(qs, ts, n):
    """String-list entry point (strings must already be reversed)."""
    Q, qlen = encode_strings(qs)
    T, tlen = encode_strings(ts)
    return _band_merge_split_enc(Q, qlen, T, tlen, n)


def _band_merge_split_enc(Q, qlen, T, tlen, n):
    """Forward band DP over reversed strings == the reference's greedy
    suffix recursion: on a character match ONLY the match branch is taken;
    otherwise 1 + min(delete, insert, substitute, split, merge)."""
    P = Q.shape[0]
    maxq = int(qlen.max()) if P else 0
    maxt = T.shape[1]
    W = 2 * n + 1
    INF = np.int32(n + 1)

    prev = np.full((P, W + 2), INF, dtype=np.int32)
    for k in range(1, W + 1):
        j = k - 1 - n
        if 0 <= j <= n:
            prev[:, k] = np.where(tlen >= j, min(j, n + 1), INF)
    prev2 = np.full((P, W + 2), INF, dtype=np.int32)

    res = np.full(P, INF, dtype=np.int32)
    done0 = qlen == 0
    if done0.any():
        res[done0] = np.minimum(tlen[done0], n + 1)

    curr = np.full((P, W + 2), INF, dtype=np.int32)
    for i in range(1, maxq + 1):
        qc = Q[:, i - 1]
        curr[:, 0] = INF
        curr[:, W + 1] = INF
        for k in range(1, W + 1):
            j = i + (k - 1) - n
            if j < 0:
                curr[:, k] = INF
                continue
            if j == 0:
                curr[:, k] = min(i, n + 1)
                continue
            if j - 1 >= maxt:
                curr[:, k] = INF
                continue
            tc = T[:, j - 1]
            match = qc == tc
            # non-match: 1 + min(delete (i-1,j), substitute (i-1,j-1),
            #                    split (i-1,j-2), merge (i-2,j-1), insert (i,j-1))
            e = np.minimum(prev[:, k + 1], prev[:, k])
            if j >= 2:
                e = np.minimum(e, prev[:, k - 1])  # split
            if i >= 2:
                e = np.minimum(e, prev2[:, k + 1])  # merge
            e = np.minimum(e, curr[:, k - 1])  # insert chain (k ascending)
            cell = np.where(match, prev[:, k], e + 1)
            curr[:, k] = np.where(j <= tlen, np.minimum(cell, INF), INF)
        hit = qlen == i
        if hit.any():
            kk = (tlen[hit] - i + n + 1).astype(np.int64)
            res[hit] = curr[np.flatnonzero(hit), kk]
        prev2, prev, curr = prev, curr, prev2
    return np.minimum(res, INF)
