"""Deduplication operators over a string column (training-data pipeline ops).

All operators take a ``ray.data.Dataset`` and column names and return
Datasets; shuffles are explicit:

* ``exact_dedup``      — content-hash partition + per-group min-id keep
  (one shuffle on a 64-bit hash; the classic exact pass)
* ``minhash_lsh_pairs``— shingle → minhash → band → bucket groupby →
  candidate pairs → exact-jaccard verify (near-dedup)
* ``simhash_pairs``    — 64-bit simhash, band buckets, Hamming verify
* ``embedding_neardup_pairs`` — LSH-free cosine near-dup over an embedding
  column (bucketed by coarse random-projection sign bits)

Pair outputs are canonical (id_a < id_b) and deduplicated.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.minhash import minhash_signature, minhash_bands, jaccard_estimate  # noqa: F401
from ..functions.simhash import simhash64, simhash_bands, hamming64, hash64  # noqa: F401
from ..functions.tokenize import tokenize, shingles, char_ngrams

# byte-wise popcount lookup table for vectorized 64-bit Hamming distance
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


# ----------------------------------------------------------------------
def exact_dedup(ds, text_col: str, id_col: str):
    """Keep one row (min id) per distinct text.  Hash-partition on a content
    hash so the groupby shuffles 8-byte keys, not the payloads."""

    def add_hash(t: pa.Table) -> pa.Table:
        hs = pa.array(
            [hash64(x) if x is not None else 0 for x in t.column(text_col).to_pylist()],
            type=pa.uint64(),
        )
        return t.append_column("__content_hash", hs)

    from .grouped import bucketed_apply

    def keep_min_id(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col).drop_duplicates("__content_hash", keep="first")

    return bucketed_apply(
        ds.map_batches(add_hash, batch_format="pyarrow"), "__content_hash", keep_min_id
    ).drop_columns(["__content_hash"])


# ----------------------------------------------------------------------
def minhash_lsh_pairs(
    ds,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_perm: int = 64,
    n_bands: int = 32,
    shingle_k: int = 3,
):
    """Near-duplicate candidate pairs via MinHash LSH, verified with the
    signature Jaccard estimate >= ``threshold``.

    Shape: map_batches (signatures + band keys, explode) → groupby(band
    bucket) → within-bucket candidate pairs (each bucket is tiny by LSH
    construction) → groupby(pair) dedup.
    """

    def sign(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_id, out_band, out_sig = [], [], []
        for i, x in zip(ids, texts):
            feats = shingles(tokenize(x or ""), shingle_k)
            sig = minhash_signature(feats, num_perm)
            for band_id, bh in enumerate(minhash_bands(sig, n_bands)):
                out_id.append(i)
                out_band.append(f"{band_id}:{bh:016x}")
                out_sig.append(sig.tobytes())
        return pa.table(
            {
                "id": pa.array(out_id),
                "bucket": pa.array(out_band, type=pa.string()),
                "sig": pa.array(out_sig, type=pa.binary()),
            }
        )

    _empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "jaccard": pd.Series(dtype="float64")}
    )

    def pairs_in_hashbucket(df: pd.DataFrame) -> pd.DataFrame:
        # whole hash-bucket of band-buckets at once: pandas C merge forms
        # the candidate pairs, one numpy pass scores every pair's signature
        # agreement (vs per-band-bucket Python dispatch — most band buckets
        # are singletons, and dispatch dominated wall time)
        df = df.drop_duplicates(["bucket", "id"])
        m = df.merge(df, on="bucket", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]].drop_duplicates(["id_a", "id_b"])
        if not len(m):
            return _empty
        A = np.frombuffer(b"".join(m["sig_a"]), dtype=np.uint64).reshape(len(m), -1)
        B = np.frombuffer(b"".join(m["sig_b"]), dtype=np.uint64).reshape(len(m), -1)
        est = (A == B).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame(
            {"id_a": m["id_a"].to_numpy()[keep], "id_b": m["id_b"].to_numpy()[keep],
             "jaccard": est[keep]}
        )

    from .grouped import bucketed_apply

    cand = bucketed_apply(
        ds.map_batches(sign, batch_format="pyarrow"),
        "bucket",
        pairs_in_hashbucket,
        empty_result=_empty,
    )
    return bucketed_apply(
        cand,
        ["id_a", "id_b"],
        lambda df: df.groupby(["id_a", "id_b"], as_index=False)["jaccard"].max(),
        empty_result=_empty,
    )


# ----------------------------------------------------------------------
def simhash_pairs(ds, text_col: str, id_col: str, max_hamming: int = 3, n_bands: int | None = None):
    """SimHash near-dup: band-bucket groupby then Hamming-distance verify
    (<= ``max_hamming``).

    Completeness by pigeonhole: with ``n_bands > max_hamming`` equal bands of
    the 64-bit simhash, any pair within ``max_hamming`` bit flips shares at
    least one untouched band — so banding never loses a qualifying pair
    (default ``n_bands = max_hamming + 1``)."""
    if n_bands is None:
        n_bands = max_hamming + 1
    if 64 % n_bands:
        n_bands = next(b for b in (2, 4, 8, 16, 32, 64) if b >= n_bands)

    def sign(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_id, out_bucket, out_sh = [], [], []
        for i, x in zip(ids, texts):
            sh = simhash64(char_ngrams((x or "").lower(), 3))
            for band_id, bits in enumerate(simhash_bands(sh, n_bands)):
                out_id.append(i)
                out_bucket.append(f"{band_id}:{bits:04x}")
                out_sh.append(sh)
        return pa.table(
            {
                "id": pa.array(out_id),
                "bucket": pa.array(out_bucket, type=pa.string()),
                "simhash": pa.array(out_sh, type=pa.uint64()),
            }
        )

    _empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "hamming": pd.Series(dtype="int64")}
    )

    def verify_hashbucket(df: pd.DataFrame) -> pd.DataFrame:
        # pairs across the whole hash-bucket via C merge; vectorized XOR +
        # byte-LUT popcount for the Hamming verify
        df = df.drop_duplicates(["bucket", "id"])
        m = df.merge(df, on="bucket", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]].drop_duplicates(["id_a", "id_b"])
        if not len(m):
            return _empty
        x = m["simhash_a"].to_numpy().astype(np.uint64) ^ m["simhash_b"].to_numpy().astype(np.uint64)
        h = _POPCNT8[x.view(np.uint8).reshape(len(m), 8)].sum(axis=1).astype(np.int64)
        keep = h <= max_hamming
        return pd.DataFrame(
            {"id_a": m["id_a"].to_numpy()[keep], "id_b": m["id_b"].to_numpy()[keep],
             "hamming": h[keep]}
        )

    from .grouped import bucketed_apply

    cand = bucketed_apply(
        ds.map_batches(sign, batch_format="pyarrow"),
        "bucket",
        verify_hashbucket,
        empty_result=_empty,
    )
    return bucketed_apply(
        cand,
        ["id_a", "id_b"],
        lambda df: df.groupby(["id_a", "id_b"], as_index=False)["hamming"].min(),
        empty_result=_empty,
    )


# ----------------------------------------------------------------------
def ngram_jaccard_pairs(ds, text_col: str, id_col: str, threshold: float = 0.5, k: int = 3):
    """EXACT token-k-shingle Jaccard pairs via a distributed inverted-index
    join — no LSH approximation, no driver-side collect:

    1. explode each doc's DISTINCT shingles to ``(shingle, id, set_size)``;
    2. groupby(shingle): every co-occurring id pair, canonical id_a < id_b;
    3. groupby(id_a, id_b): the pair's row count IS |A ∩ B| (each shared
       shingle contributes exactly one row), so
       ``jaccard = c / (|A| + |B| - c)`` — exact, filtered at threshold.

    Any pair with jaccard > 0 shares a shingle, so step 2 loses nothing.
    Skew note (100 TB): a shingle shared by f docs emits f(f-1)/2 rows;
    stop-shingles should be prefix-filtered upstream (a doc pair relying
    only on shingles of document frequency > 1/threshold can't reach a
    high threshold anyway, so dropping ultra-hot shingles first is the
    standard prefix-filter optimization — not applied at test scale)."""

    def explode_shingles(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_s, out_i, out_n = [], [], []
        for i, x in zip(ids, texts):
            sh = set(shingles(tokenize(x or ""), k))
            for s in sh:
                out_s.append(s)
                out_i.append(i)
                out_n.append(len(sh))
        return pa.table(
            {
                "shingle": pa.array(out_s, type=pa.string()),
                "id": pa.array(out_i),
                "set_size": pa.array(out_n, type=pa.int64()),
            }
        )

    def pairs_in_group(bucket: pd.DataFrame) -> pd.DataFrame:
        m = bucket.merge(bucket, on="shingle", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]]
        return m[["id_a", "id_b", "set_size_a", "set_size_b"]]

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["id_a", "id_b", "set_size_a", "set_size_b"], as_index=False).size()
        c = g["size"].to_numpy()
        union = g["set_size_a"].to_numpy() + g["set_size_b"].to_numpy() - c
        j = np.where(union > 0, c / np.maximum(union, 1), 1.0)
        out = g.assign(jaccard=j)[["id_a", "id_b", "jaccard"]]
        return out[out["jaccard"] >= threshold]

    from .grouped import bucketed_apply

    ex = ds.map_batches(explode_shingles, batch_format="pyarrow")
    cand = bucketed_apply(ex, "shingle", pairs_in_group)
    return bucketed_apply(
        cand,
        ["id_a", "id_b"],
        combine,
        empty_result=pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        ),
    )


# ----------------------------------------------------------------------
def embedding_neardup_pairs(
    ds, vec_col: str, id_col: str, threshold: float = 0.9, method: str = "exact",
    n_planes: int = 8,
):
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    ``method="exact"``: broadcast the (normalized) full matrix once via
    ``ray.put``, then each batch does ONE numpy matmul against it — the
    brute-force baseline, oracle-checkable against SQL.  Fine while the
    matrix fits a worker (N·dim·8 bytes); beyond that use ``method="lsh"``:
    random-hyperplane sign buckets (pairs agreeing on all ``n_planes`` signs
    co-group; recall degrades gracefully with angle) with exact verify
    inside buckets — the scale path, approximate by construction."""
    import ray

    def load_matrix():
        df = ds.select_columns([id_col, vec_col]).to_pandas()
        ids = df[id_col].to_numpy()
        order = np.argsort(ids)
        m = np.array(df[vec_col].tolist(), dtype=np.float64)[order]
        return ids[order], _norm_rows(m)

    def _norm_rows(m):
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        return m / np.maximum(nrm, 1e-12)

    if method == "exact":
        ids, mat = load_matrix()
        ref = ray.put((ids, mat))

        def score(t: pa.Table) -> pa.Table:
            all_ids, all_m = ray.get(ref)
            bid = np.asarray(t.column(id_col).to_pylist())
            bm = _norm_rows(np.array(t.column(vec_col).to_pylist(), dtype=np.float64))
            sims = bm @ all_m.T
            bi, aj = np.nonzero(sims >= threshold)
            ia, ib = bid[bi], all_ids[aj]
            keep = ia < ib  # canonical, also drops self-pairs
            return pa.table(
                {
                    "id_a": pa.array(ia[keep].tolist(), type=pa.int64()),
                    "id_b": pa.array(ib[keep].tolist(), type=pa.int64()),
                    "cosine": pa.array(sims[bi, aj][keep], type=pa.float64()),
                }
            )

        return ds.select_columns([id_col, vec_col]).map_batches(
            score, batch_format="pyarrow"
        )

    # ---- LSH sign-bucket path ----------------------------------------
    # multi-table amplification: L independent tables of k hyperplanes;
    # a pair co-buckets if ALL k signs agree in AT LEAST ONE table.  For a
    # pair at angle θ, hit prob = 1-(1-(1-θ/π)^k)^L — sized for the
    # near-duplicate regime (cosine >= ~0.85); low-threshold searches
    # should use method="exact".
    n_tables = 16

    def bucketize(t: pa.Table) -> pa.Table:
        m = _norm_rows(np.array(t.column(vec_col).to_pylist(), dtype=np.float64))
        rng = np.random.default_rng(1234)
        out_bucket, out_idx = [], []
        for table_id in range(n_tables):
            planes = rng.standard_normal((m.shape[1], n_planes))
            bits = (m @ planes) > 0
            keys = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            out_bucket.extend((np.int64(table_id) << 32 | keys).tolist())
            out_idx.extend(range(m.shape[0]))
        ids = t.column(id_col).to_pylist()
        vecs = t.column(vec_col).to_pylist()
        return pa.table(
            {
                "bucket": pa.array(out_bucket, type=pa.int64()),
                "id": pa.array([ids[i] for i in out_idx]),
                "vec": pa.array([vecs[i] for i in out_idx]),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values("id")
        ids = g["id"].to_numpy()
        m = _norm_rows(np.array(g["vec"].tolist(), dtype=np.float64))
        sims = m @ m.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, 1))
        return pd.DataFrame(
            {"id_a": ids[ii], "id_b": ids[jj], "cosine": sims[ii, jj]}
        )

    from .grouped import bucketed_apply

    cand = ds.map_batches(bucketize, batch_format="pyarrow")
    pairs = cand.groupby("bucket").map_groups(verify, batch_format="pandas")
    return bucketed_apply(
        pairs,
        ["id_a", "id_b"],
        lambda df: df.groupby(["id_a", "id_b"], as_index=False)["cosine"].max(),
    )
