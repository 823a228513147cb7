"""Mergeable sketches for corpus-scale cardinality questions.

KMV ("k minimum values" / bottom-k) distinct-count sketch: hash every
element with a fixed hash family, keep only the ``k`` smallest distinct
hash values.  The sketch is

* **mergeable** — bottom-k of a union is the bottom-k of the two bottom-k
  sets, so per-batch partials combine associatively and the exchange ships
  ``k`` 8-byte values per block regardless of corpus size (the right shape
  for 100 TB: no groupby over the element domain, no global set);
* **deterministically approximate** — with the md5 hash family
  (``functions.simhash.md5_hash64`` == DuckDB ``md5_number_lower``) the
  estimate is a pure function of the input SET, so the SQL oracle
  reproduces the *estimate itself* bit-for-bit, not just a tolerance band
  (same trick as the md5 MinHash/SimHash variants: approximate algorithm,
  exact oracle).

Estimator (Beyer et al. 2007, "On Synopses for Distinct-Value Estimation
Under Multiset Operations"): with fewer than ``k`` distinct hashes the
count is exact; otherwise ``(k-1) / U_k`` where ``U_k`` is the k-th
smallest hash normalized to (0,1] — computed here as
``(k-1) * 2^64 / h_k`` in float64, the formula the oracle mirrors
operation-for-operation.
"""

import math

import pandas as pd
import pyarrow as pa

from ..functions.simhash import md5_hash64

_TWO64 = 2.0 ** 64


def kmv_partial_batch(t: pa.Table, text_col: str, k: int,
                      shingle_k: int) -> pa.Table:
    """Per-batch partial: the batch's <= k smallest distinct shingle
    hashes, one uint64 row each (the only thing that ever leaves the
    task)."""
    from ..functions.tokenize import shingle_codes_column

    _, _, uniq = shingle_codes_column(t.column(text_col), shingle_k)
    hs = {md5_hash64(s) for s in uniq.to_pylist()}
    return pa.table({"h": pa.array(sorted(hs)[:k], type=pa.uint64())})


def kmv_estimate(hashes: list[int], k: int) -> pd.DataFrame:
    """Final estimator over the merged distinct bottom hashes."""
    hs = sorted(set(hashes))[:k]
    n = len(hs)
    if n < k:
        est = float(n)
    else:
        est = (k - 1) * _TWO64 / float(hs[-1])
    return pd.DataFrame({
        "k_used": pd.Series([n], dtype="int64"),
        "kth_hash": pd.Series([float(hs[-1]) if hs else 0.0],
                              dtype="float64"),
        "est_distinct": pd.Series([est], dtype="float64"),
    })


def kmv_distinct_shingles(ds, text_col: str = "text", k: int = 256,
                          shingle_k: int = 3):
    """Estimated number of distinct word ``shingle_k``-shingles in a text
    column, as a one-row DataFrame ``(k_used, kth_hash, est_distinct)``.

    Streaming shape: stateless per-batch partial (set-build + bottom-k)
    -> the merge pulls ONLY ``k × n_blocks`` uint64 rows to the driver
    (a few KB at any corpus size) and finishes in microseconds — the
    corpus itself never materializes anywhere."""
    parts = ds.map_batches(
        lambda t: kmv_partial_batch(t, text_col, k, shingle_k),
        batch_format="pyarrow",
    )
    merged = parts.to_pandas()  # <= k rows per input block, tiny by design
    return kmv_estimate(merged["h"].tolist(), k)


def exact_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99)):
    """EXACT distributed quantiles of an integer-valued column:
    one-row-per-q DataFrame ``(q, value)`` where ``value`` is the
    smallest v whose running count reaches ``ceil(q * n)`` (the
    discrete/lower quantile — SQL-mirrorable with a window cumsum).

    Scale shape: per-batch ``(value, count)`` partials (bounded by the
    batch's DISTINCT values, not its rows) → one tiny value-keyed
    ``groupby().sum()`` → a driver cumsum over the distinct-value
    histogram.  For doc-length/token-count/score-bucket columns the
    histogram is thousands of rows at ANY corpus size, so this gives
    exact p50/p90/p99 with no sort and no sampling error — the
    corpus-stats primitive (length-filter thresholds, contamination
    cutoffs) a curation job reads before picking its knobs."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({
            "v": pa.array(u, type=pa.int64()),
            "c": pa.array(c.astype(np.int64), type=pa.int64()),
        })

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v").sum("c").to_pandas()
            .sort_values("v").reset_index(drop=True))
    n = int(hist["sum(c)"].sum())
    if n == 0:
        # empty input: one NaN row per q (the SQL mirror returns NULLs;
        # value is float64 here instead of int64 — documented divergence,
        # an empty corpus has no integer quantile to report)
        return pd.DataFrame({"q": [float(q) for q in qs],
                             "value": [float("nan")] * len(qs)})
    cum = hist["sum(c)"].cumsum().to_numpy()
    vals = hist["v"].to_numpy()
    out = []
    for q in qs:
        target = math.ceil(q * n)
        idx = int(np.searchsorted(cum, target, side="left"))
        out.append({"q": float(q), "value": int(vals[min(idx, len(vals) - 1)])})
    return pd.DataFrame(out)
