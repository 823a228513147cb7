"""Text-analysis map_batches stages over a documents-style table."""

import pyarrow as pa

from ..functions.textstats import (
    quality_scores,
    langid_ngram,
    rolling_fingerprint,
    fingerprint64,
)
from ..functions.tokenize import tokenize


def token_stats_batch(t: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_distinct_tokens, n_chars) — SQL-mirrorable."""
    texts = t.column("text").to_pylist()
    toks = [tokenize(x or "") for x in texts]
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array([len(x) for x in toks], type=pa.int64()),
            "n_distinct_tokens": pa.array([len(set(x)) for x in toks], type=pa.int64()),
            "n_chars": pa.array([len(x or "") for x in texts], type=pa.int64()),
        }
    )


def quality_batch(t: pa.Table) -> pa.Table:
    texts = t.column("text").to_pylist()
    qs = [quality_scores(x or "") for x in texts]
    cols = {"doc_id": t.column("doc_id")}
    for k, typ in [
        ("n_chars", pa.int64()),
        ("n_tokens", pa.int64()),
        ("punct_ratio", pa.float64()),
        ("stopword_ratio", pa.float64()),
        ("mean_token_len", pa.float64()),
    ]:
        cols[k] = pa.array([q[k] for q in qs], type=typ)
    return pa.table(cols)


def langid_batch(t: pa.Table) -> pa.Table:
    texts = t.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "lang_given": t.column("lang") if "lang" in t.column_names else pa.nulls(t.num_rows, pa.string()),
            "lang_pred": pa.array([langid_ngram(x or "") for x in texts], type=pa.string()),
        }
    )


def fingerprint_batch(t: pa.Table) -> pa.Table:
    texts = t.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "content_hash": pa.array(
                [fingerprint64(x or "") for x in texts], type=pa.uint64()
            ),
            "winnow": pa.array(
                [rolling_fingerprint(x or "") for x in texts],
                type=pa.list_(pa.uint64()),
            ),
        }
    )


def fingerprint_md5_batch(t: pa.Table) -> pa.Table:
    """DuckDB-reproducible fingerprint variant: md5-derived 64-bit content
    hash (md5_number_lower semantics) and a winnowing sketch (window 32,
    stride 4, 8 smallest distinct hashes) emitted as a comma-joined
    decimal string — every step expressible in SQL (substr + md5_number_
    lower + list ops), giving the fingerprint operator an exact oracle.
    Same sketch shape as fingerprint_batch; only the hash family differs."""
    from ..functions.minhash import md5_hash64

    texts = t.column("text").to_pylist()

    def winnow(x: str) -> str:
        if not x:
            return ""
        if len(x) <= 32:
            hs = [md5_hash64(x)]
        else:
            hs = sorted({md5_hash64(x[i:i + 32])
                         for i in range(0, len(x) - 31, 4)})[:8]
        return ",".join(str(h) for h in hs)

    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "content_hash": pa.array(
                [md5_hash64(x or "") for x in texts], type=pa.uint64()
            ),
            "winnow": pa.array([winnow(x or "") for x in texts], type=pa.string()),
        }
    )
