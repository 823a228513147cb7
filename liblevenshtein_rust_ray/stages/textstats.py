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
