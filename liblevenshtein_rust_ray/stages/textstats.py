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


# ----------------------------------------------------------------------
# PII redaction — fully vectorized Arrow regex kernels (RE2), applied in a
# fixed order so DuckDB's regexp_replace(..., 'g') chain (same RE2 engine,
# same patterns, same order) reproduces the output byte-for-byte.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d{1,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{3,4}\b", "<PHONE>"),
)


def redact_pii_batch(t: pa.Table, text_col: str = "text",
                     out_col: str = "redacted") -> pa.Table:
    """Replace emails / IPv4s / phone numbers with typed placeholders —
    one ``pc.replace_substring_regex`` kernel per pattern, no Python rows."""
    import pyarrow.compute as pc

    col = pc.coalesce(t.column(text_col), pa.scalar("", type=pa.string()))
    for pat, repl in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
    return t.append_column(out_col, col)


def redact_pii(ds, text_col: str = "text", out_col: str = "redacted"):
    """Dataset stage: scrub PII from ``text_col`` into ``out_col`` (a
    stateless streaming map — nothing proportional to the corpus is held
    anywhere)."""
    return ds.map_batches(
        lambda t: redact_pii_batch(t, text_col, out_col),
        batch_format="pyarrow",
    )
