"""Blocking-key derivation (north-star blocking: host + length-bucketed
title tokens + exact-hash; simhash banding serves the near-dup operators).

Each page explodes to one row ``(block_key, url, key_string)`` per key:

* ``{host}|t|{token}|{len_bucket}`` — one per distinct title token.  A
  <=2-edit title perturbation touches at most 2 token regions, so two titles
  within distance 2 (and >= 3 tokens) ALWAYS share an unchanged token —
  recall by construction, not probability.  The length bucket (width 16,
  dual-emitted within 2 of an edge so a <=2-edit length change cannot split
  a pair) prunes blocks the way the north star's "length-bucketed title
  tokens" prescribes.
* ``x|{hash64(title)}``          — global exact-title key: catches identical
  titles across hosts at distance 0 with one tiny block per distinct title.

Skew: hot (host, token) blocks — stopword-like tokens on mega-hosts — are
subdivided in-memory by the scorer's salting (bounded cardinality,
``stages.scorer.BlockScorer._subdivide``); the keys themselves never fan out
more than (#tokens + 1) rows per page, keeping the blocking shuffle linear
in corpus size.
"""

from urllib.parse import urlparse

import pyarrow as pa

from ..functions.simhash import hash64, simhash64, simhash_bands  # noqa: F401 (bands used by dedup ops)

BLOCK_BANDS = 4
_LEN_BUCKET = 16
_EDGE = 2


def host_of(url: str) -> str:
    try:
        return urlparse(url).netloc or "unknown"
    except Exception:
        return "unknown"


def _len_buckets(n: int) -> set[int]:
    b = n // _LEN_BUCKET
    out = {b}
    if n % _LEN_BUCKET < _EDGE:
        out.add(max(0, b - 1))
    if n % _LEN_BUCKET >= _LEN_BUCKET - _EDGE:
        out.add(b + 1)
    return out


def keys_for_title(host: str, title: str) -> list[str]:
    if not title:
        return []
    keys = [f"x|{hash64(title):016x}"]
    buckets = _len_buckets(len(title))
    for token in dict.fromkeys(title.split()):
        for lb in buckets:
            keys.append(f"{host}|t|{token}|{lb}")
    return keys


def blocking_keys_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: explode each page into its blocking keys.
    Input needs ``url`` + ``title``; output ``(block_key, url, key_string)``."""
    urls = batch.column("url").to_pylist()
    titles = batch.column("title").to_pylist()
    out_key, out_url, out_str = [], [], []
    for url, title in zip(urls, titles):
        host = host_of(url)
        for k in keys_for_title(host, title):
            out_key.append(k)
            out_url.append(url)
            out_str.append(title)
    return pa.table(
        {
            "block_key": pa.array(out_key, type=pa.string()),
            "url": pa.array(out_url, type=pa.string()),
            "key_string": pa.array(out_str, type=pa.string()),
        }
    )
