"""Deterministic Common-Crawl-style synthetic page corpus (FIXTURES.md §1-2).

Schema matches BASELINE.json's input_hint exactly:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.

Entity structure: each entity has one canonical page plus 0-5 near-duplicate
variants whose titles are perturbed by the seeded typo model
(reference ``TypoGenerator::generate_typos`` semantics,
/root/reference/src/corpus/generator.rs:35-212) at edit distance <= 2.
Variants share the canonical page's host, so blocking keys co-locate them.

Hosts are drawn Zipf-like from a fixed pool with a few mega-hosts to
exercise skew salting.  Everything is derived from per-entity blake2b-seeded
RNGs, so generation is deterministic, order-independent, and scale-nested
(entity i is identical at every corpus size).
"""

import random

import numpy as np
import pyarrow as pa

from ..functions.simhash import hash64
from ..functions.typogen import TypoGenerator

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

PAIRS_SCHEMA = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("entity_id", pa.int64()),
    ]
)

_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds


def _vocab(seed: int = 42, size: int = 2000) -> list[str]:
    rng = random.Random(seed)
    out = set()
    while len(out) < size:
        n = rng.randint(4, 10)
        out.add("".join(rng.choices("abcdefghijklmnopqrstuvwxyz", k=n)))
    return sorted(out)


_VOCAB = None


def _get_vocab():
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = _vocab()
    return _VOCAB


def _hosts(n_entities: int) -> list[str]:
    n_hosts = max(8, n_entities // 40)
    return [f"site{h}.example.com" for h in range(n_hosts)]


_ZIPF_CUM: dict[int, "np.ndarray"] = {}


def _zipf_pick(rng: random.Random, n: int) -> int:
    # weight 1/rank: a few mega-hosts absorb a large share (skew on purpose).
    # Byte-identical to the original O(n) scan (np.cumsum accumulates the
    # same float64 partial sums left-to-right, and side="left" reproduces
    # the ``x <= acc`` tie rule) but O(log n) per pick — the scan made
    # corpus generation O(n_entities^2/40): ~90 of sf10's ~70 generation
    # minutes were this loop.
    cum = _ZIPF_CUM.get(n)
    if cum is None:
        cum = np.cumsum(1.0 / (np.arange(n, dtype=np.float64) + 1.0))
        _ZIPF_CUM[n] = cum
    x = rng.random() * cum[-1]
    return min(int(np.searchsorted(cum, x, side="left")), n - 1)


def _entity_range(e_lo: int, e_hi: int, n_entities: int, seed: int):
    """Generate entities [e_lo, e_hi) with LOCAL page indices.

    Every entity derives from its own blake2b-seeded RNG, so any entity
    range is generated independently and byte-identically to the serial
    pass — the ONE cross-entity value is the global page index feeding
    ``warc_ts``, which is just row order and is stamped by the caller
    after concatenation.  Returns ``(pages_without_ts, pairs, n_pages)``.
    """
    vocab = _get_vocab()
    hosts = _hosts(n_entities)

    urls, htmls, texts, langs = [], [], [], []
    pair_a, pair_b, pair_e = [], [], []
    page_index = 0

    for e in range(e_lo, e_hi):
        rng = random.Random(hash64(f"entity-{seed}-{e}"))
        typo = TypoGenerator(seed=hash64(f"typo-{seed}-{e}") & 0x7FFFFFFF)

        title_tokens = rng.sample(vocab, rng.randint(3, 5))
        title = " ".join(title_tokens)
        body_sentences = [
            " ".join(rng.choices(vocab, k=rng.randint(8, 14))) + "."
            for _ in range(rng.randint(3, 8))
        ]
        body = " ".join(body_sentences)
        host = hosts[_zipf_pick(rng, len(hosts))]
        n_variants = rng.randint(0, 5)

        entity_urls = []
        for v in range(n_variants + 1):
            if v == 0:
                vtitle = title
            else:
                vtitle = typo.generate_typos(title, rng.choice([1, 1, 2]))
            url = f"https://{host}/e{e}/p{v}"
            text = f"{vtitle}\n{body}"
            html = (
                f"<html><head><title>{vtitle}</title></head>"
                f"<body><p>{body}</p></body></html>"
            ).encode("utf-8")
            # ~10% of rows ship html only (empty text) to exercise extraction
            ship_text = rng.random() >= 0.10
            lang = rng.choices(["en", "de", "fr", ""], weights=[90, 4, 4, 2])[0]

            urls.append(url)
            htmls.append(html)
            texts.append(text if ship_text else "")
            langs.append(lang)
            entity_urls.append(url)
            page_index += 1

        entity_urls.sort()
        for i in range(len(entity_urls)):
            for j in range(i + 1, len(entity_urls)):
                pair_a.append(entity_urls[i])
                pair_b.append(entity_urls[j])
                pair_e.append(e)

    pages = pa.table(
        {
            "url": urls,
            "html": htmls,
            "text": texts,
            "lang": langs,
        },
    )
    pairs = pa.table(
        {"url_a": pair_a, "url_b": pair_b, "entity_id": pair_e}, schema=PAIRS_SCHEMA
    )
    return pages, pairs, len(urls)


def _stamp_ts(pages_no_ts: pa.Table, first_page_index: int) -> pa.Table:
    """Insert the ``warc_ts`` column: ``_EPOCH_US + global_row_index·1s``."""
    n = pages_no_ts.num_rows
    ts = pa.array(
        range(
            _EPOCH_US + first_page_index * 1_000_000,
            _EPOCH_US + (first_page_index + n) * 1_000_000,
            1_000_000,
        ),
        type=pa.timestamp("us"),
    )
    return pa.table(
        {
            "url": pages_no_ts.column("url"),
            "warc_ts": ts,
            "html": pages_no_ts.column("html"),
            "text": pages_no_ts.column("text"),
            "lang": pages_no_ts.column("lang"),
        },
        schema=PAGES_SCHEMA,
    )


def generate_pages(n_entities: int, seed: int = 42):
    """Return ``(pages: pa.Table, labeled_pairs: pa.Table)``.

    ``labeled_pairs`` holds every within-entity pair (url_a < url_b) — the
    ground truth for pairwise F1 (FIXTURES.md §2).
    """
    pages, pairs, _n = _entity_range(0, n_entities, n_entities, seed)
    return _stamp_ts(pages, 0), pairs


def _entity_range_star(args):
    return _entity_range(*args)


def generate_corpus(sf: float, seed: int = 42, workers: int | None = None):
    """Scale-factor entry: sf=0.001 → ~600 entities (~2k pages).

    ``workers`` parallelizes generation across entity chunks
    (byte-identical to the serial pass — entities are independently
    seeded and ``warc_ts`` is stamped from global row order afterwards;
    pinned by ``tests/test_pipeline_e2e.py::test_parallel_corpus_identical``).
    Default: serial below 50k entities, one chunk per CPU above.
    """
    n_entities = max(20, int(sf * 600_000))
    if workers is None:
        import os as _os

        workers = 1 if n_entities < 50_000 else min(16, _os.cpu_count() or 1)
    if workers <= 1:
        return generate_pages(n_entities, seed)

    from multiprocessing import get_context

    bounds = [
        (n_entities * w // workers, n_entities * (w + 1) // workers)
        for w in range(workers)
    ]
    with get_context("fork").Pool(workers) as pool:
        parts = pool.map(
            _entity_range_star,
            [(lo, hi, n_entities, seed) for lo, hi in bounds],
        )
    page_tabs, pair_tabs, offset = [], [], 0
    for pages_no_ts, pairs, n in parts:
        page_tabs.append(_stamp_ts(pages_no_ts, offset))
        pair_tabs.append(pairs)
        offset += n
    return (
        pa.concat_tables(page_tabs).combine_chunks(),
        pa.concat_tables(pair_tabs).combine_chunks(),
    )


def write_corpus(out_dir: str, sf: float, seed: int = 42, shards: int = 8,
                 workers: int | None = None):
    """Write pages + labeled pairs as partitioned parquet under ``out_dir``
    (one file per shard — the resumable layout)."""
    import os

    import pyarrow.parquet as pq

    pages, pairs = generate_corpus(sf, seed, workers=workers)
    os.makedirs(f"{out_dir}/pages", exist_ok=True)
    os.makedirs(f"{out_dir}/labeled_pairs", exist_ok=True)
    n = pages.num_rows
    per = max(1, (n + shards - 1) // shards)
    for s in range(shards):
        chunk = pages.slice(s * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, f"{out_dir}/pages/part-{s:05d}.parquet")
    pq.write_table(pairs, f"{out_dir}/labeled_pairs/part-00000.parquet")
    return f"{out_dir}/pages", f"{out_dir}/labeled_pairs"
