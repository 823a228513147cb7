"""URL canonicalization + crawl-snapshot dedup (stages/urls.py).

Three layers: handcrafted rule-by-rule canonicalization cases, a DuckDB
regexp-chain parity sweep (both sides are RE2 — the oracle contract), and
end-to-end snapshot-dedup semantics on a small multi-block dataset.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from liblevenshtein_rust_ray.stages.urls import (
    canonicalize_url_array,
    canonicalize_urls,
    messy_crawl_variants,
    url_snapshot_dedup,
)

CASES = [
    # fragment
    ("https://a.com/x#frag", "https://a.com/x"),
    # tracking params, value included; query cleanup
    ("https://a.com/x?utm_source=feed&utm_campaign=x", "https://a.com/x"),
    ("https://a.com/x?utm_source=f&keep=1", "https://a.com/x?keep=1"),
    ("https://a.com/x?keep=1&gclid=abc", "https://a.com/x?keep=1"),
    ("https://a.com/x?fbclid=z#top", "https://a.com/x"),
    # scheme/host case-fold, path case kept
    ("HTTPS://A.COM/Path", "https://a.com/Path"),
    ("HtTp://MiXeD.example.org/Q?x=Y", "http://mixed.example.org/Q?x=Y"),
    # default ports
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),  # non-default kept
    ("https://a.com:443", "https://a.com"),
    # trailing slash
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com/", "https://a.com"),
    # combined
    ("HTTPS://A.com:443/e1/p2/?utm_medium=rss&gclid=1#s", "https://a.com/e1/p2"),
    # anchored tracking-param match: look-alike names/values survive
    ("https://a.com/x?xutm_source=1", "https://a.com/x?xutm_source=1"),
    ("https://a.com/x?q=gclid=abc", "https://a.com/x?q=gclid=abc"),
    ("https://a.com/x?utm_a=1&utm_b=2&keep=3", "https://a.com/x?keep=3"),
    # non-URL passthrough (generic rewrites only)
    ("not a url#frag", "not a url"),
    ("plain", "plain"),
]


def test_canonicalize_handcrafted():
    got = canonicalize_url_array(pa.array([c[0] for c in CASES])).to_pylist()
    assert got == [c[1] for c in CASES]


def test_canonicalize_duckdb_parity():
    """The SQL oracle's regexp chain reproduces the Arrow chain
    byte-for-byte on every handcrafted input (same RE2 patterns, same
    order) — this is the contract the url_canonical_dedup oracle rests on."""
    prefix = "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*"
    con = duckdb.connect()
    con.register("t", pa.table({"u": pa.array([c[0] for c in CASES])}))
    rows = con.sql(f"""
        WITH g AS (SELECT u,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(u, '#.*$', '', 'g'),
            '([?&])(utm_[a-z]+|gclid|fbclid)=[^&#]*', '\\1', 'g'),
            '&&+', '&', 'g'), '\\?&', '?', 'g'), '[?&]+$', '', 'g') AS g
          FROM t),
        f AS (SELECT u, CASE WHEN regexp_extract(g, '{prefix}') = '' THEN g
          ELSE lower(regexp_extract(g, '{prefix}'))
               || substr(g, length(regexp_extract(g, '{prefix}')) + 1) END AS h
          FROM g)
        SELECT regexp_replace(regexp_replace(regexp_replace(h,
          '^(https://[^/:]+):443(/|$)', '\\1\\2', 'g'),
          '^(http://[^/:]+):80(/|$)', '\\1\\2', 'g'),
          '/$', '', 'g') FROM f
    """).fetchall()
    assert [r[0] for r in rows] == [c[1] for c in CASES]


@pytest.fixture()
def snapshots(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "crawl_url": [
            "https://a.com/x?utm_source=f",   # canon https://a.com/x
            "https://a.com/x/",               # same canon, newer ts
            "HTTPS://A.com/x",                # same canon, newest ts
            "https://b.com/y",                # singleton
            "https://b.com/z#f",              # canon b.com/z, tie on ts
            "https://b.com/z/",               # tie -> min crawl_url wins
        ],
        "ts": [100, 200, 300, 50, 70, 70],
    })
    return rd.from_pandas(df).repartition(3)


def test_snapshot_dedup_semantics(snapshots):
    out = url_snapshot_dedup(
        snapshots, url_col="crawl_url", ts_col="ts", n_buckets=4
    ).to_pandas().sort_values("canonical_url").reset_index(drop=True)
    assert out["canonical_url"].tolist() == [
        "https://a.com/x", "https://b.com/y", "https://b.com/z"]
    assert out["kept_url"].tolist() == [
        "HTTPS://A.com/x", "https://b.com/y", "https://b.com/z#f"]
    assert out["kept_ts"].tolist() == [300, 50, 70]
    assert out["n_snapshots"].tolist() == [3, 1, 2]


def test_messy_variants_roundtrip(ray_session):
    """Every synthesized variant canonicalizes back to its clean URL, and
    the recrawl rows (page %3 == 0) add exactly one extra snapshot a day
    later."""
    import ray.data as rd

    urls = [f"https://site{h}.example.com/e{e}/p{v}"
            for h, e, v in [(0, 1, 0), (1, 2, 3), (2, 3, 4), (0, 4, 6)]]
    ts = pd.to_datetime([1_600_000_000 + i for i in range(4)], unit="s")
    ds = rd.from_pandas(pd.DataFrame({"url": urls, "warc_ts": ts}))
    messy = messy_crawl_variants(ds).to_pandas()
    # v%3==0 for p0, p3, p6; not for p4 -> 4 base + 3 recrawl rows
    assert len(messy) == 7
    canon = canonicalize_url_array(
        pa.array(messy["crawl_url"].tolist())).to_pylist()
    expect = urls + [urls[0], urls[1], urls[3]]
    assert canon == expect
    dedup = url_snapshot_dedup(
        rd.from_pandas(messy), url_col="crawl_url", ts_col="ts", n_buckets=2
    ).to_pandas().sort_values("canonical_url").reset_index(drop=True)
    assert sorted(dedup["canonical_url"]) == sorted(urls)
    n = dict(zip(dedup["canonical_url"], dedup["n_snapshots"]))
    assert n[urls[0]] == 2 and n[urls[1]] == 2 and n[urls[3]] == 2
    assert n[urls[2]] == 1
    kept = dict(zip(dedup["canonical_url"], dedup["kept_ts"]))
    assert kept[urls[0]] == 1_600_000_000 + 86_400


def test_canonicalize_urls_stage(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"url": [c[0] for c in CASES]}))
    out = canonicalize_urls(ds).to_pandas()
    assert out["canonical_url"].tolist() == [c[1] for c in CASES]


def test_snapshot_dedup_carry_cols(ray_session):
    """carry_cols ride the dedup: the winning (newest) snapshot's values
    survive, recrawl variants repeat the original content."""
    import ray.data as rd

    df = pd.DataFrame({
        "crawl_url": ["https://a.com/x?utm_source=f", "https://a.com/x/",
                      "https://b.com/y"],
        "ts": [100, 200, 50],
        "text": ["old content", "new content", "solo"],
    })
    out = url_snapshot_dedup(
        rd.from_pandas(df), url_col="crawl_url", ts_col="ts",
        n_buckets=2, carry_cols=("text",),
    ).to_pandas().sort_values("canonical_url").reset_index(drop=True)
    assert out["canonical_url"].tolist() == ["https://a.com/x", "https://b.com/y"]
    assert out["text"].tolist() == ["new content", "solo"]
    assert out["n_snapshots"].tolist() == [2, 1]


def test_messy_variants_carry_cols(ray_session):
    import ray.data as rd

    urls = ["https://site0.example.com/e1/p0"]
    ds = rd.from_pandas(pd.DataFrame({
        "url": urls, "warc_ts": [1_600_000_000], "text": ["body"]}))
    messy = messy_crawl_variants(ds, carry_cols=("text",)).to_pandas()
    assert len(messy) == 2  # base + recrawl (p0 -> v%3==0)
    assert messy["text"].tolist() == ["body", "body"]
    assert messy["ts"].tolist() == [1_600_000_000, 1_600_000_000 + 86_400]


def test_host_stats(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.urls import host_stats

    df = pd.DataFrame({
        "url": ["https://a.com/1", "https://a.com/2", "HTTPS://b.org/x",
                "not a url"],
        "text": ["abcd", "ab", "abc", ""],
    })
    out = host_stats(rd.from_pandas(df).repartition(2), n_buckets=2
                     ).to_pandas().sort_values("host").reset_index(drop=True)
    assert out["host"].tolist() == ["", "a.com", "b.org"]
    assert out["n_pages"].tolist() == [1, 2, 1]
    assert out["sum_chars"].tolist() == [0, 6, 3]
    assert out["mean_chars"].tolist() == [0.0, 3.0, 3.0]
    assert out["flag_mega"].tolist() == [False, False, False]


def test_canonicalize_duckdb_parity_random():
    """Hypothesis-style randomized RE2-parity sweep: the Arrow chain and
    the DuckDB chain agree byte-for-byte on adversarial URL-ish strings
    (unicode, %-escapes, stray separators, nested params)."""
    import random

    rng = random.Random(23)
    pieces = ["https://", "HTTP://", "a.COM", "b-c.org:443", ":80", "/p",
              "/P/q", "?", "&", "utm_source=x", "gclid=1", "keep=1", "#f",
              "#", "//", "é", "%20", "=", "x.y", ":8080", "/", "fbclid=Z"]
    urls = ["".join(rng.choices(pieces, k=rng.randint(1, 8)))
            for _ in range(300)]
    got = canonicalize_url_array(pa.array(urls)).to_pylist()
    prefix = "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*"
    con = duckdb.connect()
    con.register("t", pa.table({"u": pa.array(urls)}))
    rows = con.sql(f"""
        WITH g AS (SELECT u,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(u, '#.*$', '', 'g'),
            '([?&])(utm_[a-z]+|gclid|fbclid)=[^&#]*', '\\1', 'g'),
            '&&+', '&', 'g'), '\\?&', '?', 'g'), '[?&]+$', '', 'g') AS g
          FROM t),
        f AS (SELECT u, CASE WHEN regexp_extract(g, '{prefix}') = '' THEN g
          ELSE lower(regexp_extract(g, '{prefix}'))
               || substr(g, length(regexp_extract(g, '{prefix}')) + 1) END AS h
          FROM g)
        SELECT regexp_replace(regexp_replace(regexp_replace(h,
          '^(https://[^/:]+):443(/|$)', '\\1\\2', 'g'),
          '^(http://[^/:]+):80(/|$)', '\\1\\2', 'g'),
          '/$', '', 'g') FROM f
    """).fetchall()
    assert got == [r[0] for r in rows]
