"""Stage kernels: extract, blocking, scorer (no Ray — pure batch kernels),
plus Ray-level connected components."""

import pandas as pd
import pyarrow as pa
import pytest

from liblevenshtein_rust_ray.stages.extract import (
    extract_batch,
    extract_text_from_html,
)
from liblevenshtein_rust_ray.stages.blocking import blocking_keys_batch, keys_for_title
from liblevenshtein_rust_ray.stages.scorer import BlockScorer
from liblevenshtein_rust_ray.kernel import standard_distance


def _pages_batch():
    return pa.table(
        {
            "url": ["https://a.com/1", "https://a.com/2"],
            "warc_ts": pa.array([0, 1], type=pa.timestamp("us")),
            "html": [
                b"<html><head><title>Hello World</title></head><body><p>Body text.</p></body></html>",
                b"<html><head><title>T2</title></head><body>other</body></html>",
            ],
            "text": ["", "provided text\nbody here"],
            "lang": ["en", "en"],
        }
    )


def test_extract_html_fallback_and_passthrough():
    out = extract_batch(_pages_batch())
    assert out.column_names == ["url", "warc_ts", "lang", "text", "title"]
    texts = out.column("text").to_pylist()
    # row 0: extracted from html (deterministic), title first line
    assert texts[0] == "Hello World\nBody text."
    assert out.column("title").to_pylist()[0] == "hello world"
    # row 1: provided text passes through byte-identically
    assert texts[1] == "provided text\nbody here"
    assert out.column("title").to_pylist()[1] == "provided text"


def test_extract_deterministic():
    h = b"<html><head><title> A  Title </title></head><body>x <b>y</b>\nz</body></html>"
    assert extract_text_from_html(h) == extract_text_from_html(h)
    assert extract_text_from_html(h) == "A Title\nx y z"


def test_blocking_token_guarantee():
    # <=2 char edits touch <=2 token regions -> a shared token always remains
    a = "alpha beta gamma delta"
    b = "alXha beta gamma deltaZ"  # 2 edits
    ka = set(keys_for_title("h", a))
    kb = set(keys_for_title("h", b))
    assert ka & kb
    # identical titles across hosts share the global exact key
    k1 = set(keys_for_title("h1", a))
    k2 = set(keys_for_title("h2", a))
    assert any(k.startswith("x|") for k in k1 & k2)
    assert keys_for_title("h", "") == []


def test_blocking_batch_explodes():
    batch = pa.table(
        {"url": ["https://a.com/1"], "title": ["alpha beta gamma"]}
    )
    out = blocking_keys_batch(batch)
    assert out.column_names == ["block_key", "url", "key_string"]
    assert out.num_rows >= 4  # exact + 3 tokens
    assert set(out.column("key_string").to_pylist()) == {"alpha beta gamma"}


def _group(strings_urls):
    return pd.DataFrame(
        {
            "block_key": ["k"] * len(strings_urls),
            "url": [u for _s, u in strings_urls],
            "key_string": [s for s, _u in strings_urls],
        }
    )


def test_scorer_identical_strings_star():
    g = _group([("t", f"u{i}") for i in range(5)])
    out = BlockScorer()(g)
    # star: 4 edges from min url, all distance 0
    assert len(out) == 4
    assert set(out["url_a"]) == {"u0"}
    assert (out["distance"] == 0).all()


def test_scorer_cross_string_representatives():
    g = _group([("abcd", "u1"), ("abce", "u2"), ("zzzz", "u3")])
    out = BlockScorer(max_distance=1)(g)
    assert len(out) == 1
    assert tuple(out.iloc[0][["url_a", "url_b"]]) == ("u1", "u2")
    assert out.iloc[0]["distance"] == 1


def test_scorer_all_pairs_parity_with_dp():
    import itertools

    strings = ["cat", "cap", "dog", "dig", "dot", "cart", "", "catt"]
    rows = [(s, f"u{i}") for i, s in enumerate(strings)]
    out = BlockScorer(max_distance=2, emit_all_pairs=True)(_group(rows))
    got = {(a, b): d for a, b, d in zip(out["url_a"], out["url_b"], out["distance"])}
    expected = {}
    for (s1, u1), (s2, u2) in itertools.combinations(rows, 2):
        d = standard_distance(s1, s2)
        if d <= 2:
            a, b = sorted([u1, u2])
            expected[(a, b)] = d
    assert got == expected


def test_scorer_salting_preserves_near_pairs():
    # force subdivision with a tiny cap; near-identical strings must still pair
    rows = [(f"prefix-{i:04d}", f"u{i}") for i in range(100)]
    rows.append(("prefix-0000x", "near_a"))
    out = BlockScorer(max_distance=1, max_block_strings=10)(_group(rows))
    pairs = set(zip(out["url_a"], out["url_b"]))
    assert ("near_a", "u0") in pairs or ("u0", "near_a") in pairs


def test_scorer_empty_and_single():
    assert len(BlockScorer()(_group([("only", "u1")]))) == 0
    out = BlockScorer()(_group([]))
    assert list(out.columns) == ["url_a", "url_b", "distance"]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["driver", "distributed"])
def test_connected_components(mode):
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.cluster import connected_components

    pairs = rd.from_items(
        [
            {"url_a": "a", "url_b": "b", "distance": 1},
            {"url_a": "b", "url_b": "c", "distance": 1},
            {"url_a": "x", "url_b": "y", "distance": 0},
        ]
    )
    out = connected_components(pairs, mode=mode, n_buckets=4).to_pandas()
    lab = dict(zip(out["url"], out["cluster_id"]))
    assert lab["a"] == lab["b"] == lab["c"] == "a"
    assert lab["x"] == lab["y"] == "x"
    assert len(out) == 5


@pytest.mark.usefixtures("ray_session")
def test_connected_components_modes_agree():
    import random

    import ray.data as rd

    from liblevenshtein_rust_ray.stages.cluster import connected_components

    rng = random.Random(3)
    # random chain/star mixture over 120 nodes
    edges = []
    for i in range(0, 120, 4):
        base = f"n{i:03d}"
        for j in range(1, 4):
            if rng.random() < 0.8:
                edges.append({"url_a": base, "url_b": f"n{i + j:03d}", "distance": 1})
    # multi-block input (the point of the test) without from_items'
    # row-per-block task overhead
    pairs = rd.from_pandas(pd.DataFrame(edges)).repartition(7)
    a = connected_components(pairs, mode="driver").to_pandas().sort_values("url").reset_index(drop=True)
    b = connected_components(pairs, mode="distributed", n_buckets=4).to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_contract_table_stars():
    from liblevenshtein_rust_ray.stages.cluster import _contract_table

    t = pa.table({
        "url_a": ["b", "c", "y", "c"],
        "url_b": ["a", "b", "x", "b"],  # dup edge + two components
    })
    out = _contract_table(t)
    stars = dict(zip(out["url_a"].to_pylist(), out["url_b"].to_pylist()))
    # every non-root points at the lexicographic min of its component
    assert stars == {"b": "a", "c": "a", "y": "x"}
    # empty input keeps the schema
    empty = _contract_table(t.slice(0, 0))
    assert empty.num_rows == 0
    assert empty.column_names == ["url_a", "url_b"]
    assert empty.schema.field("url_a").type == pa.string()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("threshold", [1, 30])
def test_connected_components_auto_contraction_parity(threshold):
    """auto above the driver threshold contracts first; the result must be
    identical to the pure driver path whether the contracted set then fits
    the driver (threshold=30) or falls through to the distributed rounds
    (threshold=1)."""
    import random

    import ray.data as rd

    from liblevenshtein_rust_ray.stages.cluster import connected_components

    rng = random.Random(11)
    edges = []
    # chains spanning blocks + a dense clique + random cross edges
    for i in range(60):
        edges.append({"url_a": f"c{i:03d}", "url_b": f"c{i + 1:03d}"})
    for i in range(10):
        for j in range(i + 1, 10):
            edges.append({"url_a": f"k{i}", "url_b": f"k{j}"})
    for _ in range(40):
        a, b = rng.randrange(60), rng.randrange(60)
        edges.append({"url_a": f"r{a:03d}", "url_b": f"r{b:03d}"})
    # many small blocks so contraction crosses partition boundaries
    pairs = rd.from_pandas(pd.DataFrame(edges)).repartition(13)
    stats: dict = {}
    got = (
        connected_components(pairs, mode="auto", driver_threshold=threshold,
                             n_buckets=4, stats=stats)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    want = (
        connected_components(pairs, mode="driver")
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert got.equals(want)
    assert stats.get("contract_passes", 0) >= 1
    # contraction must not grow the edge set
    assert stats["contract_edges"][0] <= len(edges)


def test_vectorized_bucket_scorer_parity():
    """score_bucket_vectorized ≡ BlockScorer per block + global pair dedup,
    including identical-string stars, representative edges, and salting."""
    import numpy as np
    import pandas as pd

    from liblevenshtein_rust_ray.stages.scorer import BlockScorer, score_bucket_vectorized

    rng = np.random.default_rng(11)
    alpha = list("abcdef ")
    rows = []
    for b in range(30):
        base = "".join(rng.choice(alpha, size=12))
        for i in range(int(rng.integers(1, 9))):
            s = list(base)
            for _ in range(int(rng.integers(0, 3))):
                s[int(rng.integers(0, len(s)))] = str(rng.choice(alpha))
            rows.append({"block_key": f"b{b}", "url": f"u{rng.integers(0, 500):03d}",
                         "key_string": "".join(s)})
    df = pd.DataFrame(rows)

    sc = BlockScorer()
    outs = [sc(g) for _, g in df.groupby("block_key") if len(g) >= 2]
    outs = [o for o in outs if len(o)]
    auto = (
        pd.concat(outs, ignore_index=True)
        .groupby(["url_a", "url_b"], as_index=False)["distance"].min()
        if outs else pd.DataFrame(columns=["url_a", "url_b", "distance"])
    )
    vec = score_bucket_vectorized(df)
    a = set(map(tuple, auto.values.tolist()))
    v = set(map(tuple, vec.values.tolist()))
    assert a == v


def test_vectorized_scorer_salting_parity():
    """Oversized blocks go through the same two-view simhash salting."""
    import pandas as pd

    from liblevenshtein_rust_ray.stages.scorer import BlockScorer, score_bucket_vectorized

    strings = [f"shared prefix string number {i:04d}" for i in range(40)]
    df = pd.DataFrame(
        {"block_key": "big", "url": [f"u{i:03d}" for i in range(40)], "key_string": strings}
    )
    sc = BlockScorer(max_block_strings=8)
    auto = sc(df).groupby(["url_a", "url_b"], as_index=False)["distance"].min()
    vec = score_bucket_vectorized(df, max_block_strings=8)
    assert set(map(tuple, auto.values.tolist())) == set(map(tuple, vec.values.tolist()))


def test_blocking_recall_property():
    """Property: any >=3-token title and a <=2-edit perturbation of it share
    at least one blocking key on the same host (recall by construction, not
    probability — the flagship's completeness claim)."""
    import random

    from liblevenshtein_rust_ray.functions.typogen import TypoGenerator
    from liblevenshtein_rust_ray.stages.blocking import keys_for_title

    rng = random.Random(17)
    alpha = "abcdefgh"
    for trial in range(300):
        n_tok = rng.randint(3, 7)
        title = " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randint(3, 10)))
            for _ in range(n_tok)
        )
        g = TypoGenerator(seed=trial)
        perturbed = g.generate_typos(title, rng.randint(0, 2))
        ka = set(keys_for_title("host", title))
        kb = set(keys_for_title("host", perturbed))
        assert ka & kb, (title, perturbed)


@pytest.mark.usefixtures("ray_session")
def test_distributed_cc_label_link_shortcut_chain():
    """Label-link shortcutting makes round count O(log diameter): a 16-node
    chain (one-hop propagation would need 15 rounds) must converge within
    8 rounds and match the driver union-find exactly."""
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.cluster import connected_components

    n = 16
    edges = [
        {"url_a": f"n{i:04d}", "url_b": f"n{i + 1:04d}", "distance": 1}
        for i in range(n - 1)
    ]
    pairs = rd.from_items(edges)
    stats = {}
    got = (
        connected_components(pairs, mode="distributed", n_buckets=4,
                             max_rounds=8, stats=stats)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (got["cluster_id"] == "n0000").all(), got.head()
    assert len(got) == n
    assert stats["rounds"] <= 8, stats
    # block-count hygiene: the label table must stay coalesced to ~n_buckets
    # blocks every round (the sentinel union adds a few); without the
    # per-round repartition it grows by +|edge blocks| per round and round
    # cost climbs linearly (measured 71s -> 7s on this very test)
    assert max(stats["label_blocks"]) <= 4 + 4, stats["label_blocks"]


@pytest.mark.usefixtures("ray_session")
def test_distributed_cc_multiblock_termination():
    """Termination must fire as soon as labels stop changing even when the
    label table spans several blocks/components (regression: the old
    signature pushed %-reduced partials through Dataset.sum — not
    partition-independent — so 30 converged 20-chains kept 'changing' for
    ~27 rounds instead of 6)."""
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.cluster import connected_components

    rows_a, rows_b = [], []
    for c in range(8):
        for i in range(12):
            rows_a.append(f"https://chain{c}.x/p{i:03d}")
            rows_b.append(f"https://chain{c}.x/p{i + 1:03d}")
    pairs = rd.from_pandas(
        pd.DataFrame({"url_a": rows_a, "url_b": rows_b, "distance": 1})
    )
    stats = {}
    got = connected_components(
        pairs, mode="distributed", n_buckets=8, stats=stats
    ).to_pandas()
    assert got["cluster_id"].nunique() == 8
    assert stats["rounds"] <= 8, stats
    # exact parity with the driver path (min-url labels)
    drv = connected_components(pairs, mode="driver").to_pandas()
    a = got.sort_values("url").reset_index(drop=True)
    b = drv.sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_empty_arrow_matches_edge_schema():
    """Empty bucket outputs are typed Arrow tables with the SAME column set
    and compatible types as real edge frames (they union downstream)."""
    from liblevenshtein_rust_ray.stages.grouped import _empty_arrow
    from liblevenshtein_rust_ray.stages.scorer import (
        _empty_candidates,
        _empty_edges,
    )

    for empty in (_empty_edges(), _empty_candidates()):
        t = _empty_arrow(empty)
        assert t.num_rows == 0
        assert t.column_names == list(empty.columns)
        for c in empty.columns:
            typ = t.schema.field(c).type
            assert pa.types.is_string(typ) or pa.types.is_integer(typ), (c, typ)


def test_numpy_thp_madvise_disabled_in_process():
    """The package import must turn off numpy's MADV_HUGEPAGE hint — with
    this kernel's defrag=madvise it causes synchronous-compaction storms
    (measured 1.1 s vs 1.2-29 s CPU for the identical scorer call)."""
    from numpy.core import multiarray

    import liblevenshtein_rust_ray  # noqa: F401  (import applies the toggle)

    assert multiarray._get_madvise_hugepage() is False


def test_numpy_thp_madvise_disabled_in_ray_workers(ray_session):
    """Workers must ALSO have the hint off — either inherited via
    NUMPY_MADVISE_HUGEPAGE=0 (conftest sets it before ray.init) or applied
    when they import this package to deserialize UDFs."""
    import ray.data as rd

    def probe(batch):
        import liblevenshtein_rust_ray  # noqa: F401
        from numpy.core import multiarray

        batch["off"] = [multiarray._get_madvise_hugepage() is False] * len(batch["x"])
        return batch

    out = rd.from_items([{"x": i} for i in range(8)]).map_batches(probe).to_pandas()
    assert out["off"].all()


def test_exact_dedup_survives_hash_collision(ray_session, monkeypatch):
    """Two DISTINCT texts that collide on the 64-bit content hash must both
    survive: the hash is only the shuffle key, the in-bucket dedup compares
    the text itself (at 10^12 docs a 64-bit hash alone has ~3x10^7 birthday
    collisions, each silently merging two different documents)."""
    import ray.data as rd

    from liblevenshtein_rust_ray.stages import dedup as dd

    monkeypatch.setattr(dd, "hash64", lambda x: 42)  # force total collision
    ds = rd.from_items(
        [
            {"id": 1, "text": "alpha"},
            {"id": 2, "text": "alpha"},
            {"id": 3, "text": "beta"},
        ]
    )
    out = dd.exact_dedup(ds, "text", "id").to_pandas().sort_values("id")
    assert list(out["id"]) == [1, 3]
    assert set(out["text"]) == {"alpha", "beta"}


# ---------------------------------------------------------------------------
# line_dedup (stages/lines.py) — CCNet-style cross-doc boilerplate removal


def _line_docs():
    return pd.DataFrame({
        "url": [f"u{i}" for i in range(6)],
        "text": [
            "title one\ncommon footer\nbody a",
            "title two\ncommon footer\nbody b",
            "title three\ncommon footer",
            "common footer",          # all-boilerplate -> doc drops out
            "solo page\nunique line",
            "",                       # lone empty line is unique -> kept
        ],
    })


def test_line_dedup_semantics(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.lines import line_dedup

    ds = rd.from_pandas(_line_docs()).repartition(3)
    out = (line_dedup(ds, "text", "url", min_df=2).to_pandas()
           .sort_values("url").reset_index(drop=True))
    assert list(out["url"]) == ["u0", "u1", "u2", "u4", "u5"]  # u3 dropped
    assert out.loc[0, "text"] == "title one\nbody a"
    assert out.loc[2, "text"] == "title three"
    assert out.loc[4, "text"] == ""          # unique empty line survives
    assert list(out["n_lines_kept"]) == [2, 2, 1, 2, 1]
    assert list(out["n_lines_dropped"]) == [1, 1, 1, 0, 0]


def test_line_dedup_paths_agree(ray_session):
    """Broadcast path and the two-exchange join fallback are output-identical."""
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.lines import line_dedup

    a = (line_dedup(rd.from_pandas(_line_docs()).repartition(3),
                    "text", "url", min_df=2)
         .to_pandas().sort_values("url").reset_index(drop=True))
    b = (line_dedup(rd.from_pandas(_line_docs()).repartition(3),
                    "text", "url", min_df=2, max_broadcast_common=0)
         .to_pandas().sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_line_dedup_flood_linear(ray_session):
    """A flood of f docs sharing one boilerplate line costs O(f) rows in the
    count exchange (per-batch partials), and every doc keeps its unique line."""
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.lines import line_dedup

    f = 500
    docs = pd.DataFrame({
        "url": [f"u{i}" for i in range(f)],
        "text": [f"unique {i}\nSHARED BANNER" for i in range(f)],
    })
    out = line_dedup(rd.from_pandas(docs).repartition(4), "text", "url",
                     min_df=2).to_pandas()
    assert len(out) == f
    assert (out["n_lines_dropped"] == 1).all()
    assert out["text"].str.startswith("unique ").all()


def test_quality_langid_vectorized_parity():
    """The vectorized quality/langid batch kernels must equal the scalar
    reference kernels row for row (including unicode, empty, null and
    whitespace-edge inputs) — they are the 100-TB full-corpus path."""
    import numpy as np

    from liblevenshtein_rust_ray.functions.textstats import (
        langid_ngram,
        quality_scores,
    )
    from liblevenshtein_rust_ray.stages.textstats import (
        langid_batch,
        quality_batch,
    )

    texts = [
        "The quick brown fox, it jumps!", "", None, "xz",
        "der hund und die katze sind schön in einem haus",
        "le chat et le chien sont dans la maison",
        "the cat and the dog are in the house of things",
        "   leading and trailing   ", "a\tb\nc\r\nd  e", "é œ ß ¿punct?",
        "que la casa el perro en el jardín ión", "123 456 !!! ???",
        "x" * 500 + " the and of to in is",
        " \t\r\n ", "the " * 200,
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["" for _ in texts], pa.string()),
    })
    qv = quality_batch(t).to_pydict()
    lv = langid_batch(t).to_pydict()
    for i, x in enumerate(texts):
        x = x or ""
        qs = quality_scores(x)
        for k in ["n_chars", "n_tokens", "punct_ratio",
                  "stopword_ratio", "mean_token_len"]:
            assert abs(float(qs[k]) - float(qv[k][i])) < 1e-12, (i, k, x)
        assert langid_ngram(x) == lv["lang_pred"][i], (i, x)


# ---------------------------------------------------------------------------
# duplicated_spans / dup_span_fraction (stages/spans.py)
# ---------------------------------------------------------------------------

def _span_docs():
    shared = " ".join(f"w{i}" for i in range(10))      # 10-token shared run
    return pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            f"alpha beta {shared} gamma delta",        # shared at tokens 2..11
            f"{shared} tail0 tail1 tail2",             # shared at tokens 0..9
            "p q r s t u v w x y z",                   # all-unique, no dups
            "short doc",                               # < w tokens: 0 windows
            # two DISJOINT dup regions in one doc: the shared run again,
            # then uniques, then a within-doc repeat is impossible here so
            # reuse the shared run once more after a unique gap
            f"{shared} z0 z1 z2 z3 z4 z5 z6 z7 z8 {shared}",
        ],
    })


def test_duplicated_spans_exact(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.spans import duplicated_spans

    ds = rd.from_pandas(_span_docs()).repartition(3)
    out = (duplicated_spans(ds, "text", "doc_id", w=8, min_df=2).to_pandas()
           .sort_values(["doc_id", "span_start"]).reset_index(drop=True))
    got = list(out.itertuples(index=False, name=None))
    # a 10-token duplicated run = positions p..p+2 dup-flagged (3 windows),
    # merged span covers exactly the 10 tokens
    assert (0, 2, 12, 10) in got
    assert (1, 0, 10, 10) in got
    assert not (out["doc_id"] == 2).any()
    assert not (out["doc_id"] == 3).any()
    d4 = out[out["doc_id"] == 4]
    assert list(d4[["span_start", "span_end"]].itertuples(index=False,
                                                          name=None)) == \
        [(0, 10), (19, 29)]


def test_dup_span_fraction_consistent(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.spans import (
        dup_span_fraction,
        duplicated_spans,
    )

    ds = rd.from_pandas(_span_docs()).repartition(2)
    frac = (dup_span_fraction(ds, "text", "doc_id", w=8, min_df=2).to_pandas()
            .set_index("doc_id").sort_index())
    spans = duplicated_spans(ds, "text", "doc_id", w=8, min_df=2).to_pandas()
    # every doc present; <w-token docs have 0 windows and fraction 0.0
    assert list(frac.index) == [0, 1, 2, 3, 4]
    assert frac.loc[3, "n_windows"] == 0
    assert frac.loc[3, "dup_fraction"] == 0.0
    assert frac.loc[2, "n_dup_windows"] == 0
    # n_dup_windows == sum over that doc's spans of (len - w + 1)
    for doc in (0, 1, 4):
        s = spans[spans["doc_id"] == doc]
        expect = int((s["n_tokens"] - 8 + 1).sum())
        assert frac.loc[doc, "n_dup_windows"] == expect
        assert frac.loc[doc, "dup_fraction"] == pytest.approx(
            expect / frac.loc[doc, "n_windows"])


def test_duplicated_spans_within_doc_repeat(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.spans import duplicated_spans

    # min_df counts OCCURRENCES (Lee et al. semantics): a shingle repeated
    # inside ONE doc is a duplicate even if no other doc has it
    rep = " ".join(f"r{i}" for i in range(8))
    df = pd.DataFrame({"doc_id": [7],
                       "text": [f"{rep} gap0 gap1 gap2 gap3 gap4 gap5 gap6 gap7 {rep}"]})
    out = (duplicated_spans(rd.from_pandas(df), "text", "doc_id",
                            w=8, min_df=2).to_pandas()
           .sort_values("span_start").reset_index(drop=True))
    assert list(out[["span_start", "span_end"]].itertuples(index=False,
                                                           name=None)) == \
        [(0, 8), (16, 24)]


def test_executor_patch_fallback_on_missing_internals():
    """Version guard (round-3 VERDICT task 8): when Ray's private
    streaming-executor hook is absent or renamed, the empty-bundle patch
    degrades to a no-op (warning comes back) instead of crashing."""
    import ray.data._internal.execution.streaming_executor_state as ses

    from liblevenshtein_rust_ray.pipelines.context import (
        _patch_empty_bundle_schema_warning)

    saved_fn = ses.dedupe_schemas_with_validation
    saved_flag = getattr(ses, "_llr_empty_bundle_patch", False)
    try:
        ses._llr_empty_bundle_patch = False
        del ses.dedupe_schemas_with_validation
        # must not raise — simulates a Ray upgrade that moved the hook
        _patch_empty_bundle_schema_warning()
        assert not ses._llr_empty_bundle_patch
    finally:
        ses.dedupe_schemas_with_validation = saved_fn
        ses._llr_empty_bundle_patch = saved_flag


def test_popcount_u64_matches_python():
    import numpy as np

    from liblevenshtein_rust_ray.stages.similarity import _popcount_u64

    rng = np.random.RandomState(3)
    xs = rng.randint(0, 1 << 63, size=257, dtype=np.int64).astype(np.uint64)
    xs[0] = 0
    xs[1] = np.uint64(2**64 - 1)
    got = _popcount_u64(xs)
    assert got.tolist() == [bin(int(x)).count("1") for x in xs]


@pytest.mark.usefixtures("ray_session")
def test_distributed_cc_exchange_plan_parity():
    """Force the thin-row exchange plan (broadcast_idmap_bytes=0): the
    128-bit edge-key pair-up must reproduce the driver path exactly,
    including duplicate edges and multi-block inputs."""
    import random

    import ray.data as rd

    from liblevenshtein_rust_ray.stages.cluster import (
        _distributed_cc, connected_components)

    rng = random.Random(11)
    edges = []
    for i in range(0, 160, 5):
        base = f"m{i:03d}"
        for j in range(1, 5):
            if rng.random() < 0.75:
                edges.append({"url_a": base, "url_b": f"m{i + j:03d}",
                              "distance": 1})
    edges.append(edges[0])  # duplicate edge
    pairs = rd.from_pandas(pd.DataFrame(edges)).repartition(6)
    a = (connected_components(pairs, mode="driver").to_pandas()
         .sort_values("url").reset_index(drop=True))
    b = (_distributed_cc(pairs, max_rounds=30, n_buckets=4,
                         broadcast_idmap_bytes=0).to_pandas()
         .sort_values("url").reset_index(drop=True))
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_distributed_cc_idmap_branch_parity():
    """Pin the middle branch (edge table too big for the dense-rank
    regime, id map still broadcastable): duplicate-heavy edges let a
    byte guard sit between ids and pairs sizes."""
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.cluster import (
        _distributed_cc, connected_components)

    edges = []
    for i in range(0, 60, 3):
        for _ in range(40):  # heavy duplication: |pairs bytes| >> |ids|
            edges.append({"url_a": f"p{i:02d}", "url_b": f"p{i + 1:02d}",
                          "distance": 1})
            edges.append({"url_a": f"p{i + 1:02d}", "url_b": f"p{i + 2:02d}",
                          "distance": 1})
    pairs = rd.from_pandas(pd.DataFrame(edges)).repartition(5).materialize()
    ids_bytes_ceiling = pairs.size_bytes() // 2 - 1  # pairs > 2*B
    assert ids_bytes_ceiling > 2_000  # sanity: B still fits the tiny map
    a = (connected_components(pairs, mode="driver").to_pandas()
         .sort_values("url").reset_index(drop=True))
    b = (_distributed_cc(pairs, max_rounds=30, n_buckets=4,
                         broadcast_idmap_bytes=ids_bytes_ceiling)
         .to_pandas().sort_values("url").reset_index(drop=True))
    assert a.equals(b)
