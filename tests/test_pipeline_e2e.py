"""End-to-end entity resolution: synthetic page corpus -> clusters,
pairwise F1 >= 0.99 (BASELINE.md targets); determinism; checkpoint resume."""

import os

import pytest

from liblevenshtein_rust_ray.sources.pages import generate_pages, write_corpus
from liblevenshtein_rust_ray.pipelines.entity_resolution import (
    er_clusters,
    er_pairs,
    evaluate_f1,
)
from liblevenshtein_rust_ray.state.checkpoint import CheckpointManager


@pytest.fixture(scope="module")
def corpus():
    pages, labeled = generate_pages(50, seed=42)
    return pages, labeled


@pytest.mark.usefixtures("ray_session")
def test_er_f1(corpus):
    import ray.data as rd

    pages, labeled = corpus
    clusters = er_clusters(rd.from_arrow(pages)).to_pandas()
    m = evaluate_f1(clusters, labeled.to_pandas())
    assert m["precision"] >= 0.99, m
    assert m["recall"] >= 0.99, m
    assert m["f1"] >= 0.99, m


@pytest.mark.usefixtures("ray_session")
def test_er_deterministic_across_runs(corpus):
    import ray.data as rd

    pages, _ = corpus
    a = (
        er_clusters(rd.from_arrow(pages))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        er_clusters(rd.from_arrow(pages).repartition(7))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_resume(tmp_path, corpus):
    import ray.data as rd

    pages, _ = corpus
    run_dir = str(tmp_path / "run")

    ck = CheckpointManager(run_dir)
    first = er_clusters(rd.from_arrow(pages), checkpoints=ck, fingerprint="t1")
    first_df = first.to_pandas().sort_values("url").reset_index(drop=True)

    assert os.path.exists(os.path.join(run_dir, "pairs.manifest.json"))
    assert os.path.exists(os.path.join(run_dir, "clusters.manifest.json"))
    # the clusters manifest records which CC path ran (per-stage metrics)
    assert ck.manifest("clusters")["counters"]["path"] == "driver"

    # resume: a fresh manager with the same fingerprint must reuse the
    # checkpoints (byte-identical outputs, no recompute)
    ck2 = CheckpointManager(run_dir)
    assert ck2.is_complete("pairs", ck2.manifest("pairs")["input_fingerprint"])
    second = er_clusters(rd.from_arrow(pages), checkpoints=ck2, fingerprint="t1")
    second_df = second.to_pandas().sort_values("url").reset_index(drop=True)
    assert first_df.equals(second_df)

    # changed fingerprint (e.g. new extractor version) invalidates the stage
    assert not ck2.is_complete("pairs", "different-fingerprint")


@pytest.mark.usefixtures("ray_session")
def test_er_pairs_distances_sound(corpus):
    """Every emitted pair's distance equals the DP distance of the two
    titles (spot-check of the automaton inside the distributed stage)."""
    import ray.data as rd

    from liblevenshtein_rust_ray.kernel import standard_distance
    from liblevenshtein_rust_ray.stages.extract import _canonical_text, _title_of

    pages, _ = corpus
    titles = {
        u: _title_of(_canonical_text(t, h))
        for u, t, h in zip(
            pages.column("url").to_pylist(),
            pages.column("text").to_pylist(),
            pages.column("html").to_pylist(),
        )
    }
    pairs = er_pairs(rd.from_arrow(pages)).to_pandas()
    assert len(pairs) > 0
    for a, b, d in zip(pairs["url_a"], pairs["url_b"], pairs["distance"]):
        assert a < b
        assert standard_distance(titles[a], titles[b]) == d


def test_write_corpus_layout(tmp_path):
    pages_dir, pairs_dir = write_corpus(str(tmp_path), sf=0.0001, shards=4)
    import pyarrow.parquet as pq
    import glob

    files = sorted(glob.glob(f"{pages_dir}/*.parquet"))
    assert len(files) >= 2  # partitioned output, not one giant file
    total = sum(pq.read_table(f).num_rows for f in files)
    from liblevenshtein_rust_ray.sources.pages import generate_corpus

    pages, _ = generate_corpus(0.0001, seed=42)
    assert total == pages.num_rows


def test_parallel_corpus_identical():
    """Chunk-parallel generation is byte-identical to the serial pass
    (entities are independently seeded; warc_ts is global row order)."""
    from liblevenshtein_rust_ray.sources.pages import generate_corpus

    sp, sl = generate_corpus(0.002, seed=42, workers=1)
    pp, pl = generate_corpus(0.002, seed=42, workers=5)
    assert sp.schema.equals(pp.schema)
    assert sp.equals(pp)
    assert sl.equals(pl)


def test_er_pairs_incremental_equals_full(corpus):
    """Appending pages and re-scoring only affected blocks: the merged edge
    set is a superset of the from-scratch run (extras are stale-
    representative aliases) with IDENTICAL connected components
    (dynamic-dictionary capability, SURVEY.md §2.2)."""
    from liblevenshtein_rust_ray.stages.cluster import connected_components
    from liblevenshtein_rust_ray.pipelines.entity_resolution import (
        er_pairs,
        er_pairs_incremental,
    )

    tab, _labeled = corpus
    n = tab.num_rows
    old_t, new_t = tab.slice(0, int(n * 0.9)), tab.slice(int(n * 0.9))

    full = er_pairs(tab).materialize()
    base = er_pairs(old_t)
    inc = er_pairs_incremental(old_t, new_t, base_pairs=base).materialize()

    key = lambda df: set(map(tuple, df[["url_a", "url_b", "distance"]].values.tolist()))
    assert key(full.to_pandas()) <= key(inc.to_pandas())
    ci = connected_components(inc).to_pandas().sort_values("url").reset_index(drop=True)
    cf = connected_components(full).to_pandas().sort_values("url").reset_index(drop=True)
    assert ci.equals(cf)


def test_er_pairs_actor_pool_parity(corpus):
    """scorer_concurrency engages a stateful actor pool (per-actor universal
    tables + memo cache); output identical to the task path."""
    tab, _ = corpus
    task = er_pairs(tab).to_pandas()
    act = er_pairs(tab, scorer_concurrency=2).to_pandas()
    key = lambda df: set(map(tuple, df[["url_a", "url_b", "distance"]].values.tolist()))
    assert key(task) == key(act)


def test_er_pairs_engine_parity(corpus):
    """The default single-phase plan (duplicate DP, edge-sized second
    exchange) and the score-once pair-exchange plan are output-identical."""
    tab, _ = corpus
    default = er_pairs(tab).to_pandas()
    once = er_pairs(tab, engine="vectorized_once").to_pandas()
    key = lambda df: set(map(tuple, df[["url_a", "url_b", "distance"]].values.tolist()))
    assert key(default) == key(once)


def test_er_pairs_arrow_vs_pandas_exchange_parity(corpus):
    """The all-Arrow exchange (default) and its pandas twin must stay
    EXACTLY identical — same rows, same canonical order keys, same dtypes
    after to_pandas (they share the integer scoring core; this pins the
    two frontends and the two exchange implementations together)."""
    import pandas as pd

    tab, _ = corpus
    srt = lambda df: df.sort_values(["url_a", "url_b"]).reset_index(drop=True)
    arrow = srt(er_pairs(tab, engine="vectorized").to_pandas())
    pandas_ = srt(er_pairs(tab, engine="vectorized_pandas").to_pandas())
    pd.testing.assert_frame_equal(arrow, pandas_)


@pytest.mark.usefixtures("ray_session")
def test_er_pipeline_writes_partitioned_output(tmp_path, corpus):
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    from liblevenshtein_rust_ray.pipelines.entity_resolution import er_pipeline

    pages, _ = corpus
    out_dir = str(tmp_path / "clusters")
    clusters = er_pipeline(rd.from_arrow(pages), out_dir=out_dir, output_partitions=3)
    files = glob.glob(f"{out_dir}/*.parquet")
    assert len(files) >= 1
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == clusters.count() > 0


def test_er_pairs_decremental_equals_full(corpus):
    """Removing pages and re-scoring only the blocks that lost a member:
    the merged edge set is a superset of the from-scratch run over the
    remaining pages with IDENTICAL connected components (the remove half
    of the dynamic-dictionary capability, SURVEY.md §2.2)."""
    from liblevenshtein_rust_ray.stages.cluster import connected_components
    from liblevenshtein_rust_ray.pipelines.entity_resolution import (
        er_pairs,
        er_pairs_decremental,
    )

    tab, _labeled = corpus
    n = tab.num_rows
    removed = tab.slice(0, int(n * 0.1)).column("url").to_pylist()
    remaining = tab.slice(int(n * 0.1))

    full = er_pairs(remaining).materialize()
    base = er_pairs(tab)
    dec = er_pairs_decremental(tab, removed, base_pairs=base).materialize()

    key = lambda df: set(map(tuple, df[["url_a", "url_b", "distance"]].values.tolist()))
    dec_df = dec.to_pandas()
    assert key(full.to_pandas()) <= key(dec_df)
    # no edge may touch a removed url
    rm = set(removed)
    assert not (dec_df["url_a"].isin(rm) | dec_df["url_b"].isin(rm)).any()
    cd = connected_components(dec).to_pandas().sort_values("url").reset_index(drop=True)
    cf = connected_components(full).to_pandas().sort_values("url").reset_index(drop=True)
    assert cd.equals(cf)
