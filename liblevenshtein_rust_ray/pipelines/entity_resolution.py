"""Flagship pipeline: blocking + automaton pairwise scoring + transitive
clustering over Common-Crawl-style pages (the north star).

Dataflow (all lazy, streaming executor, Arrow batches)::

    read_parquet(pages)                      columns pruned at the read
      -> map_batches(extract_batch)          canonical text + title, html dropped
      -> map_batches(blocking_keys_batch)    explode to (block_key, url, key_string)
      -> groupby(block_key)                  shuffle #1 (the blocking shuffle)
           .map_groups(BlockScorer)          per-block trie + automaton traversal
      -> dedup edges                         shuffle #2 (same canonical pair from
                                             several bands)
      -> connected_components                shuffles #3..k (min-label rounds)
      -> (url, cluster_id)

Every stage can checkpoint per-partition parquet + manifest via
``CheckpointManager`` and resumes by fingerprint.
"""

import pandas as pd

from ..kernel import STANDARD
from ..stages.blocking import blocking_keys_batch
from ..stages.extract import extract_batch, EXTRACTOR_VERSION
from ..stages.scorer import BlockScorer
from ..stages.cluster import connected_components
from ..state.checkpoint import CheckpointManager


def read_pages(source):
    """``source`` is a parquet path/dir or an existing Dataset/arrow table."""
    import pyarrow as pa
    import ray.data as rd

    if isinstance(source, str):
        return rd.read_parquet(source)
    if isinstance(source, pa.Table):
        return rd.from_arrow(source)
    return source


def _auto_buckets(source, ds, floor: int = 256, cap: int = 4096,
                  pages_per_bucket: int = 1024) -> int:
    """Scale the exchange bucket count with corpus size (~1k pages/bucket).

    Fixed buckets skew at scale: at sf2.0 (4.2M pages) the 256-bucket plan
    reads 176 s (hot buckets pack into few sort ranges; 21 s straggler
    scorer task at 1024 buckets), while interleaved warm-pool A/B measured
    4096 buckets at 47.0/34.3 s vs 1024 at 52.3/41.5 s — finer buckets
    spread quadratic-cost blocks across sort ranges, so ~1k pages/bucket
    is the round-3 default (sf0.1 still lands on the 256 floor — the bench
    physical plan is unchanged).  Row counts come from parquet FILE
    METADATA only (ms) — ``Dataset.count()`` would spin up read tasks
    (~3 s).  Unknown inputs keep the floor; the cap bounds the sort
    fan-out on this single node (at cluster scale pass ``n_buckets``
    explicitly — thousands to millions)."""
    try:
        files = None
        if isinstance(source, str):
            import glob as _glob
            import os as _os

            files = (
                sorted(_glob.glob(_os.path.join(source, "*.parquet")))
                if _os.path.isdir(source)
                else [source]
            )
        elif hasattr(ds, "input_files"):
            files = ds.input_files()
        if not files:
            return floor
        import pyarrow.parquet as pq

        n_pages = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        return max(floor, min(cap, n_pages // pages_per_bucket))
    except Exception:
        return floor


def er_pairs(
    source,
    max_distance: int = 2,
    algorithm: str = STANDARD,
    scorer_concurrency=None,
    emit_all_pairs: bool = False,
    checkpoints: CheckpointManager | None = None,
    fingerprint: str = "",
    engine: str = "vectorized",
    max_block_strings: int = 512,
    n_buckets: int | None = None,
):
    """Pages -> canonical deduped candidate edges (url_a, url_b, distance).

    ``engine="vectorized"`` (default) scores pairs per block bucket with
    the numpy banded-DP kernel (the reference's SIMD distance-matrix
    path), then dedups url pairs in a second small exchange.  The same
    title pair co-occurs under several blocking keys, so this path scores
    each distinct pair ~3x — MEASURED cheaper than avoiding it: the
    banded DP is ~3 us/pair while the alternative ships every candidate's
    string pair through a 12x-larger exchange (31 vs 22 CPU-seconds and
    +6 s wall at sf0.1/32 cores; see docs/SCALE.md "score-once A/B").
    ``engine="vectorized_once"`` keeps the score-once plan: phase A emits
    unscored candidates keyed by canonical string pair, the pair exchange
    co-locates duplicates, phase B scores each distinct pair exactly once.
    Use it when the per-pair scorer is genuinely expensive (weighted
    cost models, restricted-substitution automata) — the break-even is
    scorer cost vs ~60 bytes/candidate of extra exchange payload.
    ``engine="automaton"`` runs the per-block trie + automaton traversal —
    output-identical (pinned by tests) and the reference-parity /
    restricted-substitution engine."""
    ck = checkpoints or CheckpointManager("", enabled=False)
    fp = f"{fingerprint}|x{EXTRACTOR_VERSION}|d{max_distance}|{algorithm}|{engine}"

    def compute():
        from .context import configure_data_context
        from ..stages.grouped import bucketed_group_apply, bucketed_apply
        from ..stages.scorer import (
            _empty_candidates,
            _empty_edges,
            candidate_pairs_bucket,
            score_candidates_bucket,
        )

        configure_data_context()
        ds = read_pages(source)
        nonlocal n_buckets
        if n_buckets is None:
            n_buckets = _auto_buckets(source, ds)
        ds = ds.map_batches(extract_batch, batch_format="pyarrow")
        ds = ds.map_batches(blocking_keys_batch, batch_format="pyarrow")
        if engine == "vectorized" and not emit_all_pairs and not scorer_concurrency:
            # single-phase, all-Arrow: score within each block bucket, dedup
            # url pairs in a second (edge-sized) exchange.  Batches stay
            # pa.Table through both exchanges — row-level strings never
            # become Python objects (only each bucket's DISTINCT strings
            # cross into Python, for the DP kernel).
            from ..stages.grouped import bucketed_apply_arrow
            from ..stages.scorer import (
                _empty_edges_arrow,
                score_bucket_vectorized_arrow,
            )

            def min_dedup(tbl):
                # use_threads=False: this runs inside a 1-CPU Ray task —
                # Acero's own thread pool would oversubscribe the worker
                g = tbl.group_by(["url_a", "url_b"], use_threads=False).aggregate(
                    [("distance", "min")]
                )
                return g.rename_columns(["url_a", "url_b", "distance"])

            edges = bucketed_apply_arrow(
                ds,
                "block_key",
                lambda tbl: score_bucket_vectorized_arrow(
                    tbl, max_distance=max_distance,
                    max_block_strings=max_block_strings, algorithm=algorithm,
                ),
                n_buckets=n_buckets,
                empty_result=_empty_edges_arrow(),
            )
            # bucket by the full pair: raw scorer pairs rarely share an
            # endpoint (measured at sf5.0: single-endpoint co-location
            # contracts <1%), so single-column keys buy downstream
            # clustering nothing and the two-column hash spreads best.
            return bucketed_apply_arrow(
                edges,
                ["url_a", "url_b"],
                min_dedup,
                n_buckets=n_buckets,
                empty_result=_empty_edges_arrow(),
            )
        if engine == "vectorized_pandas" and not emit_all_pairs and not scorer_concurrency:
            # the pandas-exchange twin, kept for A/B and as fallback
            from ..stages.scorer import score_bucket_vectorized

            edges = bucketed_apply(
                ds,
                "block_key",
                lambda df: score_bucket_vectorized(
                    df, max_distance=max_distance,
                    max_block_strings=max_block_strings, algorithm=algorithm,
                ),
                n_buckets=n_buckets,
                empty_result=_empty_edges(),
            )
            return bucketed_apply(
                edges,
                ["url_a", "url_b"],
                lambda df: df.groupby(["url_a", "url_b"], as_index=False)["distance"].min(),
                n_buckets=n_buckets,
                empty_result=_empty_edges(),
            )
        if engine in ("vectorized", "vectorized_pandas", "vectorized_once") and not emit_all_pairs:
            # phase A: per block-bucket star edges + unscored candidates
            cand = bucketed_apply(
                ds,
                "block_key",
                lambda df: candidate_pairs_bucket(
                    df, max_distance=max_distance,
                    max_block_strings=max_block_strings, algorithm=algorithm,
                ),
                n_buckets=n_buckets,
                empty_result=_empty_candidates(),
            )
            # phase B: exchange on the string pair, score each distinct
            # pair once, dedup url pairs (global — one key_string per url)
            if scorer_concurrency:
                # stateful actor pool: per-actor universal-automaton tables
                # built once in __init__ (north-star shape)
                import numpy as np
                import pandas as pd

                from ..stages.grouped import _with_schema_sentinel
                from ..stages.scorer import CandidateScorerActor

                def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
                    df = df.copy()
                    h = pd.util.hash_pandas_object(df[["s_a", "s_b"]], index=False)
                    df["__bucket"] = (
                        h.to_numpy().astype("uint32") % np.uint32(64)
                    ).astype("int32")
                    return df

                return _with_schema_sentinel(
                    cand.map_batches(add_bucket, batch_format="pandas")
                    .groupby("__bucket")
                    .map_groups(
                        CandidateScorerActor,
                        fn_constructor_kwargs={
                            "max_distance": max_distance,
                            "algorithm": algorithm,
                        },
                        concurrency=scorer_concurrency,
                        batch_format="pandas",
                    ),
                    _empty_edges(),
                )
            return bucketed_apply(
                cand,
                ["s_a", "s_b"],
                lambda df: score_candidates_bucket(
                    df, max_distance=max_distance, algorithm=algorithm
                ),
                n_buckets=n_buckets,
                empty_result=_empty_edges(),
            )
        scorer = BlockScorer(
            max_distance=max_distance,
            algorithm=algorithm,
            emit_all_pairs=emit_all_pairs,
            max_block_strings=max_block_strings,
        )
        # bucketed group-apply: one map_groups call per coarse bucket,
        # C-path pandas groupby inside, singletons pruned before Python
        pairs = bucketed_group_apply(
            ds,
            "block_key",
            scorer,
            n_buckets=n_buckets,
            min_group_size=2,
            empty_result=_empty_edges(),
        )
        # the same canonical pair arrives via several bands: exact dedup by
        # (url_a, url_b), keep the smallest distance (vectorized per bucket)
        return bucketed_apply(
            pairs,
            ["url_a", "url_b"],
            lambda df: df.groupby(["url_a", "url_b"], as_index=False)["distance"].min(),
        )

    return ck.run_stage("pairs", fp, compute)


def er_clusters(
    source,
    max_distance: int = 2,
    algorithm: str = STANDARD,
    checkpoints: CheckpointManager | None = None,
    fingerprint: str = "",
    cc_mode: str = "auto",
    **kwargs,
):
    """Pages -> (url, cluster_id): the transitive entity clusters.

    ``cc_mode`` selects the clustering path ("auto" / "driver" /
    "distributed" — see :func:`~..stages.cluster.connected_components`);
    the default edge-count auto-switch is right for almost every run."""
    ck = checkpoints or CheckpointManager("", enabled=False)
    pairs = er_pairs(
        source,
        max_distance=max_distance,
        algorithm=algorithm,
        checkpoints=checkpoints,
        fingerprint=fingerprint,
        **kwargs,
    )
    fp = f"{fingerprint}|x{EXTRACTOR_VERSION}|d{max_distance}|{algorithm}|cc"
    # cc_stats is filled during compute() and lands in the stage manifest's
    # counters (path chosen, contraction pass sizes, label rounds) — the
    # per-stage metrics a resumed or audited run reads back.
    cc_stats: dict = {}
    return ck.run_stage(
        "clusters", fp,
        lambda: connected_components(pairs, mode=cc_mode, stats=cc_stats),
        counters=cc_stats,
    )


def er_pipeline(source, out_dir: str | None = None, output_partitions: int | None = None, **kwargs):
    """Run the full pipeline; optionally write (url, cluster_id) parquet.

    The clustering rounds leave many small blocks; coalesce to
    ``output_partitions`` files (default: one per ~256k rows, min 1) so the
    sink is a sane partitioned layout rather than a spray of tiny files."""
    clusters = er_clusters(source, **kwargs)
    if out_dir:
        n = output_partitions or max(1, clusters.count() // 262_144)
        clusters.repartition(n).write_parquet(out_dir)
    return clusters


# ----------------------------------------------------------------------
def _score_blocks_all_pairs(sub, max_distance, algorithm, max_block_strings):
    """Quadratic (SQL-oracle-mode) scoring of a bucket's blocks through
    BlockScorer — the same engine er_pairs' ``emit_all_pairs`` path uses.
    ``score_bucket_vectorized`` is NOT equivalent here: it always collapses
    identical strings to distance-0 stars and scores one representative url
    per distinct string."""
    import pandas as pd

    from ..stages.scorer import BlockScorer, _empty_edges

    scorer = BlockScorer(
        max_distance=max_distance, algorithm=algorithm,
        emit_all_pairs=True, max_block_strings=max_block_strings,
    )
    outs = []
    for _key, g in sub.groupby("block_key", sort=False):
        if len(g) < 2:
            continue
        out = scorer(g)
        if out is not None and len(out):
            outs.append(out)
    if not outs:
        return _empty_edges()
    return pd.concat(outs, ignore_index=True)


def er_pairs_incremental(
    old_source,
    new_source,
    base_pairs=None,
    max_distance: int = 2,
    algorithm: str = STANDARD,
    emit_all_pairs: bool = False,
    max_block_strings: int = 512,
):
    """Incremental update — the reference's dynamic-dictionary capability
    (DynamicDawg insert/remove, /root/reference/src/dictionary/dynamic_dawg.rs)
    in batch form (SURVEY.md §2.2): appending pages re-scores ONLY the
    blocks that gained a member.

    Both page sets flow through the same extract/blocking stages; inside
    each hash bucket, blocks containing at least one NEW page are rescored
    in full (old + new members), all other blocks are skipped.

    Contract (pinned by tests): with representative edges (default) the
    merge with ``base_pairs`` is a SUPERSET of the from-scratch edge set
    whose connected components are IDENTICAL.  The possible extras are
    stale-representative aliases: when a new page becomes a block's
    minimal url, base edges name the old representative — which the
    rescored block's distance-0 star already links to the new one, so
    clustering is unaffected.  With ``emit_all_pairs=True`` (``base_pairs``
    must also be all-pairs) the merge EQUALS the from-scratch all-pairs
    edge set exactly: adding pages never changes an existing page's block
    keys, so old-old pairs co-block identically (in base) and every pair
    touching a new page lives in a rescored block (in delta) — this is the
    SQL-oracle-checkable restatement the driver verifies."""
    import pandas as pd

    from .context import configure_data_context
    from ..stages.grouped import bucketed_apply
    from ..stages.scorer import _empty_edges, score_bucket_vectorized

    configure_data_context()

    def keyed(source, flag):
        ds = read_pages(source)
        ds = ds.map_batches(extract_batch, batch_format="pyarrow")
        ds = ds.map_batches(blocking_keys_batch, batch_format="pyarrow")

        def tag(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__new"] = flag
            return df

        return ds.map_batches(tag, batch_format="pandas")

    both = keyed(old_source, False).union(keyed(new_source, True))

    def score_affected(df: pd.DataFrame) -> pd.DataFrame:
        hot = df.loc[df["__new"], "block_key"].unique()
        sub = df[df["block_key"].isin(set(hot))].drop(columns="__new")
        if not len(sub):
            return _empty_edges()
        if emit_all_pairs:
            # quadratic SQL-oracle mode: score_bucket_vectorized always
            # star-collapses identical strings, so hot blocks go through
            # BlockScorer (the same engine er_pairs' all-pairs path uses)
            return _score_blocks_all_pairs(
                sub, max_distance, algorithm, max_block_strings
            )
        return score_bucket_vectorized(
            sub, max_distance=max_distance, algorithm=algorithm,
            max_block_strings=max_block_strings,
        )

    delta = bucketed_apply(
        both, "block_key", score_affected, n_buckets=64, empty_result=_empty_edges()
    )
    merged = delta if base_pairs is None else base_pairs.union(delta)
    return bucketed_apply(
        merged,
        ["url_a", "url_b"],
        lambda df: df.groupby(["url_a", "url_b"], as_index=False)["distance"].min(),
        empty_result=_empty_edges(),
    )


# ----------------------------------------------------------------------
def er_pairs_decremental(
    old_source,
    removed_urls,
    base_pairs=None,
    max_distance: int = 2,
    algorithm: str = STANDARD,
    emit_all_pairs: bool = False,
    max_block_strings: int = 512,
):
    """Decremental update — the remove half of the reference's dynamic
    dictionary (DynamicDawg remove, /root/reference/src/dictionary/
    dynamic_dawg.rs; SURVEY.md §2.2) in batch form: deleting pages
    re-scores ONLY the blocks that lost a member.

    ``removed_urls`` (the small side — a deletion batch) is broadcast via
    ``ray.put``; inside each hash bucket, blocks containing at least one
    removed page are rescored over their REMAINING members, all other
    blocks are skipped.  ``base_pairs`` edges touching a removed url are
    dropped (every such edge came from an affected block); base edges
    between surviving urls stay — they are true distance-<=n pairs whose
    endpoints still co-block, so the merge is a SUPERSET of the
    from-scratch edge set over the remaining pages whose connected
    components are IDENTICAL (same argument as the incremental contract:
    extras are stale-representative aliases; pinned by tests).  With
    ``emit_all_pairs=True`` (``base_pairs`` must also be all-pairs) the
    merge EQUALS the from-scratch all-pairs edge set over the remaining
    pages exactly: removal never changes a survivor's block keys, so
    surviving base pairs ARE the from-scratch pairs and the rescored hot
    blocks only re-derive a subset of them — the SQL-oracle-checkable
    restatement the driver verifies."""
    import pandas as pd
    import pyarrow as pa

    import ray

    from .context import configure_data_context
    from ..stages.grouped import bucketed_apply
    from ..stages.scorer import _empty_edges, score_bucket_vectorized

    configure_data_context()
    rm_ref = ray.put(frozenset(removed_urls))

    ds = read_pages(old_source)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow")
    ds = ds.map_batches(blocking_keys_batch, batch_format="pyarrow")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        rm = ray.get(rm_ref)
        df = df.copy()
        df["__rm"] = df["url"].isin(rm)
        return df

    def score_affected(df: pd.DataFrame) -> pd.DataFrame:
        hot = df.loc[df["__rm"], "block_key"].unique()
        sub = df[df["block_key"].isin(set(hot)) & ~df["__rm"]].drop(columns="__rm")
        if not len(sub):
            return _empty_edges()
        if emit_all_pairs:
            return _score_blocks_all_pairs(
                sub, max_distance, algorithm, max_block_strings
            )
        return score_bucket_vectorized(
            sub, max_distance=max_distance, algorithm=algorithm,
            max_block_strings=max_block_strings,
        )

    delta = bucketed_apply(
        ds.map_batches(tag, batch_format="pandas"),
        "block_key", score_affected, n_buckets=64, empty_result=_empty_edges(),
    )

    if base_pairs is None:
        merged = delta
    else:
        def drop_removed(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            rm = pa.array(sorted(ray.get(rm_ref)), type=pa.string())
            keep = pc.and_(
                pc.invert(pc.is_in(t.column("url_a"), value_set=rm)),
                pc.invert(pc.is_in(t.column("url_b"), value_set=rm)),
            )
            return t.filter(keep)

        merged = base_pairs.map_batches(
            drop_removed, batch_format="pyarrow"
        ).union(delta)

    return bucketed_apply(
        merged,
        ["url_a", "url_b"],
        lambda df: df.groupby(["url_a", "url_b"], as_index=False)["distance"].min(),
        empty_result=_empty_edges(),
    )


# ----------------------------------------------------------------------
def evaluate_f1(clusters, labeled_pairs) -> dict:
    """Pairwise precision/recall/F1 of cluster co-membership against labeled
    within-entity pairs (FIXTURES.md §2; target >= 0.99).

    ``clusters``: Dataset/DataFrame (url, cluster_id);
    ``labeled_pairs``: DataFrame (url_a, url_b).  Predicted pairs are
    enumerated per cluster (clusters are small by construction — bounded
    block cardinality upstream)."""
    if hasattr(clusters, "to_pandas"):
        clusters = clusters.to_pandas()
    if hasattr(labeled_pairs, "to_pandas") and not isinstance(labeled_pairs, pd.DataFrame):
        labeled_pairs = labeled_pairs.to_pandas()

    pred = set()
    for _cid, g in clusters.groupby("cluster_id"):
        urls = sorted(g["url"])
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                pred.add((urls[i], urls[j]))

    truth = set(zip(labeled_pairs["url_a"], labeled_pairs["url_b"]))
    tp = len(pred & truth)
    precision = tp / len(pred) if pred else 1.0
    recall = tp / len(truth) if truth else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "predicted_pairs": len(pred),
        "true_pairs": len(truth),
        "tp": tp,
    }
