#!/usr/bin/env python
"""Benchmark harness.

Headline: the flagship ER pipeline (pages -> blocking -> automaton scoring ->
clusters) on the deterministic synthetic corpus matched to $GRAFT_SF_DIR's
scale, plus representative operator pipelines over the $GRAFT_SF_DIR tables.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "pages": N, "pages_per_sec": ..., "candidate_pairs": N}

``--scaling`` runs the headline pipeline in two fresh processes
(num_cpus=8 and num_cpus=32) on the same input and reports both throughputs
plus scaling efficiency (the N -> 4N cluster-size proxy for this sandbox).
"""

import json
import os
import subprocess
import sys
import time

# Before ray.init so the raylet (and thus every worker) inherits it: numpy's
# MADV_HUGEPAGE on >=4 MiB buffers triggers synchronous THP compaction under
# defrag=madvise kernels — measured 1.1 s vs 1.2-29 s CPU for the identical
# scorer call (see liblevenshtein_rust_ray.__init__).
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf() -> float:
    import re

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    from liblevenshtein_rust_ray.pipelines.context import configure_data_context

    configure_data_context()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as em

    from liblevenshtein_rust_ray.pipelines.entity_resolution import er_pairs, er_clusters

    sf = _sf()
    pages_path = em._pages_path(SF_DIR)  # generates/caches the corpus

    # warm the page cache AND the worker pool (process startup + library
    # imports in each worker are one-time session costs, not steady-state
    # throughput): run the full pipeline over a tiny slice first
    warm = rd.read_parquet(pages_path).count()
    er_pairs(
        rd.read_parquet(pages_path).limit(4096).repartition(NUM_CPUS * 2)
    ).count()

    timings: dict[str, float] = {}

    # headline: full ER pipeline.  The host's residual noise is BIMODAL —
    # quiet runs vs page-cache-reclaim/fault-storm runs, measured 25s vs
    # 75-110s for identical code at sf0.5 — AND a long-lived session can
    # land entirely in a slow window (r03's artifact read 8.8s for code
    # whose fresh-process twin read 4.8s in the same artifact).  So the
    # headline is measured the way the scaling block always has been:
    # min over N FRESH child processes (LLRR_HEADLINE_ONLY), each with
    # its own ray session — the steady-state number a quiet cluster
    # delivers, robust to any one session's window (r03 VERDICT task 1).
    from liblevenshtein_rust_ray.stages.cluster import connected_components

    reps = int(os.environ.get("LLRR_HEADLINE_REPS", "3"))
    if not os.environ.get("LLRR_HEADLINE_ONLY"):
        # parent session: one in-session pass only (window evidence for
        # er_runs + the pairs dataset for --stats); the headline itself
        # comes from the fresh children below
        reps = 1
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        pairs = er_pairs(pages_path).materialize()
        n_pairs = pairs.count()
        t_pairs = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_clustered = connected_components(pairs).count()
        t_cc = time.perf_counter() - t0
        runs.append((t_pairs, t_cc))
    best = min(runs, key=lambda r: r[0] + r[1])
    timings["er_pairs"] = round(best[0], 3)
    timings["er_cluster"] = round(best[1], 3)
    timings["er_runs"] = [round(a + b, 2) for a, b in runs]
    headline = timings["er_pairs"] + timings["er_cluster"]

    if os.environ.get("LLRR_HEADLINE_ONLY"):
        # headline/scaling children: one fresh-session measurement
        result = {
            "metric": "er_pipeline_sec", "value": round(headline, 3),
            "unit": "sec", "queries": timings, "sf": sf,
            "num_cpus": NUM_CPUS, "pages": warm,
            "pages_per_sec": round(warm / headline, 1) if headline else None,
            "candidate_pairs": n_pairs, "clustered_urls": n_clustered,
        }
        ray.shutdown()
        print(json.dumps(result))
        return

    # fresh-process headline: 3 children x 1 in-session rep each; min.
    # The in-session numbers above stay in er_runs (session-window
    # evidence); the fresh-child spread is recorded alongside.
    try:
        kids = [_headline_child(NUM_CPUS) for _ in range(3)]
        bestk = min(kids, key=lambda r: r["value"])
        timings["er_pairs"] = bestk["queries"]["er_pairs"]
        timings["er_cluster"] = bestk["queries"]["er_cluster"]
        timings["er_runs_fresh"] = [round(k["value"], 2) for k in kids]
        headline = bestk["value"]
        n_pairs = bestk["candidate_pairs"]
        n_clustered = bestk["clustered_urls"]
    except Exception as e:  # noqa: BLE001 — fall back to in-session number
        timings["headline_child_error"] = f"{type(e).__name__}: {e}"

    # operator pipelines over the provided tables — best of 2 for the same
    # host-noise reason as the headline
    qs = em.queries()
    for name in ["q1", "word_freq", "fuzzy_selfjoin_part", "ann_cosine_topk",
                 "ann_lsh_topk", "minhash_neardup_docs", "token_stats",
                 "curate_docs", "semdedup_embeddings", "tfidf_docs",
                 "dsir_weights_docs", "lm_ppl_docs", "pack_docs",
                 "bpe_merges_docs", "neardup_canonical_docs",
                 "er_clusters_scaled"]:
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = qs[name](SF_DIR)
            if hasattr(out, "count"):
                out.count()
            reps.append(time.perf_counter() - t0)
        timings[name] = round(min(reps), 3)

    # crawl-ingest stage over the headline corpus: URL canonicalization +
    # newest-snapshot dedup of the synthesized messy variants (~1.43 rows
    # per page).  input_blocks=2/CPU — tiny-block task overhead dominates
    # otherwise (14.0 -> 2.8 s at sf0.1/32 CPUs)
    from liblevenshtein_rust_ray.stages.urls import (
        messy_crawl_variants, url_snapshot_dedup)

    reps = []
    for _ in range(2):
        t0 = time.perf_counter()
        url_snapshot_dedup(
            messy_crawl_variants(
                rd.read_parquet(pages_path, columns=["url", "warc_ts"])),
            url_col="crawl_url", ts_col="ts", input_blocks=NUM_CPUS * 2,
        ).count()
        reps.append(time.perf_counter() - t0)
    timings["url_dedup"] = round(min(reps), 3)

    # dictionary-backend micro point vs BASELINE.md's reference numbers:
    # ArrayTrie over the reference's real 124k-word dictionary (single
    # process — comparable to the criterion single-thread table)
    from liblevenshtein_rust_ray.kernel.arraytrie import ArrayTrie, batched_query
    from liblevenshtein_rust_ray.pipelines.spelling import load_dictionary_words

    words = load_dictionary_words()
    t0 = time.perf_counter()
    trie = ArrayTrie.from_terms(words, presorted=True)
    timings["dict_build_124k"] = round(time.perf_counter() - t0, 3)
    probe = ["recieve", "acomodate", "definately", "seperate", "occured"] * 4
    batched_query(trie, "warmup", 2)
    t0 = time.perf_counter()
    for q in probe:
        batched_query(trie, q, 2)
    timings["dict_query_d2_ms"] = round((time.perf_counter() - t0) / len(probe) * 1000, 3)

    if "--stats" in sys.argv:
        # per-operator execution stats for the headline pipeline (the
        # ds.stats() review loop) — stderr so stdout stays one JSON line
        print(pairs.stats(), file=sys.stderr)

    result = {
        "metric": "er_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "pages": warm,
        "pages_per_sec": round(warm / headline, 1) if headline else None,
        "candidate_pairs": n_pairs,
        "clustered_urls": n_clustered,
    }
    ray.shutdown()
    # two-parallelism scaling evidence IN the driver artifact (round-2
    # VERDICT task 8): fresh 8-CPU and 32-CPU child processes re-run the
    # headline on the same input after the parent session is gone
    if not os.environ.get("LLRR_SKIP_SCALING"):
        try:
            result["scaling"] = _scaling_block()
        except Exception as e:  # noqa: BLE001 — bench must still emit
            result["scaling"] = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(result))


def _headline_child(ncpu: int, reps: int = 1) -> dict:
    """One fresh-process headline measurement (own ray session)."""
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), LLRR_HEADLINE_ONLY="1",
               LLRR_SKIP_SCALING="1", LLRR_HEADLINE_REPS=str(reps))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def _scaling_block() -> dict:
    def run_once(ncpu: int) -> dict:
        return _headline_child(ncpu, reps=3)

    def run(ncpu: int) -> dict:
        # two fresh processes per size, min headline: the residual host
        # noise is bimodal (page-cache-reclaim fault storms), so a single
        # session can land entirely in a slow window; the minimum over
        # sessions x best-of-3-in-session is the steady-state number.
        # Symmetric across sizes, so the ratio stays a fair comparison.
        a, b = run_once(ncpu), run_once(ncpu)
        return a if a["value"] <= b["value"] else b

    lo, hi = run(8), run(32)
    thr_lo = lo["pages"] / lo["value"]
    thr_hi = hi["pages"] / hi["value"]
    eff = (thr_hi / thr_lo) / (32 / 8)
    return {
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "pages_per_sec_8": round(thr_lo, 1),
        "pages_per_sec_32": round(thr_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
    }


def scaling() -> None:
    print(json.dumps(_scaling_block()))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
