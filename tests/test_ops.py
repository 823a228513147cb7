"""Targeted tests for dedup / similarity / multimodal operators."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup():
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.dedup import exact_dedup

    ds = rd.from_items(
        [
            {"id": 3, "text": "aaa"},
            {"id": 1, "text": "aaa"},
            {"id": 2, "text": "bbb"},
        ]
    )
    out = exact_dedup(ds, "text", "id").to_pandas().sort_values("id")
    assert out["id"].tolist() == [1, 2]  # min id kept per distinct text


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_finds_near_duplicates():
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base.replace("lazy", "sleepy")
    far = "completely unrelated text about database systems and queries " * 3
    ds = rd.from_items(
        [{"doc_id": 1, "text": base}, {"doc_id": 2, "text": near}, {"doc_id": 3, "text": far}]
    )
    out = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


@pytest.mark.usefixtures("ray_session")
def test_simhash_pairs_near_duplicates():
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.dedup import simhash_pairs

    base = "the quick brown fox jumps over the lazy dog " * 4
    near = base[:-10] + " dog today"
    ds = rd.from_items(
        [{"doc_id": 1, "text": base}, {"doc_id": 2, "text": near},
         {"doc_id": 3, "text": "zzz completely different material qqq " * 4}]
    )
    out = simhash_pairs(ds, "text", "doc_id", max_hamming=10).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (1, 2) in pairs


@pytest.mark.usefixtures("ray_session")
def test_ann_brute_topk_exact():
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.similarity import ann_brute_topk

    rng = np.random.RandomState(0)
    mat = rng.randn(200, 8).astype(np.float64)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(200)]
    )
    queries = {"ids": np.array([0, 1], dtype=np.int64), "matrix": mat[:2]}
    out = ann_brute_topk(ds, queries, k=3).to_pandas()

    # oracle: full cosine matrix
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qi in (0, 1):
        sims = norm @ norm[qi]
        order = np.lexsort((np.arange(200), -sims))[:3]
        got = out[out["query_id"] == qi].sort_values("rank")["match_id"].tolist()
        assert got == order.tolist()
        assert got[0] == qi  # self is rank 1


@pytest.mark.usefixtures("ray_session")
def test_ann_lsh_recall():
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.similarity import ann_brute_topk, ann_lsh_topk

    rng = np.random.RandomState(1)
    mat = rng.randn(300, 16).astype(np.float64)
    # plant 4 true near neighbors of vector 5 (high cosine) among the noise
    for j, nid in enumerate([100, 101, 102, 103]):
        mat[nid] = mat[5] + 0.05 * rng.randn(16)
    ds = rd.from_items([{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)])
    queries = {"ids": np.array([5], dtype=np.int64), "matrix": mat[5:6]}
    exact = ann_brute_topk(ds, queries, k=5).to_pandas()["match_id"].tolist()
    approx = ann_lsh_topk(ds, queries, k=5, n_planes=6, probe_hamming=2).to_pandas()[
        "match_id"
    ].tolist()
    assert set(exact) == {5, 100, 101, 102, 103}
    # the pruned variant recovers the planted neighbors (they share the
    # query's sign-bucket up to small hamming)
    assert 5 in approx
    assert len(set(exact) & set(approx)) >= 4


@pytest.mark.usefixtures("ray_session")
def test_multimodal_stub_plumbing():
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.multimodal import multimodal_features, DecodeStub

    ds = rd.from_items(
        [{"name": "a", "payload": b"\x89PNG fake bytes"}, {"name": "b", "payload": b""}]
    )
    out = multimodal_features(ds).to_pandas()
    assert list(out.columns) == ["name", "payload_bytes", "features"]
    assert out["payload_bytes"].tolist() == [15, 0]
    assert all(len(f) == DecodeStub.FEATURE_DIM for f in out["features"])
    # deterministic features from payload bytes
    out2 = multimodal_features(ds).to_pandas()
    assert [list(x) for x in out["features"]] == [list(x) for x in out2["features"]]
    # the real-decode path is explicitly stubbed
    with pytest.raises(NotImplementedError):
        DecodeStub(fake=False)._decode(b"x")


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_join_two_sided():
    import ray.data as rd

    from liblevenshtein_rust_ray.pipelines.fuzzy import fuzzy_join

    left = rd.from_items([{"q": "scan"}, {"q": "merge"}, {"q": "zzz"}])
    right = rd.from_items([{"t": "span"}, {"t": "scan"}, {"t": "merge"}, {"t": "merges"}])
    out = fuzzy_join(left, right, "q", "t", n=1).to_pandas()
    got = {(a, b): d for a, b, d in zip(out["left_val"], out["right_val"], out["distance"])}
    assert got == {
        ("scan", "scan"): 0,
        ("scan", "span"): 1,
        ("merge", "merge"): 0,
        ("merge", "merges"): 1,
    }


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_self_join_arraytrie_engine_parity():
    """engine="arraytrie" (CSR-trie automaton walk) must emit exactly the
    pairs the default vectorized engine does, per algorithm."""
    import ray.data as rd

    from liblevenshtein_rust_ray.pipelines.fuzzy import fuzzy_self_join

    vocab = [
        "scan", "span", "spam", "scant", "merge", "merges", "mere",
        "liter", "litre", "tiler", "ab", "ba", "abc", "cab", "x",
        "receive", "recieve", "sépar", "separ",
    ]
    ds = rd.from_items([{"w": w} for w in vocab])
    for algo in ("standard", "transposition"):
        base = fuzzy_self_join(ds, "w", n=2, algorithm=algo).to_pandas()
        at = fuzzy_self_join(ds, "w", n=2, algorithm=algo,
                             engine="arraytrie").to_pandas()
        key = lambda df: sorted(map(tuple, df[["val_a", "val_b", "distance"]]
                                    .itertuples(index=False)))
        assert key(base) == key(at), algo


def test_multimodal_actor_pool(ray_session):
    """concurrency engages the actor-pool form of the decode stage; output
    identical to the task form."""
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.multimodal import multimodal_features

    rows = [{"url": f"u{i}", "payload": bytes([i] * (i + 1))} for i in range(40)]
    a = multimodal_features(rd.from_items(rows)).to_pandas().sort_values("url")
    b = (
        multimodal_features(rd.from_items(rows), concurrency=2)
        .to_pandas()
        .sort_values("url")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_curate_documents_semantics():
    """Handcrafted corpus: short doc and non-English filtered, exact dup
    keeps min id, near-dup drops the greater id of the candidate pair."""
    import ray.data as rd

    from liblevenshtein_rust_ray.pipelines.curation import curate_documents

    base = ("the quick brown fox jumps over the lazy dog and then the "
            "dog walks away to the house and sleeps for the day")
    near = base + " extra"
    docs = [
        {"doc_id": 1, "text": base},                  # keep (rep of near-dups)
        {"doc_id": 2, "text": base},                  # exact dup -> dropped
        {"doc_id": 3, "text": near},                  # near dup -> dropped
        {"doc_id": 4, "text": "short text"},          # < min_tokens
        {"doc_id": 5, "text": "der hund läuft durch die stadt und der "
                              "mann ist mit dem hund in das haus gegangen "
                              "und sie sind dann die strasse entlang"},  # de
        {"doc_id": 6, "text": "a completely different english document "
                              "about the weather in the mountains where "
                              "the rain falls on the green valley below"},
    ]
    out = curate_documents(rd.from_items(docs)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 6]
    assert dict(zip(out["doc_id"], out["n_tokens"]))[1] == len(base.split())

    # The broadcast anti-join (default: drop set fits the object store)
    # and the bucketed-exchange fallback must agree row for row.
    shuf = (curate_documents(rd.from_items(docs), max_broadcast_drops=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    bcast = out.sort_values("doc_id").reset_index(drop=True)
    assert bcast.equals(shuf)
