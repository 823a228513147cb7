"""Tests for round-2 operators: corpus sources, dictionary serialization,
exact n-gram Jaccard, embedding near-dup (exact + LSH), scoped completion."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ----------------------------------------------------------------------
def test_bigtxt_reader(tmp_path, ray_session):
    p = tmp_path / "big.txt"
    p.write_text("The quick brown fox. The fox!\nquick quick")
    from liblevenshtein_rust_ray.sources.corpus import read_bigtxt

    got = {r["token"]: r["freq"] for r in read_bigtxt(str(p)).take_all()}
    assert got == {"the": 2, "quick": 3, "brown": 1, "fox": 2}


def test_mitton_reader(tmp_path, ray_session):
    p = tmp_path / "mitton.dat"
    p.write_text("$receive\nrecieve 3\nreceeve\n$separate\nseperate 12\n")
    from liblevenshtein_rust_ray.sources.corpus import read_mitton

    rows = sorted(
        (r["correct"], r["misspelling"], r["freq"])
        for r in read_mitton(str(p)).take_all()
    )
    assert rows == [
        ("receive", "receeve", 1),
        ("receive", "recieve", 3),
        ("separate", "seperate", 12),
    ]


# ----------------------------------------------------------------------
def test_dictionary_parquet_roundtrip(tmp_path):
    from liblevenshtein_rust_ray.kernel import build_trie
    from liblevenshtein_rust_ray.state.dictionary_io import (
        read_dictionary,
        write_dictionary,
    )

    terms = ["apple", "apply", "banana", "band", "éclair"]
    path = str(tmp_path / "dict.parquet")
    write_dictionary(build_trie(terms), path)
    for backend in ("dawg", "trie"):
        d = read_dictionary(path, backend)
        assert sorted(d.iter_terms()) == sorted(terms)
        assert "apple" in d and "nope" not in d


# ----------------------------------------------------------------------
def test_ngram_jaccard_exact(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.functions.tokenize import shingles, tokenize
    from liblevenshtein_rust_ray.stages.dedup import ngram_jaccard_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox leaps over the lazy dog",
        "completely different text with other words entirely here",
        "the quick brown fox jumps over the lazy dog",  # identical to 0
    ]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    got = ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.3).to_pandas()
    got = {(a, b): round(j, 6) for a, b, j in got.itertuples(index=False)}

    want = {}
    sets = [set(shingles(tokenize(t), 3)) for t in texts]
    for i in range(4):
        for j in range(i + 1, 4):
            u = len(sets[i] | sets[j])
            jac = len(sets[i] & sets[j]) / u if u else 1.0
            if jac >= 0.3:
                want[(i, j)] = round(jac, 6)
    assert got == want and (0, 3) in got and got[(0, 3)] == 1.0


# ----------------------------------------------------------------------
def _clustered_vectors(n_clusters=20, per=5, dim=32, noise=0.05, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(n_clusters):
        for k in range(per):
            v = centers[c] + noise * rng.standard_normal(dim)
            rows.append({"vec_id": c * per + k, "embedding": v.tolist()})
    return rows


def test_embedding_neardup_exact_and_lsh(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.dedup import embedding_neardup_pairs

    rows = _clustered_vectors()
    ds = rd.from_items(rows)
    exact = embedding_neardup_pairs(ds, "embedding", "vec_id", threshold=0.9,
                                    method="exact").to_pandas()
    # brute-force check
    m = np.array([r["embedding"] for r in rows])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    ii, jj = np.nonzero(np.triu(sims >= 0.9, 1))
    want = set(zip(ii.tolist(), jj.tolist()))
    got = set(zip(exact["id_a"], exact["id_b"]))
    assert got == want and len(want) > 100  # clusters of 5 -> >= 10 pairs each

    lsh = embedding_neardup_pairs(ds, "embedding", "vec_id", threshold=0.9,
                                  method="lsh").to_pandas()
    got_lsh = set(zip(lsh["id_a"], lsh["id_b"]))
    assert got_lsh <= want  # no false positives (exact verify in-bucket)
    assert len(got_lsh & want) / len(want) >= 0.95  # amplified recall


# ----------------------------------------------------------------------
def test_scoped_completion_visibility(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.pipelines.scoped import scoped_fuzzy_complete

    # root -> m1 -> {b1, b2}; terms at every level
    tree = {"b1": "m1", "b2": "m1", "m1": None}
    terms = [
        ("m1", "alpha common"),
        ("b1", "alpha one"),
        ("b2", "alpha two"),
        ("b2", "beta two"),
    ]
    ds = rd.from_items([{"scope": s, "term": t} for s, t in terms])
    out = scoped_fuzzy_complete(ds, tree, prefix_len=4, n=0).to_pandas()
    vis = out.groupby("scope")["term"].apply(set).to_dict()
    # b1 sees its own + the ancestor's terms, not the sibling's
    assert vis["b1"] == {"alpha common", "alpha one"}
    assert vis["b2"] == {"alpha common", "alpha two", "beta two"}
    assert vis["m1"] == {"alpha common"}
    # prefix filtering: 'beta' prefix only matches in b2
    beta = out[out["prefix"] == "beta"]
    assert set(beta["scope"]) == {"b2"} and set(beta["term"]) == {"beta two"}
    assert (out["distance"] == 0).all()
