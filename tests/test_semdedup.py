"""SemDeDup-style semantic dedup (stages/similarity.py::semdedup).

Contract: partition embeddings by argmax dot against anchors, drop any
vector with a lower-id co-clustered neighbour at cosine >= threshold.
Pinned against an in-process brute-force reference; the kmeans-anchor
quality path is checked for internal consistency (its partition is
data-dependent, so exact keep sets may differ from random anchors).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from liblevenshtein_rust_ray.stages.similarity import (
    _normalize,
    semdedup,
    semdedup_anchors,
)


def _ref_semdedup(ids, mat, anchors, threshold):
    """O(n^2) reference: same drop rule, no clustering shortcuts."""
    order = np.argsort(ids)
    ids, mat = np.asarray(ids)[order], np.asarray(mat, dtype=np.float64)[order]
    assign = np.argmax(_normalize(mat) @ anchors.T, axis=1)
    matn = _normalize(mat)
    keep = np.ones(len(ids), dtype=bool)
    for j in range(len(ids)):
        for i in range(j):
            if assign[i] == assign[j] and matn[i] @ matn[j] >= threshold:
                keep[j] = False
                break
    return dict(zip(ids.tolist(), keep.tolist())), dict(
        zip(ids.tolist(), assign.tolist()))


def _mk_ds(ids, mat):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float32())),
    }))


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(99)
    base = rng.randn(40, 16)
    # planted near-dup pairs: rows 40-49 are jittered copies of rows 0-9
    dup = base[:10] + 0.01 * rng.randn(10, 16)
    mat = np.vstack([base, dup]).astype(np.float32)
    ids = np.arange(len(mat), dtype=np.int64)
    return ids, mat


@pytest.mark.parametrize("threshold", [0.999, 0.95, 0.6])
@pytest.mark.parametrize("n_clusters", [1, 4, 8])
def test_matches_bruteforce_reference(ray_session, corpus, threshold, n_clusters):
    ids, mat = corpus
    anchors = semdedup_anchors(mat.shape[1], n_clusters)
    ref_keep, ref_assign = _ref_semdedup(
        ids, np.asarray(mat, dtype=np.float64), anchors, threshold)
    out = semdedup(_mk_ds(ids, mat), n_clusters=n_clusters,
                   threshold=threshold).to_pandas()
    assert len(out) == len(ids)
    got = dict(zip(out["vec_id"], out["keep"]))
    got_assign = dict(zip(out["vec_id"], out["cluster_id"]))
    assert got == ref_keep
    assert got_assign == ref_assign


def test_exact_duplicates_collapse_to_min_id(ray_session):
    rng = np.random.RandomState(5)
    v = rng.randn(8).astype(np.float32)
    w = rng.randn(8).astype(np.float32)
    ids = [3, 7, 1, 9, 4]
    mat = [v, v, w, v, w]  # v-class: ids {3,7,9}; w-class: ids {1,4}
    out = semdedup(_mk_ds(ids, mat), n_clusters=1,
                   threshold=0.9999).to_pandas()
    keep = dict(zip(out["vec_id"], out["keep"]))
    assert keep[3] and not keep[7] and not keep[9]
    assert keep[1] and not keep[4]


def test_threshold_monotone(ray_session, corpus):
    ids, mat = corpus
    drops = []
    for tau in (0.99, 0.8, 0.5):
        out = semdedup(_mk_ds(ids, mat), n_clusters=4,
                       threshold=tau).to_pandas()
        drops.append(int((~out["keep"]).sum()))
    assert drops == sorted(drops)  # lower tau can only drop more


def test_kmeans_anchor_path(ray_session, corpus):
    ids, mat = corpus
    out = semdedup(_mk_ds(ids, mat), n_clusters=4, threshold=0.95,
                   anchors="kmeans", sample_size=32).to_pandas()
    assert len(out) == len(ids)
    assert set(out.columns) == {"vec_id", "cluster_id", "keep"}
    # the planted jittered copies (cos ~0.9999) must be dropped under any
    # partition: a copy and its source always co-cluster (argmax of nearly
    # identical vectors)
    dropped = set(out.loc[~out["keep"], "vec_id"])
    assert set(range(40, 50)) <= dropped


def test_bad_anchor_mode_raises(ray_session, corpus):
    ids, mat = corpus
    with pytest.raises(ValueError, match="anchors"):
        semdedup(_mk_ds(ids, mat), anchors="nope")


def test_cli_run_semdedup(tmp_path, capsys, ray_session):
    import json

    import pyarrow.parquet as pq

    from liblevenshtein_rust_ray.cli import main

    rng = np.random.RandomState(3)
    v = rng.randn(8).astype(np.float32)
    mat = np.vstack([rng.randn(6, 8).astype(np.float32), v, v])
    src = tmp_path / "emb"
    src.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(8), type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in mat],
                              type=pa.list_(pa.float32())),
    }), str(src / "e.parquet"))
    out = tmp_path / "kept"
    rc = main(["run-semdedup", "--input", str(src), "--output", str(out),
               "--n-clusters", "2", "--threshold", "0.9999"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload == {"vectors": 8, "kept": 7, "dropped": 1,
                       "output": str(out)}
    got = pq.read_table(str(out)).to_pandas()
    assert not got.loc[got["vec_id"] == 7, "keep"].item()


def test_tfidf_top_terms(ray_session):
    """TF-IDF pinned against a tiny hand-checkable corpus."""
    import math

    from liblevenshtein_rust_ray.stages.textstats import tfidf_top_terms

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": ["cat dog cat", "dog mouse", ""],
    })
    out = tfidf_top_terms(rd.from_arrow(docs), k=2).to_pandas()
    got = {(r.doc_id, r.token): (r.tf, r.df, round(r.tfidf, 9), r["rank"])
           for _, r in out.iterrows()}
    ln = math.log
    # doc 0: cat tf=2 df=1 -> 2*ln(3); dog tf=1 df=2 -> ln(1.5)
    assert got[(0, "cat")] == (2, 1, round(2 * ln(3.0), 9), 1)
    assert got[(0, "dog")] == (1, 2, round(ln(3.0 / 2), 9), 2)
    # doc 1: mouse tf=1 df=1 -> ln(3) beats dog ln(1.5)
    assert got[(1, "mouse")] == (1, 1, round(ln(3.0), 9), 1)
    assert got[(1, "dog")] == (1, 2, round(ln(3.0 / 2), 9), 2)
    # doc 2 empty: no rows
    assert not any(d == 2 for d, _ in got)
    assert len(got) == 4


def test_tfidf_broadcast_df_parity(ray_session):
    """mode='broadcast_df' (partial-df combiner + ray.put lookup + local
    top-k, zero doc-keyed exchange) is bit-identical to the exchange
    mode, string and int id columns both."""
    import pandas as pd

    from liblevenshtein_rust_ray.stages.textstats import tfidf_top_terms

    for ids, typ in [([0, 1, 2, 3], pa.int64()),
                     (["u0", "u1", "u2", "u3"], pa.string())]:
        docs = pa.table({
            "doc_id": pa.array(ids, type=typ),
            "text": ["cat dog cat", "dog mouse", "", "the cat the mouse x"],
        })
        a = tfidf_top_terms(rd.from_arrow(docs), k=3,
                            mode="exchange").to_pandas()
        b = tfidf_top_terms(rd.from_arrow(docs), k=3,
                            mode="broadcast_df").to_pandas()
        key = ["doc_id", "token"]
        a = a.sort_values(key).reset_index(drop=True)[sorted(a.columns)]
        b = b.sort_values(key).reset_index(drop=True)[sorted(b.columns)]
        pd.testing.assert_frame_equal(a, b)


def test_tfidf_auto_mode(ray_session):
    """mode='auto' (the default) picks broadcast_df when the vocab fits,
    falls back to the exchange plan when it doesn't — same rows both ways."""
    import pandas as pd

    from liblevenshtein_rust_ray.stages.textstats import tfidf_top_terms

    docs = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": ["cat dog cat", "dog mouse x"],
    })
    a = tfidf_top_terms(rd.from_arrow(docs), k=3).to_pandas()
    assert tfidf_top_terms.last_mode == "broadcast_df"
    b = tfidf_top_terms(rd.from_arrow(docs), k=3,
                        max_vocab_driver=2).to_pandas()
    assert tfidf_top_terms.last_mode == "exchange"
    key = ["doc_id", "token"]
    a = a.sort_values(key).reset_index(drop=True)[sorted(a.columns)]
    b = b.sort_values(key).reset_index(drop=True)[sorted(b.columns)]
    pd.testing.assert_frame_equal(a, b)


def test_tfidf_broadcast_df_vocab_guard(ray_session):
    """max_vocab_driver exceeded -> loud error naming the fallback."""
    import pytest

    from liblevenshtein_rust_ray.stages.textstats import tfidf_top_terms

    docs = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": ["a b c d e f g h"],
    })
    with pytest.raises(ValueError, match="exchange"):
        tfidf_top_terms(rd.from_arrow(docs), mode="broadcast_df",
                        max_vocab_driver=3)


def test_chunk_documents(ray_session):
    from liblevenshtein_rust_ray.stages.textstats import chunk_documents

    docs = pa.table({
        "doc_id": pa.array([7, 8, 9], type=pa.int64()),
        "text": ["A b, c D e", "", "x  y"],
    })
    out = chunk_documents(rd.from_arrow(docs), max_tokens=2).to_pandas()
    got = {(r.doc_id, r.chunk_id): (r.text, r.n_tokens)
           for _, r in out.iterrows()}
    assert got == {
        (7, 0): ("a b", 2), (7, 1): ("c d", 2), (7, 2): ("e", 1),
        (9, 0): ("x y", 2),
    }


from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="ab c1.", min_size=0, max_size=40),
                min_size=1, max_size=8),
       st.integers(min_value=1, max_value=5))
def test_chunk_documents_property(ray_session, texts, k):
    """Chunks reassemble to the doc's token stream; sizes <= k with only
    the last chunk short; chunk ids dense from 0."""
    import re

    from liblevenshtein_rust_ray.stages.textstats import chunk_documents

    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    out = chunk_documents(rd.from_arrow(docs), max_tokens=k).to_pandas()
    if not len(out):
        assert all(not re.findall(r"[a-z0-9]+", t.lower()) for t in texts)
        return
    for d, text in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", text.lower())
        sub = out[out["doc_id"] == d].sort_values("chunk_id")
        assert sub["chunk_id"].tolist() == list(range(len(sub)))
        joined = " ".join(sub["text"])
        assert joined.split() == toks
        sizes = sub["n_tokens"].tolist()
        assert all(s == k for s in sizes[:-1])
        if sizes:
            assert 1 <= sizes[-1] <= k
            assert sizes == [len(c.split()) for c in sub["text"]]
        else:
            assert not toks


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="xy z2,", min_size=0, max_size=30),
                min_size=1, max_size=6),
       st.integers(min_value=1, max_value=4))
def test_tfidf_property(ray_session, texts, k):
    """tfidf rows match a pure-pandas reference computation."""
    import math
    import re

    from liblevenshtein_rust_ray.stages.textstats import tfidf_top_terms

    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    out = tfidf_top_terms(rd.from_arrow(docs), k=k).to_pandas()
    # reference
    n = len(texts)
    tf = {}
    for d, text in enumerate(texts):
        for tok in re.findall(r"[a-z0-9]+", text.lower()):
            tf[(d, tok)] = tf.get((d, tok), 0) + 1
    df = {}
    for (_, tok) in tf:
        df[tok] = df.get(tok, 0) + 1
    scored = [(d, tok, c, df[tok], c * math.log(n / df[tok]))
              for (d, tok), c in tf.items()]
    expect = {}
    for d in range(n):
        rows = sorted((r for r in scored if r[0] == d),
                      key=lambda r: (-r[4], r[1]))[:k]
        for rank, r in enumerate(rows, 1):
            expect[(d, r[1])] = (r[2], r[3], round(r[4], 9), rank)
    got = {(r.doc_id, r.token): (r.tf, r.df, round(r.tfidf, 9), r["rank"])
           for _, r in out.iterrows()}
    assert got == expect
