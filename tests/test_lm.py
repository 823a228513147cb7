"""Hashed-bigram LM perplexity scoring (stages/lm.py)."""

import math
import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from liblevenshtein_rust_ray.functions.simhash import md5_hash64
from liblevenshtein_rust_ray.stages.lm import lm_filter, lm_score

B1, B2, ALPHA = 256, 4096, 1.0

CORPUS = ["the cat sat on the mat", "dog mouse dog mouse", "",
          "the the the", "zebra", "cat on mat the cat sat"]
TRAIN = ["the cat sat", "the mat", "cat on the mat"]


def _toks(x):
    return [t for t in re.split(r"[^a-z0-9]+", (x or "").lower()) if t]


def _ref_scores(corpus, train):
    c1 = np.zeros(B1, dtype=np.int64)
    c2 = np.zeros(B2, dtype=np.int64)
    cc = np.zeros(B1, dtype=np.int64)
    M = 1 << 20
    for x in train:
        tt = _toks(x)
        for w in tt:
            c1[md5_hash64(w) % B1] += 1
        for v, w in zip(tt, tt[1:]):
            c2[((md5_hash64(v) % M) * M + md5_hash64(w) % M) % B2] += 1
            cc[md5_hash64(v) % B1] += 1
    t1 = int(c1.sum())

    def p1(w):
        return (c1[md5_hash64(w) % B1] + 1.0) / (t1 + B1)

    out = []
    for x in corpus:
        tt = _toks(x)
        if not tt:
            out.append((0, 0.0, 1.0))
            continue
        lp = math.log(p1(tt[0]))
        for v, w in zip(tt, tt[1:]):
            g = ((md5_hash64(v) % M) * M + md5_hash64(w) % M) % B2
            num = c2[g] + ALPHA * p1(w)
            den = cc[md5_hash64(v) % B1] + ALPHA
            lp += math.log(num / den)
        out.append((len(tt), lp, math.exp(-lp / len(tt))))
    return out


def test_lm_score_matches_reference(ray_session):
    docs = pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": CORPUS,
    })
    out = (lm_score(rd.from_arrow(docs), TRAIN, b1=B1, b2=B2, alpha=ALPHA)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ref = _ref_scores(CORPUS, TRAIN)
    import numpy as np

    for i, (n, lp, ppl) in enumerate(ref):
        assert out.loc[i, "n_tokens"] == n
        # engine output is 4dp-quantized (lm_score contract)
        assert out.loc[i, "logp"] == pytest.approx(np.round(lp, 4),
                                                   abs=1e-9)
        assert out.loc[i, "ppl"] == pytest.approx(np.round(ppl, 4),
                                                  abs=1e-9)
    # train-lookalike text scores lower perplexity than off-domain text
    assert out.loc[0, "ppl"] < out.loc[1, "ppl"]


def test_lm_train_dataset_equals_iterable(ray_session):
    docs = pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": CORPUS,
    })
    tr_ds = rd.from_arrow(pa.table({"text": TRAIN}))
    a = (lm_score(rd.from_arrow(docs), TRAIN, b1=B1, b2=B2)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (lm_score(rd.from_arrow(docs), tr_ds, b1=B1, b2=B2)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(a["logp"]) == list(b["logp"])
    assert list(a["ppl"]) == list(b["ppl"])


def test_lm_filter_is_threshold(ray_session):
    docs = pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": CORPUS,
        "extra": [f"e{i}" for i in range(len(CORPUS))],
    })
    scores = (lm_score(rd.from_arrow(docs), TRAIN, b1=B1, b2=B2)
              .to_pandas().set_index("doc_id")["ppl"])
    thr = float(scores.median())
    kept = lm_filter(rd.from_arrow(docs), TRAIN, max_ppl=thr,
                     b1=B1, b2=B2).to_pandas()
    assert set(kept["doc_id"]) == set(scores[scores <= thr].index)
    assert list(kept.columns) == ["doc_id", "text", "extra"]


def test_run_lm_cli(ray_session, tmp_path, capsys):
    import json

    import pyarrow.parquet as pq

    from liblevenshtein_rust_ray.cli import main

    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": CORPUS,
    }), str(src / "d.parquet"))
    tr = tmp_path / "train"
    tr.mkdir()
    pq.write_table(pa.table({"text": TRAIN}), str(tr / "t.parquet"))
    out = tmp_path / "kept"
    ref = _ref_scores(CORPUS, TRAIN)
    thr = sorted(p for _, _, p in ref)[len(ref) // 2]
    rc = main(["run-lm", "--input", str(src), "--train", str(tr),
               "--output", str(out), "--max-ppl", str(thr)])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["docs"] == len(CORPUS)
    # NB: CLI uses default b1/b2 buckets, so compare against the same
    # model at defaults, not the tiny-bucket _ref model
    w = lm_score(
        rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
            "text": CORPUS})),
        TRAIN).to_pandas()
    assert payload["kept"] == int((w["ppl"] <= thr).sum())


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="ab c1.!", min_size=0, max_size=30),
                min_size=1, max_size=10))
def test_lm_score_property(ray_session, texts):
    """lm_score == the pure-Python reference on random corpora
    (train = first half, never empty)."""
    train = texts[: max(1, len(texts) // 2)]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": texts,
    })
    out = (lm_score(rd.from_arrow(docs), train, b1=B1, b2=B2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    import numpy as np

    for i, (n, lp, ppl) in enumerate(_ref_scores(texts, train)):
        assert out.loc[i, "n_tokens"] == n
        assert out.loc[i, "logp"] == pytest.approx(np.round(lp, 4),
                                                   abs=1e-9)
        assert out.loc[i, "ppl"] == pytest.approx(np.round(ppl, 4),
                                                  abs=1e-9)


def test_lm_score_block_order_independent(ray_session):
    """Per-doc logp/ppl must not depend on how docs are batched or
    ordered — each doc's sum runs in its own token order (the
    quantization contract in lm_score's docstring)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.lm import lm_score

    texts = [f"alpha beta gamma doc{i} alpha beta common words here"
             for i in range(40)]
    tbl = pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                    "text": pa.array(texts)})
    train = ["alpha beta gamma common", "beta common words"]

    a = (lm_score(rd.from_arrow(tbl), train, "text", "doc_id",
                  b1=512, b2=4096).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    # reversed row order, different block split
    rev = tbl.take(pa.array(list(range(39, -1, -1))))
    ds_rev = rd.from_arrow_refs(
        [__import__("ray").put(rev.slice(0, 7)),
         __import__("ray").put(rev.slice(7, 13)),
         __import__("ray").put(rev.slice(20, 20))])
    b = (lm_score(ds_rev, train, "text", "doc_id",
                  b1=512, b2=4096).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # outputs are 4dp-quantized
    assert (a["logp"] == a["logp"].round(4)).all()
    assert (a["ppl"] == a["ppl"].round(4)).all()


def test_dsir_logw_quantized(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.selection import (
        PredicateTarget, dsir_weights)

    tbl = pa.table({"doc_id": pa.array(range(30), type=pa.int64()),
                    "text": pa.array([f"tok{i % 7} shared words tok{i % 3}"
                                      for i in range(30)])})
    target = PredicateTarget(
        lambda t: t.column("doc_id").to_numpy(zero_copy_only=False) % 5 == 0)
    out = dsir_weights(rd.from_arrow(tbl), target, "text", "doc_id",
                       n_buckets=256).to_pandas()
    assert (out["logw"] == out["logw"].round(4)).all()
