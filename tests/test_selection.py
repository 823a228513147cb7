"""DSIR importance-weighted selection (stages/selection.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from liblevenshtein_rust_ray.functions.simhash import md5_hash64
from liblevenshtein_rust_ray.stages.selection import dsir_select, dsir_weights

B = 64
ALPHA = 1.0


def _ref_weights(corpus, target):
    """Pure-Python reference: exact histograms + per-token log-ratio."""
    import re

    def toks(x):
        return [t for t in re.split(r"[^a-z0-9]+", (x or "").lower()) if t]

    def hist(texts):
        h = np.zeros(B, dtype=np.int64)
        for x in texts:
            for t in toks(x):
                h[md5_hash64(t) % B] += 1
        return h

    th, rh = hist(target), hist(corpus)
    lr = (np.log(th + ALPHA) - math.log(th.sum() + ALPHA * B)
          - np.log(rh + ALPHA) + math.log(rh.sum() + ALPHA * B))
    out = []
    for x in corpus:
        tt = toks(x)
        out.append((len(tt), float(sum(lr[md5_hash64(t) % B] for t in tt))))
    return out


CORPUS = ["cat dog cat", "dog mouse", "", "the CAT the mouse x!",
          "zebra quagga", "dog dog dog dog"]
TARGET = ["cat mouse", "cat cat zebra"]


def test_dsir_weights_matches_reference(ray_session):
    docs = pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": CORPUS,
    })
    out = (dsir_weights(rd.from_arrow(docs), TARGET,
                        n_buckets=B, alpha=ALPHA)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ref = _ref_weights(CORPUS, TARGET)
    assert list(out["n_feats"]) == [n for n, _ in ref]
    for got, (_, want) in zip(out["logw"], ref):
        assert got == pytest.approx(round(want, 4), abs=1e-9)
    # empty doc: zero features, zero weight
    assert out.loc[2, "n_feats"] == 0 and out.loc[2, "logw"] == 0.0
    # target-lookalike docs outrank target-unlike ones
    assert out.loc[0, "logw"] > out.loc[5, "logw"]  # cat-heavy > dog-only


def test_dsir_target_dataset_equals_iterable(ray_session):
    docs = pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": CORPUS,
    })
    tgt_ds = rd.from_arrow(pa.table({"text": TARGET}))
    a = (dsir_weights(rd.from_arrow(docs), TARGET, n_buckets=B)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dsir_weights(rd.from_arrow(docs), tgt_ds, n_buckets=B)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(a["logw"]) == list(b["logw"])
    assert list(a["n_feats"]) == list(b["n_feats"])


def test_dsir_select_is_threshold_on_weights(ray_session):
    docs = pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": CORPUS,
        "extra": [f"e{i}" for i in range(len(CORPUS))],
    })
    w = (dsir_weights(rd.from_arrow(docs), TARGET, n_buckets=B)
         .to_pandas().set_index("doc_id")["logw"])
    thr = float(w.median())
    kept = (dsir_select(rd.from_arrow(docs), TARGET, logw_threshold=thr,
                        n_buckets=B).to_pandas())
    assert set(kept["doc_id"]) == set(w[w >= thr].index)
    # full input schema passes through the filter
    assert list(kept.columns) == ["doc_id", "text", "extra"]


def test_dsir_weights_string_ids(ray_session):
    docs = pa.table({
        "url": pa.array([f"u{i}" for i in range(len(CORPUS))],
                        type=pa.string()),
        "text": CORPUS,
    })
    out = (dsir_weights(rd.from_arrow(docs), TARGET, text_col="text",
                        id_col="url", n_buckets=B)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert len(out) == len(CORPUS)
    assert out["logw"].dtype == np.float64


def test_run_dsir_cli(ray_session, tmp_path, capsys):
    import json

    import pyarrow.parquet as pq

    from liblevenshtein_rust_ray.cli import main

    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": CORPUS,
    }), str(src / "d.parquet"))
    tgt = tmp_path / "tgt"
    tgt.mkdir()
    pq.write_table(pa.table({"text": TARGET}), str(tgt / "t.parquet"))
    out = tmp_path / "kept"
    rc = main(["run-dsir", "--input", str(src), "--target", str(tgt),
               "--output", str(out), "--n-buckets", str(B)])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["docs"] == len(CORPUS)
    assert payload["kept"] == payload["docs"] - payload["dropped"]
    # CLI threshold 0.0 == library dsir_select at 0.0
    w = (dsir_weights(
            rd.from_arrow(pa.table({
                "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
                "text": CORPUS})),
            TARGET, n_buckets=B).to_pandas())
    assert payload["kept"] == int((w["logw"] >= 0.0).sum())


# ---------------------------------------------------------------------
# pack_documents (sequence packing — textstats.py, chunk_documents' dual)

def test_pack_documents_rule(ray_session):
    from liblevenshtein_rust_ray.functions.simhash import md5_hash64
    from liblevenshtein_rust_ray.stages.textstats import pack_documents

    texts = ["a b c", "", "d e f g", "h", "i j", "k l m n o", "p q"]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": texts,
    })
    out = (pack_documents(rd.from_arrow(docs), max_tokens=4, n_groups=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # reference: same rule in plain python
    ntok = [3, 0, 4, 1, 2, 5, 2]
    grp = [md5_hash64(str(i)) % 3 for i in range(len(texts))]
    cum = {}
    for i in range(len(texts)):
        before = cum.get(grp[i], 0)
        want_pack = before // 4
        cum[grp[i]] = before + ntok[i]
        row = out.loc[i]
        assert (row["grp"], row["pack_id"], row["n_tokens"]) == \
            (grp[i], want_pack, ntok[i]), i
    # every doc appears exactly once
    assert len(out) == len(texts)


def test_pack_documents_bin_overflow_bound(ray_session):
    """No bin exceeds max_tokens by more than its largest single doc,
    and bins below the last in a group are filled to >= max_tokens."""
    from liblevenshtein_rust_ray.stages.textstats import pack_documents

    texts = [("tok " * ((i * 7) % 23 + 1)).strip() for i in range(200)]
    docs = pa.table({
        "doc_id": pa.array(range(200), type=pa.int64()),
        "text": texts,
    })
    out = pack_documents(rd.from_arrow(docs), max_tokens=64,
                         n_groups=4).to_pandas()
    g = out.groupby(["grp", "pack_id"])["n_tokens"]
    total, biggest = g.sum(), g.max()
    assert (total < 64 + biggest).all()
    # exact fill invariant of the floor(cum/k) rule: bin k+1 only opens
    # once the group's cumulative tokens reach 64*(k+1), so the running
    # fill through every non-last bin is >= 64*(bin_index+1)
    for grp, tot in total.groupby(level=0):
        cums = tot.droplevel(0).sort_index().cumsum()
        for k, c in cums.iloc[:-1].items():
            assert c >= 64 * (k + 1), (grp, k, c)


def test_dsir_top_frac_threshold(ray_session):
    from liblevenshtein_rust_ray.stages.selection import (
        dsir_top_frac_threshold)

    w = dsir_weights(
        rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
            "text": CORPUS})),
        TARGET, n_buckets=B)
    thr = dsir_top_frac_threshold(w, 0.5)
    got = w.to_pandas()
    kept_frac = (got["logw"] >= thr).mean()
    assert kept_frac >= 0.5
    # exact path: threshold is an actual observed weight
    assert thr in set(got["logw"])
    # sampled path stays deterministic and returns a sane threshold
    thr2 = dsir_top_frac_threshold(w, 0.5, max_driver_rows=3)
    thr3 = dsir_top_frac_threshold(w, 0.5, max_driver_rows=3)
    assert thr2 == thr3


def test_dsir_bigram_features(ray_session):
    """ngram=2 == unigram+bigram reference computation."""
    import re

    from liblevenshtein_rust_ray.functions.simhash import md5_hash64

    def toks(x):
        return [t for t in re.split(r"[^a-z0-9]+", (x or "").lower()) if t]

    def feats(x):
        tt = toks(x)
        return tt + [f"{a} {b}" for a, b in zip(tt, tt[1:])]

    def hist(texts):
        h = np.zeros(B, dtype=np.int64)
        for x in texts:
            for f in feats(x):
                h[md5_hash64(f) % B] += 1
        return h

    th, rh = hist(CORPUS if False else TARGET), hist(CORPUS)
    lr = (np.log(th + ALPHA) - math.log(th.sum() + ALPHA * B)
          - np.log(rh + ALPHA) + math.log(rh.sum() + ALPHA * B))
    docs = pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": CORPUS,
    })
    out = (dsir_weights(rd.from_arrow(docs), TARGET, n_buckets=B,
                        ngram=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, x in enumerate(CORPUS):
        ff = feats(x)
        assert out.loc[i, "n_feats"] == len(ff)
        want = float(sum(lr[md5_hash64(f) % B] for f in ff))
        assert out.loc[i, "logw"] == pytest.approx(round(want, 4),
                                                   abs=1e-9)


def test_dsir_fused_self_sample_target(ray_session):
    """HashSampleTarget (one fused histogram pass) == an explicit
    sample_by_hash Dataset target, bit for bit; ngram=2 too."""
    import pandas as pd

    from liblevenshtein_rust_ray.stages.sampling import sample_by_hash
    from liblevenshtein_rust_ray.stages.selection import HashSampleTarget

    texts = [f"cat dog w{i % 11} mouse zebra t{i % 3}" for i in range(60)]
    docs = pa.table({
        "doc_id": pa.array(range(60), type=pa.int64()),
        "text": texts,
    })
    ds = rd.from_arrow(docs)
    for ng in (1, 2):
        a = (dsir_weights(ds, sample_by_hash(ds, "doc_id", pct=20, salt="s7"),
                          n_buckets=B, ngram=ng)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (dsir_weights(ds, HashSampleTarget(pct=20, salt="s7"),
                          n_buckets=B, ngram=ng)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------
# decontaminate_embeddings (similarity.py — semantic decontamination)

def test_decontaminate_embeddings(ray_session):
    from liblevenshtein_rust_ray.stages.similarity import (
        decontaminate_embeddings)

    def v(*xs):
        return list(map(float, xs))

    corpus = pa.table({
        "vec_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "embedding": pa.array(
            [v(1, 0), v(0.9, 0.1), v(0, 1), v(-1, 0)],
            type=pa.list_(pa.float32())),
        "extra": ["a", "b", "c", "d"],
    })
    bench = pa.table({
        "embedding": pa.array([v(2, 0)], type=pa.list_(pa.float32())),
    })
    kept = decontaminate_embeddings(
        rd.from_arrow(corpus), rd.from_arrow(bench),
        threshold=0.95).to_pandas()
    # cos to (1,0): id1=1.0 dropped, id2=0.994 dropped, id3=0, id4=-1
    assert sorted(kept["vec_id"]) == [3, 4]
    assert list(kept.columns) == ["vec_id", "embedding", "extra"]
    # array-like bench side and empty bench behave
    kept2 = decontaminate_embeddings(
        rd.from_arrow(corpus), [[2.0, 0.0]], threshold=0.95).to_pandas()
    assert sorted(kept2["vec_id"]) == [3, 4]
    all_kept = decontaminate_embeddings(
        rd.from_arrow(corpus), np.empty((0, 0)), threshold=0.95
    ).to_pandas()
    assert len(all_kept) == 4


def test_decontaminate_embeddings_bench_guard(ray_session):
    from liblevenshtein_rust_ray.stages.similarity import (
        decontaminate_embeddings)

    corpus = pa.table({
        "vec_id": pa.array([1], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0]], type=pa.list_(pa.float32())),
    })
    big = np.ones((1024, 256))
    with pytest.raises(ValueError, match="max_bench_mb"):
        decontaminate_embeddings(rd.from_arrow(corpus), big,
                                 max_bench_mb=1)


# ---------------------------------------------------------------------
# randomized property sweeps (the repo's Hypothesis discipline)

from hypothesis import given, settings, strategies as st

_texts = st.lists(
    st.text(alphabet="ab c1.!", min_size=0, max_size=30),
    min_size=1, max_size=10)


@settings(max_examples=8, deadline=None)
@given(_texts)
def test_dsir_weights_property(ray_session, texts):
    """dsir_weights == the pure-Python reference on random corpora
    (target = first half, never empty)."""
    target = texts[: max(1, len(texts) // 2)]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": texts,
    })
    out = (dsir_weights(rd.from_arrow(docs), target, n_buckets=B)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ref = _ref_weights(texts, target)
    assert list(out["n_feats"]) == [n for n, _ in ref]
    for got, (_, want) in zip(out["logw"], ref):
        assert got == pytest.approx(round(want, 4), abs=1e-9)


@settings(max_examples=8, deadline=None)
@given(_texts, st.integers(min_value=1, max_value=7),
       st.integers(min_value=1, max_value=5))
def test_pack_documents_property(ray_session, texts, max_tokens, n_groups):
    """Every doc packed exactly once; the rule reproduces the pure-Python
    cumsum reference for random inputs and knob settings."""
    import re

    from liblevenshtein_rust_ray.functions.simhash import md5_hash64
    from liblevenshtein_rust_ray.stages.textstats import pack_documents

    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": texts,
    })
    out = (pack_documents(rd.from_arrow(docs), max_tokens=max_tokens,
                          n_groups=n_groups)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(texts)
    cum: dict[int, int] = {}
    for i, x in enumerate(texts):
        n = len([t for t in re.split(r"[^a-z0-9]+", x.lower()) if t])
        g = md5_hash64(str(i)) % n_groups
        before = cum.get(g, 0)
        cum[g] = before + n
        assert (out.loc[i, "grp"], out.loc[i, "pack_id"],
                out.loc[i, "n_tokens"]) == (g, before // max_tokens, n)


def test_dsir_predicate_target_fused(ray_session):
    """PredicateTarget (fused) == an explicit filtered-Dataset target."""
    import pandas as pd

    from liblevenshtein_rust_ray.stages.selection import PredicateTarget

    docs = pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": CORPUS,
    })
    ds = rd.from_arrow(docs)

    def flt(t):
        keep = t.column("doc_id").to_numpy(zero_copy_only=False) % 2 == 0
        return t.filter(pa.array(keep, type=pa.bool_()))

    explicit = ds.map_batches(flt, batch_format="pyarrow")
    a = (dsir_weights(ds, explicit, n_buckets=B)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dsir_weights(
            ds, PredicateTarget(
                lambda t: t.column("doc_id").to_numpy(
                    zero_copy_only=False) % 2 == 0),
            n_buckets=B)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------
# exact_quantiles (sketch.py — exact distributed percentiles)

def test_exact_quantiles(ray_session):
    from liblevenshtein_rust_ray.stages.sketch import exact_quantiles

    vals = [1, 1, 2, 3, 3, 3, 7, 10, 100, 100]
    t = pa.table({"v": pa.array(vals, type=pa.int64())})
    out = exact_quantiles(rd.from_arrow(t), "v", qs=(0.1, 0.5, 0.9, 1.0))
    got = dict(zip(out["q"], out["value"]))
    # smallest v with running count >= ceil(q*10)
    assert got == {0.1: 1, 0.5: 3, 0.9: 100, 1.0: 100}
    srt = sorted(vals)
    for q, v in got.items():
        import math as m
        assert v == srt[m.ceil(q * len(vals)) - 1]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=-50, max_value=50),
                min_size=1, max_size=60),
       st.floats(min_value=0.01, max_value=1.0))
def test_exact_quantiles_property(ray_session, vals, q):
    """Matches the sorted-list discrete quantile for random ints."""
    import math as m

    from liblevenshtein_rust_ray.stages.sketch import exact_quantiles

    t = pa.table({"v": pa.array(vals, type=pa.int64())})
    out = exact_quantiles(rd.from_arrow(t), "v", qs=(q,))
    want = sorted(vals)[max(0, m.ceil(q * len(vals)) - 1)]
    assert out["value"].iloc[0] == want


def test_run_pack_cli(ray_session, tmp_path, capsys):
    import json

    import pyarrow.parquet as pq

    from liblevenshtein_rust_ray.cli import main
    from liblevenshtein_rust_ray.stages.textstats import pack_documents

    src = tmp_path / "docs"
    src.mkdir()
    texts = [("w " * (i % 9 + 1)).strip() for i in range(40)]
    tbl = pa.table({
        "doc_id": pa.array(range(40), type=pa.int64()),
        "text": texts,
    })
    pq.write_table(tbl, str(src / "d.parquet"))
    out = tmp_path / "packed"
    rc = main(["run-pack", "--input", str(src), "--output", str(out),
               "--max-tokens", "8", "--n-groups", "4"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    lib = pack_documents(rd.from_arrow(tbl), max_tokens=8,
                         n_groups=4).to_pandas()
    assert payload["docs"] == 40
    assert payload["bins"] == len(lib.groupby(["grp", "pack_id"]))
    got = pq.read_table(str(out)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    lib = lib.sort_values("doc_id").reset_index(drop=True)
    assert list(got["pack_id"]) == list(lib["pack_id"])
