"""BPE merge learning (stages/bpetrain.py)."""

import pandas as pd
import pyarrow as pa
import pytest


def _docs(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({"text": pa.array(texts, type=pa.string())}))


def test_bpe_hand_checked(ray_session):
    from liblevenshtein_rust_ray.stages.bpetrain import bpe_learn_merges

    # vocab: aaab x3, ab x2  ->  pairs: (a,a): 2*3=6, (a,b): 3+2=5, then
    # after merging (a,a)->aa: aaab = [aa,a,b]; pairs (aa,a):3, (a,b):5
    out = bpe_learn_merges(_docs(["aaab aaab ab", "aaab ab"]),
                           n_merges=2)
    assert list(out.itertuples(index=False, name=None)) == [
        (1, "a", "a", 6), (2, "a", "b", 5)]


def test_bpe_overlap_left_to_right(ray_session):
    from liblevenshtein_rust_ray.stages.bpetrain import bpe_learn_merges

    # "aaa": pairs (a,a) counted twice per word occurrence; the merge is
    # applied left-to-right non-overlapping -> [aa, a], leaving ONE
    # (aa,a) pair for round 2
    out = bpe_learn_merges(_docs(["aaa"]), n_merges=2)
    assert list(out.itertuples(index=False, name=None)) == [
        (1, "a", "a", 2), (2, "aa", "a", 1)]


def test_bpe_exhaustion(ray_session):
    from liblevenshtein_rust_ray.stages.bpetrain import bpe_learn_merges

    # single-char words only: no adjacent pairs ever -> 0 rows
    out = bpe_learn_merges(_docs(["a b c", "a b"]), n_merges=4)
    assert len(out) == 0
    # one two-char word: exactly 1 merge then exhaustion
    out = bpe_learn_merges(_docs(["ab"]), n_merges=4)
    assert list(out.itertuples(index=False, name=None)) == [(1, "a", "b", 1)]


def test_bpe_distributed_parity_with_collisions(ray_session):
    """The marker encoding must keep distributed == driver on vocab
    engineered so a naive space-join replace would corrupt: 'the'/'he'
    (suffix fake-l), 'a bc'-style prefix fake-r, adjacent repeats."""
    from liblevenshtein_rust_ray.stages.bpetrain import bpe_learn_merges

    texts = ["the the the he he she she banana banana",
             "than bane the he ababab abc abc abc"]
    a = bpe_learn_merges(_docs(texts), n_merges=6, mode="driver")
    b = bpe_learn_merges(_docs(texts), n_merges=6, mode="distributed")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    # first merge on this corpus must be (h,e) or (t,h) by count — sanity
    assert a.iloc[0]["pair_count"] >= 6


def test_bpe_mode_guard(ray_session):
    from liblevenshtein_rust_ray.stages.bpetrain import bpe_learn_merges

    with pytest.raises(ValueError, match="distributed"):
        bpe_learn_merges(_docs(["aa bb cc dd"]), n_merges=1,
                         mode="driver", max_vocab_driver=2)
    with pytest.raises(ValueError, match="unknown mode"):
        bpe_learn_merges(_docs(["aa"]), mode="nope")
    # auto falls back to distributed over the guard — same answer
    out = bpe_learn_merges(_docs(["aa bb aa"]), n_merges=1,
                           max_vocab_driver=1)
    # word "aa" freq 2 -> pair (a,a) weight 2; beats (b,b) weight 1
    assert list(out.itertuples(index=False, name=None)) == [(1, "a", "a", 2)]


def test_neardup_canonicalize(ray_session):
    """Cluster representative = most tokens (ties: smallest id);
    non-duplicates map to themselves."""
    import ray.data as rd

    from liblevenshtein_rust_ray.pipelines.curation import (
        neardup_canonicalize)

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight")
    near = base + " extra trailing words here"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": [base, near, base, "completely different text entirely"],
    })
    out = (neardup_canonicalize(rd.from_arrow(docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    got = dict(zip(out["doc_id"], out["canon_id"]))
    # 1,2,3 are one near-dup cluster; rep = doc 2 (most tokens); 4 = self
    assert got == {1: 2, 2: 2, 3: 2, 4: 4}


def test_neardup_canonicalize_paths_agree(ray_session):
    """Broadcast fast path (default) == exchange plan (forced via
    max_driver_members=0) — bit-identical mapping."""
    import ray.data as rd

    from liblevenshtein_rust_ray.pipelines.curation import (
        neardup_canonicalize)

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    docs = pa.table({
        "doc_id": pa.array([10, 11, 12, 13, 14], type=pa.int64()),
        "text": [base, base + " phi chi", base, "unrelated short text",
                 base + " psi"],
    })
    a = (neardup_canonicalize(rd.from_arrow(docs)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (neardup_canonicalize(rd.from_arrow(docs), max_driver_members=0)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(st.lists(st.text(alphabet="abcde", min_size=1, max_size=6),
                min_size=1, max_size=20),
       st.integers(min_value=1, max_value=4))
def test_bpe_distributed_equals_driver_property(ray_session, words, n_merges):
    """Random small corpora: the distributed marker-encoding rounds must
    equal the driver list-form loop exactly (merge choice, counts, and
    exhaustion behavior)."""
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.bpetrain import bpe_learn_merges

    docs = _docs([" ".join(words)])
    a = bpe_learn_merges(docs, n_merges=n_merges, mode="driver")
    b = bpe_learn_merges(docs, n_merges=n_merges, mode="distributed")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=8),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=24))
def test_bpe_incremental_equals_reference_property(words, n_merges):
    """The incremental heap+delta engine must match the naive
    full-recount reference loop exactly — merge choices, tie-breaks,
    counts, and exhaustion — on random corpora (no Ray needed)."""
    from collections import Counter

    from liblevenshtein_rust_ray.stages.bpetrain import (
        _merges_incremental, _merges_reference)

    wf = Counter(words)
    ws = [list(w) for w in wf.keys()]
    fs = list(wf.values())
    assert _merges_incremental([list(w) for w in ws], fs, n_merges) == \
        _merges_reference(ws, fs, n_merges)


def test_bpe_distributed_small_candidate_k_and_flush(ray_session):
    """candidate_k=1 (one merge per launch, the degenerate schedule) and
    max_overlay=0 (flush after every launch) must both stay
    bit-identical to the driver loop."""
    from liblevenshtein_rust_ray.stages.bpetrain import bpe_learn_merges

    texts = ["the the the he he she she banana banana",
             "than bane the he ababab abc abc abc"]
    a = bpe_learn_merges(_docs(texts), n_merges=8, mode="driver")
    b = bpe_learn_merges(_docs(texts), n_merges=8, mode="distributed",
                         candidate_k=1)
    c = bpe_learn_merges(_docs(texts), n_merges=8, mode="distributed",
                         max_overlay=0)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  c.reset_index(drop=True))
