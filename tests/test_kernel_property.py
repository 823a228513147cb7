"""Property-based cross-validation: automaton traversal ≡ brute-force DP scan.

Mirrors the reference's load-bearing oracle
(/root/reference/tests/proptest_automaton_distance_cross_validation.rs:1-80):
for random dictionaries and queries, the automaton must produce exactly the
terms within ``max_distance`` with exactly the DP distances — no false
positives, no false negatives, identical distances — for all three algorithms.
"""

from hypothesis import given, settings, strategies as st

from liblevenshtein_rust_ray.kernel import (
    ALGORITHMS,
    LevenshteinAutomaton,
    build_trie,
    distance_fn,
    query,
)

words = st.text(alphabet="ab", min_size=0, max_size=8)
wordsets = st.lists(st.text(alphabet="abc", min_size=0, max_size=10), min_size=1, max_size=30)
unicode_words = st.text(alphabet="aé中", min_size=0, max_size=6)


@settings(max_examples=300, deadline=None)
@given(
    terms=wordsets,
    q=words,
    n=st.integers(min_value=0, max_value=3),
    alg=st.sampled_from(ALGORITHMS),
)
def test_automaton_equals_dp_scan(terms, q, n, alg):
    dp = distance_fn(alg)
    expected = {}
    for t in set(terms):
        d = dp(q, t)
        if d <= n:
            expected[t] = d
    got = {c.term: c.distance for c in query(build_trie(terms), q, n, alg)}
    assert got == expected


@settings(max_examples=100, deadline=None)
@given(
    terms=st.lists(unicode_words, min_size=1, max_size=15),
    q=unicode_words,
    n=st.integers(min_value=0, max_value=2),
    alg=st.sampled_from(ALGORITHMS),
)
def test_automaton_equals_dp_scan_unicode(terms, q, n, alg):
    dp = distance_fn(alg)
    expected = {t: dp(q, t) for t in set(terms) if dp(q, t) <= n}
    got = {c.term: c.distance for c in query(build_trie(terms), q, n, alg)}
    assert got == expected


@settings(max_examples=150, deadline=None)
@given(
    a=st.text(alphabet="abcd", max_size=10),
    b=st.text(alphabet="abcd", max_size=10),
    n=st.integers(min_value=0, max_value=3),
    alg=st.sampled_from(ALGORITHMS),
)
def test_pair_acceptance_equals_dp(a, b, n, alg):
    # LevenshteinAutomaton.accepts ≡ DP pair distance (the universal-automaton
    # pair-scoring surface, reference universal/automaton.rs:242)
    d = distance_fn(alg)(a, b)
    acc = LevenshteinAutomaton(a, n, alg).accepts(b)
    if d <= n:
        assert acc == d
    else:
        assert acc is None


@settings(max_examples=100, deadline=None)
@given(
    terms=wordsets,
    q=words,
    n=st.integers(min_value=0, max_value=2),
    alg=st.sampled_from(ALGORITHMS),
)
def test_prefix_mode_equals_prefix_dp_scan(terms, q, n, alg):
    # prefix-mode oracle: min over all prefixes p of t of dp(q, p)
    dp = distance_fn(alg)
    got = {c.term: c.distance
           for c in query(build_trie(terms), q, n, alg, prefix_mode=True)}
    for t in set(terms):
        # the autocomplete contract, uniform for every term length: the
        # reported distance is exactly min over term prefixes p of dp(q, p).
        # (The reference's fully-consumed-only finality is unsound under
        # subsumption and also drops short terms — see
        # kernel/state.py::infer_prefix_distance for the analysis.)
        best = min(dp(q, t[:k]) for k in range(len(t) + 1))
        if best <= n:
            assert got.get(t) == best
        else:
            assert t not in got


# ----------------------------------------------------------------------
# Vectorized banded-DP kernel (kernel.vectorized) ≡ per-pair DP oracle —
# the numpy analogue of the reference's SIMD distance matrix
# (src/distance/simd.rs), clamped at n+1.
# ----------------------------------------------------------------------
pairlists = st.lists(
    st.tuples(
        st.text(alphabet="abcé", min_size=0, max_size=12),
        st.text(alphabet="abcé", min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(pairs=pairlists, n=st.integers(min_value=0, max_value=3), alg=st.sampled_from(ALGORITHMS))
def test_batch_distances_equal_dp(pairs, n, alg):
    from liblevenshtein_rust_ray.kernel.vectorized import batch_distances

    dp = distance_fn(alg)
    qs = [a for a, _ in pairs]
    ts = [b for _, b in pairs]
    got = batch_distances(qs, ts, n, alg)
    for (a, b), g in zip(pairs, got):
        assert int(g) == min(dp(a, b), n + 1), (a, b, n, alg)


@settings(max_examples=150, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.text(alphabet="aol01", max_size=8), st.text(alphabet="aol01", max_size=8)),
        min_size=1,
        max_size=20,
    ),
    n=st.integers(min_value=0, max_value=2),
)
def test_batch_distances_subst_equals_automaton(pairs, n):
    """Restricted substitutions (standard algorithm): vectorized cost ≡
    single-term automaton query with the same substitution set."""
    from liblevenshtein_rust_ray.kernel.substitution import leet_speak
    from liblevenshtein_rust_ray.kernel.vectorized import batch_distances

    sub = leet_speak()
    qs = [a for a, _ in pairs]
    ts = [b for _, b in pairs]
    got = batch_distances(qs, ts, n, "standard", subst=sub)
    for (a, b), g in zip(pairs, got):
        hits = list(query(build_trie([b]), a, n, "standard", subst=sub))
        want = hits[0].distance if hits else n + 1
        assert int(g) == want, (a, b, n)


@settings(max_examples=150, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.binary(max_size=10), st.binary(max_size=10)),
        min_size=1, max_size=20,
    ),
    n=st.integers(min_value=0, max_value=2),
    alg=st.sampled_from(ALGORITHMS),
)
def test_batch_distances_bytes_mode(pairs, n, alg):
    """Byte-unit terms (the reference's CharUnit axis) go through the same
    banded kernel; oracle = DP over byte sequences."""
    from liblevenshtein_rust_ray.kernel.vectorized import batch_distances

    dp = distance_fn(alg)
    qs = [a for a, _ in pairs]
    ts = [b for _, b in pairs]
    got = batch_distances(qs, ts, n, alg)
    for (a, b), g in zip(pairs, got):
        assert int(g) == min(dp(a, b), n + 1), (a, b, n, alg)


def test_transposition_special_subsumption_regression():
    """Pinned regression: the reference's special-subsumes-normal rule
    (position.rs:104-113, f == query_length && i == j) kills the only
    accepting path for query 'cb' vs term 'abcb' at n=2 — the special
    (0,2,t) must NOT subsume the normal (0,2) whose match-match tail
    accepts.  Found by the Hypothesis oracle; our rule keeps both."""
    from liblevenshtein_rust_ray.kernel import build_trie
    from liblevenshtein_rust_ray.kernel.query import query

    for terms, q in [(["abcb"], "cb"), (["xyay"], "ay"), (["aé中é"], "中é")]:
        got = {c.term: c.distance for c in query(build_trie(terms), q, 2, "transposition")}
        assert got == {terms[0]: 2}


# ----------------------------------------------------------------------
# encode_concat (one utf-32 encode of the joined strings + scatter fill)
# ≡ the per-string encode_strings loop it replaced, including reverse
# layout and the precomputed-lens fast path.
# ----------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    strings=st.lists(
        st.text(alphabet="abé日\U0001f600", min_size=0, max_size=9),
        min_size=0,
        max_size=30,
    ),
    reverse=st.booleans(),
)
def test_encode_concat_equals_encode_strings(strings, reverse):
    import numpy as np

    from liblevenshtein_rust_ray.kernel.vectorized import (
        encode_concat,
        encode_strings,
    )

    ref_enc, ref_lens = encode_strings(strings, reverse=reverse)
    got_enc, got_lens, buf = encode_concat(strings, reverse=reverse)
    assert np.array_equal(ref_lens, got_lens)
    # widths may differ only in trailing all-zero padding columns
    w = min(ref_enc.shape[1], got_enc.shape[1])
    assert np.array_equal(ref_enc[:, :w], got_enc[:, :w])
    assert not ref_enc[:, w:].any() and not got_enc[:, w:].any()
    assert len(buf) == int(got_lens.sum()) if len(strings) else len(buf) == 0
    # precomputed-lens path is identical
    pre_enc, pre_lens, _ = encode_concat(strings, reverse=reverse, lens=got_lens)
    assert np.array_equal(pre_enc, got_enc) and np.array_equal(pre_lens, got_lens)
