"""Universal Levenshtein automaton (kernel.universal) ≡ DP oracle.

Mirrors the reference's universal-automaton validation
(/root/reference/src/transducer/universal/automaton.rs): ``accepts(q, w)``
must equal ``standard_distance(q, w) <= n`` for every pair; state counts of
the parametric tables match the published values (8 for n=1, 50 for n=2,
Schulz & Mihov 2002 §6 / Mitankin 2005)."""

import itertools

from hypothesis import given, settings, strategies as st

from liblevenshtein_rust_ray.kernel.distance import standard_distance
from liblevenshtein_rust_ray.kernel.universal import universal_automaton


def test_state_counts():
    assert universal_automaton(0).state_count == 1
    assert universal_automaton(1).state_count == 8
    assert universal_automaton(2).state_count == 50


def test_exhaustive_small():
    for n in (0, 1, 2):
        ua = universal_automaton(n)
        for la in range(4):
            for lb in range(4):
                for a in itertools.product("ab", repeat=la):
                    for b in itertools.product("ab", repeat=lb):
                        q, w = "".join(a), "".join(b)
                        assert ua.accepts(q, w) == (standard_distance(q, w) <= n), (q, w, n)


@settings(max_examples=400, deadline=None)
@given(
    q=st.text(alphabet="abcé", max_size=12),
    w=st.text(alphabet="abcé", max_size=12),
    n=st.integers(min_value=0, max_value=3),
)
def test_accepts_equals_dp(q, w, n):
    ua = universal_automaton(n)
    assert ua.accepts(q, w) == (standard_distance(q, w) <= n)


@settings(max_examples=200, deadline=None)
@given(q=st.text(alphabet="abc", max_size=10), w=st.text(alphabet="abc", max_size=10))
def test_distance_probe(q, w):
    ua = universal_automaton(2)
    assert ua.distance(q, w, cap=2) == min(standard_distance(q, w), 3)


def test_transposition_variant_state_counts():
    from liblevenshtein_rust_ray.kernel.universal import universal_automaton

    assert universal_automaton(1, "transposition").state_count == 9
    assert universal_automaton(2, "transposition").state_count == 79


@settings(max_examples=300, deadline=None)
@given(
    q=st.text(alphabet="abcé", max_size=10),
    w=st.text(alphabet="abcé", max_size=10),
    n=st.integers(min_value=0, max_value=2),
)
def test_transposition_accepts_equals_osa_dp(q, w, n):
    from liblevenshtein_rust_ray.kernel.distance import transposition_distance

    ua = universal_automaton(n, "transposition")
    assert ua.accepts(q, w) == (transposition_distance(q, w) <= n)


def test_transposition_swap_cases():
    ua = universal_automaton(1, "transposition")
    assert ua.accepts("ab", "ba")            # one adjacent swap
    assert not ua.accepts("abcd", "badc")    # two swaps > n=1
    ua2 = universal_automaton(2, "transposition")
    assert ua2.accepts("abcd", "badc")


def test_merge_split_exhaustive_small():
    from liblevenshtein_rust_ray.kernel.distance import merge_and_split_distance

    for n in (0, 1, 2):
        ua = universal_automaton(n, "merge_and_split")
        for la in range(4):
            for lb in range(4):
                for a in itertools.product("ab", repeat=la):
                    for b in itertools.product("ab", repeat=lb):
                        q, w = "".join(a), "".join(b)
                        assert ua.accepts(q, w) == (
                            merge_and_split_distance(q, w) <= n
                        ), (q, w, n)


@settings(max_examples=300, deadline=None)
@given(
    q=st.text(alphabet="abcé", max_size=10),
    w=st.text(alphabet="abcé", max_size=10),
    n=st.integers(min_value=0, max_value=2),
)
def test_merge_split_accepts_equals_dp(q, w, n):
    from liblevenshtein_rust_ray.kernel.distance import merge_and_split_distance

    ua = universal_automaton(n, "merge_and_split")
    assert ua.accepts(q, w) == (merge_and_split_distance(q, w) <= n)


def test_merge_split_cases():
    ua = universal_automaton(1, "merge_and_split")
    assert ua.accepts("ab", "c")      # one merge
    assert ua.accepts("c", "ab")      # one split
    assert not ua.accepts("abcd", "ef")  # two merges > n=1
    ua2 = universal_automaton(2, "merge_and_split")
    assert ua2.accepts("abcd", "ef")
