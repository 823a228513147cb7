"""Restricted substitution sets + approximate substring search kernels."""

import numpy as np
import pytest

from liblevenshtein_rust_ray.kernel import build_trie, query
from liblevenshtein_rust_ray.kernel.substitution import (
    SubstitutionSet,
    phonetic_basic,
    keyboard_qwerty,
    leet_speak,
    ocr_friendly,
)
from liblevenshtein_rust_ray.kernel.substring import (
    substring_match_ends,
    best_substring_match,
)
from liblevenshtein_rust_ray.kernel.distance import standard_distance


def qset(d, term, n, **kw):
    return {(c.term, c.distance) for c in query(d, term, n, **kw)}


def test_substitution_free_match():
    # reference doctest: "fone" matches "phone" at d=1 with phonetic_basic
    # (f<->p free substitution: f-one vs p-hone -> only the h insertion costs)
    d = build_trie(["phone"])
    assert qset(d, "fone", 1, subst=phonetic_basic()) == {("phone", 1)}
    # without the substitution set it needs d=2
    assert qset(d, "fone", 1) == set()
    assert qset(d, "fone", 2) == {("phone", 2)}


def test_substitution_directional():
    s = SubstitutionSet([("x", "y")])  # dict x matches query y, not reverse
    assert s.is_allowed("x", "y")
    assert not s.is_allowed("y", "x")
    d = build_trie(["xx"])
    assert qset(d, "yy", 0, subst=s) == {("xx", 0)}
    d2 = build_trie(["yy"])
    assert qset(d2, "xx", 0, subst=s) == set()


def test_preset_contents():
    assert keyboard_qwerty().is_allowed("q", "w")
    assert keyboard_qwerty().is_allowed("w", "q")
    assert leet_speak().is_allowed("e", "3") and leet_speak().is_allowed("3", "e")
    assert ocr_friendly().is_allowed("0", "O")
    assert not phonetic_basic().is_allowed("q", "w")


def test_leet_zero_cost_query():
    d = build_trie(["l33t", "l0ck"])
    assert qset(d, "leet", 0, subst=leet_speak()) == {("l33t", 0)}
    assert qset(d, "lock", 0, subst=leet_speak()) == {("l0ck", 0)}


# ----------------------------------------------------------------------
def brute_best_substring(pattern, text, n):
    best = None
    for j in range(len(text) + 1):
        for i in range(j + 1):
            dd = standard_distance(pattern, text[i:j])
            if dd <= n and (best is None or (dd, j) < best):
                best = (dd, j)
    return best


def test_substring_exact():
    ends, dists = substring_match_ends("cat", "the cat sat on a catapult", 0)
    assert set(ends.tolist()) == {7, 20}  # "cat" ends at 7 and inside "catapult"
    assert all(d == 0 for d in dists)


def test_substring_approx():
    got = best_substring_match("custoner", "dear customer, welcome", 1)
    assert got is not None and got[0] == 1
    assert best_substring_match("custoner", "nothing relevant here", 1) is None
    assert best_substring_match("", "abc", 0) == (0, 0)


@pytest.mark.parametrize("pattern,text,n", [
    ("abc", "xxabcxx", 1),
    ("kitten", "the sitting room", 2),
    ("aaa", "", 2),
    ("ab", "ba", 1),
    ("hello", "hxllo wxrld hell", 1),
])
def test_substring_matches_brute_force(pattern, text, n):
    got = best_substring_match(pattern, text, n)
    want = brute_best_substring(pattern, text, n)
    assert got == want


def test_substring_ends_complete():
    # every reported end has a witness substring within n; every qualifying
    # end is reported
    pattern, text, n = "abcd", "zabxdqabcd", 1
    ends, dists = substring_match_ends(pattern, text, n)
    reported = dict(zip(ends.tolist(), dists.tolist()))
    for j in range(len(text) + 1):
        best = min(
            (standard_distance(pattern, text[i:j]) for i in range(j + 1)),
        )
        if best <= n:
            assert reported.get(j) == best
        else:
            assert j not in reported
