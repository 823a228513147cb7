"""Golden transducer vectors — ported from the reference's unit/integration
tests (FIXTURES.md §3):

* /root/reference/src/transducer/query.rs:242-293
* /root/reference/tests/integration_tests.rs (high distance, query longer
  than term, z/za boundary)
* README.md prefix-mode and Unicode examples
"""

import pytest

from liblevenshtein_rust_ray.kernel import (
    STANDARD,
    TRANSPOSITION,
    MERGE_AND_SPLIT,
    build_trie,
    build_dawg,
    query,
    ordered_query,
)


def qset(dictionary, term, n, algorithm=STANDARD, **kw):
    return {(c.term, c.distance) for c in query(dictionary, term, n, algorithm, **kw)}


@pytest.mark.parametrize("build", [build_trie, build_dawg])
def test_exact_match(build):
    d = build(["test"])
    assert qset(d, "test", 0) == {("test", 0)}


@pytest.mark.parametrize("build", [build_trie, build_dawg])
def test_query_with_distance(build):
    # query.rs:259-282 — dict [test, best, rest, testing], query "test", d=1
    d = build(["test", "best", "rest", "testing"])
    assert qset(d, "test", 1) == {("test", 0), ("best", 1), ("rest", 1)}


def test_candidate_distances():
    d = build_trie(["test", "best"])
    assert qset(d, "test", 1) == {("test", 0), ("best", 1)}


def test_empty_query():
    d = build_trie(["test"])
    assert qset(d, "", 0) == set()
    # empty query at d=4 reaches "test" via 4 insertions
    assert qset(d, "", 4) == {("test", 4)}


def test_empty_string_in_dict():
    d = build_trie(["", "a"])
    assert qset(d, "", 0) == {("", 0)}
    assert qset(d, "", 1) == {("", 0), ("a", 1)}


def test_high_distance_returns_all_terms():
    # integration_tests.rs test_high_distance_returns_all_terms
    terms = ["foo", "bar", "baz", "qux", "quo"]
    d = build_trie(terms)
    found = {t for t, _ in qset(d, "quuo", 99)}
    assert found == set(terms)


def test_query_longer_than_term():
    # integration_tests.rs test_query_longer_than_term: "aahaara" vs "hr" = 5
    d = build_trie(["hr"])
    assert qset(d, "aahaara", 5) == {("hr", 5)}
    assert qset(d, "aahaara", 4) == set()


def test_z_za_boundary():
    # query.rs:169-172 comment: dict [z, za], query "za" — 'z' node is final
    # at distance 1 but children must still be explored
    d = build_trie(["z", "za"])
    assert qset(d, "za", 0) == {("za", 0)}
    assert qset(d, "za", 1) == {("z", 1), ("za", 0)}


def test_transposition_algorithm():
    d = build_trie(["the", "there"])
    assert qset(d, "teh", 1, TRANSPOSITION) == {("the", 1)}
    # standard needs distance 2
    assert qset(d, "teh", 1, STANDARD) == set()
    assert qset(d, "teh", 2, STANDARD) == {("the", 2)}


def test_transposition_ab_ba():
    # position.rs:116-144 regression: query "ab", dict "ba" — the special
    # position must survive subsumption for the transposition to complete
    d = build_trie(["ba"])
    assert qset(d, "ab", 1, TRANSPOSITION) == {("ba", 1)}


def test_merge_split_algorithm():
    d = build_trie(["rn", "m", "cl"])
    # any single char splits into any two chars at cost 1 (and vice versa)
    assert qset(d, "m", 1, MERGE_AND_SPLIT) == {("rn", 1), ("m", 0), ("cl", 1)}
    assert qset(d, "rn", 1, MERGE_AND_SPLIT) == {("rn", 0), ("m", 1)}
    assert qset(d, "d", 1, MERGE_AND_SPLIT) == {("cl", 1), ("m", 1), ("rn", 1)}


def test_merge_split_everyone():
    d = build_trie(["everyone"])
    assert qset(d, "every one", 1, MERGE_AND_SPLIT) == {("everyone", 1)}


def test_unicode_terms():
    # README.md:200-213 Unicode set
    d = build_trie(["café", "naïve", "中文", "🎉"])
    assert qset(d, "cafe", 1) == {("café", 1)}
    assert qset(d, "中国", 1) == {("中文", 1)}
    assert qset(d, "🎉", 0) == {("🎉", 0)}


def test_bytes_terms():
    d = build_trie([b"test", b"best"])
    assert qset(d, b"test", 1) == {(b"test", 0), (b"best", 1)}


def test_prefix_mode():
    # README.md:373-392 — autocomplete on identifiers
    d = build_trie(["getValue", "getVariable", "setValue", "setVariable"])
    got = qset(d, "getVal", 0, prefix_mode=True)
    assert got == {("getValue", 0)}
    got = qset(d, "getVal", 1, prefix_mode=True)
    assert got == {("getValue", 0), ("getVariable", 1), ("setValue", 1)}


def test_prefix_mode_basic():
    d = build_trie(["test", "testing", "tester", "best"])
    got = qset(d, "tes", 0, prefix_mode=True)
    assert got == {("test", 0), ("testing", 0), ("tester", 0)}
    got = qset(d, "tes", 1, prefix_mode=True)
    assert got == {("test", 0), ("testing", 0), ("tester", 0), ("best", 1)}


def test_substring_mode():
    # substring semantics: unmatched query suffix is free
    d = build_trie(["tes"])
    assert qset(d, "testing", 0, substring_mode=True) == {("tes", 0)}


def test_ordered_query_contract():
    # distance asc, then lexicographic (transducer/mod.rs:390-427)
    d = build_trie(["test", "best", "rest", "tests", "text"])
    got = ordered_query(d, "test", 2)
    assert got[0].term == "test" and got[0].distance == 0
    dists = [c.distance for c in got]
    assert dists == sorted(dists)
    for a, b in zip(got, got[1:]):
        if a.distance == b.distance:
            assert a.term < b.term
    assert ordered_query(d, "test", 2, limit=2) == got[:2]


def test_dawg_minimality():
    # shared suffixes collapse: DAWG of [tap, top] shares the 'p' tail
    d = build_dawg(["tap", "top"])
    assert len(d) == 2
    assert "tap" in d and "top" in d and "tp" not in d
    n_trie = 7  # root + t,a,p + o,p distinct in a trie (root,t,a,o,p,p)
    assert d.node_count() < n_trie


def test_dawg_requires_sorted():
    from liblevenshtein_rust_ray.kernel.dawg import Dawg

    with pytest.raises(ValueError):
        Dawg(["b", "a"])


def test_dawg_query_equals_trie_query():
    terms = ["banana", "band", "bandana", "bans", "can", "candy"]
    t, d = build_trie(terms), build_dawg(terms)
    for q in ["band", "cand", "bananna", "xyz"]:
        for alg in (STANDARD, TRANSPOSITION, MERGE_AND_SPLIT):
            assert qset(t, q, 2, alg) == qset(d, q, 2, alg)


def test_ordered_query_predicate_filter():
    """Filter hook applies before the limit (ordered_query.rs:295)."""
    from liblevenshtein_rust_ray.kernel import build_trie
    from liblevenshtein_rust_ray.kernel.query import ordered_query

    trie = build_trie(["test", "best", "rest", "jest"])
    got = ordered_query(trie, "test", 1, predicate=lambda t: t != "best", limit=2)
    assert [(c.term, c.distance) for c in got] == [("test", 0), ("jest", 1)]


def test_prefix_mode_sound_semantics():
    """Prefix distance = min over term prefixes p of dp(query, p) —
    uniformly, including terms shorter than the query (trailing query
    chars count as deletions).  The reference instead filters finality to
    fully-consumed positions (state.rs:264-281), which is unsound under
    subsumption-minimal states AND silently drops short terms; see
    kernel/state.py::infer_prefix_distance for the analysis.  This test
    pins the corrected semantics on the cases where the two diverge."""
    from liblevenshtein_rust_ray.kernel import build_trie
    from liblevenshtein_rust_ray.kernel.query import query

    trie = build_trie(["bb", "baab", "ba"])
    got = {c.term: c.distance for c in query(trie, "baa", 2, prefix_mode=True)}
    assert got["baab"] == 0
    assert got["ba"] == 1   # delete q's trailing 'a'
    assert got["bb"] == 2   # dp('baa','bb') == 2 (the reference misses it)
    empty_trie = build_trie(["", "x"])
    got2 = {c.term: c.distance for c in query(empty_trie, "ab", 2, prefix_mode=True)}
    assert got2[""] == 2    # two deletions; dropped by the reference
    # the subsumption counterexample that exposed the reference bug
    got3 = {c.term: c.distance
            for c in query(build_trie(["aaacb"]), "aaaba", 2, prefix_mode=True)}
    assert got3["aaacb"] == 2


def test_substring_mode_suffix_automaton_convention():
    """Trie substring_mode uses min_distance (free QUERY suffix) — the
    suffix-automaton convention (reference query.rs:147-156): the dictionary
    is expected to hold suffixes, so 'term approximates a PREFIX of the
    query' is the per-entry test.  'ab' matches query 'abb' at 0 (free
    query tail); full substring-in-text search over raw text is
    kernel.substring / pipelines.fuzzy.substring_search."""
    from liblevenshtein_rust_ray.kernel import build_trie
    from liblevenshtein_rust_ray.kernel.query import query

    got = {c.term: c.distance
           for c in query(build_trie(["ab", "zz"]), "abb", 0, substring_mode=True)}
    assert got == {"ab": 0}


# ---------------------------------------------------------------------------
# Fluent builder APIs (reference builder.rs:40-103, builder_api.rs:35-209).
# ---------------------------------------------------------------------------
def test_transducer_builder_fluent():
    import pytest as _pytest

    from liblevenshtein_rust_ray.kernel import BuilderError, TransducerBuilder

    t = (TransducerBuilder()
         .dictionary(["apple", "apply", "ape", "banana"])
         .algorithm("standard")
         .backend("array_trie")
         .build())
    got = t.query("aple").max_distance(1).ordered().execute()
    assert [(c.term, c.distance) for c in got] == [("ape", 1), ("apple", 1)]
    assert t.query("aple").max_distance(1).limit(1).collect_terms() == ["ape"]
    # predicate filter (ordered contract)
    got = t.query("aple").max_distance(1).filter(lambda s: s.startswith("app")).execute()
    assert [c.term for c in got] == ["apple"]

    with _pytest.raises(BuilderError):
        TransducerBuilder().build()  # missing dictionary
    with _pytest.raises(BuilderError):
        TransducerBuilder().algorithm("nope")
    with _pytest.raises(BuilderError):
        TransducerBuilder().backend("nope")
    with _pytest.raises(BuilderError):
        TransducerBuilder().dictionary([]).build()
    with _pytest.raises(BuilderError):
        t.query("x").max_distance(-1)


def test_query_builder_per_query_algorithm_and_prefix():
    from liblevenshtein_rust_ray.kernel import TransducerBuilder

    t = (TransducerBuilder()
         .dictionary(["abcd", "abdc", "zzzz"])
         .algorithm("standard")
         .backend("trie")
         .build())
    # per-query algorithm override: OSA finds the transposed term at d=1
    std = t.query("abcd").max_distance(1).execute()
    osa = t.query("abcd").max_distance(1).algorithm("transposition").execute()
    assert {c.term for c in std} >= {"abcd"}
    assert ("abdc", 1) in [(c.term, c.distance) for c in osa]
    # prefix mode through the builder
    pre = t.query("ab").max_distance(0).prefix_mode().ordered().execute()
    assert {c.term for c in pre} == {"abcd", "abdc"}


def test_trie_dynamic_insert_remove():
    """Online insert/remove (the DynamicDawg mutable-dictionary capability,
    reference src/dictionary/dynamic_dawg.rs) on the Trie backend."""
    from liblevenshtein_rust_ray.kernel import build_trie
    from liblevenshtein_rust_ray.kernel.query import query as kq

    t = build_trie(["car", "card", "care"])
    assert len(t) == 3
    # remove a word that is a prefix of others: children must survive
    assert t.remove("car") is True
    assert "car" not in t and "card" in t and "care" in t
    assert len(t) == 2
    # remove a leaf: the dangling suffix path is pruned
    assert t.remove("card") is True
    assert t.root.edges["c"].edges["a"].edges["r"].edges.keys() == {"e"}
    # absent / double removal
    assert t.remove("card") is False
    assert t.remove("nope") is False
    # re-insert after removal
    t.insert("car")
    assert "car" in t and len(t) == 2
    got = sorted(c.term for c in kq(t, "care", 1))
    assert got == ["car", "care"]
    assert sorted(t.iter_terms()) == ["car", "care"]


def test_cli_query_array_trie_backend(capsys):
    import json

    from liblevenshtein_rust_ray.cli import main

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "words.txt")
        with open(p, "w") as f:
            f.write("apple\napply\nape\n")
        rc = main(["query", "--dict", p, "--term", "aple", "-n", "1",
                   "--backend", "array_trie"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert {r["term"] for r in out} == {"ape", "apple"}
