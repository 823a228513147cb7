"""DP distance oracles — golden vectors from the reference's doctests/tests
(/root/reference/src/distance/mod.rs)."""

from liblevenshtein_rust_ray.kernel import (
    standard_distance,
    transposition_distance,
    merge_and_split_distance,
    strip_common_affixes,
    MemoCache,
)


def test_standard_golden():
    # mod.rs doctests: kitten/sitting = 3
    assert standard_distance("kitten", "sitting") == 3
    assert standard_distance("test", "test") == 0
    assert standard_distance("", "") == 0
    assert standard_distance("", "abc") == 3
    assert standard_distance("abc", "") == 3
    assert standard_distance("test", "best") == 1
    assert standard_distance("test", "rest") == 1
    assert standard_distance("test", "testing") == 3
    assert standard_distance("flaw", "lawn") == 2


def test_transposition_golden():
    # mod.rs doctests: one transposition
    assert transposition_distance("ab", "ba") == 1
    assert transposition_distance("test", "tset") == 1
    assert transposition_distance("teh", "the") == 1
    # standard distance would be 2 for these
    assert standard_distance("ab", "ba") == 2
    # OSA restriction: "ca" -> "abc" is 3 under OSA
    assert transposition_distance("ca", "abc") == 3
    assert transposition_distance("kitten", "sitting") == 3


def test_merge_split_golden():
    # mod.rs doctests: "m" <-> "rn" is one merge/split
    assert merge_and_split_distance("m", "rn") == 1
    assert merge_and_split_distance("rn", "m") == 1
    assert merge_and_split_distance("cl", "d") == 1
    assert merge_and_split_distance("test", "test") == 0
    assert merge_and_split_distance("", "ab") == 2
    # no transposition in merge-split: ab <-> ba is 2
    assert merge_and_split_distance("ab", "ba") == 2
    # "every one" <-> "everyone": delete one space = 1
    assert merge_and_split_distance("every one", "everyone") == 1


def test_merge_split_symmetry_and_bounds():
    cases = [("abc", "ab"), ("hello", "help"), ("aaa", "a"), ("abcd", "xy")]
    for a, b in cases:
        d = merge_and_split_distance(a, b)
        assert d == merge_and_split_distance(b, a)
        # merge/split can only reduce distance vs standard
        assert d <= standard_distance(a, b)


def test_strip_common_affixes():
    # (prefix_len, core_a, core_b) per reference mod.rs:111-147
    assert strip_common_affixes("testing", "tested") == (4, 3, 2)
    assert strip_common_affixes("abc", "abc") == (3, 0, 0)
    assert strip_common_affixes("", "abc") == (0, 0, 3)
    assert strip_common_affixes("abc", "xbc") == (0, 1, 1)


def test_memo_cache():
    cache = MemoCache("standard")
    assert cache.distance("kitten", "sitting") == 3
    assert cache.distance("sitting", "kitten") == 3  # symmetric key hit
    assert cache.hits == 1 and cache.misses == 1


def test_unicode_char_level():
    # char-level distances (reference *Char backends / test_utf8_char_level.rs)
    assert standard_distance("café", "cafe") == 1
    assert standard_distance("中文", "中国") == 1
    assert standard_distance("🎉", "") == 1


def test_bytes_level():
    # byte-level semantics: é is 2 bytes in UTF-8
    assert standard_distance("café".encode(), "cafe".encode()) == 2
