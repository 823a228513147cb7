"""Columnar tokenizer/shingle kernel parity vs the per-row reference.

The per-row ``tokenize`` / ``shingles`` functions are the semantic
definition (SQL-mirrorable: regexp_extract_all(lower(text), '[a-z0-9]+'));
the columnar kernels must be bit-identical on every input, including the
two codepoints whose str.lower() introduces ASCII token chars (U+0130 İ,
U+212A KELVIN SIGN), multi-byte UTF-8, empty/null rows, and both the
packed-int64-key and void-view unique branches of the shingle kernel.
"""

import random
import string

import numpy as np
import pyarrow as pa
import pytest

from liblevenshtein_rust_ray.functions.tokenize import (
    shingle_codes_column,
    shingle_column,
    shingles,
    token_counts_column,
    token_freq_partial,
    tokenize,
    tokenize_column,
)

EDGE = [
    "Hello World 123 foo-bar",
    "",
    None,
    "   ",
    "a",
    "ÉLAN café naïve",
    "İstanbul KelvinKsign",           # lower() -> ASCII risk codepoints
    "ab1 CD2 ef3 gh4 ij5",
    "x" * 5000 + " yz",
    "多字节 utf8 text here",
    "tab\tsep\nnewline",
    "1234567890",
    "dup dup dup dup",
    "one two one two one two",
]


def _fuzz(n=400, seed=7):
    rng = random.Random(seed)
    alpha = string.ascii_letters + string.digits + " .,;é中Kİ\t\n"
    return ["".join(rng.choice(alpha) for _ in range(rng.randrange(0, 80)))
            for _ in range(n)]


def test_tokenize_column_parity():
    cases = EDGE + _fuzz()
    col = pa.array(cases, type=pa.string())
    toks, offs = tokenize_column(col)
    tp = toks.to_pylist()
    for j, x in enumerate(cases):
        assert tokenize(x or "") == tp[offs[j]:offs[j + 1]], repr(x)
    counts = token_counts_column(col)
    assert counts.tolist() == [len(tokenize(x or "")) for x in cases]


@pytest.mark.parametrize("k", [1, 2, 3, 5, 8])
def test_shingle_column_parity(k):
    cases = EDGE + _fuzz()
    col = pa.array(cases, type=pa.string())
    sh, so = shingle_column(col, k)
    sp = sh.to_pylist()
    for j, x in enumerate(cases):
        assert shingles(tokenize(x or ""), k) == sp[so[j]:so[j + 1]], repr(x)


def test_shingle_void_branch():
    # force the void-view unique fallback: vocab big enough that
    # (nv+1)**k overflows the packed-key bound at k=8
    cases = _fuzz(n=600, seed=11)
    col = pa.array(cases)
    toks, _ = tokenize_column(col)
    nv = len(toks.dictionary_encode().dictionary)
    assert (nv + 1) ** 8 > (1 << 62)  # proves the branch taken below
    sh, so = shingle_column(col, 8)
    sp = sh.to_pylist()
    for j, x in enumerate(cases):
        assert shingles(tokenize(x or ""), 8) == sp[so[j]:so[j + 1]]


def test_token_freq_partial_parity():
    import collections

    cases = EDGE + _fuzz()
    col = pa.array(cases, type=pa.string())
    t = token_freq_partial(col)
    got = dict(zip(t.column("token").to_pylist(), t.column("c").to_pylist()))
    exp = collections.Counter(
        tok for x in cases for tok in tokenize(x or ""))
    assert got == dict(exp)


def test_shingle_codes_distinct_and_roundtrip():
    cases = ["a b c a b c", "a b c", "b c a", "", "zz"]
    col = pa.array(cases)
    codes, offs, uniq = shingle_codes_column(col, 3)
    # distinct strings are unique
    u = uniq.to_pylist()
    assert len(set(u)) == len(u)
    # flat reconstruction matches per-row
    flat = uniq.take(pa.array(codes)).to_pylist()
    exp = [s for x in cases for s in shingles(tokenize(x), 3)]
    assert flat == exp
    # duplicate shingles within a doc share a code
    d0 = codes[offs[0]:offs[1]]
    assert d0[0] == d0[3]  # "a b c" appears twice in doc 0


def test_empty_column():
    col = pa.array([], type=pa.string())
    toks, offs = tokenize_column(col)
    assert len(toks) == 0 and offs.tolist() == [0]
    codes, so, uniq = shingle_codes_column(col, 3)
    assert len(codes) == 0 and len(uniq) == 0 and so.tolist() == [0]


def test_sliced_and_chunked_inputs():
    """Buffer-offset handling: sliced arrays and multi-chunk
    ChunkedArrays must tokenize identically to their materialized
    copies (the kernel reads raw buffers with ca.offset applied)."""
    base = ["alpha Beta 42", "césar K", "", "tail end tokens here"] * 5
    arr = pa.array(base, type=pa.string())
    sl = arr.slice(3, 12)
    toks_sl, offs_sl = tokenize_column(sl)
    toks_ref, offs_ref = tokenize_column(pa.array(sl.to_pylist()))
    assert toks_sl.to_pylist() == toks_ref.to_pylist()
    assert offs_sl.tolist() == offs_ref.tolist()

    ch = pa.chunked_array([arr.slice(0, 7), arr.slice(7, 6),
                           pa.array([], type=pa.string()),
                           arr.slice(13, 7)])
    toks_ch, offs_ch = tokenize_column(ch)
    toks_ref2, _ = tokenize_column(pa.array(ch.to_pylist()))
    assert toks_ch.to_pylist() == toks_ref2.to_pylist()

    sh_sl, so_sl = shingle_column(sl, 3)
    sh_ref, so_ref = shingle_column(pa.array(sl.to_pylist()), 3)
    assert sh_sl.to_pylist() == sh_ref.to_pylist()
    assert so_sl.tolist() == so_ref.tolist()


def test_null_rows_treated_as_empty():
    col = pa.array(["a b c", None, "d", None], type=pa.string())
    toks, offs = tokenize_column(col)
    assert toks.to_pylist() == ["a", "b", "c", "d"]
    assert offs.tolist() == [0, 3, 3, 4, 4]
