"""Tokenization / shingling — byte-vs-char duality mirrors the reference's
``CharUnit`` axis (/root/reference/src/dictionary/char_unit.rs:30-165).

Two tiers share one semantics:

- per-string ``tokenize`` (the original, SQL-mirrorable definition:
  ``regexp_extract_all(lower(text), '[a-z0-9]+')``) — kept as the
  reference implementation and the small-input path;
- columnar ``tokenize_column`` / ``shingle_column`` — the corpus-pass
  kernels (vectorized analogue of the reference's SIMD hot loops,
  /root/reference/src/transducer/simd.rs): one numpy pass over the
  Arrow string column's flat UTF-8 buffer (LUT lowercase, LUT token
  class, run-boundary scan), emitting the token stream as a zero-loop
  Arrow array.  Bit-identical to mapping ``tokenize`` per row (pinned
  by tests), because UTF-8 multi-byte sequences contain no ASCII bytes
  (every lead/continuation byte is >= 0x80, so they can only SEPARATE
  tokens — exactly the regex semantics) and the only two codepoints
  whose ``str.lower()`` introduces ASCII token chars (U+0130 İ and
  U+212A KELVIN SIGN, exhaustively enumerated) are detected with one
  RE2 pass and handled by Python-lowering just those rows first.
"""

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# lowercase alnum runs — matches DuckDB's regexp_extract_all(lower(text), '[a-z0-9]+')
_TOKEN_RE = re.compile(r"[a-z0-9]+")

# ---- columnar kernel tables ------------------------------------------
_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[ord("A"):ord("Z") + 1] += 32
_TOK_LUT = np.zeros(256, dtype=bool)
_TOK_LUT[ord("a"):ord("z") + 1] = True
_TOK_LUT[ord("0"):ord("9") + 1] = True
# the ONLY codepoints whose str.lower() contains [a-z0-9] (exhaustive
# scan of U+0080..U+10FFFF): İ -> 'i'+U+0307, KELVIN SIGN -> 'k'
_RISK_RE = "[İK]"


def _as_large_utf8(col) -> pa.Array:
    """One contiguous large_string array, nulls -> '' (tokenize(x or ''))."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.fill_null("")
    if not pa.types.is_large_string(col.type):
        col = col.cast(pa.large_string())  # offsets copy; values shared
    return col


def _column_bytes(ca: pa.Array):
    """(data uint8 view, normalized int64 offsets) for a large_string array."""
    offs = np.frombuffer(ca.buffers()[1], dtype=np.int64)[
        ca.offset: ca.offset + len(ca) + 1]
    data = np.frombuffer(ca.buffers()[2], dtype=np.uint8)
    data = data[offs[0]: offs[-1]]
    offs = offs - offs[0]
    return data, offs


def tokenize_column(col):
    """Vectorized ``tokenize`` over a whole Arrow string column.

    Returns ``(tokens, tok_offs)``: ``tokens`` is ONE large_utf8 array of
    all lowercased tokens in document order, ``tok_offs`` an int64
    ``[n_docs+1]`` array so document ``j``'s tokens are
    ``tokens[tok_offs[j]:tok_offs[j+1]]``.  Bit-identical to
    ``[tokenize(x or '') for x in col.to_pylist()]`` flattened."""
    ca = _as_large_utf8(col)
    n_docs = len(ca)
    if n_docs == 0:
        return (pa.array([], type=pa.large_utf8()),
                np.zeros(1, dtype=np.int64))
    risk = pc.match_substring_regex(ca, _RISK_RE)
    if pc.any(risk).as_py():
        # Python-lower ONLY the risky rows; the byte kernel below is a
        # no-op on already-lowered text, so semantics stay identical.
        idx = np.flatnonzero(risk.to_numpy(zero_copy_only=False))
        repl = pa.array([ca[int(i)].as_py().lower() for i in idx],
                        type=pa.large_utf8())
        mask = np.zeros(n_docs, dtype=bool)
        mask[idx] = True
        ca = pc.replace_with_mask(ca, pa.array(mask), repl)
    data, offs = _column_bytes(ca)
    if len(data) == 0:
        return (pa.array([], type=pa.large_utf8()),
                np.zeros(n_docs + 1, dtype=np.int64))
    low = _LOWER_LUT[data]
    tok = _TOK_LUT[low]
    # run boundaries, forced closed at document edges
    prev = np.empty_like(tok)
    prev[0] = False
    prev[1:] = tok[:-1]
    doc_starts = offs[:-1][offs[:-1] < len(data)]
    prev[doc_starts] = False
    nxt = np.empty_like(tok)
    nxt[-1] = False
    nxt[:-1] = tok[1:]
    doc_last = offs[1:] - 1
    doc_last = doc_last[(doc_last >= 0) & (doc_last < len(data))]
    nxt[doc_last] = False
    s_idx = np.flatnonzero(tok & ~prev)
    e_idx = np.flatnonzero(tok & ~nxt)
    lens = e_idx - s_idx + 1
    n_tok = len(s_idx)
    new_offs = np.zeros(n_tok + 1, dtype=np.int64)
    np.cumsum(lens, out=new_offs[1:])
    # token bytes are contiguous runs in document order, so ONE boolean
    # select is the whole copy (no per-byte gather index)
    tokens = pa.Array.from_buffers(
        pa.large_utf8(), n_tok,
        [None, pa.py_buffer(new_offs), pa.py_buffer(low[tok])])
    # tokens-per-doc: count token starts falling inside each doc span
    per_doc = np.searchsorted(s_idx, offs, side="left")
    return tokens, per_doc.astype(np.int64, copy=False)


def token_counts_column(col) -> np.ndarray:
    """Per-document token counts (vectorized ``token_count``)."""
    _, tok_offs = tokenize_column(col)
    return np.diff(tok_offs)


def token_freq_partial(col) -> pa.Table:
    """Per-batch (token, c) partial counts — the corpus-pass combiner
    shared by word_freq / BPE training / TF-IDF-style vocab passes."""
    tokens, _ = tokenize_column(col)
    vc = pc.value_counts(tokens)
    return pa.table({
        "token": vc.field("values").cast(pa.string()),
        "c": vc.field("counts").cast(pa.int64()),
    })


def shingle_codes_column(col, k: int = 3):
    """Vectorized word-``k``-shingles, factorized.

    Returns ``(codes, sh_offs, uniq)``: ``codes`` is an int64 array with
    one entry per shingle in document order (an index into ``uniq``),
    ``sh_offs`` int64 ``[n_docs+1]`` document offsets, and ``uniq`` a
    large_utf8 array of the DISTINCT space-joined shingle strings.
    ``uniq.take(codes)`` row-for-row equals
    ``[shingles(tokenize(x or ''), k) for x in col]`` flattened —
    including the short-document rule (0 < n_tokens < k -> ONE shingle
    of all tokens; 0 tokens -> no shingle).

    Shape rationale (the 100-TB signer): shingle strings are built only
    once per DISTINCT token window (web corpora repeat stop-shingles
    heavily), everything flat-sized is integer work — per-token
    dictionary codes, a k-column code matrix, one np.unique — and the
    string assembly is Arrow's C ``binary_join_element_wise`` over the
    unique set."""
    tokens, tok_offs = tokenize_column(col)
    n_docs = len(tok_offs) - 1
    n = np.diff(tok_offs)                       # tokens per doc
    ns = np.where(n == 0, 0, np.maximum(n - k + 1, 1))  # shingles per doc
    sh_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(ns, out=sh_offs[1:])
    total_sh = int(sh_offs[-1])
    if total_sh == 0:
        return (np.zeros(0, dtype=np.int64), sh_offs,
                pa.array([], type=pa.large_utf8()))
    de = tokens.dictionary_encode()
    tcodes = de.indices.to_numpy(zero_copy_only=False).astype(
        np.int64, copy=False)
    vocab = de.dictionary
    # flat shingle -> (first token index, token count)
    sh_first = (np.repeat(tok_offs[:-1], ns)
                + (np.arange(total_sh, dtype=np.int64)
                   - np.repeat(sh_offs[:-1], ns)))
    sh_cnt = np.repeat(np.minimum(n, k), ns)
    # k-column code matrix, padded with -1 past each shingle's length;
    # distinct rows <=> distinct shingle strings (space-join is
    # injective on token sequences)
    nv = len(vocab)
    if (nv + 1) ** k <= (1 << 62):
        # pack into one int64 key (codes+1, 0 = absent)
        key = np.zeros(total_sh, dtype=np.int64)
        base = np.int64(nv + 1)
        for j in range(k):
            cj = np.zeros(total_sh, dtype=np.int64)
            valid = sh_cnt > j
            cj[valid] = tcodes[sh_first[valid] + j] + 1
            key = key * base + cj
        uk, codes = np.unique(key, return_inverse=True)
        # decode unique keys back to code tuples
        ucols = []
        rem = uk.copy()
        for j in range(k):
            ucols.append(rem % base - 1)
            rem //= base
        ucols = ucols[::-1]
    else:
        M = np.full((total_sh, k), -1, dtype=np.int64)
        for j in range(k):
            valid = sh_cnt > j
            M[valid, j] = tcodes[sh_first[valid] + j]
        Mc = np.ascontiguousarray(M)
        void = Mc.view([("", np.int64)] * k).ravel()
        uv, codes = np.unique(void, return_inverse=True)
        um = uv.view(np.int64).reshape(-1, k)
        ucols = [um[:, j] for j in range(k)]
    # assemble the distinct strings grouped by shingle token count
    n_uniq = len(ucols[0])
    ucnt = np.zeros(n_uniq, dtype=np.int64)
    for j in range(k):
        ucnt += ucols[j] >= 0
    out = pa.nulls(n_uniq, type=pa.large_utf8())
    parts_cache = {}
    for cnt in np.unique(ucnt):
        cnt = int(cnt)
        sel = np.flatnonzero(ucnt == cnt)
        cols = [vocab.take(pa.array(ucols[j][sel])) for j in range(cnt)]
        if cnt == 1:
            joined = cols[0]
        else:
            joined = pc.binary_join_element_wise(
                *cols, pa.scalar(" ", type=pa.large_utf8()))
        parts_cache[cnt] = (sel, joined)
    # scatter per-cnt results back into one array (replace_with_mask)
    for cnt, (sel, joined) in parts_cache.items():
        mask = np.zeros(n_uniq, dtype=bool)
        mask[sel] = True
        out = pc.replace_with_mask(out, pa.array(mask),
                                   joined.cast(pa.large_utf8()))
    return codes.astype(np.int64, copy=False), sh_offs, out


def shingle_column(col, k: int = 3):
    """Flat form of :func:`shingle_codes_column`: ``(shingle_strs,
    sh_offs)`` with one large_utf8 entry per shingle in document order."""
    codes, sh_offs, uniq = shingle_codes_column(col, k)
    if len(codes) == 0:
        return pa.array([], type=pa.large_utf8()), sh_offs
    return uniq.take(pa.array(codes)), sh_offs


def tokenize(text: str) -> list[str]:
    """Lowercase alphanumeric tokens. The canonical tokenizer for word
    frequency, quality stats and shingles; SQL-mirrorable for the oracle."""
    return _TOKEN_RE.findall(text.lower())


def token_count(text: str) -> int:
    return len(tokenize(text))


def shingles(tokens: list[str], k: int = 3) -> list[str]:
    """Word k-shingles (joined by a space); falls back to the token list when
    the document is shorter than k tokens."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def char_ngrams(text: str, n: int = 3) -> list[str]:
    if len(text) < n:
        return [text] if text else []
    return [text[i : i + n] for i in range(len(text) - n + 1)]
