"""Text-analysis map_batches stages over a documents-style table."""

import pyarrow as pa

from ..functions.textstats import (
    _LANG_PROFILES,
    _STOPWORDS,
    rolling_fingerprint,
    fingerprint64,
)


def token_stats_batch(t: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_distinct_tokens, n_chars) — SQL-mirrorable.
    Vectorized: token counts are one RE2 count kernel; distinct counts
    come from ONE flattened factorize + C-path groupby (same semantics as
    the per-row ``len(set(tokenize(x)))`` it replaces, pinned by test)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    text = pc.coalesce(t.column("text"), pa.scalar("", type=pa.string()))
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lower = pc.utf8_lower(text)
    n_tokens = pc.count_substring_regex(lower, pattern=r"[a-z0-9]+")
    # distinct per doc: flatten all tokens once, factorize, group by
    # (doc, code) — no Python row loop
    tok_lists = pc.split_pattern_regex(lower, pattern=r"[^a-z0-9]+")
    flat = tok_lists.flatten()
    counts = np.diff(tok_lists.offsets.to_numpy().astype(np.int64))
    parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
    mask = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    codes, _ = pd.factorize(
        pd.Series(flat.to_numpy(zero_copy_only=False)[mask]))
    per = (pd.DataFrame({"d": parent[mask], "w": codes})
           .drop_duplicates().groupby("d", sort=False).size())
    n_distinct = np.zeros(t.num_rows, dtype=np.int64)
    n_distinct[per.index.to_numpy()] = per.to_numpy()
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_tokens": n_tokens.cast(pa.int64()),
            "n_distinct_tokens": pa.array(n_distinct),
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
        }
    )


def quality_batch(t: pa.Table) -> pa.Table:
    """Vectorized quality stats — same relation as the scalar
    ``functions.textstats.quality_scores`` per row (parity pinned by
    tests): two RE2 count kernels (tokens, punctuation) + ONE flattened
    token pass (Arrow split -> numpy bincount) for stopword counts and
    token-length sums.  No Python row loop — this runs on the full corpus
    at 100 TB (VERDICT r02 task 2)."""
    import numpy as np
    import pyarrow.compute as pc

    n = t.num_rows
    text = pc.coalesce(t.column("text"), pa.scalar("", type=pa.string()))
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    lower = pc.utf8_lower(text)
    n_tokens = (pc.count_substring_regex(lower, pattern=r"[a-z0-9]+")
                .to_numpy(zero_copy_only=False).astype(np.int64))
    # RE2 [^\w\s] == the scalar kernel's re.ASCII pattern == the DuckDB
    # oracle's regexp_extract_all(text, '[^\w\s]')
    n_punct = (pc.count_substring_regex(text, pattern=r"[^\w\s]")
               .to_numpy(zero_copy_only=False).astype(np.int64))

    tok_lists = pc.split_pattern_regex(lower, pattern=r"[^a-z0-9]+")
    flat = tok_lists.flatten()
    counts = np.diff(tok_lists.offsets.to_numpy().astype(np.int64))
    parent = np.repeat(np.arange(n, dtype=np.int64), counts)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = lens > 0
    parent, lens = parent[nonempty], lens[nonempty]
    stop_mask = (pc.is_in(flat, value_set=pa.array(sorted(_STOPWORDS)))
                 .to_numpy(zero_copy_only=False)[nonempty])
    sum_len = np.bincount(parent, weights=lens, minlength=n)
    n_stop = np.bincount(parent[stop_mask], minlength=n).astype(np.int64)

    nt = np.maximum(n_tokens, 1)
    nc = np.maximum(n_chars, 1)
    return pa.table({
        "doc_id": t.column("doc_id"),
        "n_chars": pa.array(n_chars),
        "n_tokens": pa.array(n_tokens),
        "punct_ratio": pa.array(np.where(n_chars > 0, n_punct / nc, 0.0)),
        "stopword_ratio": pa.array(np.where(n_tokens > 0, n_stop / nt, 0.0)),
        "mean_token_len": pa.array(np.where(n_tokens > 0, sum_len / nt, 0.0)),
    })


# the four profiles as (lang, trigram) pairs, profile order preserved for
# the strict-> tie-break of the scalar kernel
_LANGID_LANGS = list(_LANG_PROFILES)

# Flattened-trigram match tables, built lazily once per process: the
# profile trigrams are keyed by their UTF-8 bytes (3-byte ASCII keys via a
# 2^24 boolean LUT; the rare multi-byte trigram, e.g. "ión" = 4 bytes, via
# direct uint32 window equality).  A run of k ASCII bytes in UTF-8 is
# exactly k consecutive codepoints (continuation bytes are >= 0x80), so
# byte-window matching of ASCII trigrams is equivalent to the scalar
# kernel's codepoint-trigram set intersection — parity pinned by tests.
_LANGID_TABLES = None


def _langid_tables():
    global _LANGID_TABLES
    if _LANGID_TABLES is None:
        import numpy as np

        strings = sorted({g for p in _LANG_PROFILES.values() for g in p})
        s3 = sorted((s for s in strings if len(s.encode()) == 3),
                    key=lambda s: int.from_bytes(s.encode(), "big"))
        s4 = sorted((s for s in strings if len(s.encode()) == 4),
                    key=lambda s: int.from_bytes(s.encode(), "big"))
        rest = [s for s in strings if len(s.encode()) > 4]
        if rest:  # profiles are 3 codepoints -> at most 4 UTF-8 bytes here;
            # wider profiles would need another window size
            raise ValueError(f"unsupported profile trigram bytes: {rest}")
        k3 = np.array([int.from_bytes(s.encode(), "big") for s in s3],
                      dtype=np.uint32)
        k4 = np.array([int.from_bytes(s.encode(), "big") for s in s4],
                      dtype=np.uint32)
        lut3 = np.zeros(1 << 24, dtype=bool)
        lut3[k3] = True

        def memb(strs):
            m = np.zeros((len(strs), len(_LANGID_LANGS)), dtype=bool)
            for si, s in enumerate(strs):
                for li, lang in enumerate(_LANGID_LANGS):
                    m[si, li] = s in _LANG_PROFILES[lang]
            return m

        _LANGID_TABLES = (k3, lut3, memb(s3), k4, memb(s4))
    return _LANGID_TABLES


def langid_scores_batch(text: pa.Array) -> "np.ndarray":
    """(len(_LANGID_LANGS), n) matrix of profile-overlap scores for the
    PADDED normalized text.  One flattened byte-trigram pass over the
    Arrow string buffer (zero-copy): uint32 sliding windows -> 2^24 LUT
    membership -> per-(row, trigram) presence dedup -> per-language
    bincount.  Presence (not count) matches the scalar kernel's
    set-intersection semantics; ~3x the ~60-``match_substring`` variant
    it replaces and O(bytes) regardless of profile count."""
    import numpy as np
    import pyarrow.compute as pc

    text = pc.coalesce(text, pa.scalar("", type=pa.string()))
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lower = pc.utf8_lower(text)
    # mirror the scalar chain: lower -> strip -> collapse \s+ -> [:400]
    # -> pad with single spaces (trim set = the DuckDB oracle's)
    trimmed = pc.utf8_trim(lower, " \t\n\r")
    collapsed = pc.replace_substring_regex(trimmed, pattern=r"\s+",
                                           replacement=" ")
    clipped = pc.utf8_slice_codeunits(collapsed, 0, 400)
    padded = pc.binary_join_element_wise(
        pa.scalar(" "), clipped, pa.scalar(" "), "")
    n = len(padded)
    scores = np.zeros((len(_LANGID_LANGS), n), dtype=np.int64)
    if n == 0:
        return scores
    k3, lut3, m3, k4, m4 = _langid_tables()

    binv = padded.cast(pa.binary())
    odt = np.int64 if pa.types.is_large_binary(binv.type) else np.int32
    offs = np.frombuffer(binv.buffers()[1], dtype=odt).astype(np.int64)
    offs = offs[binv.offset:binv.offset + n + 1]
    buf = np.frombuffer(binv.buffers()[2], dtype=np.uint8)
    b = buf[offs[0]:offs[-1]]
    offs = offs - offs[0]
    nb = len(b)
    row_of_byte = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    row_end = offs[1:]

    def accumulate(width: int, keys, kt, memb):
        pos_row = row_of_byte[:nb - (width - 1)]
        valid = (np.arange(nb - (width - 1), dtype=np.int64) + width
                 <= row_end[pos_row])
        if width == 3:
            hit = valid & lut3[keys]
        else:
            hit = np.zeros(len(keys), dtype=bool)
            for kv in kt:
                hit |= keys == kv
            hit &= valid
        if not hit.any():
            return
        hrow = pos_row[hit]
        htid = np.searchsorted(kt, keys[hit]).astype(np.int64)
        code = np.unique(hrow * np.int64(len(kt)) + htid)
        urow, utid = code // len(kt), code % len(kt)
        for li in range(len(_LANGID_LANGS)):
            sel = memb[utid, li]
            if sel.any():
                scores[li] += np.bincount(urow[sel], minlength=n)

    if nb >= 3:
        b32 = b.astype(np.uint32)
        keys3 = ((b32[:-2] << np.uint32(16)) | (b32[1:-1] << np.uint32(8))
                 | b32[2:])
        accumulate(3, keys3, k3, m3)
        if nb >= 4 and len(k4):
            keys4 = (keys3[:-1] << np.uint32(8)) | b32[3:]
            accumulate(4, keys4, k4, m4)
    # len(t) < 5 -> und: padded length = core + 2
    short = (pc.utf8_length(padded).to_numpy(zero_copy_only=False) < 5)
    scores[:, short] = 0
    return scores


def langid_batch(t: pa.Table) -> pa.Table:
    """Vectorized trigram language ID — same answers as the scalar
    ``functions.textstats.langid_ngram`` per row (parity pinned by
    tests); ~60 ``match_substring`` kernels replace the per-doc Python
    trigram set (VERDICT r02 task 2)."""
    import numpy as np

    scores = langid_scores_batch(t.column("text"))
    best = scores.argmax(axis=0)  # first max == the scalar strict-> loop
    best_score = scores.max(axis=0) if scores.size else np.zeros(0)
    langs = np.array(_LANGID_LANGS, dtype=object)
    pred = np.where(best_score >= 3, langs[best], "und")
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "lang_given": t.column("lang") if "lang" in t.column_names else pa.nulls(t.num_rows, pa.string()),
            "lang_pred": pa.array(pred, type=pa.string()),
        }
    )


def fingerprint_batch(t: pa.Table) -> pa.Table:
    texts = t.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "content_hash": pa.array(
                [fingerprint64(x or "") for x in texts], type=pa.uint64()
            ),
            "winnow": pa.array(
                [rolling_fingerprint(x or "") for x in texts],
                type=pa.list_(pa.uint64()),
            ),
        }
    )


def fingerprint_md5_batch(t: pa.Table) -> pa.Table:
    """DuckDB-reproducible fingerprint variant: md5-derived 64-bit content
    hash (md5_number_lower semantics) and a winnowing sketch (window 32,
    stride 4, 8 smallest distinct hashes) emitted as a comma-joined
    decimal string — every step expressible in SQL (substr + md5_number_
    lower + list ops), giving the fingerprint operator an exact oracle.
    Same sketch shape as fingerprint_batch; only the hash family differs."""
    from ..functions.minhash import md5_hash64

    texts = t.column("text").to_pylist()

    def winnow(x: str) -> str:
        if not x:
            return ""
        if len(x) <= 32:
            hs = [md5_hash64(x)]
        else:
            hs = sorted({md5_hash64(x[i:i + 32])
                         for i in range(0, len(x) - 31, 4)})[:8]
        return ",".join(str(h) for h in hs)

    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "content_hash": pa.array(
                [md5_hash64(x or "") for x in texts], type=pa.uint64()
            ),
            "winnow": pa.array([winnow(x or "") for x in texts], type=pa.string()),
        }
    )


# ----------------------------------------------------------------------
# BPE-ish token counting (training-cost estimation: how many subword
# tokens will this corpus cost?).  The pattern is the GPT-2 pre-tokenizer
# shape (contractions | word | number | punctuation-run | whitespace-run)
# restricted to RE2 (no lookahead), so ONE vectorized
# pc.count_substring_regex kernel counts it, and DuckDB's
# regexp_extract_all (same RE2) reproduces it exactly.
BPE_TOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(t: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """(id, n_bpe_tokens, n_chars) — one regex-count kernel, no rows."""
    import pyarrow.compute as pc

    text = pc.coalesce(t.column(text_col), pa.scalar("", type=pa.string()))
    return pa.table({
        id_col: t.column(id_col),
        "n_bpe_tokens": pc.count_substring_regex(
            text, pattern=BPE_TOKEN_RE).cast(pa.int64()),
        "n_chars": pc.utf8_length(text).cast(pa.int64()),
    })


def bpe_token_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset stage: per-document BPE-ish token count (stateless
    streaming map)."""
    return ds.map_batches(
        lambda t: bpe_token_count_batch(t, text_col, id_col),
        batch_format="pyarrow",
    )


# ----------------------------------------------------------------------
# Gopher-style repetition / quality signals (Rae et al. 2021, "Scaling
# Language Models: ..." §A1.1 quality heuristics — public paper).  Word
# and bigram repetition fractions computed per document, fully
# vectorized: one Arrow RE2 split, then numpy bincount / factorized
# pandas groupbys over the flattened token arrays — no Python rows.
# Thresholds for ``keep`` are constants mirrored in the SQL oracle.
GOPHER_MIN_WORDS = 40
GOPHER_MEAN_LEN_LO = 2.0
GOPHER_MEAN_LEN_HI = 10.0
GOPHER_MIN_UNIQUE_FRAC = 0.2
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.08


def gopher_stats_batch(t: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Per-document repetition stats: word/unique-word counts, mean word
    length, top-word and top-/duplicate-bigram fractions, and a Gopher-ish
    ``keep`` verdict.  Tokens are ``\\s+`` splits with empties dropped,
    compared as-is (the corpus is already case-folded); bigrams are
    consecutive pairs of the filtered sequence.  Every reduction is a
    bincount or a factorized C-path groupby over one flattened array."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    n = t.num_rows
    text = pc.coalesce(t.column(text_col), pa.scalar("", type=pa.string()))
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(text, pattern=r"\s+")
    flat = toks.flatten()
    counts = np.diff(toks.offsets.to_numpy().astype(np.int64))
    parent = np.repeat(np.arange(n, dtype=np.int64), counts)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = lens > 0
    parent = parent[nonempty]
    wlens = lens[nonempty]
    codes, uniq = pd.factorize(
        pd.Series(flat.to_numpy(zero_copy_only=False)[nonempty]))

    n_words = np.bincount(parent, minlength=n).astype(np.int64)
    sum_len = np.bincount(parent, weights=wlens, minlength=n).astype(np.int64)

    wc = (pd.DataFrame({"d": parent, "w": codes})
          .groupby(["d", "w"], sort=False).size().reset_index(name="c"))
    per_doc = wc.groupby("d", sort=False)["c"].agg(["count", "max"])
    n_unique = np.zeros(n, dtype=np.int64)
    top_word = np.zeros(n, dtype=np.int64)
    n_unique[per_doc.index.to_numpy()] = per_doc["count"].to_numpy()
    top_word[per_doc.index.to_numpy()] = per_doc["max"].to_numpy()

    same = parent[1:] == parent[:-1]
    bd = parent[1:][same]
    k = np.int64(len(uniq) + 1)
    bcode = codes[:-1][same].astype(np.int64) * k + codes[1:][same]
    bc = (pd.DataFrame({"d": bd, "b": bcode})
          .groupby(["d", "b"], sort=False).size().reset_index(name="c"))
    bagg = bc.groupby("d", sort=False)["c"].agg(
        top="max", dup=lambda s: s[s > 1].sum())
    top_bigram = np.zeros(n, dtype=np.int64)
    dup_bigram = np.zeros(n, dtype=np.int64)
    top_bigram[bagg.index.to_numpy()] = bagg["top"].to_numpy()
    dup_bigram[bagg.index.to_numpy()] = bagg["dup"].to_numpy(dtype=np.int64)

    nw = np.maximum(n_words, 1)
    nb = np.maximum(n_words - 1, 1)
    mean_word_len = sum_len / nw
    top_word_frac = top_word / nw
    top_bigram_frac = np.where(n_words >= 2, top_bigram / nb, 0.0)
    dup_bigram_frac = np.where(n_words >= 2, dup_bigram / nb, 0.0)
    unique_frac = n_unique / nw
    keep = ((n_words >= GOPHER_MIN_WORDS)
            & (mean_word_len >= GOPHER_MEAN_LEN_LO)
            & (mean_word_len <= GOPHER_MEAN_LEN_HI)
            & (unique_frac > GOPHER_MIN_UNIQUE_FRAC)
            & (top_bigram_frac < GOPHER_MAX_TOP_BIGRAM_FRAC))
    return pa.table({
        id_col: t.column(id_col),
        "n_words": pa.array(n_words),
        "n_unique_words": pa.array(n_unique),
        "mean_word_len": pa.array(np.where(n_words > 0, mean_word_len, 0.0)),
        "top_word_frac": pa.array(np.where(n_words > 0, top_word_frac, 0.0)),
        "top_bigram_frac": pa.array(top_bigram_frac),
        "dup_bigram_frac": pa.array(dup_bigram_frac),
        "keep": pa.array(keep),
    })


def gopher_quality(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset stage: per-document Gopher-style repetition stats + keep
    verdict (stateless streaming map_batches — nothing proportional to
    the corpus is held anywhere)."""
    return ds.map_batches(
        lambda t: gopher_stats_batch(t, text_col, id_col),
        batch_format="pyarrow",
    )


# ----------------------------------------------------------------------
# PII redaction — fully vectorized Arrow regex kernels (RE2), applied in a
# fixed order so DuckDB's regexp_replace(..., 'g') chain (same RE2 engine,
# same patterns, same order) reproduces the output byte-for-byte.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d{1,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{3,4}\b", "<PHONE>"),
)


def redact_pii_batch(t: pa.Table, text_col: str = "text",
                     out_col: str = "redacted") -> pa.Table:
    """Replace emails / IPv4s / phone numbers with typed placeholders —
    one ``pc.replace_substring_regex`` kernel per pattern, no Python rows."""
    import pyarrow.compute as pc

    col = pc.coalesce(t.column(text_col), pa.scalar("", type=pa.string()))
    for pat, repl in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
    return t.append_column(out_col, col)


def redact_pii(ds, text_col: str = "text", out_col: str = "redacted"):
    """Dataset stage: scrub PII from ``text_col`` into ``out_col`` (a
    stateless streaming map — nothing proportional to the corpus is held
    anywhere)."""
    return ds.map_batches(
        lambda t: redact_pii_batch(t, text_col, out_col),
        batch_format="pyarrow",
    )


def tfidf_top_terms(ds, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 5, mode: str = "auto",
                    max_vocab_driver: int = 50_000_000):
    """Top-``k`` TF-IDF terms per document: (doc_id, token, tf, df, tfidf,
    rank), rank 1..k by (tfidf desc, token asc) — fully SQL-mirrorable.

    ``mode="auto"`` (default — round-3 VERDICT task 4): run the
    broadcast_df plan when the measured distinct-token count fits under
    ``max_vocab_driver`` (the df aggregation that produces that count is
    pass A of broadcast_df itself, so the decision costs nothing extra),
    else fall back to the exchange plan whose volume is bounded without
    any driver materialization.  Both modes are bit-identical (pinned by
    the parity test); the decision is logged and recorded on
    ``tfidf_top_terms.last_mode``.

    ``mode="exchange"`` (the oracle path — two exchanges, both
    on thin rows):
    1. stateless map: exact (doc, token, tf) rows per batch — Arrow
       lower+split (the token_stats kernel) + one C-path pandas groupby;
       a doc's text lives in one row, so per-batch tf is already final.
    2. token-keyed bucketed exchange: df per token is the group's row
       count (rows are distinct (doc, token)), idf = ln(N/df) attached
       in-bucket — no separate join, nothing doc-sized crosses twice.
    3. doc-keyed bucketed exchange: per-doc top-k with deterministic tie
       order.

    ``mode="broadcast_df"`` (the corpus-scale path — identical output,
    exchange volume shrunk from every (doc, token) row to the per-batch
    DISTINCT-token partials):
    1. pass A: per-batch (token_hash, partial_df) — one 16-byte row per
       distinct token per batch (Zipf vocab overlap makes this a small
       fraction of the (doc, token) rows the exchange mode ships) — then
       one tiny hash-keyed ``groupby().sum()`` to the exact global df
       table, pulled to the driver (vocab-sized, ``max_vocab_driver``
       guard) and broadcast once via ``ray.put`` as two buffer-backed
       numpy arrays (sorted int64 hashes + int64 dfs — zero-copy reads
       from every worker's local object store).
    2. pass B: ONE stateless map — re-tokenize, ``np.searchsorted`` df
       lookup, idf, and per-doc top-k computed locally (a doc's text
       lives in one row, so its whole posting list is batch-local; the
       doc-keyed exchange of mode "exchange" is unnecessary).
    Token identity uses the repo's fixed-key 64-bit siphash: a df merge
    needs two distinct corpus tokens colliding (p ≈ vocab²/2⁶⁵ —
    negligible; the parity test pins bit-equality vs mode "exchange").
    The one scale liability is the driver-materialized vocabulary
    (~16 B/token: 50M tokens ≈ 800 MB); beyond ``max_vocab_driver`` this
    raises and the exchange mode — whose volume is bounded by total
    distinct (doc, token) pairs, same as word_freq — is the fallback.

    N (total docs) is read from input metadata before the tiny-input
    coalesce; hot tokens cost O(df) rows in either mode (no pairing), so
    there is no stop-word blowup."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .grouped import bucketed_apply, coalesce_small_input

    n_docs = ds.count()
    id_type = ds.schema().base_schema.field(id_col).type
    id_pd_dtype = "int64" if pa.types.is_integer(id_type) else object
    ds = coalesce_small_input(ds)

    def term_counts(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t.column(text_col), pa.scalar("", type=pa.string()))
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lower = pc.utf8_lower(text)
        tok_lists = pc.split_pattern_regex(lower, pattern=r"[^a-z0-9]+")
        flat = tok_lists.flatten()
        counts = np.diff(tok_lists.offsets.to_numpy().astype(np.int64))
        parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        mask = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        toks = flat.to_numpy(zero_copy_only=False)[mask]
        ids = t.column(id_col).to_numpy(zero_copy_only=False)[parent[mask]]
        tf = (pd.DataFrame({id_col: ids, "token": toks})
              .groupby([id_col, "token"], sort=False)
              .size().reset_index(name="tf"))
        return pa.table({
            id_col: pa.array(tf[id_col].to_numpy(), type=id_type),
            "token": pa.array(tf["token"], type=pa.string()),
            "tf": pa.array(tf["tf"].to_numpy(), type=pa.int64()),
        })

    _scored_empty = pd.DataFrame({
        id_col: pd.Series(dtype=id_pd_dtype), "token": pd.Series(dtype=object),
        "tf": pd.Series(dtype="int64"), "df": pd.Series(dtype="int64"),
        "tfidf": pd.Series(dtype="float64"),
    })

    _empty = _scored_empty.assign(rank=pd.Series(dtype="int64"))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "tfidf", "token"],
                            ascending=[True, False, True])
        df = df.groupby(id_col, sort=False).head(k).copy()
        df["rank"] = (df.groupby(id_col, sort=False).cumcount() + 1
                      ).astype("int64")
        return df

    if mode not in ("auto", "broadcast_df", "exchange"):
        raise ValueError(f"tfidf_top_terms: unknown mode {mode!r}")

    def _tfidf_exchange():
        def attach_idf(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["df"] = df.groupby("token", sort=False)[id_col].transform(
                "size").astype("int64")
            out["tfidf"] = out["tf"] * np.log(float(n_docs) / out["df"])
            return out

        scored = bucketed_apply(
            ds.map_batches(term_counts, batch_format="pyarrow"),
            "token", attach_idf, empty_result=_scored_empty)

        return bucketed_apply(scored, id_col, topk, empty_result=_empty)

    if mode in ("auto", "broadcast_df"):
        import ray

        from .grouped import _empty_arrow

        def _tok_hash(tokens) -> np.ndarray:
            # fixed-key siphash — elementwise-deterministic across
            # processes; int64 bit-view so Ray's groupby key stays signed
            return pd.util.hash_pandas_object(
                pd.Series(tokens, dtype=object), index=False
            ).to_numpy().view(np.int64)

        def partial_df(t: pa.Table) -> pa.Table:
            tf = term_counts(t)  # rows are distinct (doc, token)
            h = _tok_hash(tf.column("token").to_numpy(zero_copy_only=False))
            dfp = pd.DataFrame({"h": h}).groupby("h", sort=False).size()
            return pa.table({
                "h": pa.array(dfp.index.to_numpy(), type=pa.int64()),
                "dfp": pa.array(dfp.to_numpy(), type=pa.int64()),
            })

        agg = (ds.map_batches(partial_df, batch_format="pyarrow")
               .groupby("h").sum("dfp").materialize())
        n_vocab = agg.count()
        if n_vocab == 0:
            # no tokens anywhere: the aggregate is schema-less; the
            # exchange plan's typed sentinels produce the empty output
            tfidf_top_terms.last_mode = "exchange"
            return _tfidf_exchange()
        if n_vocab > max_vocab_driver:
            if mode == "broadcast_df":
                raise ValueError(
                    f"tfidf_top_terms(mode='broadcast_df'): vocabulary "
                    f"({n_vocab} tokens) exceeds max_vocab_driver="
                    f"{max_vocab_driver}; use mode='exchange' (bounded "
                    f"exchange volume, no driver materialization)")
            # auto: vocab too big to broadcast — fall through to the
            # exchange plan below (its volume is bounded by the distinct
            # (doc, token) pairs, nothing driver-materialized)
            import logging

            logging.getLogger(__name__).info(
                "tfidf_top_terms: auto -> exchange (vocab %d > %d)",
                n_vocab, max_vocab_driver)
            tfidf_top_terms.last_mode = "exchange"
            return _tfidf_exchange()
        tfidf_top_terms.last_mode = "broadcast_df"
        vocab = agg.to_pandas()
        order = np.argsort(vocab["h"].to_numpy(), kind="stable")
        href = ray.put(np.ascontiguousarray(vocab["h"].to_numpy()[order]))
        dref = ray.put(np.ascontiguousarray(
            vocab["sum(dfp)"].to_numpy()[order].astype(np.int64)))

        out_schema = _empty_arrow(_empty).schema

        def topk_local(t: pa.Table) -> pa.Table:
            tf = term_counts(t).to_pandas()
            hs = ray.get(href)  # zero-copy local-object-store views
            dfv = ray.get(dref)
            h = _tok_hash(tf["token"].to_numpy())
            tf["df"] = (dfv[np.searchsorted(hs, h)] if len(tf)
                        else pd.Series(dtype="int64"))
            tf["tfidf"] = tf["tf"] * np.log(float(n_docs) / tf["df"])
            out = topk(tf)
            return pa.Table.from_pandas(
                out[list(_empty.columns)], schema=out_schema,
                preserve_index=False).replace_schema_metadata(None)

        return ds.map_batches(topk_local, batch_format="pyarrow")

    tfidf_top_terms.last_mode = "exchange"
    return _tfidf_exchange()


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    max_tokens: int = 32):
    """Split each document into training-sequence chunks of at most
    ``max_tokens`` tokens: (doc_id, chunk_id, text, n_tokens), chunk_id
    0.., text = the chunk's tokens joined by single spaces (the same
    normalized [a-z0-9]+ tokenization as word_freq/tfidf — chunking for a
    fixed context window normalizes anyway), last chunk carries the
    remainder, empty docs emit nothing.

    One stateless pass: Arrow lower+split gives the flat token stream +
    offsets; chunk index = token position // max_tokens; one pandas
    C-groupby joins each (doc, chunk) group in order.  No exchange at
    all — chunking is embarrassingly parallel at any corpus size."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    def chunks(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t.column(text_col), pa.scalar("", type=pa.string()))
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lower = pc.utf8_lower(text)
        tok_lists = pc.split_pattern_regex(lower, pattern=r"[^a-z0-9]+")
        flat = tok_lists.flatten()
        counts = np.diff(tok_lists.offsets.to_numpy().astype(np.int64))
        parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        mask = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        toks = flat.to_numpy(zero_copy_only=False)[mask]
        parent = parent[mask]
        id_type = t.column(id_col).type
        ids = t.column(id_col).to_numpy(zero_copy_only=False)[parent]
        # token position within its doc, over the kept (non-empty) tokens
        pos = np.arange(len(parent), dtype=np.int64)
        starts = np.zeros(len(parent), dtype=np.int64)
        if len(parent):
            new_doc = np.flatnonzero(np.diff(parent) != 0) + 1
            starts[new_doc] = pos[new_doc]
            starts = np.maximum.accumulate(starts)
        chunk_id = (pos - starts) // max_tokens
        df = pd.DataFrame({id_col: ids, "chunk_id": chunk_id, "tok": toks})
        out = (df.groupby([id_col, "chunk_id"], sort=False)["tok"]
               .agg([(("text"), " ".join), ("n_tokens", "size")])
               .reset_index())
        return pa.table({
            id_col: pa.array(out[id_col].to_numpy(), type=id_type),
            "chunk_id": pa.array(out["chunk_id"].to_numpy(), type=pa.int64()),
            "text": pa.array(out["text"], type=pa.string()),
            "n_tokens": pa.array(out["n_tokens"].to_numpy(), type=pa.int64()),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")


def pack_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                   max_tokens: int = 1024, n_groups: int = 64):
    """Sequence packing — assign WHOLE documents to fixed-token-budget
    training bins: (id, grp, pack_id, n_tokens), where ``pack_id`` is the
    bin index within the document's group.  The dual of
    :func:`chunk_documents` (that splits long docs; this packs short ones
    so training sequences aren't mostly padding).

    Deterministic, cluster-size-independent rule — no greedy global
    state: ``grp = md5(id) % n_groups`` (the DuckDB ``md5_number_lower``
    family), and within a group in ``id`` order,
    ``pack_id = floor(cumsum_of_previous_docs' tokens / max_tokens)``.
    A bin may overshoot ``max_tokens`` by less than the largest single
    document in it (the standard approximate-packing contract; run
    :func:`chunk_documents` first if hard caps are needed) and average
    fill is ~``max_tokens``.

    Scale shape: token counts are one RE2 count kernel per batch
    (stateless map, the doc TEXT never leaves the map — only
    (id, grp, n_tokens) thin rows cross); the one exchange is
    group-keyed on those thin rows, and each group's cumsum is a C-path
    pandas pass.  ``n_groups`` bounds per-worker group size (rows/group
    ≈ N/n_groups 24-byte rows — at 10^12 docs pass n_groups in the
    tens of thousands); packing quality does not depend on n_groups,
    and resumed runs reproduce the exact assignment."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .grouped import bucketed_apply, coalesce_small_input
    from .sampling import _md5_hash64_batch

    id_type = ds.schema().base_schema.field(id_col).type
    id_pd_dtype = "int64" if pa.types.is_integer(id_type) else object
    ds = coalesce_small_input(ds)

    def counts(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t.column(text_col), pa.scalar("", type=pa.string()))
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_tokens = (pc.count_substring_regex(
            pc.utf8_lower(text), pattern=r"[a-z0-9]+")
            .to_numpy(zero_copy_only=False).astype(np.int64))
        grp = (_md5_hash64_batch(t.column(id_col), salt=None)
               % np.uint64(n_groups)).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col).combine_chunks()
            if isinstance(t.column(id_col), pa.ChunkedArray)
            else t.column(id_col),
            "grp": pa.array(grp, type=pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
        })

    _empty = pd.DataFrame({
        id_col: pd.Series(dtype=id_pd_dtype),
        "grp": pd.Series(dtype="int64"),
        "pack_id": pd.Series(dtype="int64"),
        "n_tokens": pd.Series(dtype="int64"),
    })

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["grp", id_col]).reset_index(drop=True)
        cum = (df.groupby("grp", sort=False)["n_tokens"].cumsum()
               - df["n_tokens"])
        df["pack_id"] = (cum // max_tokens).astype("int64")
        return df[[id_col, "grp", "pack_id", "n_tokens"]]

    # exchange buckets scale WITH n_groups (a fixed 64 would put N/64
    # rows in every reduce task no matter how many groups the caller
    # sized for their cluster); cap bounds the tiny-input dispatch count
    return bucketed_apply(
        ds.map_batches(counts, batch_format="pyarrow"),
        "grp", pack, n_buckets=max(64, min(n_groups, 65536)),
        empty_result=_empty)
