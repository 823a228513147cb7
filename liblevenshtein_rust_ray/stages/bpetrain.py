"""BPE merge learning over a corpus — distributed tokenizer training.

The classic byte-pair-encoding training loop (Sennrich et al. 2016;
reference capability family: `src/corpus/parser.rs` word-frequency
ranking feeding a subword model) as a Ray Data operator:

1. ONE distributed corpus pass builds the word-frequency table (the
   same `[a-z0-9]+` lower tokenization as word_freq / tfidf — partial
   per-batch counts, one tiny (token, count) exchange).  All further
   rounds operate on the VOCABULARY table, not the corpus — the
   standard trick that makes BPE training corpus-size-independent
   after one pass (training cost scales with distinct words).
2. Each merge round counts adjacent symbol pairs weighted by word
   frequency, picks the argmax (ties: count desc, left asc, right
   asc — fully deterministic), and applies the merge left-to-right
   non-overlapping (exactly `str.replace` on the MARKER-WRAPPED
   symbol string "<a><b><c>", which is also SQL `replace` semantics —
   the property the chained-CTE oracle leans on; see the encoding
   note in the distributed branch).

``mode="driver"`` runs the merge rounds on the driver over the pulled
vocab table (guarded by ``max_vocab_driver`` — default 2M: the loop is
per-word Python, so the guard is sized to loop time, not memory).
``mode="distributed"`` keeps the vocabulary
a Dataset and runs each round as a pair-count partial exchange +
driver argmax + broadcast merge application — the path for
vocabularies past the driver guard; bit-identical to the driver loop
(pinned by tests).  ``mode="auto"`` picks driver under the guard.

Output: one row per learned merge — (merge_rank, lhs, rhs, pair_count).
"""

from collections import Counter

import pyarrow as pa


def _word_freq_table(ds, text_col: str):
    """Distributed (token, freq) over the corpus — occurrence counts,
    word_freq's exact tokenization and partial combiner
    (``functions.tokenize.token_freq_partial``, the columnar kernel
    shared with pipelines.relational.word_freq) + one tiny exchange."""
    from ray.data.aggregate import Sum

    from ..functions.tokenize import token_freq_partial

    return (ds.map_batches(
                lambda t: token_freq_partial(t.column(text_col)),
                batch_format="pyarrow")
            .groupby("token").aggregate(Sum("c", alias_name="freq")))


def _apply_merge(sy: list, l: str, r: str, merged: str) -> list:
    """Left-to-right non-overlapping merge — `str.replace` semantics on
    the space-joined form, kept in list form for speed."""
    i, ns = 0, []
    n = len(sy)
    while i < n:
        if i + 1 < n and sy[i] == l and sy[i + 1] == r:
            ns.append(merged)
            i += 2
        else:
            ns.append(sy[i])
            i += 1
    return ns


def _best_pair(cnt):
    """Deterministic argmax: count desc, lhs asc, rhs asc."""
    return min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))


def _merges_driver(words, freqs, n_merges: int):
    out = []
    for rank in range(1, n_merges + 1):
        cnt = Counter()
        for sy, f in zip(words, freqs):
            for a, b in zip(sy, sy[1:]):
                cnt[(a, b)] += f
        if not cnt:
            break
        (l, r), c = _best_pair(cnt)
        out.append((rank, l, r, int(c)))
        merged = l + r
        words = [_apply_merge(sy, l, r, merged) if l in sy else sy
                 for sy in words]
    return out


def bpe_learn_merges(ds, text_col: str = "text", n_merges: int = 8,
                     max_vocab_driver: int = 2_000_000,
                     mode: str = "auto"):
    """Learn the first ``n_merges`` BPE merges; returns a pandas
    DataFrame (merge_rank, lhs, rhs, pair_count) — at most ``n_merges`` rows,
    fewer if the vocabulary runs out of adjacent pairs."""
    import pandas as pd

    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"bpe_learn_merges: unknown mode {mode!r}")

    wf = _word_freq_table(ds, text_col)

    if mode != "distributed":
        wf = wf.materialize()
        n_vocab = wf.count()
        if n_vocab > max_vocab_driver:
            if mode == "driver":
                raise ValueError(
                    f"bpe_learn_merges(mode='driver'): vocabulary "
                    f"({n_vocab}) exceeds max_vocab_driver="
                    f"{max_vocab_driver}; use mode='distributed'")
            mode = "distributed"
        else:
            vocab = wf.to_pandas()
            words = [list(w) for w in vocab["token"]]
            freqs = vocab["freq"].to_numpy()
            rows = _merges_driver(words, freqs, n_merges)
            return pd.DataFrame(rows, columns=["merge_rank", "lhs", "rhs",
                                               "pair_count"]).astype(
                {"merge_rank": "int64", "pair_count": "int64"})

    # ---- distributed rounds: vocab stays a Dataset ----------------------
    # Symbol sequences travel as MARKER-WRAPPED strings "<a><b><c>"
    # (Arrow string col).  With every symbol delimited on BOTH sides by
    # characters outside the token alphabet, plain left-to-right
    # non-overlapping `replace("<l><r>", "<lr>")` is EXACTLY the BPE
    # merge step: adjacent occurrences share no characters (unlike a
    # single-separator encoding), a suffix of a longer symbol can't fake
    # an l-match ("<th><e>" has no "<h>"), and a longer symbol can't
    # fake an r-prefix ("<a><bc>" has no "<b>").  The SQL oracle uses
    # the same encoding, so engine and oracle share semantics by
    # construction.  Each round = one pair-count partial exchange ->
    # driver argmax (distinct-symbol-pairs sized) -> one stateless merge
    # map.  Rounds run over the vocab table, never the corpus.
    def to_syms(t: pa.Table) -> pa.Table:
        toks = t.column("token").to_pylist()
        return pa.table({
            "s": pa.array(["<" + "><".join(w) + ">" for w in toks],
                          type=pa.string()),
            "f": t.column("freq").combine_chunks().cast(pa.int64()),
        })

    cur = wf.map_batches(to_syms, batch_format="pyarrow").materialize()

    out = []
    for rank in range(1, n_merges + 1):
        def pair_partial(t: pa.Table) -> pa.Table:
            cnt = Counter()
            fs = t.column("f").to_numpy(zero_copy_only=False)
            for s, f in zip(t.column("s").to_pylist(), fs):
                sy = s[1:-1].split("><")
                for a, b in zip(sy, sy[1:]):
                    cnt[(a, b)] += int(f)
            if not cnt:
                return pa.table({"l": pa.array([], type=pa.string()),
                                 "r": pa.array([], type=pa.string()),
                                 "c": pa.array([], type=pa.int64())})
            ls, rs = zip(*cnt.keys())
            return pa.table({"l": pa.array(ls, type=pa.string()),
                             "r": pa.array(rs, type=pa.string()),
                             "c": pa.array(list(cnt.values()),
                                           type=pa.int64())})

        from ray.data.aggregate import Sum

        agg = (cur.map_batches(pair_partial, batch_format="pyarrow")
               .groupby(["l", "r"]).aggregate(Sum("c", alias_name="c"))
               .to_pandas())
        if "l" not in agg.columns:
            break  # every partial was empty -> schema-less aggregate
        agg = agg.dropna(subset=["l"])
        if not len(agg):
            break
        agg = agg.sort_values(["c", "l", "r"],
                              ascending=[False, True, True])
        l, r, c = (agg.iloc[0]["l"], agg.iloc[0]["r"],
                   int(agg.iloc[0]["c"]))
        out.append((rank, l, r, c))
        pat, rep = f"<{l}><{r}>", f"<{l}{r}>"

        def apply(t: pa.Table, pat=pat, rep=rep) -> pa.Table:
            ss = [s.replace(pat, rep) for s in t.column("s").to_pylist()]
            return pa.table({"s": pa.array(ss, type=pa.string()),
                             "f": t.column("f").combine_chunks()})

        cur = cur.map_batches(apply, batch_format="pyarrow").materialize()

    return pd.DataFrame(out, columns=["merge_rank", "lhs", "rhs",
                                      "pair_count"]
                        ).astype({"merge_rank": "int64",
                                  "pair_count": "int64"})
