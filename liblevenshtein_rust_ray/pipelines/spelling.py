"""Spelling-correction evaluation — the reference's corpus-validation
pipeline (/root/reference/tests/corpus_validation.rs:129-346: Holbrook /
Aspell / Wikipedia recall-at-distance gates) as a distributed job.

``spelling_recall`` generates deterministic misspellings from a vocabulary
(TypoGenerator semantics, generator.rs:35-212 — seeded per word, so any
parallelism yields the same corpus), fuzzy-joins them back against the
vocabulary at distance ``n``, and reports recall: the fraction of
misspellings whose ORIGINAL word is among the matches.  By construction
every misspelling is within ``n`` edits of its original, so the exact
automaton/DP join must achieve recall 1.0 — the pipeline doubles as an
end-to-end kernel-correctness gate (the reference's gates are >= 85-90%
because its corpora are human misspellings; ours are generated at known
distance)."""

import pandas as pd
import pyarrow as pa

from ..functions.simhash import hash64
from ..functions.typogen import TypoGenerator
from .fuzzy import fuzzy_join


def generate_misspellings(vocab_ds, col: str, per_word: int = 2,
                          distance: int = 2, seed: int = 42):
    """Dataset (original, misspelling) — ``per_word`` seeded typos per word,
    each at edit distance <= ``distance`` (exact under all three algorithms:
    no transpositions)."""

    def gen(t: pa.Table) -> pa.Table:
        orig, miss = [], []
        for w in t.column(col).to_pylist():
            if not w or len(w) < 3:
                continue
            g = TypoGenerator(seed=(hash64(w) ^ seed) & 0x7FFFFFFF)
            for _ in range(per_word):
                m = g.generate_typos(w, distance)
                orig.append(w)
                miss.append(m)
        return pa.table({"original": pa.array(orig, type=pa.string()),
                         "misspelling": pa.array(miss, type=pa.string())})

    return vocab_ds.map_batches(gen, batch_format="pyarrow")


def spelling_recall(vocab_ds, col: str, n: int = 2, per_word: int = 2,
                    seed: int = 42):
    """One-row Dataset (n_misspellings, n_recovered, recall): recall of the
    fuzzy join at distance ``n`` against the generating vocabulary."""
    pairs = generate_misspellings(vocab_ds, col, per_word=per_word,
                                  distance=n, seed=seed)
    matches = fuzzy_join(pairs, vocab_ds, "misspelling", col, n=n)

    # (misspelling, original) recovered iff the original appears among the
    # misspelling's matches — a broadcast-free merge on the pair table
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"left_val": "misspelling", "right_val": "matched"})

    m = matches.map_batches(tag, batch_format="pandas")
    truth = pairs

    from ..stages.grouped import bucketed_apply

    def prep_truth(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["matched"] = ""
        out["__side"] = "t"
        return out[["misspelling", "original", "matched", "__side"]]

    def prep_match(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["original"] = ""
        out["__side"] = "m"
        return out[["misspelling", "original", "matched", "__side"]]

    both = truth.map_batches(prep_truth, batch_format="pandas").union(
        m.map_batches(prep_match, batch_format="pandas")
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        t = df[df["__side"] == "t"][["misspelling", "original"]].drop_duplicates()
        mm = df[df["__side"] == "m"][["misspelling", "matched"]]
        hit = t.merge(
            mm, left_on=["misspelling", "original"],
            right_on=["misspelling", "matched"], how="left", indicator=True,
        )
        return pd.DataFrame(
            {
                "n_misspellings": [len(t)],
                "n_recovered": [int((hit["_merge"] == "both").sum())],
            }
        )

    parts = bucketed_apply(both, "misspelling", per_bucket)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        tot = int(df["n_misspellings"].sum())
        rec = int(df["n_recovered"].sum())
        return pd.DataFrame(
            {"n_misspellings": [tot], "n_recovered": [rec],
             "recall": [rec / tot if tot else 1.0]}
        )

    return parts.repartition(1).map_batches(finalize, batch_format="pandas",
                                            batch_size=None)
