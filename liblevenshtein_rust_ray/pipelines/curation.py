"""End-to-end training-data curation over a documents table — the composed
pipeline an LLM-data job runs at 100 TB, built from this repo's stages:

    quality screen (length / punctuation heuristics, vectorized per batch)
    → language-ID filter (trigram-profile heuristic, functions.textstats)
    → exact dedup (keep min doc_id per identical text — one hash exchange)
    → MinHash-LSH near-dedup (md5 hash family, stages.dedup) → drop the
      GREATER id of every candidate pair at jaccard ≥ threshold
    → anti-join of the drop set (one id-keyed bucketed exchange)

Every step is individually oracle-checked elsewhere (quality_docs,
langid_docs, exact_dedup_part, minhash_neardup_docs_md5); the composition
ships its own composed SQL oracle (__ray_entry__ ``curate_docs``), so the
whole pipeline — filters, both dedups, and the drop rule — is
value-checked end to end against DuckDB.

Scale shape: the screen is a stateless map (no exchange); exact dedup is
one hash-bucketed exchange on text; the near-dedup drop set is tiny
relative to the corpus (duplicate fraction × docs) and the anti-join is
one id-keyed bucketed exchange — three exchanges total, none carrying the
corpus more than once.
"""

import pandas as pd
import pyarrow as pa


def curate_documents(ds, min_tokens: int = 10, max_punct: float = 0.2,
                     lang: str = "en", threshold: float = 0.5,
                     hasher: str = "md5"):
    """Dataset[(doc_id, n_tokens)] of curated documents.

    Keep rule: trigram language-ID == ``lang``, at least ``min_tokens``
    tokens, punctuation ratio ≤ ``max_punct``; then exact-dedup (min
    doc_id per text wins); then drop any doc that is the greater element
    of a MinHash-LSH candidate pair at jaccard ≥ threshold.

    ``hasher="md5"`` (default) keeps the near-dup step SQL-reproducible —
    the curate_docs oracle depends on it; pass ``"blake2b"`` for the
    fastest production hash family (same pipeline, different pair RNG)."""
    from ..functions.textstats import langid_ngram, quality_scores
    from ..stages.dedup import exact_dedup, minhash_lsh_pairs
    from ..stages.grouped import bucketed_apply

    def screen(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_pylist()
        out_id, out_text, out_nt = [], [], []
        for i, x in zip(ids, texts):
            x = x or ""
            q = quality_scores(x)
            if (q["n_tokens"] >= min_tokens and q["punct_ratio"] <= max_punct
                    and langid_ngram(x) == lang):
                out_id.append(i)
                out_text.append(x)
                out_nt.append(q["n_tokens"])
        return pa.table({
            "doc_id": pa.array(out_id, type=pa.int64()),
            "text": pa.array(out_text, type=pa.string()),
            "n_tokens": pa.array(out_nt, type=pa.int64()),
        })

    kept = ds.map_batches(screen, batch_format="pyarrow")
    deduped = exact_dedup(kept, "text", "doc_id")

    pairs = minhash_lsh_pairs(deduped, "text", "doc_id",
                              threshold=threshold, hasher=hasher)
    drops = pairs.select_columns(["id_b"]).map_batches(
        lambda t: pa.table({
            "doc_id": t.column("id_b").cast(pa.int64()),
            "n_tokens": pa.array([0] * t.num_rows, type=pa.int64()),
            "is_drop": pa.array([True] * t.num_rows, type=pa.bool_()),
        }),
        batch_format="pyarrow",
    )
    docs = deduped.select_columns(["doc_id", "n_tokens"]).map_batches(
        lambda t: t.append_column("is_drop",
                                  pa.array([False] * t.num_rows, pa.bool_())),
        batch_format="pyarrow",
    )

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False)["is_drop"].any()
        keep_ids = set(g[~g].index)
        out = df[(~df["is_drop"]) & df["doc_id"].isin(keep_ids)]
        return out[["doc_id", "n_tokens"]]

    return bucketed_apply(
        docs.union(drops),
        "doc_id",
        anti,
        empty_result=pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                   "n_tokens": pd.Series(dtype="int64")}),
    )
