"""Batched model-inference stage — the actor-pool scoring pattern.

A quality-classifier pass over a corpus (fastText-style linear scorer,
perplexity filter, reward model) is an ACTOR-POOL ``map_batches`` stage:
the model loads ONCE per actor in ``__init__`` (never per batch), every
batch is one vectorized forward pass, and ``concurrency`` x ``num_cpus``
sizes the pool to the node.  The container has no ML runtimes, so the
"model" here is a frozen linear scorer over vectorized text features —
the Ray-side plumbing (actor signature, per-actor load, batched forward,
output layout) is the real deliverable, exactly like the multimodal
decode stubs (stages/multimodal.py); swap ``LinearQualityModel`` for a
real classifier and nothing else changes.

The frozen weights make the score a pure float64 polynomial of integer
features, evaluated in the SAME operation order the SQL oracle uses —
bit-identical results, so even this stub is value-hash checkable.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# frozen "checkpoint": weights of the linear quality model.  The SQL
# oracle embeds these literals in the same order — do not reorder terms.
MODEL_WEIGHTS = {
    "bias": -0.5,
    "n_tokens": 0.01,
    "n_distinct_frac": 2.0,   # distinct/total tokens
    "mean_token_len": 0.125,
}
MODEL_KEEP_THRESHOLD = 1.0


class LinearQualityModel:
    """The per-actor 'model'.  ``__init__`` is the expensive load (here:
    materializing the weight vector; for a real model: torch.load /
    fasttext.load_model) and runs once per actor; ``score`` is one numpy
    forward pass per batch."""

    def __init__(self):
        self.w = MODEL_WEIGHTS

    def score(self, n_tokens: np.ndarray, n_distinct: np.ndarray,
              sum_len: np.ndarray) -> np.ndarray:
        nt = np.maximum(n_tokens, 1)
        # evaluation order mirrored by the oracle: bias + a + b + c
        return (self.w["bias"]
                + self.w["n_tokens"] * n_tokens
                + self.w["n_distinct_frac"] * (n_distinct / nt)
                + self.w["mean_token_len"] * (sum_len / nt))


class ModelScoreActor:
    """Callable class for ``map_batches(..., concurrency=N)``: model load
    in ``__init__``, vectorized feature extraction + forward in
    ``__call__``."""

    def __init__(self):
        self.model = LinearQualityModel()

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd

        text = pc.coalesce(t.column("text"), pa.scalar("", type=pa.string()))
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lower = pc.utf8_lower(text)
        n_tokens = pc.count_substring_regex(
            lower, pattern=r"[a-z0-9]+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        tok_lists = pc.split_pattern_regex(lower, pattern=r"[^a-z0-9]+")
        flat = tok_lists.flatten()
        counts = np.diff(tok_lists.offsets.to_numpy().astype(np.int64))
        parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        mask = lens > 0
        sum_len = np.bincount(parent[mask], weights=lens[mask],
                              minlength=t.num_rows).astype(np.int64)
        codes, _ = pd.factorize(
            pd.Series(flat.to_numpy(zero_copy_only=False)[mask]))
        per = (pd.DataFrame({"d": parent[mask], "w": codes})
               .drop_duplicates().groupby("d", sort=False).size())
        n_distinct = np.zeros(t.num_rows, dtype=np.int64)
        n_distinct[per.index.to_numpy()] = per.to_numpy()

        score = self.model.score(n_tokens, n_distinct, sum_len)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "model_score": pa.array(score),
            "model_keep": pa.array(score > MODEL_KEEP_THRESHOLD),
        })


def model_score(ds, concurrency: int | None = None, batch_size: int = 1024,
                num_cpus: float = 1):
    """Dataset stage: per-document model quality score + keep verdict via
    an actor pool (model loaded once per actor).  ``concurrency x
    num_cpus`` MUST stay below the session's CPU count so the operators
    feeding the pool keep scheduling slots — a pool sized to the whole
    session live-locks the pipeline (measured on the 4-CPU test session;
    same rule as pipelines/spelling.py dictionary_membership).  Default:
    ncpu//4 actors, clamped to [2, 8]."""
    if concurrency is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, min(8, ncpu // 4))
    return ds.map_batches(
        ModelScoreActor,
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=num_cpus,
        batch_format="pyarrow",
    )
