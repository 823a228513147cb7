"""Similarity search over an embedding column (``list<float>``).

* ``ann_brute_topk`` — baseline: broadcast the query matrix once
  (``ray.put``), per-batch numpy matmul partial top-k, then a tiny
  groupby-merge of partials.  No full materialization of the corpus.
* ``ann_lsh_topk``   — scale path: random-hyperplane sign buckets prune the
  corpus per batch before the same matmul (recall traded for compute; the
  bucket width is the knob).
"""

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _PartialTopK:
    """map_batches kernel: cosine of every batch row against the broadcast
    query matrix; emit per-query partial top-k rows.

    The query matrix travels as an object-store ref (``ray.put`` once on the
    driver) and is resolved lazily on the WORKER at first call — a local
    shared-memory read, never re-shipped per batch or serialized into the
    task closure."""

    def __init__(self, queries_ref, k: int):
        self._ref = queries_ref
        self.k = k
        self.qids = None
        self.qmat = None

    def _ensure(self):
        if self.qids is None:
            import ray

            q = ray.get(self._ref)
            self.qids = q["ids"]
            self.qmat = _normalize(q["matrix"].astype(np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure()
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "match_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        mat = _normalize(mat)
        sims = self.qmat @ mat.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        out_q, out_m, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # deterministic partial top-k: sim desc, id asc
            idx = np.lexsort((ids, -row))[:k]
            out_q.extend([self.qids[qi]] * len(idx))
            out_m.extend(ids[idx].tolist())
            out_s.extend(row[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "match_id": pa.array(out_m, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )


def ann_brute_topk(ds, queries: dict, k: int = 5):
    """``queries`` = {"ids": np.ndarray[int64], "matrix": np.ndarray[n,d]}.
    Returns Dataset (query_id, match_id, rank, sim) with exactly top-k per
    query (ties broken by match_id asc — deterministic)."""
    import ray

    ref = ray.put(queries)
    partials = ds.map_batches(
        _PartialTopK(ref, k), batch_format="pyarrow", batch_size=4096
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "match_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "match_id", "rank", "sim"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def ann_lsh_topk(ds, queries: dict, k: int = 5, n_planes: int = 8, probe_hamming: int = 1):
    """LSH-pruned variant: only corpus rows whose sign-bucket is within
    ``probe_hamming`` bits of the query's bucket are scored.  Approximate —
    the baseline above is the exactness oracle in tests."""
    import ray

    rng = np.random.RandomState(42)
    dim = queries["matrix"].shape[1]
    planes = rng.randn(n_planes, dim)

    def bucket(m: np.ndarray) -> np.ndarray:
        return ((m @ planes.T) > 0).astype(np.uint8) @ (1 << np.arange(n_planes, dtype=np.uint64))

    qb = bucket(queries["matrix"].astype(np.float64))
    ref = ray.put({**queries, "buckets": qb})

    class PrunedTopK(_PartialTopK):
        def _ensure(self):
            if self.qids is None:
                super()._ensure()
                import ray as _r

                self.qbuckets = _r.get(self._ref)["buckets"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            self._ensure()
            ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            if mat.size == 0:
                return pa.table({"query_id": pa.array([], type=pa.int64()),
                                 "match_id": pa.array([], type=pa.int64()),
                                 "sim": pa.array([], type=pa.float64())})
            bb = bucket(mat)
            matn = _normalize(mat)
            out_q, out_m, out_s = [], [], []
            for qi in range(len(self.qids)):
                xor = np.bitwise_xor(bb.astype(np.uint64), np.uint64(self.qbuckets[qi]))
                ham = np.array([bin(int(x)).count("1") for x in xor])
                sel = ham <= probe_hamming
                if not sel.any():
                    continue
                row = matn[sel] @ self.qmat[qi]
                sub_ids = ids[sel]
                idx = np.lexsort((sub_ids, -row))[: self.k]
                out_q.extend([self.qids[qi]] * len(idx))
                out_m.extend(sub_ids[idx].tolist())
                out_s.extend(row[idx].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "match_id": pa.array(out_m, type=pa.int64()),
                    "sim": pa.array(out_s, type=pa.float64()),
                }
            )

    partials = ds.map_batches(PrunedTopK(ref, k), batch_format="pyarrow", batch_size=4096)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "match_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "match_id", "rank", "sim"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 7):
    """Deterministic Lloyd's on normalized vectors (spherical k-means-lite)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(sample)
    cent = sample[rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ann_ivf_topk(ds, queries: dict, k: int = 5, n_clusters: int = 16,
                 n_probe: int = 4, sample_size: int = 4096):
    """IVF (inverted-file) ANN — the centroid-partitioned scale path:

    1. driver fits spherical k-means centroids on a bounded SAMPLE of the
       corpus (``ds.random_sample``-sized; deterministic seed);
    2. centroids broadcast once; each query probes its ``n_probe`` nearest
       centroids;
    3. per batch, only rows assigned to a probed centroid are scored
       against that query (numpy matmul), partial top-k, tiny merge.

    Recall degrades with cluster truncation — the brute-force baseline is
    the exactness oracle in tests.  At 100 TB the sample feeding k-means is
    a fixed-size driver-side array; everything else streams."""
    import ray

    sample = []
    remaining = sample_size
    for b in ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        sample.extend(b.column("embedding").to_pylist()[:remaining])
        remaining = sample_size - len(sample)
        if remaining <= 0:
            break
    cent = _kmeans(np.array(sample, dtype=np.float64), n_clusters)

    qmat = _normalize(queries["matrix"].astype(np.float64))
    probes = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]
    ref = ray.put({**queries, "centroids": cent, "probes": probes})

    class IvfTopK(_PartialTopK):
        def _ensure(self):
            if self.qids is None:
                super()._ensure()
                import ray as _r

                obj = _r.get(self._ref)
                self.cent = obj["centroids"]
                self.probes = obj["probes"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            self._ensure()
            ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            if mat.size == 0:
                return pa.table({"query_id": pa.array([], type=pa.int64()),
                                 "match_id": pa.array([], type=pa.int64()),
                                 "sim": pa.array([], type=pa.float64())})
            matn = _normalize(mat)
            assign = np.argmax(matn @ self.cent.T, axis=1)
            out_q, out_m, out_s = [], [], []
            for qi in range(len(self.qids)):
                sel = np.isin(assign, self.probes[qi])
                if not sel.any():
                    continue
                row = matn[sel] @ self.qmat[qi]
                sub_ids = ids[sel]
                idx = np.lexsort((sub_ids, -row))[: self.k]
                out_q.extend([self.qids[qi]] * len(idx))
                out_m.extend(sub_ids[idx].tolist())
                out_s.extend(row[idx].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "match_id": pa.array(out_m, type=pa.int64()),
                    "sim": pa.array(out_s, type=pa.float64()),
                }
            )

    partials = ds.map_batches(IvfTopK(ref, k), batch_format="pyarrow", batch_size=4096)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "match_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "match_id", "rank", "sim"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
