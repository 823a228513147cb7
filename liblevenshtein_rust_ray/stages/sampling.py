"""Deterministic sampling / splitting stages (SURVEY §2.6 "sampling
workloads" at corpus scale).

A train/val split at 10^12 docs must be a pure function of the row key —
never of row order, partitioning, or a global shuffle: any node can
recompute a row's split without coordination, resumed runs agree with the
original, and adding shards never reassigns existing rows.  The key is
hashed with the md5 family (``functions.simhash.md5_hash64`` ==
DuckDB ``md5_number_lower``), so the split is SQL-reproducible."""

import pyarrow as pa

from ..functions.simhash import md5_hash64


def split_by_hash(ds, key_col: str, val_pct: int = 10, salt: str = "split",
                  out_col: str = "split"):
    """Append ``out_col`` ∈ {'train', 'val'}: 'val' iff
    ``md5(salt:key) % 100 < val_pct``.  Stateless streaming map — the
    assignment is a pure function of the key, independent of ordering,
    partitioning and cluster size; ``salt`` derives independent splits
    from the same keys."""

    def f(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        lab = [
            "val" if md5_hash64(f"{salt}:{k}") % 100 < val_pct else "train"
            for k in keys
        ]
        return t.append_column(out_col, pa.array(lab, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def rebalance_sources(ds, group_col: str, rates: dict[str, float],
                      key_col: str, default_rate: float = 1.0,
                      salt: str = "mix"):
    """Domain mixing: keep each row of group ``g`` (e.g. a source/domain
    column) with probability ``rates.get(g, default_rate)`` — the standard
    way to re-weight corpus domains for a training mix.  Membership is a
    pure function of the row key (``md5(salt:key) % 10^6`` under an
    integer per-million threshold, exact in SQL), so the sample is
    order/partitioning/cluster-size independent and resumable, and
    disjoint salts give independent draws.  Stateless streaming filter —
    nothing proportional to the corpus is held anywhere."""
    thr = {g: int(round(r * 1_000_000)) for g, r in rates.items()}
    dthr = int(round(default_rate * 1_000_000))

    def f(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        groups = t.column(group_col).to_pylist()
        mask = [
            md5_hash64(f"{salt}:{k}") % 1_000_000 < thr.get(g, dthr)
            for k, g in zip(keys, groups)
        ]
        return t.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(f, batch_format="pyarrow")


def sample_by_hash(ds, key_col: str, pct: int, salt: str = "sample"):
    """Keep a deterministic ``pct``% sample: rows with
    ``md5(salt:key) % 100 < pct``.  Same invariances as
    :func:`split_by_hash`; disjoint salts give independent samples."""

    def f(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        mask = [md5_hash64(f"{salt}:{k}") % 100 < pct for k in keys]
        return t.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(f, batch_format="pyarrow")
