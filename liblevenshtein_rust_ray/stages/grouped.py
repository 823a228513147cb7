"""Bucketed group-apply: the cure for per-group Python dispatch.

``ds.groupby(key).map_groups(fn)`` calls Python once per GROUP — at millions
of small blocks (the normal case for blocking keys) the ~0.1-0.2 ms dispatch
dominates end-to-end time.  ``bucketed_group_apply`` instead:

1. hashes the key columns into ``n_buckets`` coarse buckets (vectorized,
   deterministic — pandas siphash with its fixed key, process-independent);
2. runs ONE ``map_groups`` per bucket (tiny dispatch count);
3. inside each bucket, groups by the real key with pandas' C groupby and
   calls ``fn`` only for qualifying groups (``min_group_size`` prunes
   singletons before any Python work).

All members of a key share its bucket, so semantics are identical to a
per-key groupby.  ``n_buckets`` bounds bucket size ≈ rows / n_buckets: size
it so a bucket fits a worker's heap (at webscale pass thousands of buckets;
the shuffle cost is the same one exchange).
"""

import numpy as np
import pandas as pd


def bucketed_group_apply(
    ds,
    key_cols,
    fn,
    n_buckets: int = 64,
    min_group_size: int = 1,
    empty_result: pd.DataFrame | None = None,
):
    """Apply ``fn(group_df) -> DataFrame`` per distinct key tuple, bucketed.

    ``empty_result`` pins the output schema when every group is pruned."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(df[list(key_cols)], index=False)
        # uint32 before the mod: this host's CPU has no vectorized 64-bit
        # integer division (uint64 % is ~30x slower than uint32 %)
        df["__bucket"] = (
            h.to_numpy().astype("uint32") % np.uint32(n_buckets)
        ).astype("int32")
        return df

    # single-column groupers must be scalar (a one-element list makes pandas
    # yield 1-tuple iteration keys that don't match .size()'s scalar index)
    grouper = key_cols[0] if len(key_cols) == 1 else list(key_cols)

    def apply_bucket(bucket: pd.DataFrame):
        outs = []
        grouped = bucket.groupby(grouper, sort=False)
        if min_group_size > 1:
            sizes = grouped.size()
            keep = set(sizes[sizes >= min_group_size].index)
            items = ((k, g) for k, g in grouped if k in keep)
        else:
            items = iter(grouped)
        for _key, g in items:
            out = fn(g.drop(columns="__bucket"))
            if out is not None and len(out):
                outs.append(out)
        if not outs:
            if empty_result is not None:
                return _empty_arrow(empty_result)
            return _schema_probe(fn, bucket, key_cols)
        return _as_typed_block(pd.concat(outs, ignore_index=True),
                               empty_result)

    out = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(apply_bucket, batch_format="pandas")
    )
    return _with_schema_sentinel(out, empty_result)


def _as_typed_block(out, empty_result: pd.DataFrame | None):
    """Non-empty bucket output -> a typed ARROW block matching the
    ``empty_result`` schema.  Without this, non-empty buckets emit pandas
    blocks while empty buckets and the union sentinel emit Arrow — Ray
    logs a 'RefBundle with a different schema' warning per block pair
    (log spam at 800k blocks, and a real schema-drift foot-gun on a
    cluster).  When no ``empty_result`` pins a schema the pandas block
    passes through unchanged (no sentinel exists to drift against)."""
    if empty_result is None or out is None or not isinstance(out, pd.DataFrame):
        return out
    import pyarrow as pa

    schema = _empty_arrow(empty_result).schema
    # replace_schema_metadata(None): from_pandas attaches b'pandas' metadata,
    # and a schema whose metadata holds a dict is UNHASHABLE — Ray's
    # unify_schemas then logs "Failed to hash the schemas" per bundle pair
    # and loses its early-exit dedup (transform_pyarrow.py:175-181).
    return pa.Table.from_pandas(
        out[list(empty_result.columns)], schema=schema, preserve_index=False
    ).replace_schema_metadata(None)


def _empty_arrow(empty_result: pd.DataFrame):
    """Typed 0-row Arrow table matching ``empty_result``'s columns.  Empty
    UDF outputs return THIS instead of an empty object-dtype DataFrame:
    Arrow block size is exact metadata, while Ray's pandas size estimator
    np.vectorize()s over object columns and errors loudly on 0 rows."""
    import numpy as np
    import pyarrow as pa

    def arrow_type(dtype):
        if dtype == object:
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(dtype))

    schema = pa.schema(
        [(c, arrow_type(empty_result[c].dtype)) for c in empty_result.columns]
    )
    return pa.table(
        {c: pa.array([], type=schema.field(c).type) for c in empty_result.columns},
        schema=schema,
    )


def _with_schema_sentinel(out, empty_result: pd.DataFrame | None):
    """A groupby over zero groups yields a schema-less empty dataset; union a
    typed 0-row ARROW block so downstream consumers (schema(), to_pandas,
    write_parquet) always see the column set."""
    if empty_result is None:
        return out
    import ray.data as rd

    return out.union(rd.from_arrow(_empty_arrow(empty_result)))


def bucketed_apply(ds, key_cols, bucket_fn, n_buckets: int = 64,
                   empty_result: pd.DataFrame | None = None):
    """Vectorized cousin of :func:`bucketed_group_apply`: ``bucket_fn`` gets
    the WHOLE bucket DataFrame and does its own (pandas C) grouping —
    e.g. ``df.groupby(keys, as_index=False)[col].min()``.  Total Python
    dispatches = n_buckets, regardless of group count.  Use it for
    aggregate-shaped per-key logic (dedup, min/sum/count combine)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(df[list(key_cols)], index=False)
        # uint32 before the mod: this host's CPU has no vectorized 64-bit
        # integer division (uint64 % is ~30x slower than uint32 %)
        df["__bucket"] = (
            h.to_numpy().astype("uint32") % np.uint32(n_buckets)
        ).astype("int32")
        return df

    def apply_bucket(bucket: pd.DataFrame):
        out = bucket_fn(bucket.drop(columns="__bucket"))
        if empty_result is not None and out is not None and not len(out):
            return _empty_arrow(empty_result)
        return _as_typed_block(out, empty_result)

    out = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(apply_bucket, batch_format="pandas")
    )
    return _with_schema_sentinel(out, empty_result)


def _schema_probe(fn, bucket: pd.DataFrame, key_cols) -> pd.DataFrame:
    """Derive an empty-but-typed frame so Ray keeps a stable schema even when
    a bucket yields nothing: run fn on the first group and take .iloc[:0]."""
    grouper = key_cols[0] if len(key_cols) == 1 else list(key_cols)
    for _key, g in bucket.groupby(grouper, sort=False):
        out = fn(g.drop(columns="__bucket"))
        if out is not None:
            return out.iloc[:0]
        break
    return pd.DataFrame()


def bucketed_apply_arrow(ds, key_cols, bucket_fn, n_buckets: int = 256,
                         empty_result=None):
    """Arrow-native :func:`bucketed_apply`: batches stay ``pa.Table`` end to
    end, so exchange rows never become Python objects.  Bucket assignment
    hashes each key column's DICTIONARY (distinct values only — pandas
    siphash for cross-process determinism) and ``take``s the code per row;
    multi-column keys combine per-column hashes with a polynomial mix.
    ``bucket_fn(pa.Table) -> pa.Table`` must return the same schema for
    every bucket; ``empty_result`` (a typed 0-row ``pa.Table``) is unioned
    as the schema sentinel."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    if isinstance(key_cols, str):
        key_cols = [key_cols]

    def add_bucket(tbl: pa.Table) -> pa.Table:
        nrows = tbl.num_rows
        if nrows == 0:
            return tbl.append_column("__bucket", pa.array([], type=pa.int32()))
        acc = np.zeros(nrows, dtype=np.uint32)
        for c in key_cols:
            d = pc.dictionary_encode(tbl[c].combine_chunks())
            hd = (
                pd.util.hash_pandas_object(d.dictionary.to_pandas(), index=False)
                .to_numpy()
                .astype(np.uint32)
            )
            acc = acc * np.uint32(1000003) ^ hd[d.indices.to_numpy()]
        bucket = (acc % np.uint32(n_buckets)).astype(np.int32)
        return tbl.append_column("__bucket", pa.array(bucket, type=pa.int32()))

    def apply_bucket(tbl: pa.Table) -> pa.Table:
        return bucket_fn(tbl.drop_columns(["__bucket"]))

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(apply_bucket, batch_format="pyarrow")
    )
    if empty_result is not None:
        out = out.union(rd.from_arrow(empty_result))
    return out


def coalesce_small_input(ds, rows_per_block: int = 256, max_rows: int = 65536):
    """Repartition a SMALL input to ~``rows_per_block`` rows/block.

    The fixed 64-split read plan is right for the web-scale corpus, but a
    tiny side table split 64 ways pays 64x task dispatch per stage and
    64 x n_partitions shuffle fragments of ~80-row blocks — pure overhead
    (measured 3.0 -> 1.6 s on the sf0.1 minhash pipeline, identical
    output).  Above ``max_rows`` the input is returned untouched, so the
    cluster physical plan never changes at scale.

    Call this on READS or materialized datasets only: ``count()`` is free
    there (parquet/block metadata) but would execute a derived lazy plan.
    """
    n = ds.count()
    if n <= max_rows:
        # only ever REDUCE below the 64-split read plan: a target >= 64
        # would ADD a shuffle for nothing (the read already has <= 64
        # blocks under read_op_min_num_blocks)
        target = min(64, max(8, n // rows_per_block))
        if target < 64:
            ds = ds.repartition(target)
    return ds
