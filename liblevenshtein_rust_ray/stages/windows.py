"""Windowed event operators — the "streaming-shaped" custom operators
(session windows, sliding windows, as-of join) expressed as Ray Data batch
transforms.  The reference has no streaming surface (SURVEY.md §2.11); these
cover the windowed-aggregate/as-of-join capability a training-data event
pipeline needs, with exact SQL oracles.

Partitioning assumptions (documented per the custom-operator rule):
* ``sessionize`` / ``asof_join`` co-locate by key (one groupby); correctness
  needs all events of a key together, which the bucketed groupby guarantees.
* ``sliding_window_agg`` explodes each event into the ceil(width/slide)
  windows containing it — partial counts per batch, then one groupby-sum;
  window count per event is a small constant, so the explode is linear.
"""

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(ds, key_col: str, ts_col: str, gap_seconds: float):
    """Gap-based session windows per key: a new session starts when the gap
    to the previous event of the same key exceeds ``gap_seconds``.
    Output: (key, session_id, session_start, session_end, n_events) with
    session_id = rank of the session within the key (1-based)."""
    from .grouped import bucketed_apply

    gap = pd.Timedelta(seconds=gap_seconds)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="mergesort")
        new_key = df[key_col].ne(df[key_col].shift())
        gap_break = df[ts_col].diff() > gap
        start = (new_key | gap_break).cumsum()
        g = df.groupby(start, sort=False)
        out = pd.DataFrame(
            {
                key_col: g[key_col].first(),
                "session_start": g[ts_col].min(),
                "session_end": g[ts_col].max(),
                "n_events": g[ts_col].size().astype("int64"),
            }
        ).reset_index(drop=True)
        out["session_id"] = out.groupby(key_col, sort=False).cumcount() + 1
        return out[[key_col, "session_id", "session_start", "session_end", "n_events"]]

    return bucketed_apply(
        ds.select_columns([key_col, ts_col]),
        key_col,
        per_bucket,
    )


def sliding_window_agg(ds, ts_col: str, value_col: str, width_s: int, slide_s: int,
                       group_col: str | None = None):
    """Sliding windows [w, w+width) starting every ``slide_s`` seconds from
    the epoch: per (window_start, group) event count + value sum.  Each
    event belongs to ceil(width/slide) windows — explode then groupby-sum
    of per-batch partials."""
    from ray.data.aggregate import Sum

    n_windows = (width_s + slide_s - 1) // slide_s

    _DIV = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}

    def explode_partial(t: pa.Table) -> pa.Table:
        col = t.column(ts_col)
        unit = getattr(col.type, "unit", "us")
        ts = col.cast(pa.int64()).to_numpy()
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        groups = (
            t.column(group_col).to_numpy(zero_copy_only=False)
            if group_col
            else np.zeros(len(ts), dtype=np.int64)
        )
        sec = ts // _DIV[unit]
        frames = []
        for k in range(n_windows):
            w = (sec - k * slide_s) // slide_s * slide_s
            ok = (sec >= w) & (sec < w + width_s)
            frames.append(
                pd.DataFrame({"window_start": w[ok], "grp": groups[ok],
                              "n": 1, "v": vals[ok]})
            )
        df = pd.concat(frames, ignore_index=True)
        part = df.groupby(["window_start", "grp"], as_index=False).agg(
            n_events=("n", "sum"), sum_value=("v", "sum")
        )
        # metadata-free schema: pandas metadata makes schemas unhashable
        # and defeats Ray's unify_schemas dedup (see stages/grouped.py)
        return pa.Table.from_pandas(
            part, preserve_index=False).replace_schema_metadata(None)

    out = (
        ds.map_batches(explode_partial, batch_format="pyarrow")
        .groupby(["window_start", "grp"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )
    if not group_col:
        out = out.drop_columns(["grp"])
    return out


def asof_join(left, right, key_col: str, ts_col: str, right_cols: list[str],
              suffix: str = "_right"):
    """For every left row, the LATEST right row of the same key with
    right.ts <= left.ts (backward as-of join, pandas merge_asof semantics).
    Both sides co-locate by key in one bucketed groupby; merge_asof runs
    per bucket on sorted frames.  Output: left columns + the matched right
    timestamp (``ts{suffix}``) + ``right_cols`` (suffixed); unmatched left
    rows keep nulls.

    The two sides are unioned into ONE schema-stable frame (same columns,
    dtypes and order on both sides — padding cells carry typed dummy values
    that are never read) so pandas dtypes survive the shuffle intact."""
    import pyarrow as pa

    from .grouped import bucketed_apply

    lcols = list(left.schema().names)
    rts = f"ts{suffix}"
    rpay = [c + suffix for c in right_cols]
    out_cols = [*lcols, rts, *rpay]
    all_cols = [key_col, ts_col, "__side", rts,
                *[c for c in lcols if c not in (key_col, ts_col)], *rpay]

    def _pd_dtype(schema: pa.Schema, name: str):
        return schema.field(name).type.to_pandas_dtype()

    lschema, rschema = left.schema().base_schema, right.schema().base_schema
    ldt = {c: _pd_dtype(lschema, c) for c in lcols}
    rdt = {c: _pd_dtype(rschema, c) for c in [ts_col, *right_cols]}

    def _filler(dtype, n):
        return pd.Series(np.zeros(n, dtype=np.int64)).astype(dtype)

    def prep_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[lcols].copy()
        out["__side"] = "l"
        out[rts] = _filler(rdt[ts_col], len(df)).values
        for c, rc in zip(right_cols, rpay):
            out[rc] = _filler(rdt[c], len(df)).values
        return out[all_cols]

    def prep_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key_col: df[key_col], ts_col: df[ts_col]})
        out["__side"] = "r"
        out[rts] = df[ts_col].values
        for c, rc in zip(right_cols, rpay):
            out[rc] = df[c].values
        for c in lcols:
            if c not in (key_col, ts_col):
                out[c] = _filler(ldt[c], len(df)).values
        return out[all_cols]

    both = left.map_batches(prep_left, batch_format="pandas").union(
        right.map_batches(prep_right, batch_format="pandas")
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == "l"][lcols].sort_values(ts_col, kind="mergesort")
        r = (
            df[df["__side"] == "r"][[key_col, ts_col, rts, *rpay]]
            .sort_values(ts_col, kind="mergesort")
        )
        if not len(r):
            out = l.copy()
            out[rts] = pd.NaT
            for rc in rpay:
                out[rc] = np.nan
            return out[out_cols]
        merged = pd.merge_asof(l, r, on=ts_col, by=key_col, direction="backward")
        return merged[out_cols]

    return bucketed_apply(both, key_col, per_bucket)


def time_band_join(left, right, key_col: str, ts_col: str, band_s: int,
                   left_id: str, right_id: str, n_buckets: int = 64):
    """Range join on time: every (left, right) row pair of the same key
    with ``|ts_l - ts_r| <= band_s`` — attribution-style joins (clicks
    near errors, events near deploys).

    Banded time blocking: rows bucket by ``epoch_us // band_us``; a
    qualifying pair's buckets differ by at most 1, so the RIGHT side is
    emitted to {b-1, b, b+1} and co-location is guaranteed (pairs seen
    twice dedup in the second exchange).  Per bucket the two sides meet
    in one C-path pandas merge on (key, bucket) and a vectorized |dt|
    filter — no per-row Python.  Partitioning assumption: a (key, band)
    cell's population is bounded by the key's event rate x band, not by
    corpus size.

    Output: ``(left_id, right_id, dt_us)`` with dt = ts_l - ts_r (signed
    microseconds).
    """
    from .grouped import bucketed_apply

    band_us = int(band_s) * 1_000_000

    def _epoch_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            unit = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[
                col.type.unit]
            v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            return v // 1_000 if unit is None else v * unit
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False) * 1_000_000

    def prep(side: str, id_col: str, replicate: bool):
        def fn(t: pa.Table) -> pd.DataFrame:
            ep = _epoch_us(t.column(ts_col))
            b = ep // band_us
            df = pd.DataFrame({
                key_col: t.column(key_col).to_pandas(),
                "__b": b,
                "__ts": ep,
                "__id": t.column(id_col).to_pandas(),
                "__side": side,
            })
            if not replicate:
                return df
            lo = df.copy(); lo["__b"] = lo["__b"] - 1
            hi = df.copy(); hi["__b"] = hi["__b"] + 1
            return pd.concat([lo, df, hi], ignore_index=True)
        return fn

    tagged = left.map_batches(prep("l", left_id, False),
                              batch_format="pyarrow").union(
        right.map_batches(prep("r", right_id, True), batch_format="pyarrow"))

    def _id_dtype(ds, name):
        base = ds.schema().base_schema
        if hasattr(base, "field"):  # Arrow schema
            return base.field(name).type.to_pandas_dtype()
        return dict(zip(base.names, base.types))[name]  # pandas block schema

    ldt = _id_dtype(left, left_id)
    rdt = _id_dtype(right, right_id)
    empty = pd.DataFrame({left_id: pd.Series(dtype=ldt),
                          right_id: pd.Series(dtype=rdt),
                          "dt_us": pd.Series(dtype="int64")})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lt = df[df["__side"] == "l"]
        rt = df[df["__side"] == "r"]
        if not len(lt) or not len(rt):
            return empty
        m = lt.merge(rt, on=[key_col, "__b"], suffixes=("_l", "_r"))
        dt = m["__ts_l"].to_numpy() - m["__ts_r"].to_numpy()
        keep = np.abs(dt) <= band_us
        return pd.DataFrame({
            left_id: m["__id_l"].to_numpy()[keep],
            right_id: m["__id_r"].to_numpy()[keep],
            "dt_us": dt[keep],
        })

    pairs = bucketed_apply(tagged, [key_col, "__b"], per_bucket,
                           n_buckets=n_buckets, empty_result=empty)
    # adjacent-bucket replicas see a pair twice — exact dedup
    return bucketed_apply(
        pairs, [left_id, right_id],
        lambda df: df.drop_duplicates([left_id, right_id]),
        empty_result=empty)
