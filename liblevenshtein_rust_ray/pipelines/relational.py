"""Relational pipelines over the TPC-H-ish tables — the general
data-processing surface (aggregation with partial pre-agg, broadcast join,
top-k, windowed events, word frequency).

Numeric note: monetary aggregates are rounded onto the decimal grid the true
value lies on (input data has fixed decimal precision), making float sums
hash-comparable against the DuckDB oracle regardless of summation order.
"""

import numpy as np
import pandas as pd
import pyarrow as pa



def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ----------------------------------------------------------------------
def q1_lineitem(sf_dir: str):
    """TPC-H Q1-shaped aggregate: per (returnflag, linestatus) sums/avgs.
    Partial aggregation inside map_batches (one row per group per batch),
    then a tiny groupby over partials — the pre-aggregate pattern."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )

    cutoff = pd.Timestamp("1998-09-02")

    # Money sums accumulate in EXACT integer cents (prices/discounts/
    # taxes are 2-decimal): float sums are associativity-dependent, and
    # a distributed partial-sum order differing from DuckDB's scan order
    # flipped sum_disc_price by 1 cent at a round(·, 2) boundary at
    # sf0.001.  Identical int64 totals convert to identical doubles on
    # both engines regardless of magnitude; the int64 headroom
    # (epc·(100-d)·(100+t) ≈ 1e11/row) holds to ~1e7 rows/group-batch
    # and ~1e18 per group total — far past the testdata range.
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= cutoff]
        if df.empty:
            return pd.DataFrame(
                columns=[
                    "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                    "sum_disc_price", "sum_charge", "sum_disc", "count_order",
                ]
            )
        epc = (df["l_extendedprice"] * 100).round().astype("int64")
        d100 = (df["l_discount"] * 100).round().astype("int64")
        t100 = (df["l_tax"] * 100).round().astype("int64")
        g = df.assign(
            qty=df["l_quantity"].round().astype("int64"),
            epc=epc,
            dpc=epc * (100 - d100),
            chg=epc * (100 - d100) * (100 + t100),
            d100=d100,
        ).groupby(["l_returnflag", "l_linestatus"], as_index=False)
        return g.agg(
            sum_qty=("qty", "sum"),
            sum_base_price=("epc", "sum"),
            sum_disc_price=("dpc", "sum"),
            sum_charge=("chg", "sum"),
            sum_disc=("d100", "sum"),
            count_order=("qty", "size"),
        )

    # no engine-side round(): DuckDB rounds doubles as round(x*100)/100
    # while Python rounds to nearest decimal — a total landing on a
    # .xx5 boundary (observed: 30158055.965) diverges by one cent.
    # Identical int64 totals divide to BIT-IDENTICAL doubles, so any
    # downstream rounding (the oracle harness rounds at 6dp) agrees.
    def final(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["count_order"].sum())
        row = {
            "l_returnflag": g["l_returnflag"].iloc[0],
            "l_linestatus": g["l_linestatus"].iloc[0],
            "sum_qty": float(g["sum_qty"].sum()),
            "sum_base_price": g["sum_base_price"].sum() / 100.0,
            "sum_disc_price": g["sum_disc_price"].sum() / 1e4,
            "sum_charge": g["sum_charge"].sum() / 1e6,
            "avg_disc": g["sum_disc"].sum() / (100.0 * n),
            "count_order": n,
        }
        return pd.DataFrame([row])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(final, batch_format="pandas")
    )


# ----------------------------------------------------------------------
def revenue_by_segment(sf_dir: str):
    """orders ⋈ customer (broadcast small side) → per-mktsegment order count
    + total revenue.  The customer table is ray.put once; each batch does a
    numpy/dict lookup — no shuffle join."""
    import ray

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg_of = dict(zip(cust["c_custkey"].astype("int64"), cust["c_mktsegment"]))
    ref = ray.put(seg_of)

    class Join:
        def __init__(self):
            self.seg = None

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self.seg is None:
                self.seg = ray.get(ref)
            df = df.copy()
            df["c_mktsegment"] = df["o_custkey"].map(self.seg)
            g = df.groupby("c_mktsegment", as_index=False).agg(
                n_orders=("o_orderkey", "size"),
                total_price=("o_totalprice", "sum"),
            )
            return g

    partials = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(Join(), batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "c_mktsegment": g["c_mktsegment"].iloc[0],
                    "n_orders": int(g["n_orders"].sum()),
                    "total_price": round(g["total_price"].sum(), 2),
                }
            ]
        )

    return partials.groupby("c_mktsegment").map_groups(final, batch_format="pandas")


# ----------------------------------------------------------------------
def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type: count + rounded value sum.
    The window is a pure row function (epoch-hour), so this is partial-agg +
    groupby like any other aggregate — the streaming-shaped pattern from
    ray_guide.md."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # normalize to µs explicitly — pandas>=2 preserves the Arrow unit, so
        # astype(int64) would be µs or ns depending on the source
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        df["hour_bucket"] = us // 3_600_000_000
        return df.groupby(["event_type", "hour_bucket"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "event_type": g["event_type"].iloc[0],
                    "hour_bucket": int(g["hour_bucket"].iloc[0]),
                    "n_events": int(g["n_events"].sum()),
                    "sum_value": round(g["sum_value"].sum(), 6),
                }
            ]
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "hour_bucket"])
        .map_groups(final, batch_format="pandas")
    )


# ----------------------------------------------------------------------
def word_freq(sf_dir: str, min_freq: int = 2):
    """Token frequency over documents (the BigTxtCorpus word->count analogue,
    /root/reference/src/corpus/parser.rs:58-127).  Partial counts per batch,
    tiny groupby over (token, partial_count)."""
    ds = _read(sf_dir, "documents", columns=["text"])

    from ..functions.tokenize import token_freq_partial

    def partial(t: pa.Table) -> pa.Table:
        return token_freq_partial(t.column("text"))

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c", alias_name="freq"))
    )
    if min_freq > 1:
        out = out.map_batches(
            lambda t: t.filter(pa.compute.greater_equal(t.column("freq"), min_freq)),
            batch_format="pyarrow",
        )
    return out


# ----------------------------------------------------------------------
def top_docs_by_tokens(sf_dir: str, k: int = 10):
    """Top-k documents by token count (sort + limit with deterministic
    tie-break on doc_id)."""
    from ..stages.textstats import token_stats_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        token_stats_batch, batch_format="pyarrow"
    )
    return (
        ds.select_columns(["doc_id", "n_tokens"])
        .sort(["n_tokens", "doc_id"], descending=[True, False])
        .limit(k)
    )
