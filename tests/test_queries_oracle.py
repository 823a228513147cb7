"""Driver-contract check: every queries() entry runs; SQL-expressible ones
match the DuckDB oracle (row count + sorted values) at sf0.001."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "object":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} rows != {len(sql_df)}"
    a, b = _norm(ray_df), _norm(sql_df)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av = a[c].astype(float).to_numpy()
            bv = b[c].astype(float).to_numpy()
            assert all(
                (math.isnan(x) and math.isnan(y)) or abs(x - y) <= 1e-9 * max(1.0, abs(x))
                for x, y in zip(av, bv)
            ), f"{name}: float column {c} differs"
        else:
            assert a[c].tolist() == b[c].tolist(), f"{name}: column {c} differs"


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(con, name):
    ray_df = _to_df(QUERIES[name](SF_DIR))
    sql_df = con.sql(ORACLES[name]).df()
    _compare(ray_df, sql_df, name)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name):
    result = QUERIES[name](SF_DIR)
    df = _to_df(result)
    assert df is not None
    # a legitimately-empty result may lose its column set through Ray's
    # to_pandas (schema-less empty blocks); non-empty results must have one
    if len(df):
        assert len(df.columns) > 0


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing
