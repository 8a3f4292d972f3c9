"""Driver-contract test: mimic the driver's harness — run every query at
sf0.001, compare SQL-checked ones against DuckDB (row count + schema names +
order-insensitive values), and smoke the rows-only ones."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{os.path.join(SF_DIR, t)}.parquet')")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_sql_checked_queries_match_duckdb(name):
    q = entrymod.queries()[name]
    got = _normalize(_to_pandas(q(SF_DIR)))
    exp = _normalize(_duck(entrymod.oracle_sql()[name]))
    assert list(got.columns) == list(exp.columns), \
        (list(got.columns), list(exp.columns))
    assert len(got) == len(exp), (len(got), len(exp))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=False, atol=1e-6)


ROWS_ONLY = [n for n in entrymod.queries() if n not in entrymod.oracle_sql()]


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_queries_run(name):
    df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert df is not None
    # an empty Dataset may surface with no columns after to_pandas
    assert len(df) == 0 or len(df.columns) > 0


def test_entry_smoke():
    df = _to_pandas(entrymod.entry())
    assert len(df) > 0
    assert {"vertex", "rank", "component", "partition"} <= set(df.columns)
    assert df["rank"].sum() == pytest.approx(1.0, abs=1e-6)
