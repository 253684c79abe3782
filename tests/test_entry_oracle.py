"""Replicates the driver's correctness gate locally: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf0.01 parquet, compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _rows(df_pd):
    cols = sorted(df_pd.columns)
    out = []
    for _, row in df_pd[cols].iterrows():
        out.append(tuple(_canon(x) for x in row))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_parity(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    odf = ddb.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), \
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    a, b = _rows(sdf), _rows(odf)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: value mismatch, first diffs: {mism}"


def test_every_query_has_an_oracle():
    """Every driver-contract query is value-checked: no rows-only entries
    remain (the synthetic corpus is closed-form, so even generated-input
    queries have DuckDB oracles)."""
    assert set(entrymod.queries()) == set(entrymod.oracle_sql())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "valid", "n_violations"}
