"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its DuckDB ``oracle_sql()`` side-by-side at
sf0.01 and compare row-count, column names, and order-insensitive
values (exact, as a value-hash would)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        except duckdb.Error:
            pass
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # cross-engine doubles: compare at 9 significant-ish decimals
        return round(v, 9)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v)
    return v


def _rows(cols, data):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in data)


QUERY_KEYS = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_KEYS)
def test_query_matches_oracle(spark, name):
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        pytest.skip("rows-only query (no SQL oracle)")
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(oracles[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (name, len(spark_rows), len(duck_rows))

    s = _rows(spark_cols, spark_rows)
    d = _rows(duck_cols, duck_rows)
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mism, (name, [(s[i], d[i]) for i in mism[:5]])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns
