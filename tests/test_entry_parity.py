"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its DuckDB ``oracle_sql()`` side-by-side at
sf0.01 and compare row-count, column names, and order-insensitive
values (exact, as a value-hash would).

The comparison is pandas-based on purpose — the driver canonicalizes
with ``DataFrame.sort_values`` + factorize, which (a) crashes on
unhashable array columns and (b) hashes ``194`` differently from
``194.0``.  Entries must therefore return scalar columns whose pandas
dtype *kind* matches the oracle's (int vs float vs object vs
datetime), not just equal Python values.
"""

import numpy as np
import pandas as pd
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


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: bytes(v) if isinstance(v, (bytearray, memoryview)) else v
            )
    # driver-style: sort_values over every column (crashes on lists —
    # that is intentional, entries must not return array columns)
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return pdf


QUERY_KEYS = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_KEYS)
def test_query_matches_oracle(spark, name):
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        pytest.skip("rows-only query (no SQL oracle)")
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_pdf = sdf.toPandas()

    con = _duck()
    duck_pdf = con.execute(oracles[name]).fetchdf()

    assert sorted(c.lower() for c in spark_pdf.columns) == sorted(
        c.lower() for c in duck_pdf.columns
    ), (list(spark_pdf.columns), list(duck_pdf.columns))
    assert len(spark_pdf) == len(duck_pdf), (name, len(spark_pdf), len(duck_pdf))

    s, d = _canon(spark_pdf), _canon(duck_pdf)
    for c in s.columns:
        sk, dk = s[c].dtype.kind, d[c].dtype.kind
        # int-vs-float mismatches hash differently in the driver
        num = {"i", "u"}
        assert (sk == dk) or (sk in num and dk in num), (
            name, c, s[c].dtype, d[c].dtype)
        if sk == "f" or dk == "f":
            sv, dv = s[c].to_numpy("float64"), d[c].to_numpy("float64")
            both_nan = np.isnan(sv) & np.isnan(dv)
            ok = both_nan | (np.abs(sv - dv) <= 1e-9)
            assert ok.all(), (name, c, sv[~ok][:5], dv[~ok][:5])
        elif sk == "M":
            assert (s[c].astype("datetime64[us]") ==
                    d[c].astype("datetime64[us]")).all(), (name, c)
        else:
            eq = (s[c].to_numpy() == d[c].to_numpy())
            assert eq.all(), (name, c,
                              s[c].to_numpy()[~eq][:5], d[c].to_numpy()[~eq][:5])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns
