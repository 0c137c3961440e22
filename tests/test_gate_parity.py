"""Local replica of the driver's correctness gate: every queries()
entry must match its oracle_sql() on the same parquet tables
(row-count + column names + order-insensitive values)."""

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(duck_pdf), f"{name}: rows {len(spark_pdf)} != {len(duck_pdf)}"
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype.kind == "f":
            import numpy as np

            assert np.allclose(av.astype(float), bv.astype(float), atol=1e-9, equal_nan=True), (
                f"{name}: column {c} differs\n{a[c].head()}\n{b[c].head()}"
            )
        else:
            same = (av == bv) | (pd.isna(av) & pd.isna(bv))
            assert same.all(), f"{name}: column {c} differs\n{a[~same].head()}\n{b[~same].head()}"


def _entries():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sql = entrymod.oracle_sql()
    return qs, sql


def test_every_query_has_oracle_or_is_flagged():
    qs, sql = _entries()
    assert set(sql) <= set(qs)


QUERY_NAMES = sorted(_entries()[0])


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_gate_query(spark, duck, name):
    qs, sql = _entries()
    spark_df = qs[name](spark, SF_DIR)
    spark_pdf = spark_df.toPandas()
    assert len(spark_pdf) >= 0  # materializes
    if name not in sql:
        pytest.skip("rows-only operator (no SQL oracle)")
    duck_pdf = duck.execute(sql[name]).fetchdf()
    _compare(name, spark_pdf, duck_pdf)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "score"}
