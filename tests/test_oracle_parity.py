"""Replicates the driver's correctness gate locally: every registered query
with an oracle must match DuckDB on row count, column names, and values.
Queries without an oracle must at least run and return a stable schema.
"""

from __future__ import annotations

import pytest

from lab_etl_spark.queries import load_all

from .compare import compare, duck_con

REGISTRY = load_all()
ORACLE_NAMES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_NAMES = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, con, name):
    q = REGISTRY[name]
    spark_df = q.fn(spark, sf_dir)
    duck_df = con.execute(q.oracle).fetchdf()
    compare(spark_df, duck_df, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert len(df.columns) > 0
    df.collect()  # must execute without error


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
