"""ANSI-mode division hardening for the stats family.

The session runs Spark 4 with ANSI SQL mode at its default (on), where a
double division by zero THROWS instead of yielding NULL/NaN — so any
data-dependent denominator that can be exactly zero (a zero-variance
group, a zero previous week) is a whole-job crash, not a wrong number.
DuckDB yields NULL for a zero double divisor, so the hardened Spark
twins (try_divide) agree with the oracles on degenerate input too.

Pinned here:
  * the premise (bare / throws in this session's config);
  * the _SPARK readout twins return NULL on zero-variance stats rows and
    are bit-identical to the DuckDB twins on regular rows;
  * q_anomaly_seasonal / q_top_movers survive planted degenerate lakes
    (constant-value hour bucket; zero-revenue week) without throwing.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lab_etl_spark.queries.scale import (
    _corr_readout,
    _corr_readout_spark,
    _LINREG_READOUT,
    _LINREG_READOUT_SPARK,
)
from lab_etl_spark.queries.timeseries import _ACF_READOUT, _ACF_READOUT_SPARK

STATS_SCHEMA = (
    "n BIGINT, sx DOUBLE, sy DOUBLE, sxx DOUBLE, sxy DOUBLE, syy DOUBLE"
)
# zero x-variance: n*sxx - sx*sx = 0  (x constant at 2.0, n=3)
DEGENERATE = (3, 6.0, 9.0, 12.0, 18.0, 29.0)
# a regular row (x = 1,2,3; y = 1,3,4)
REGULAR = (3, 6.0, 8.0, 14.0, 19.0, 26.0)


def _duck_eval(exprs: str, row) -> tuple:
    import duckdb

    n, sx, sy, sxx, sxy, syy = row
    return duckdb.connect().execute(
        f"SELECT {exprs} FROM (SELECT {n} AS n, {sx} AS sx, {sy} AS sy,"
        f" {sxx} AS sxx, {sxy} AS sxy, {syy} AS syy)"
    ).fetchone()


def test_bare_division_by_zero_throws_here(spark):
    # the premise the try_divide twins exist for — if an engine upgrade
    # flips ANSI off, the twins become redundant and should be revisited
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ArithmeticException

    with pytest.raises((ArithmeticException, Py4JJavaError)):
        spark.sql("SELECT CAST(1.0 AS DOUBLE) / CAST(0.0 AS DOUBLE)").collect()


def test_linreg_readout_twin(spark):
    df = spark.createDataFrame([DEGENERATE, REGULAR], STATS_SCHEMA)
    rows = df.selectExpr(*_LINREG_READOUT_SPARK).collect()
    # degenerate: NULL slope/r2, no crash
    degr = [r for r in rows if r.slope is None]
    regr = [r for r in rows if r.slope is not None]
    assert len(degr) == 1 and len(regr) == 1
    assert degr[0].r2 is None and degr[0].intercept is None
    # regular row: bit-identical to the DuckDB twin
    duck = _duck_eval(_LINREG_READOUT, REGULAR)
    got = regr[0]
    assert (got.n_points, got.slope, got.intercept, got.r2) == duck


def test_acf_readout_twin(spark):
    df = spark.createDataFrame([DEGENERATE, REGULAR], STATS_SCHEMA)
    vals = sorted(
        (r.acf for r in df.selectExpr(_ACF_READOUT_SPARK).collect()),
        key=lambda v: (v is not None, v),
    )
    assert vals[0] is None  # degenerate → NULL, no crash
    assert vals[1] == _duck_eval(_ACF_READOUT, REGULAR)[0]


def test_corr_readout_twin(spark):
    schema = "n BIGINT, s_0 DOUBLE, s_1 DOUBLE, ss_0 DOUBLE, ss_1 DOUBLE, sp_0_1 DOUBLE"
    deg = (3, 6.0, 8.0, 12.0, 26.0, 16.0)  # col 0 constant → zero variance
    reg = (3, 6.0, 8.0, 14.0, 26.0, 17.0)
    df = spark.createDataFrame([deg, reg], schema)
    out = sorted(
        (r[0] for r in df.selectExpr(_corr_readout_spark(0, 1)).collect()),
        key=lambda v: (v is not None, v),
    )
    assert out[0] is None
    import duckdb

    n, s0, s1, ss0, ss1, sp = reg
    duck = duckdb.connect().execute(
        f"SELECT {_corr_readout(0, 1)} FROM (SELECT {n} AS n, {s0} AS s_0,"
        f" {s1} AS s_1, {ss0} AS ss_0, {ss1} AS ss_1, {sp} AS sp_0_1)"
    ).fetchone()[0]
    assert out[1] == duck


@pytest.fixture(scope="module")
def degenerate_lake(tmp_path_factory):
    """events.parquet with (a) a constant-value hour bucket of n>=30 and
    (b) an event_type whose first week sums to zero revenue."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    rows = []
    eid = 0
    # (a) 35 constant-value events, same type, same hour-of-day
    for i in range(35):
        rows.append(
            (eid, datetime(2024, 1, 1 + (i % 28), 9, i % 60), 1, "flat", 5.0)
        )
        eid += 1
    # (b) zero-revenue week then a real week
    for d in range(3):
        rows.append((eid, datetime(2024, 1, 1 + d, 12, 0), 2, "spiky", 0.0))
        eid += 1
    for d in range(3):
        rows.append((eid, datetime(2024, 1, 8 + d, 12, 0), 2, "spiky", 7.5))
        eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path_factory.mktemp("degenerate_lake")
    pq.write_table(tbl, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_anomaly_seasonal_survives_constant_bucket(spark, degenerate_lake):
    from lab_etl_spark.queries.timeseries import q_anomaly_seasonal

    # the "flat" bucket has n=35 >= 30 and sigma exactly 0 — before the
    # try_divide hardening this crashed the job under predicate reordering
    out = q_anomaly_seasonal(spark, degenerate_lake).collect()
    assert all(r.event_type != "flat" for r in out)


def test_top_movers_survives_zero_week(spark, degenerate_lake):
    from lab_etl_spark.queries.timeseries import q_top_movers

    out = q_top_movers(spark, degenerate_lake).collect()
    # the 0 → 22.5 jump must not crash; prev_revenue=0 rows are excluded
    assert all(r.prev_revenue > 0 for r in out)
