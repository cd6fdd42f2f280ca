"""Automatic unit-consistency analyzer (round-9 verdict stretch item 7;
SURVEY.md §4 nice-to-have): meta.check_unit_consistency walks the ANALYZED
logical plan and rejects additive arithmetic / comparisons over columns
whose ``unit`` field metadata differs — the ``temperature + mass`` bug the
type system can't catch.  The gate runs automatically on the instrument-
lake egress (sources/sink.write_parquet) and is a no-op on plans that
never declare units (one schema scan, no Spark job).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lab_etl_spark.meta import (
    UnitMismatchError,
    check_unit_consistency,
    with_units,
)


def _frame(spark):
    df = spark.createDataFrame(
        [(1, 25.0, 10.0, 3.0)], "id INT, temp DOUBLE, mass DOUBLE, t2 DOUBLE"
    )
    return with_units(df, {"temp": "degC", "mass": "mg", "t2": "degC"})


def test_mismatched_add_raises(spark):
    df = _frame(spark).withColumn("bad", F.col("temp") + F.col("mass"))
    with pytest.raises(UnitMismatchError, match="degC"):
        check_unit_consistency(df)


def test_mismatched_subtract_raises(spark):
    df = _frame(spark).withColumn("bad", F.col("mass") - F.col("temp"))
    with pytest.raises(UnitMismatchError, match="mg"):
        check_unit_consistency(df)


def test_mismatched_comparison_raises(spark):
    df = _frame(spark).filter(F.col("temp") > F.col("mass"))
    with pytest.raises(UnitMismatchError):
        check_unit_consistency(df)


def test_same_unit_add_passes(spark):
    df = _frame(spark).withColumn("ok", F.col("temp") + F.col("t2"))
    check_unit_consistency(df)


def test_unit_plus_literal_passes(spark):
    # a literal/unit-less operand is legitimate (col + 1.0 offsets)
    df = _frame(spark).withColumn("ok", F.col("temp") + F.lit(1.0))
    check_unit_consistency(df)


def test_multiplicative_composition_passes(spark):
    # units COMPOSE under * and /: mW / mg is normalization, not a bug
    df = _frame(spark).withColumn("ratio", F.col("temp") / F.col("mass"))
    check_unit_consistency(df)


def test_mismatch_through_cast_is_caught(spark):
    df = _frame(spark).withColumn(
        "bad", F.col("temp").cast("float") + F.col("mass")
    )
    with pytest.raises(UnitMismatchError):
        check_unit_consistency(df)


def test_unitless_plan_is_noop(spark, sf_dir):
    # the analytic lake declares no units: the gate must pass untouched
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .withColumn("x", F.col("l_quantity") + F.col("l_extendedprice"))
    )
    check_unit_consistency(df)


def test_write_parquet_gates_automatically(spark, tmp_path):
    from lab_etl_spark.sources.sink import write_parquet

    df = _frame(spark).withColumn("bad", F.col("temp") + F.col("mass"))
    with pytest.raises(UnitMismatchError):
        write_parquet(df, str(tmp_path / "out.parquet"), mode="overwrite")
    # and the escape hatch / clean frame both write fine
    write_parquet(
        df, str(tmp_path / "forced.parquet"), mode="overwrite",
        unit_check=False,
    )
    write_parquet(
        _frame(spark), str(tmp_path / "ok.parquet"), mode="overwrite"
    )


def test_instrument_loader_output_passes(spark):
    # real instrument frames (units attached by every source) must flow
    # through the gate untouched
    import os

    from tests.test_sources import MCC_FILE

    if not os.path.exists(MCC_FILE):
        pytest.skip("no MCC fixture available")
    from lab_etl_spark.api import load_mcc_data

    df = load_mcc_data(spark, MCC_FILE)
    check_unit_consistency(df)
