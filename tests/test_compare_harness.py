"""Meta-tests for the driver-identical compare harness itself.

tests/compare.py IS the local correctness gate — a masking bug there ships
red rows to the driver invisibly (it happened twice: the HUGEINT class in
round 4 and the Spark-decimal class in round 5).  These tests prove the
harness REJECTS each known masking class and stays order-insensitive.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from .compare import compare


def test_accepts_identical_frames(spark):
    df = spark.createDataFrame(
        [(1, 1.5, "a"), (2, float("nan"), None)],
        "k bigint, x double, s string",
    )
    compare(df, pd.DataFrame({"k": [1, 2], "x": [1.5, float("nan")],
                              "s": ["a", None]}), "meta")


def test_accepts_row_order_differences(spark):
    df = spark.createDataFrame([(1, "b"), (2, "a")], "k bigint, s string")
    compare(df, pd.DataFrame({"k": [2, 1], "s": ["a", "b"]}), "meta")


def test_rejects_int_vs_float_kind(spark):
    # the round-4 HUGEINT class: oracle renders 7949.0 for Spark's 7949
    df = spark.createDataFrame([(7949,)], "v bigint")
    with pytest.raises(AssertionError, match="integer-vs-float"):
        compare(df, pd.DataFrame({"v": [7949.0]}), "meta")


def test_rejects_decimal_vs_float_kind(spark):
    # the round-5 q_rrf_fusion class: a Spark DecimalType output column
    df = spark.range(1).selectExpr("CAST(1.5 AS DECIMAL(5,2)) AS v")
    with pytest.raises(AssertionError, match="decimal-vs-"):
        compare(df, pd.DataFrame({"v": [1.5]}), "meta")


def test_rejects_last_ulp_float_difference(spark):
    # 17-sig-digit normalization is an exact double round-trip: the
    # neighbouring double must NOT compare equal (the whole bit-identical
    # discipline relies on this)
    v = 1.0 / 3.0
    df = spark.createDataFrame([(v,)], "v double")
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(df, pd.DataFrame({"v": [math.nextafter(v, 1.0)]}), "meta")


def test_rejects_row_count_and_column_mismatches(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(AssertionError, match="row count"):
        compare(df, pd.DataFrame({"k": [1, 2]}), "meta")
    with pytest.raises(AssertionError, match="column mismatch"):
        compare(df, pd.DataFrame({"j": [1]}), "meta")


def test_null_vs_nan_blind_spot_is_driver_faithful(spark):
    # KNOWN BLIND SPOT, shared with the driver: pandas float64 has no
    # null, so ``toPandas``/``fetchdf`` both collapse SQL NULL to NaN in
    # a DOUBLE column — a Spark NULL vs an oracle NaN is invisible to the
    # value-hash on BOTH sides of the gate.  compare() must mirror the
    # driver here (rejecting would flag queries the driver passes);
    # queries that care use explicit sentinels or COALESCE.
    df = spark.createDataFrame([(None,)], "v double")
    compare(df, pd.DataFrame({"v": [float("nan")]}), "meta")
