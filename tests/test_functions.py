"""Unit tests for the Catalyst scalar functions (SURVEY.md §2A), pinned to
the reference's documented examples (value/unit strings, segment grammar,
MFC/crucible strings, key normalization)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _one(spark, col):
    return spark.range(1).select(col.alias("out")).first()["out"]


def _vals(spark, data, fn):
    df = spark.createDataFrame([(d,) for d in data], "s string")
    return [r["out"] for r in df.select(fn(F.col("s")).alias("out")).collect()]


def test_parse_value_unit(spark):
    from lab_etl_spark.functions import parse_value_unit

    out = _vals(
        spark,
        ["8.67mm", "0.1497 W/mK", "25.0 °C", "no number", "42"],
        parse_value_unit,
    )
    assert out[0]["value"] == 8.67 and out[0]["unit"] == "mm"
    assert out[1]["value"] == 0.1497 and out[1]["unit"] == "W/mK"
    assert out[2]["value"] == 25.0 and out[2]["unit"] == "°C"
    assert out[3]["value"] is None
    assert out[4]["value"] == 42.0 and out[4]["unit"] is None


def test_parse_date_cascade(spark):
    from lab_etl_spark.functions import parse_date_cascade

    out = _vals(
        spark,
        [
            "Monday, November 15, 2021, Time 15:16",  # HFM strict format
            "2/11/2024 13:12:51 (UTC-5)",  # STA with tz remark
            "2024-02-11T13:12:51",
            "not a date",
        ],
        parse_date_cascade,
    )
    assert out[0] == datetime.datetime(2021, 11, 15, 15, 16)
    assert out[1] == datetime.datetime(2024, 2, 11, 13, 12, 51)
    assert out[2] == datetime.datetime(2024, 2, 11, 13, 12, 51)
    assert out[3] is None


def test_parse_date_fuzzy(spark):
    from lab_etl_spark.functions import parse_date_fuzzy

    out = _vals(
        spark,
        [
            # strict formats still parse identically through the fuzzy entry
            "2/11/2024 13:12:51 (UTC-5)",
            # embedded in arbitrary prose (the dateutil fuzzy=True contract)
            "Started on 2/11/2024 13:12:51 local time",
            "Export created 2024-03-05 at 14:30:00 by operator",
            "Run date: 11.02.2024 13:12",
            "Calibrated March 4, 2024 14:00 in lab 3",
            "acquired at 2:30:05 PM on 2/11/2024",
            "Report for week 7, no timestamp here",
        ],
        parse_date_fuzzy,
    )
    assert out[0] == datetime.datetime(2024, 2, 11, 13, 12, 51)
    assert out[1] == datetime.datetime(2024, 2, 11, 13, 12, 51)
    assert out[2] == datetime.datetime(2024, 3, 5, 14, 30)
    assert out[3] == datetime.datetime(2024, 2, 11, 13, 12)
    assert out[4] == datetime.datetime(2024, 3, 4, 14, 0)
    assert out[5] == datetime.datetime(2024, 2, 11, 14, 30, 5)
    assert out[6] is None  # no speculative parse of junk


def test_coerce_typed(spark):
    from lab_etl_spark.functions import coerce_typed

    out = _vals(spark, ["42", "3.14", "2024-02-11", "hello"], coerce_typed)
    assert out[0]["kind"] == "int" and out[0]["long_val"] == 42
    assert out[1]["kind"] == "float" and out[1]["double_val"] == 3.14
    assert out[2]["kind"] == "date"
    assert out[3]["kind"] == "string" and out[3]["str_val"] == "hello"


def test_normalize_unit(spark):
    from lab_etl_spark.functions import normalize_unit

    out = _vals(spark, ["(c)", "cc/min", "C/s", "sec", "/m", "W/g"], normalize_unit)
    assert out == ["°C", "ml/min", "°C/s", "s", "1/m", "W/g"]


def test_normalize_key(spark):
    from lab_etl_spark.functions import normalize_key

    out = _vals(
        spark,
        ["SAMPLE MASS /mg", "Heating Rate (K/min)", "  Date.Performed  "],
        normalize_key,
    )
    assert out == ["sample_mass", "heating_rate", "date_performed"]


def test_parse_segment_ramp_and_dwell(spark):
    from lab_etl_spark.functions import parse_segment

    ramp, dwell = _vals(
        spark, ["25°C/20.0(K/min)/250°C", "25°C/00:20/25°C"], parse_segment
    )
    assert ramp["start_temperature"]["value"] == 25.0
    assert ramp["end_temperature"]["value"] == 250.0
    assert ramp["heating_rate"]["value"] == 20.0
    assert ramp["heating_rate"]["unit"] == "K/min"
    assert ramp["time"] is None
    assert dwell["heating_rate"] is None
    assert dwell["time"] == "00:20"


def test_parse_mfc_and_crucible(spark):
    from lab_etl_spark.functions import parse_crucible, parse_mfc

    mfc = _vals(spark, ["NITROGEN,250.0 ml/min"], parse_mfc)[0]
    assert mfc["gas"] == "nitrogen"
    assert mfc["range"]["value"] == 250.0
    assert mfc["range"]["unit"] == "ml/min"

    cru = _vals(spark, ["PtRh20 85 µl, with lid"], parse_crucible)[0]
    assert cru["material"] == "PtRh20"
    assert cru["volume"]["value"] == 85.0
    assert cru["volume"]["unit"] == "µl"
    assert cru["extra"] == "with lid"


def test_unit_metadata_survives_ops(spark):
    """Property: with_units metadata survives filter/select/parquet-roundtrip
    on untouched columns (SURVEY.md §7 'what's hard')."""
    from lab_etl_spark.meta import units_of, with_units

    df = with_units(
        spark.createDataFrame([(1.0, 2.0)], "a double, b double"),
        {"a": "°C", "b": "mg"},
    )
    out = df.filter("a > 0").select("a", F.col("b"))
    assert units_of(out) == {"a": "°C", "b": "mg"}


def test_unit_consistency_gate(spark):
    from pyspark.sql import functions as F

    from lab_etl_spark.meta import (
        UnitMismatchError,
        add_with_units,
        require_same_unit,
        units_of,
        with_unit,
    )

    df = spark.range(3).select(
        with_unit(F.col("id").cast("double"), "upper_temperature", "°C"),
        with_unit((F.col("id") * 2.0), "lower_temperature", "°C"),
        with_unit((F.col("id") * 1.5), "mass", "mg"),
        (F.col("id") * 9.0).alias("unitless"),
    )
    assert require_same_unit(df, "upper_temperature", "lower_temperature") == "°C"
    out = add_with_units(df, "temp_sum", "upper_temperature", "lower_temperature")
    assert units_of(out)["temp_sum"] == "°C"
    assert out.select("temp_sum").collect()[2][0] == 6.0
    import pytest as _pytest

    with _pytest.raises(UnitMismatchError):
        require_same_unit(df, "upper_temperature", "mass")
    with _pytest.raises(UnitMismatchError):
        require_same_unit(df, "upper_temperature", "unitless")
    with _pytest.raises(UnitMismatchError, match="not in DataFrame"):
        require_same_unit(df, "upper_temperatur", "lower_temperature")


def test_dsum_tolerates_non_finite(spark):
    from lab_etl_spark.queries.exact import dsum

    row = spark.sql(
        f"SELECT {dsum('v')} AS s FROM VALUES (1.5), (CAST('NaN' AS DOUBLE)),"
        " (CAST('Infinity' AS DOUBLE)), (2.5) AS t(v)"
    ).collect()[0]
    # NaN/Inf rows skip (decimal cast -> NULL); the job never fails
    assert row.s == 4.0


def test_levenshtein_counts_characters(spark):
    # The engine contract for fuzzy entity matching is CHARACTER edit
    # distance: one accented-character substitution is distance 1, never
    # the UTF-8 byte count (DuckDB's levenshtein counts bytes — the
    # fuzzy-match oracles are valid because part names are single-byte).
    rows = spark.sql(
        "SELECT levenshtein('café', 'cafe') a, levenshtein('αβγδ', 'αβγx') b"
    ).collect()[0]
    assert rows.a == 1 and rows.b == 1


def test_lower_uses_full_unicode_case_mapping(spark):
    # Engine contract: Unicode-correct full case mapping — 'İ' lowers to
    # i + COMBINING DOT ABOVE and final sigma gets the context-sensitive
    # form.  DuckDB's lower() drops the combining dot and never emits
    # final sigma, so text-query oracle parity is scoped to corpora
    # without Turkish dotted-I / Greek final-sigma contexts (the driver
    # corpus qualifies; the adversarial suite's unicode docs avoid these
    # two known-divergent mappings deliberately).
    rows = spark.sql(
        "SELECT lower('İstanbul') a, lower('ΣΙΣΥΦΟΣ') b"
    ).collect()[0]
    assert rows.a == "i̇stanbul"
    assert rows.b == "σισυφος" and rows.b.endswith("ς")
