"""Spark-side output-schema audit (round-5 verdict item #2 — the mirror of
``test_oracle_types.py``).

In Spark SQL a bare ``N.M`` literal is DECIMAL, so ``1.0 / (60 + rank)``
is decimal division and the result column is DecimalType — which reaches
the driver's pandas frame as ``Decimal`` objects while the DuckDB oracle's
identical expression returns DOUBLE/float64.  Values match, the value-hash
doesn't (round-5's only red row, ``q_rrf_fusion``).

The repo's convention is that no registered query returns DecimalType
output: exact accumulation (queries/exact.py dsum/davg) deliberately casts
its DECIMAL sums back to DOUBLE, and DuckDB renders DECIMAL oracles as
float64 anyway.  This test builds every registered query's DataFrame at
sf0.001 and fails on any DecimalType leaf in the output schema, naming the
column so the fix (``CAST(... AS DOUBLE)`` or a ``D``-suffixed literal) is
mechanical.
"""

from __future__ import annotations

from pyspark.sql import types as T

from lab_etl_spark.queries import load_all


def _decimal_leaves(dt: T.DataType, path: str) -> list[str]:
    if isinstance(dt, T.DecimalType):
        return [f"{path}: {dt.simpleString()}"]
    if isinstance(dt, T.StructType):
        out = []
        for f in dt.fields:
            out.extend(_decimal_leaves(f.dataType, f"{path}.{f.name}"))
        return out
    if isinstance(dt, T.ArrayType):
        return _decimal_leaves(dt.elementType, f"{path}[]")
    if isinstance(dt, T.MapType):
        return _decimal_leaves(dt.keyType, f"{path}<key>") + _decimal_leaves(
            dt.valueType, f"{path}<val>"
        )
    return []


def test_no_decimal_spark_output_columns(spark, sf_dir):
    offenders = {}
    for name, q in sorted(load_all().items()):
        hits = []
        for f in q.fn(spark, sf_dir).schema.fields:
            hits.extend(_decimal_leaves(f.dataType, f.name))
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "Spark result columns with DecimalType (pandas renders these as "
        "object/Decimal while the DuckDB oracle gives float64, breaking "
        "the driver's value-hash on identical values) — CAST the column "
        "to DOUBLE or use CAST(1.0 AS DOUBLE) in place of bare decimal "
        f"literals: {offenders}"
    )
