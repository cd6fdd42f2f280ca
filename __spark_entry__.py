"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``lab_etl_spark/``; this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lab_etl_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on the smoke-check
    scale factor (override dir via SPARK_GRAFT_ENTRY_SF_DIR)."""
    registry = load_all()
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001"
    )
    return registry["q_pricing_summary"].fn(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in load_all().items() if q.oracle is not None
    }
