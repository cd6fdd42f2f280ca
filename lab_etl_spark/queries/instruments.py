"""Instrument-pipeline queries: run the §2A sources end-to-end inside the
driver harness (SURVEY.md §7 step 1's "peak HRR and time-to-peak" query).

These read the reference's fixture files (read-only), not the sf tables, so
they carry no DuckDB oracle — the driver records the rows-only check; the
golden-pin tests in tests/test_sources.py carry the value assertions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import register

_FIX = "/root/reference/tests/test_files"


@register(
    "q_instrument_peak_hrr",
    oracle=None,  # input is an instrument file, not an oracle-visible table
    bench=False,
    doc="MCC ingest → peak heat-release-rate and time-to-peak per sample: "
    "the §2A source pipeline (header sniff → distributed CSV scan → unit "
    "metadata) feeding a ranked-window analytic query.",
)
def q_instrument_peak_hrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_mcc

    path = f"{_FIX}/MCC/Hemp_Sheet_MCC_30K_min_220112_R1.txt"
    if not os.path.exists(path):  # fixture-less environment: empty result
        return spark.createDataFrame(
            [], "sample string, peak_hrr double, time_to_peak double"
        )
    df = load_mcc(spark, path)
    w = W.partitionBy("source_file").orderBy(
        F.col("hrr").desc(), F.col("time").asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("source_file").alias("sample"),
            F.col("hrr").alias("peak_hrr"),
            F.col("time").alias("time_to_peak"),
        )
    )


@register(
    "q_instrument_sta_mass_loss",
    oracle=None,
    bench=False,
    doc="STA binary (NGB) ingest → total mass loss and peak furnace "
    "temperature per run, over the distributed binaryFile scan.",
)
def q_instrument_sta_mass_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import scan_ngb

    glob = f"{_FIX}/STA/*.ngb-ss3"
    if not os.path.isdir(f"{_FIX}/STA"):
        return spark.createDataFrame(
            [], "source_file string, mass_loss double, peak_temperature double"
        )
    df = scan_ngb(spark, glob)
    return (
        df.groupBy("source_file")
        .agg(
            (F.max("sample_mass") - F.min("sample_mass")).alias("mass_loss"),
            F.max("temperature").alias("peak_temperature"),
        )
    )
