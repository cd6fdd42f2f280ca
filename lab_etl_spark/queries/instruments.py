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

#: literal ground truths: the reference test files are immutable and the
#: parsers deterministic, so the per-file readouts are constants any
#: correct parse must reproduce (golden-pin-as-oracle; DuckDB cannot
#: read the instrument containers themselves)
_PEAK_HRR_GT = """
    SELECT * FROM (VALUES
      ('/root/reference/tests/test_files/MCC/Hemp_Sheet_MCC_30K_min_220112_R1.txt', CAST('139.58' AS DOUBLE), CAST('577.0' AS DOUBLE))
    ) AS t(sample, peak_hrr, time_to_peak)
    ORDER BY sample
    """
_STA_MASS_LOSS_GT = """
    SELECT * FROM (VALUES
      ('file:/root/reference/tests/test_files/STA/PT_Deck_Board_3_1.ngb-ss3', CAST('2.9945399999999998' AS DOUBLE), CAST('748.4819946289062' AS DOUBLE)),
      ('file:/root/reference/tests/test_files/STA/Hyundai_KM8K_Carpet_STA_N2_10K_240711_R3.ngb-ss3', CAST('3.0246399999999998' AS DOUBLE), CAST('804.0980224609375' AS DOUBLE)),
      ('file:/root/reference/tests/test_files/STA/Ford_3FMT_Carpet_STA_N2_10K_240603_R1.ngb-ss3', CAST('3.3224800000000005' AS DOUBLE), CAST('802.4500122070312' AS DOUBLE)),
      ('file:/root/reference/tests/test_files/STA/IBHS_Shingle_102-B-5-1_Sample_2_STA_N2_30K_240716_R1.ngb-ss3', CAST('1.5682499999999777' AS DOUBLE), CAST('856.2269897460938' AS DOUBLE))
    ) AS t(source_file, mass_loss, peak_temperature)
    ORDER BY source_file
    """

_FIX = "/root/reference/tests/test_files"


@register(
    "q_instrument_peak_hrr",
    oracle=_PEAK_HRR_GT,  # instrument-file input; fixed parse ground truth
    bench=False,
    doc="MCC ingest → peak heat-release-rate and time-to-peak per sample: "
    "the §2A source pipeline (header sniff → distributed CSV scan → unit "
    "metadata) feeding a ranked-window analytic query.",
)
def q_instrument_peak_hrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_mcc

    path = f"{_FIX}/MCC/Hemp_Sheet_MCC_30K_min_220112_R1.txt"
    if not os.path.exists(path):
        # the oracle is a literal ground truth for this exact fixture: an
        # empty frame would be a confusing row-count red; fail fast instead
        raise FileNotFoundError(
            f"instrument fixture missing: {path} — q_instrument_peak_hrr's "
            f"literal oracle pins that file's parse"
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


#: committed lake snapshot the DuckDB oracle reads (built by
#: tests/test_lake_roundtrip.py::test_rebuild_committed_lake from the same
#: deterministic pipeline; rebuild + re-commit if the HFM parser changes)
_LAKE_ORACLE_DIR = "/root/repo/lake/hfm"


_LAKE_COLS = [
    "source_file",
    "run_mode",
    "setpoint",
    "upper_temperature",
    "lower_temperature",
    "upper_thermal_conductivity",
    "lower_thermal_conductivity",
    "sample_id",
]


@register(
    "q_lake_roundtrip",
    oracle=f"""
    SELECT {', '.join(_LAKE_COLS)}
    FROM read_parquet('{_LAKE_ORACLE_DIR}/*/*.parquet', hive_partitioning=1)
    WHERE run_mode = 'conductivity'
    """,
    bench=False,
    doc="End-to-end lake round-trip (reference README.md:6's multi-file "
    "lake aspiration, SURVEY.md §1.5): scan_hfm over the instrument "
    "fixtures → sink.write_parquet partitioned by run_mode → read back "
    "through a partition-pruned scan (only the run_mode=conductivity "
    "directory is touched; plan gate in tests/test_lake_roundtrip.py).  "
    "The oracle reads a committed snapshot of the same deterministic "
    "pipeline output, so parity proves write→read fidelity including the "
    "hive partition column, not just the in-memory frame.",
)
def q_lake_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import scratch_dir
    from ..sources import scan_hfm
    from ..sources.sink import write_parquet

    if not os.path.isdir(f"{_FIX}/HFM"):
        raise FileNotFoundError(
            f"instrument fixtures missing: {_FIX}/HFM — q_lake_roundtrip's "
            f"oracle reads the committed lake snapshot of those parses"
        )
    df = scan_hfm(spark, f"{_FIX}/HFM/*.tst")
    # per-invocation-unique scratch (catalog.scratch_dir): a FIXED path
    # here was the last survivor of the round-3 q_jsonl_roundtrip failure
    # class — a later invocation's overwrite breaks or silently changes an
    # earlier result's lazy read-back (caught by tests/test_reinvocation.py)
    lake = scratch_dir("hfm_lake", sf_dir)
    write_parquet(df, lake, mode="overwrite", partition_by=["run_mode"])
    back = spark.read.parquet(lake).filter(
        F.col("run_mode") == "conductivity"
    )
    return back.select(*_LAKE_COLS)


@register(
    "q_instrument_sta_mass_loss",
    oracle=_STA_MASS_LOSS_GT,  # fixed parse ground truth
    bench=False,
    doc="STA binary (NGB) ingest → total mass loss and peak furnace "
    "temperature per run, over the distributed binaryFile scan.",
)
def q_instrument_sta_mass_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import scan_ngb

    glob = f"{_FIX}/STA/*.ngb-ss3"
    if not os.path.isdir(f"{_FIX}/STA"):
        raise FileNotFoundError(
            f"instrument fixtures missing: {_FIX}/STA — "
            f"q_instrument_sta_mass_loss's literal oracle pins those parses"
        )
    df = scan_ngb(spark, glob)
    return (
        df.groupBy("source_file")
        .agg(
            (F.max("sample_mass") - F.min("sample_mass")).alias("mass_loss"),
            F.max("temperature").alias("peak_temperature"),
        )
    )
