"""Parquet sink (SURVEY.md §2A ``sink_parquet_snappy``).

The reference writes one snappy parquet per instrument run
(faa_mcc_parser.py:208-212 and siblings).  Spark's parquet writer preserves
``StructField.metadata`` in the file footer (round-trips on read), so unit
metadata survives without extra work; table-level metadata travels as the
``file_metadata``/``instrument_type`` columns (see meta.py).

``partition_by`` defaults to the instrument type so a lake of many runs
lands partition-pruned — the multi-file generalization the reference's
README aspires to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by is None and "instrument_type" in df.columns:
        partition_by = ["instrument_type"]
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_debug(
    df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = True
) -> None:
    """Debug CSV sink (SURVEY.md §2A ``sink_csv_debug``; reference
    netzsch_sta_ngb_parser.py:307 dumps a CSV next to the parquet for eyeball
    checks).

    ``single_file=True`` coalesces to one part for human reading — the right
    default for a debug dump of one instrument run, and deliberately wrong
    for bulk data (it serializes the write through one task); pass
    ``single_file=False`` to keep the parallel multi-part write.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)
