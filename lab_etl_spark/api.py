"""Reference-parity user API.

A lab-etl user calls ``load_<instrument>_data(path) -> pyarrow.Table`` (one
function per parser module, e.g. ``faa_mcc_parser.load_mcc_data:12``,
``fox_hfm_parser.load_hfm_data:12``, ``netzsch_sta_ngb_parser.
load_ngb_data:37``) and each module's ``__main__`` writes a snappy parquet
next to the source file.  This module keeps that muscle memory working on
Spark: the same six names (plus a ``spark`` first argument — the session IS
the engine here) return lazy DataFrames with the identical standardized
columns, unit metadata, and file-level provenance the reference attaches,
and :func:`etl_file` reproduces the load-then-write-parquet ``__main__``
behavior.

Two things the reference cannot do come for free:
  * every loader has a ``scan_*`` sibling (sources/) that takes a GLOB and
    parses a whole directory tree of runs as one distributed job;
  * the result is a plan, not a materialized table — write it, join it,
    or aggregate it without an intermediate copy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .sources.cone import load_cone, scan_cone
from .sources.ftir import load_ftir, scan_ftir
from .sources.hfm import load_hfm, scan_hfm
from .sources.ngb import load_ngb, scan_ngb
from .sources.sink import write_parquet
from .sources.text_formats import (
    load_mcc,
    load_sta_csv,
    scan_mcc,
    scan_sta_csv,
)


def load_mcc_data(spark: SparkSession, path: str) -> DataFrame:
    """FAA microscale-combustion-calorimeter text export
    (reference: faa_mcc_parser.load_mcc_data:12)."""
    return load_mcc(spark, path)


def load_sta_data(spark: SparkSession, path: str) -> DataFrame:
    """Netzsch STA CSV export (reference: netzsch_sta_parser)."""
    return load_sta_csv(spark, path)


def load_ngb_data(spark: SparkSession, path: str) -> DataFrame:
    """Netzsch STA proprietary .ngb-ss3 binary
    (reference: netzsch_sta_ngb_parser.load_ngb_data:37)."""
    return load_ngb(spark, path)


def load_cone_data(spark: SparkSession, path: str) -> DataFrame:
    """Deatak cone-calorimeter XLSM workbook
    (reference: deatak_cone_parser.load_cone_data:10)."""
    return load_cone(spark, path)


def load_hfm_data(spark: SparkSession, path: str) -> DataFrame:
    """Fox heat-flow-meter .tst report, both run modes
    (reference: fox_hfm_parser.load_hfm_data:12)."""
    return load_hfm(spark, path)


def load_ftir_data(spark: SparkSession, path: str) -> DataFrame:
    """Bruker OPUS FTIR binary
    (reference: bruker_ftir_parser.load_ftir_data:12)."""
    return load_ftir(spark, path)


#: extension → (single-file loader, glob scanner).  MCC and STA-CSV share
#: .txt/.csv shapes; MCC is the .txt default (the reference ships MCC as
#: .txt and STA as .csv exports).
_DISPATCH: dict[str, tuple] = {
    ".txt": (load_mcc, scan_mcc),
    ".csv": (load_sta_csv, scan_sta_csv),
    ".ngb-ss3": (load_ngb, scan_ngb),
    ".xlsm": (load_cone, scan_cone),
    ".xlsx": (load_cone, scan_cone),
    ".tst": (load_hfm, scan_hfm),
    ".0": (load_ftir, scan_ftir),  # OPUS numeric extensions
    ".1": (load_ftir, scan_ftir),
}


def _ext(path: str) -> str:
    base = os.path.basename(path)
    dot = base.rfind(".")
    return base[dot:].lower() if dot >= 0 else ""


def load_file(spark: SparkSession, path: str) -> DataFrame:
    """Extension-dispatched single-file load — the one-call form of the
    reference's per-module entry points."""
    ext = _ext(path)
    if ext not in _DISPATCH:
        raise ValueError(
            f"unrecognized instrument extension {ext!r} for {path!r}; "
            f"known: {sorted(_DISPATCH)}"
        )
    return _DISPATCH[ext][0](spark, path)


def etl_file(
    spark: SparkSession, path: str, out_dir: str | None = None
) -> str:
    """Reference ``__main__`` parity: load one instrument file and write a
    snappy parquet next to it (or under ``out_dir``), returning the output
    path.  Unit metadata rides in the parquet footer (StructField
    metadata); provenance columns survive as ordinary columns."""
    df = load_file(spark, path)
    stem = os.path.splitext(os.path.basename(path))[0]
    target = os.path.join(out_dir or os.path.dirname(path), f"{stem}.parquet")
    write_parquet(df, target, mode="overwrite")
    return target


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ANSI SQL over the analytic lake tables (region, nation,
    customer, supplier, part, orders, lineitem, events, documents,
    embeddings) — registers them as temp views via the catalog (with its
    type normalization) and returns the lazy result."""
    from .catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(query)
