"""Instrument-file sources (SURVEY.md §2A scans) + the parquet sink.

Every loader returns a standardized DataFrame: double measurement columns
with ``unit`` field metadata, plus provenance columns (``instrument_type``,
``source_file``, ``file_hash``, ``file_metadata`` JSON).
"""

from .cone import load_cone, scan_cone
from .ftir import load_ftir, scan_ftir
from .hfm import load_hfm, scan_hfm
from .ngb import load_ngb, scan_ngb
from .sink import write_parquet
from .text_formats import load_mcc, load_sta_csv

__all__ = [
    "load_cone",
    "load_ftir",
    "load_hfm",
    "load_mcc",
    "load_ngb",
    "load_sta_csv",
    "scan_cone",
    "scan_ftir",
    "scan_hfm",
    "scan_ngb",
    "write_parquet",
]
