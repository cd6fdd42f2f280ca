"""Netzsch STA binary ``.ngb-ss3`` / ``.ngb-bs3`` source (SURVEY.md §2A
``src_sta_ngb``).

File format (studied from the reference implementation,
netzsch_sta_ngb_parser.py:12-34 and :127-142 — the byte constants below are
facts about the Netzsch container format, the decode code here is new):

  * the file is a zip holding ``Streams/stream_N.table`` byte-streams;
  * each stream splits into *tables* at a 20-byte separator sentinel;
  * metadata fields in stream_1 are addressed by (category, field) 2-byte
    IDs and encoded as ``<type-byte> <payload>`` where type ``\\x1f`` is a
    length-prefixed string, ``\\x05`` little-endian f64, ``\\x04`` f32,
    ``\\x03`` i32 (date_performed is an i32 epoch);
  * stream_2/3 carry columnar data: a header table tags the column id
    (mapped to names via COLUMN_MAP), following data tables hold raw
    little-endian f64/f32 arrays between ``\\xa0\\x01`` and an end sentinel.

Decode is ``numpy.frombuffer`` per column chunk — one vectorized call per
table, not a per-value unpack loop.

Spark shape: whole-file operator — ``binaryFile`` scan → ``mapInPandas``
(one instrument run ≈ 1 MB; parallelism across files; SURVEY.md §3.2).
"""

from __future__ import annotations

import re
import struct
import zipfile
from collections.abc import Iterator
from datetime import datetime, timezone
from io import BytesIO
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ..meta import attach_provenance, file_blake2b, with_units

# ---- container format constants (netzsch_sta_ngb_parser.py:12-34) ----------
END_FIELD = rb"\x01\x00\x00\x00\x02\x00\x01\x00\x00"
TYPE_PREFIX = rb"\x17\xfc\xff\xff"
TYPE_SEPARATOR = rb"\x80\x01"
TABLE_SEPARATOR = (
    rb"\x00\x00\x01\x00\x00\x00\x0c\x00\x17\xfc\xff\xff\x1a\x80\x01\x01\x80\x02\x00\x00"
)
DATA_START = b"\xa0\x01"
DATA_END = b"\x01\x00\x00\x00\x02\x00\x01\x00\x00\x00\x03\x00\x18\xfc\xff\xff\x03\x80\x01"

#: column-id byte → standardized name (netzsch_sta_ngb_parser.py:19-34)
COLUMN_MAP = {
    "8d": "time",
    "8e": "temperature",
    "9c": "dsc",
    "9e": "purge_flow",
    "90": "protective_flow",
    "87": "sample_mass",
    "30": "furnace_temperature",
    "32": "furnace_power",
    "33": "h_foil_temp",
    "34": "uc_module",
    "35": "env_pressure",
    "36": "env_accel_x",
    "37": "env_accel_y",
    "38": "env_accel_z",
}

#: units for the standardized columns (docs/sta.md of the reference)
COLUMN_UNITS = {
    "time": "min",
    "temperature": "°C",
    "dsc": "µV",
    "purge_flow": "ml/min",
    "protective_flow": "ml/min",
    "sample_mass": "mg",
    "furnace_temperature": "°C",
    "furnace_power": "W",
}

#: metadata field → (category-id, field-id) (netzsch_sta_ngb_parser.py:127-142)
META_PATTERNS: dict[str, tuple[bytes, bytes]] = {
    "instrument": (rb"\x75\x17", rb"\x59\x10"),
    "project": (rb"\x72\x17", rb"\x3c\x08"),
    "date_performed": (rb"\x72\x17", rb"\x3e\x08"),
    "lab": (rb"\x72\x17", rb"\x34\x08"),
    "operator": (rb"\x72\x17", rb"\x35\x08"),
    "crucible_type": (rb"\x7e\x17", rb"\x40\x08"),
    "comment": (rb"\x72\x17", rb"\x3d\x08"),
    "furnace_type": (rb"\x7a\x17", rb"\x40\x08"),
    "carrier_type": (rb"\x79\x17", rb"\x40\x08"),
    "sample_id": (rb"\x30\x75", rb"\x98\x08"),
    "sample_name": (rb"\x30\x75", rb"\x40\x08"),
    "sample_mass": (rb"\x30\x75", rb"\x9e\x0c"),
    "crucible_mass": (rb"\x7e\x17", rb"\x9e\x0c"),
    "material": (rb"\x30\x75", rb"\x62\x09"),
}


def _split_tables(stream: bytes) -> list[bytes]:
    """Split a stream into its tables at the separator sentinel."""
    cuts = [m.start() - 2 for m in re.finditer(TABLE_SEPARATOR, stream)]
    return [stream[i:j] for i, j in zip(cuts, cuts[1:] + [len(stream)])]


def _decode_value(type_byte: bytes, payload: bytes) -> Any:
    """Decode one typed metadata payload (type bytes per the format notes)."""
    if type_byte == b"\x1f":  # length-prefixed string
        return payload[4:].decode("utf-8", errors="ignore").replace("\x00", "").strip()
    if type_byte == b"\x05" and len(payload) >= 8:
        return struct.unpack("<d", payload[:8])[0]
    if type_byte == b"\x04" and len(payload) >= 4:
        return struct.unpack("<f", payload[:4])[0]
    if type_byte == b"\x03" and len(payload) >= 4:
        return struct.unpack("<i", payload[:4])[0]
    return payload.hex()


def _extract_metadata(stream1: bytes) -> dict[str, Any]:
    meta: dict[str, Any] = {}
    for table in _split_tables(stream1):
        for name, (cat, field) in META_PATTERNS.items():
            if name in meta:
                continue
            pat = (
                cat + rb".+?" + field + rb".+?" + TYPE_PREFIX
                + rb"(.+?)" + TYPE_SEPARATOR + rb"(.+?)" + END_FIELD
            )
            m = re.search(pat, table, flags=re.DOTALL)
            if not m:
                continue
            tb, payload = m.group(1), m.group(2)
            if name == "date_performed" and len(payload) >= 4:
                epoch = struct.unpack("<i", payload[:4])[0]
                meta[name] = datetime.fromtimestamp(
                    epoch, tz=timezone.utc
                ).isoformat()
            else:
                meta[name] = _decode_value(tb[:1], payload)
    return meta


def _decode_slab(table: bytes) -> np.ndarray | None:
    """One data table (tag ``\\x75``) → float64 array, or None."""
    start = table.find(DATA_START)
    if start < 0:
        return None
    start += 6
    dtype_byte = table[start - 7 : start - 6]
    body = table[start:]
    end = body.find(DATA_END)
    body = body[: end if end >= 0 else len(body)]
    if dtype_byte == b"\x05":
        return np.frombuffer(body[: len(body) // 8 * 8], dtype="<f8")
    if dtype_byte == b"\x04":
        return np.frombuffer(body[: len(body) // 4 * 4], dtype="<f4").astype("f8")
    return None


def _decode_data_stream(stream: bytes, header_trails: bool) -> dict[str, np.ndarray]:
    """stream_2/3 → {column_name: float64 array}.

    Layouts differ per stream (verified against the fixtures; the reference
    mirrors this at netzsch_sta_ngb_parser.py:222-234 vs :275-300):
      * stream_2 (``header_trails=True``): data slabs come FIRST, then the
        header table that names the column closes them out;
      * stream_3 (``header_trails=False``): the header leads, slabs follow.
    """
    columns: dict[str, list[np.ndarray]] = {}
    current: str | None = None
    pending: list[np.ndarray] = []
    for table in _split_tables(stream):
        tag = table[1:2]
        if tag == b"\x17":  # header table
            name = COLUMN_MAP.get(table[0:1].hex(), table[0:1].hex())
            if header_trails:
                if pending:
                    columns.setdefault(name, []).extend(pending)
                    pending = []
            else:
                current = name
                columns.setdefault(current, [])
        elif tag == b"\x75":  # data slab
            arr = _decode_slab(table)
            if arr is None:
                continue
            if header_trails:
                pending.append(arr)
            elif current is not None:
                columns[current].append(arr)
    out = {
        name: (np.concatenate(chunks) if chunks else np.array([], dtype="f8"))
        for name, chunks in columns.items()
    }
    return {k: v for k, v in out.items() if v.size}


def parse_ngb_bytes(blob: bytes) -> tuple[dict[str, Any], pd.DataFrame]:
    """Full decode of one NGB container → (metadata, data frame).

    Columns come from stream_2 (primary) and stream_3 (auxiliary), trimmed
    to the shortest common length (instrument streams can disagree by a few
    trailing samples mid-write; the reference's polars ``with_columns``
    simply errors on mismatch — trimming is the lake-robust choice).
    """
    meta: dict[str, Any] = {}
    cols: dict[str, np.ndarray] = {}
    with zipfile.ZipFile(BytesIO(blob)) as z:
        names = set(z.namelist())
        if "Streams/stream_1.table" in names:
            meta = _extract_metadata(z.read("Streams/stream_1.table"))
        for sname, trails in (
            ("Streams/stream_2.table", True),
            ("Streams/stream_3.table", False),
        ):
            if sname in names:
                for k, v in _decode_data_stream(z.read(sname), trails).items():
                    cols.setdefault(k, v)
    if not cols:
        return meta, pd.DataFrame()
    n = min(v.size for v in cols.values())
    return meta, pd.DataFrame({k: v[:n] for k, v in cols.items()})


def load_ngb(spark: SparkSession, path: str) -> DataFrame:
    """Single-file load (reference call shape, netzsch_sta_ngb_parser.py:37-55):
    decoded columns + unit metadata + provenance."""
    with open(path, "rb") as f:
        blob = f.read()
    meta, pdf = parse_ngb_bytes(blob)
    if pdf.empty:
        # no decodable data streams → explicit-schema empty frame
        # (createDataFrame cannot infer a schema from an empty pandas frame)
        df = spark.createDataFrame(
            [],
            StructType(
                [StructField(c, DoubleType()) for c in COLUMN_MAP.values()]
            ),
        )
    else:
        df = spark.createDataFrame(pdf)
    df = with_units(df, {c: COLUMN_UNITS.get(c) for c in pdf.columns if COLUMN_UNITS.get(c)})
    return attach_provenance(df, "STA", path, file_blake2b(path), meta)


def scan_ngb(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed multi-file scan: one row per sample per file, superset
    schema over COLUMN_MAP, with source_file/sample_id provenance columns."""
    fields = [StructField("source_file", StringType()), StructField("sample_id", StringType())]
    fields += [StructField(c, DoubleType()) for c in COLUMN_MAP.values()]
    schema = StructType(fields)
    names = [f.name for f in schema.fields]

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                meta, data = parse_ngb_bytes(bytes(content))
                if data.empty:
                    continue
                data = data.reindex(columns=list(COLUMN_MAP.values()))
                data.insert(0, "source_file", path)
                data.insert(1, "sample_id", meta.get("sample_id"))
                yield data[names]

    binary = spark.read.format("binaryFile").load(path_glob)
    df = binary.select("path", "content").mapInPandas(parse_batch, schema)
    return with_units(df, COLUMN_UNITS)
