"""Bruker OPUS FTIR binary source (SURVEY.md §2A ``src_ftir_opus``).

The reference wraps the public ``brukeropus`` package
(bruker_ftir_parser.py:12-48); that package is not available here, so this
module implements a self-contained reader of the publicly documented OPUS
container layout (magic ``0A 0A FE FE``; a directory of 12-byte entries
``(type:i32, length_words:i32, offset:i32)``; parameter blocks as records of
``3-char tag, dtype:u16, size_words:u16, payload``; spectra as raw
little-endian float32 arrays paired with a data-status parameter block —
``status_type == data_type | 0x10`` — carrying NPT/FXV/LXV).

Output matches the reference's semantics (bruker_ftir_parser.py:50-107,
docs/ftir.md): a ``wavelength`` column in µm from the primary spectrum's
grid — priority reflectance → absorbance → transmittance → sample
(:88-93) — with every other spectrum linearly interpolated onto that grid
(:74-86, the documented acceptable-loss tradeoff).

Spark shape: whole-file operator via ``binaryFile`` + ``mapInPandas``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ..meta import attach_provenance, file_blake2b, with_units

MAGIC = b"\x0a\x0a\xfe\xfe"

#: data-type code (block-type bits 10-16) → short key, per the public
#: brukeropus block-type documentation (see also reference docs/ftir.md key
#: list: sm rf igsm igrf phsm phrf a t r km tr gcig)
DATA_TYPE_KEYS = {
    1: "sm",
    2: "rf",
    3: "igsm",
    4: "igrf",
    5: "phsm",
    6: "phrf",
    7: "a",
    8: "t",
    9: "kk",
    10: "r",
    11: "km",
    12: "tr",
    13: "gcig",
}

#: key → output column name (bruker_ftir_parser.py:27-35 column metadata)
KEY_COLUMNS = {
    "r": "reflectance",
    "a": "absorbance",
    "t": "transmittance",
    "sm": "sample_spectrum",
    "rf": "reference_spectrum",
    "phsm": "sample_phase",
    "phrf": "reference_phase",
}

#: primary-spectrum priority (bruker_ftir_parser.py:88-93 is r→a→t; sm as
#: a final fallback so single-channel files still load)
PRIORITY = ["r", "a", "t", "sm"]


def _read_directory(blob: bytes) -> list[tuple[int, int, int]]:
    if not blob.startswith(MAGIC):
        raise ValueError("not an OPUS file (bad magic)")
    dir_start, _max_blocks, n_blocks = struct.unpack_from("<iii", blob, 0x0C)
    entries = []
    for i in range(n_blocks):
        t, ln, ptr = struct.unpack_from("<iii", blob, dir_start + 12 * i)
        if ptr > 0 and ln > 0:
            entries.append((t, ln, ptr))
    return entries


def _parse_params(blob: bytes, offset: int, length_words: int) -> dict[str, Any]:
    """Parameter block → {TAG: value}. Record: 4 bytes tag (3 chars + NUL),
    u16 dtype (0=i32, 1=f64, 2/3/4=string), u16 size in 16-bit words."""
    params: dict[str, Any] = {}
    pos, end = offset, min(offset + length_words * 4, len(blob))
    while pos + 8 <= end:
        tag = blob[pos : pos + 3].decode("ascii", errors="replace")
        dtype, size = struct.unpack_from("<HH", blob, pos + 4)
        payload = blob[pos + 8 : pos + 8 + size * 2]
        if tag == "END":
            break
        if dtype == 0 and size >= 2:
            params[tag] = struct.unpack("<i", payload[:4])[0]
        elif dtype == 1 and size >= 4:
            params[tag] = struct.unpack("<d", payload[:8])[0]
        else:
            params[tag] = (
                payload.split(b"\x00")[0].decode("latin-1", errors="replace").strip()
            )
        pos += 8 + size * 2
    return params


def parse_opus_bytes(blob: bytes) -> tuple[dict[str, Any], dict[str, dict[str, Any]]]:
    """One OPUS file → (file_params, {key: {x, y, params}}).

    ``x`` is the native axis (FXV..LXV over NPT points — wavenumber cm⁻¹
    when the data-status ``DXU`` says ``WN``).
    """
    entries = _read_directory(blob)
    params: dict[str, Any] = {}
    status: dict[int, dict[str, Any]] = {}
    data: dict[int, np.ndarray] = {}

    for t, ln, ptr in entries:
        param_bits = (t >> 4) & 0x3F
        if param_bits:  # parameter / data-status block
            p = _parse_params(blob, ptr, ln)
            if {"NPT", "FXV", "LXV"} <= set(p):
                status[t & ~0x10] = p  # sibling data block's type
            else:
                params.update(p)
        elif (t >> 10) & 0x7F:  # data block (has a data-type code)
            data[t] = np.frombuffer(
                blob[ptr : ptr + ln * 4], dtype="<f4"
            ).astype("f8")

    spectra: dict[str, dict[str, Any]] = {}
    for t, y in data.items():
        st = status.get(t)
        if st is None:
            continue
        npt = int(st["NPT"])
        y = y[:npt]
        x = np.linspace(float(st["FXV"]), float(st["LXV"]), npt)
        code = (t >> 10) & 0x7F
        sub = (t >> 2) & 0x3  # 1=real, 2=imaginary, 3=amplitude
        key = DATA_TYPE_KEYS.get(code, f"data_{code}")
        if code in (1, 2) and sub == 2:
            key = {"sm": "phsm", "rf": "phrf"}.get(key, key)
        spectra[key] = {"x": x, "y": y, "params": st}
    return params, spectra


def _to_wavelength_um(x: np.ndarray, dxu: str | None) -> np.ndarray:
    """Native x-axis → wavelength in µm (docs/ftir.md: output basis is
    wavelength).  Wavenumber cm⁻¹ → 10000/wn; already-µm passes through."""
    if dxu in (None, "WN"):
        with np.errstate(divide="ignore"):
            return 10000.0 / x
    return x.astype("f8")


def opus_to_frame(blob: bytes) -> tuple[dict[str, Any], pd.DataFrame, dict[str, str]]:
    """Decode + reshape to the reference's output table: wavelength (µm,
    ascending) + primary spectrum + others interpolated onto its grid
    (bruker_ftir_parser.py:50-107)."""
    params, spectra = parse_opus_bytes(blob)
    primary_key = next((k for k in PRIORITY if k in spectra), None)
    if primary_key is None:
        return params, pd.DataFrame(), {}

    prim = spectra[primary_key]
    wl = _to_wavelength_um(prim["x"], prim["params"].get("DXU"))
    order = np.argsort(wl)
    cols: dict[str, np.ndarray] = {
        "wavelength": wl[order],
        KEY_COLUMNS.get(primary_key, primary_key): prim["y"][order],
    }
    for key, sp in spectra.items():
        if key == primary_key or key.startswith("ig"):
            continue  # interferograms have no spectral x-axis
        swl = _to_wavelength_um(sp["x"], sp["params"].get("DXU"))
        so = np.argsort(swl)
        # np.interp onto the primary grid — the reference's documented lossy
        # resample (bruker_ftir_parser.py:74-86)
        cols[KEY_COLUMNS.get(key, key)] = np.interp(
            cols["wavelength"], swl[so], sp["y"][so]
        )
    units = {name: ("µm" if name == "wavelength" else "a.u.") for name in cols}
    return params, pd.DataFrame(cols), units


def load_ftir(spark: SparkSession, path: str) -> DataFrame:
    """Single-file load (reference call shape bruker_ftir_parser.py:12-48)."""
    with open(path, "rb") as f:
        blob = f.read()
    meta, pdf, units = opus_to_frame(blob)
    if pdf.empty:
        # no spectra decoded → minimal stable schema
        # (createDataFrame cannot infer a schema from an empty pandas frame)
        df = spark.createDataFrame(
            [], StructType([StructField("wavelength", DoubleType())])
        )
    else:
        df = spark.createDataFrame(pdf)
    df = with_units(df, units)
    return attach_provenance(
        df, "FTIR", path, file_blake2b(path), {"parameters": meta}
    )


def scan_ftir(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed multi-file scan: long format (one row per wavelength ×
    spectrum) — the union-friendly lake layout for heterogeneous channels."""
    schema = StructType(
        [
            StructField("source_file", StringType()),
            StructField("spectrum", StringType()),
            StructField("wavelength", DoubleType()),
            StructField("value", DoubleType()),
        ]
    )

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                _, frame, _ = opus_to_frame(bytes(content))
                if frame.empty:
                    continue
                long = frame.melt(
                    id_vars=["wavelength"], var_name="spectrum", value_name="value"
                )
                long.insert(0, "source_file", path)
                yield long[["source_file", "spectrum", "wavelength", "value"]]

    binary = spark.read.format("binaryFile").load(path_glob)
    df = binary.select("path", "content").mapInPandas(parse_batch, schema)
    return with_units(df, {"wavelength": "µm", "value": "a.u."})
