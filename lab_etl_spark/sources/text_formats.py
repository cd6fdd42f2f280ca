"""Text-based instrument sources: FAA MCC ``.txt`` and Netzsch STA exported
``.csv`` (SURVEY.md §2A ``src_mcc_txt`` / ``src_sta_csv``).

Spark-first shape (SURVEY.md §3.1): a tiny driver-side pre-scan of the file
head finds the header sentinel, delimiter, encoding, and column names/units
(cheap, bounded per file — the reference does the same scan eagerly:
faa_mcc_parser.py:139-166, netzsch_sta_parser.py:294-323).  The *data* scan
is then a fully distributed ``spark.read.csv`` with an explicit all-double
schema, ``skipRows`` pushing past the header, and unit metadata attached to
every field.  Executors never touch the header logic, so the hot path is the
Arrow-grade vectorized CSV reader with pushdown and pruning intact.

Metadata lines become a nested dict via the same normalization/typing ops
the reference applies (functions/core.py), JSON-attached per row.
"""

from __future__ import annotations

import csv as _csv
import io
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..meta import attach_provenance, detect_encoding, file_blake2b, with_units

# ---------------------------------------------------------------------------
# Driver-side header sniffing
# ---------------------------------------------------------------------------


def _read_head_raw(path: str, max_bytes: int = 1 << 20) -> bytes:
    with open(path, "rb") as f:
        return f.read(max_bytes)


def _read_head(path: str, encoding: str, max_bytes: int = 1 << 20) -> list[str]:
    return _read_head_raw(path, max_bytes).decode(
        encoding, errors="replace"
    ).splitlines()


def _sniff_delimiter(sample: str, candidates: str = ",\t;") -> str:
    try:
        return _csv.Sniffer().sniff(sample, delimiters=candidates).delimiter
    except _csv.Error:
        counts = {d: sample.count(d) for d in candidates}
        return max(counts, key=counts.get)


_NAME_UNIT_PAREN = re.compile(r"^\s*(.*?)\s*\(([^)]*)\)\s*$")  # "Time (s)"

#: canonical unit spellings (op_unit_normalize; faa_mcc_parser.py:95-106,
#: deatak_cone_parser.py:72) — lowercase-keyed
_UNIT_CANON = {
    "c": "°C",
    "cc/min": "ml/min",
    "c/s": "°C/s",
    "sec": "s",
    "/m": "1/m",
}


def _norm_unit(u: str | None) -> str | None:
    if not u:
        return None
    u = u.strip()
    return _UNIT_CANON.get(u.lower(), u)


def _slash_outside_parens(tok: str) -> int:
    """Index of the first ``/`` at parenthesis depth 0, or -1.

    Distinguishes the STA grammar ``'Temp./°C'`` / ``'DSC(subtr.)/(mW/mg)'``
    (unit after a top-level slash) from MCC's ``'HRR (W/g)'`` (slash *inside*
    the parenthesized unit — must not split there)."""
    depth = 0
    for i, ch in enumerate(tok):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "/" and depth == 0:
            return i
    return -1


def split_header_token(tok: str) -> tuple[str, str | None]:
    """One header cell → (standard_name, unit).

    Handles both grammars: ``'Temp./°C'`` (STA: split at first top-level
    slash, netzsch_sta_parser.py:326-357) and ``'Time (s)'`` / ``'HRR (W/g)'``
    (MCC: parenthesized unit, faa_mcc_parser.py:139-166).  Name is
    snake_cased; unit spelling canonicalized (op_unit_normalize).
    """
    tok = tok.strip()
    unit: str | None = None
    slash = _slash_outside_parens(tok)
    if slash >= 0:
        name, unit = tok[:slash], tok[slash + 1 :]
        unit = unit.strip().strip("()") or None
    else:
        m = _NAME_UNIT_PAREN.match(tok)
        if m:
            name, unit = m.group(1), m.group(2)
        else:
            name = tok
    name = re.sub(r"\([^)]*\)", "", name)
    name = re.sub(r"[\s.\-]+", "_", name.strip().lower()).strip("_")
    return name, _norm_unit(unit)


#: controlled-vocabulary renames shared by the CSV family
#: (faa_mcc_parser.py:121-126; netzsch_sta_parser.py:340-355)
COLUMN_RENAMES = {
    "temp": "temperature",
    "sensit": "sensitivity",
    "mass_subtr": "mass",
    "dsc_subtr": "dsc",
    "dtg_subtr": "dtg",
    "sample_weight": "sample_mass",
    "o2": "oxygen",
}


def _standardize(name: str) -> str:
    return COLUMN_RENAMES.get(name, name)


def find_mcc_header(lines: list[str]) -> tuple[int, list[str], str]:
    """MCC layout: metadata lines, a ``*`` sentinel, header on the next line,
    data after (sentinel logic: faa_mcc_parser.py:160-162 → skip_rows=i+2).

    Returns (data_start_line, header_tokens, delimiter).
    """
    for i, line in enumerate(lines):
        if line.strip().startswith("*"):
            header_line = lines[i + 1]
            delim = _sniff_delimiter(header_line)
            return i + 2, header_line.split(delim), delim
    raise ValueError("MCC sentinel '*' not found")


def find_sta_header(lines: list[str]) -> tuple[int, list[str], str]:
    """STA layout: ``#`` metadata lines, then a ``##``-prefixed header line,
    data after (netzsch_sta_parser.py:294-323)."""
    for i, line in enumerate(lines):
        if line.startswith("##"):
            delim = _sniff_delimiter(line)
            return i + 1, line.lstrip("#").split(delim), delim
    raise ValueError("STA '##' header line not found")


# ---------------------------------------------------------------------------
# Metadata-block parsing (driver-side, bounded by header size)
# ---------------------------------------------------------------------------

_NUM = re.compile(r"^[+-]?\d+(\.\d+)?([eE][+-]?\d+)?$")

#: metadata-key controlled vocabulary (faa_mcc_parser.py:121-126)
_META_KEY_RENAMES = {
    "sample_weight": "sample_mass",
    "combustor_temp": "combustor_temperature",
}


def _coerce(v: str):
    """The reference's typing ladder: int → float → string
    (faa_mcc_parser.py:82-92)."""
    v = v.strip()
    if _NUM.match(v):
        try:
            return int(v)
        except ValueError:
            return float(v)
    return v


def parse_metadata_lines(
    lines: list[str], sep: str, prefix: str = ""
) -> dict:
    """``key<sep>value`` metadata lines → nested dict with the reference's
    conventions: keys snake_cased + controlled vocabulary, ``KEY /unit`` or
    ``KEY (unit)`` → ``{value, unit}`` with canonical unit spelling,
    duplicate keys aggregated into lists (deatak_cone_parser.py:160-166)."""
    meta: dict = {}
    for line in lines:
        body = line[len(prefix):] if prefix and line.startswith(prefix) else line
        if sep not in body:
            continue
        key, val = body.split(sep, 1)
        val = val.strip().lstrip(",").strip()
        if not val:
            continue
        name, unit = split_header_token(key)
        k = _META_KEY_RENAMES.get(name, name)
        if unit and _NUM.match(val):
            v: object = {"value": _coerce(val), "unit": unit}
        else:
            v = _coerce(val)
        if k in meta:  # dup-key list aggregation
            if not isinstance(meta[k], list):
                meta[k] = [meta[k]]
            meta[k].append(v)
        else:
            meta[k] = v
    return meta


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------


def _csv_scan(
    spark: SparkSession,
    path: str,
    encoding: str,
    delim: str,
    skip_rows: int,
    names_units: list[tuple[str, str | None]],
    comment: str | None = None,
) -> DataFrame:
    """Distributed CSV scan with explicit schema, skipping the header region.

    Two strategies (Spark CSV has no native skip-N-rows):
      * ``comment`` — when every non-data line shares a prefix char (STA's
        ``#``), Spark's comment option drops them inside the distributed
        scan itself: full pushdown, correct encoding, zero extra passes.
      * preamble exclusion — otherwise (MCC's heterogeneous preamble): the
        driver pre-scan already holds the exact preamble lines, so the
        distributed text scan drops them with a broadcast NOT-IN filter and
        parses the rest with ``from_csv``.  Pure DataFrame API — no RDD
        hop, no extra job, and the filter pushes into the scan.  Exact by
        format invariant: preamble lines are ``key: value`` text / the
        sentinel / header names, while data lines are numeric CSV, so no
        data line can collide with a preamble string.  The exclusion
        strings come from the RAW head bytes decoded the same way the text
        source decodes them (UTF-8, replacement chars), so matching is
        byte-faithful even for non-UTF-8 preambles; data rows in these
        instrument formats are numeric ASCII, byte-identical under any of
        the encodings seen.
    """
    schema = StructType(
        [StructField(n, DoubleType(), True) for n, _ in names_units]
    )
    if comment is not None:
        df = (
            spark.read.option("sep", delim)
            .option("encoding", encoding)
            .option("comment", comment)
            .option("mode", "PERMISSIVE")
            .schema(schema)
            .csv(path)
        )
    else:
        ddl = ", ".join(f"`{n}` DOUBLE" for n, _ in names_units)
        # Split on \r\n|\r|\n only — Hadoop's line reader recognizes just
        # these, while str.splitlines() also breaks on \v \f \x85  …,
        # which would desync the exclusion strings from Spark's line view.
        preamble = re.split(
            r"\r\n|\r|\n",
            _read_head_raw(path).decode("utf-8", errors="replace"),
        )[:skip_rows]
        df = (
            spark.read.text(path)
            .filter(~F.col("value").isin(preamble))
            .select(
                F.from_csv(
                    F.col("value"), ddl, {"sep": delim, "mode": "PERMISSIVE"}
                ).alias("r")
            )
            .select("r.*")
        )
    return with_units(df, dict(names_units))


def load_mcc(spark: SparkSession, path: str) -> DataFrame:
    """FAA Micro Combustion Calorimeter ``.txt`` → standardized DataFrame.

    Reference: faa_mcc_parser.py:12-48 (load), 139-166 (header find).
    Output: double data columns with unit field-metadata + provenance
    columns (instrument_type='MCC', file_hash=BLAKE2b, file_metadata JSON).
    """
    encoding = detect_encoding(path)
    lines = _read_head(path, encoding)
    data_start, header, delim = find_mcc_header(lines)
    names_units = [
        (_standardize(n), u)
        for n, u in (split_header_token(t) for t in header)
    ]
    meta = parse_metadata_lines(lines[: data_start - 2], ":")
    df = _csv_scan(spark, path, encoding, delim, data_start, names_units)
    return attach_provenance(df, "MCC", path, file_blake2b(path), meta)


def load_sta_csv(spark: SparkSession, path: str) -> DataFrame:
    """Netzsch STA exported ``.csv`` → standardized DataFrame.

    Reference: netzsch_sta_parser.py:30-71 (load), 294-323 (header find),
    74-184 (metadata block).  The ``segment`` column stays double here and
    is cast long after scan (Arrow type inference in the reference pins it
    int64; explicit cast is the deterministic equivalent).
    """
    encoding = detect_encoding(path)
    lines = _read_head(path, encoding)
    data_start, header, delim = find_sta_header(lines)
    names_units = [
        (_standardize(n), u)
        for n, u in (split_header_token(t) for t in header)
    ]
    meta = parse_metadata_lines(
        [ln for ln in lines[: data_start - 1] if ln.startswith("#")],
        ":",
        prefix="#",
    )
    # every non-data line starts with '#' → native comment-skip scan
    df = _csv_scan(
        spark, path, encoding, delim, data_start, names_units, comment="#"
    )
    if "segment" in df.columns:
        units = {
            f.name: (f.metadata or {}).get("unit") for f in df.schema.fields
        }
        df = df.withColumn("segment", df["segment"].cast("long"))
        df = with_units(df, {k: v for k, v in units.items() if v})
    return attach_provenance(df, "STA", path, file_blake2b(path), meta)


# ---------------------------------------------------------------------------
# Distributed multi-file scans (binaryFile + mapInPandas, like the other
# four formats' scan_* siblings)
# ---------------------------------------------------------------------------

#: long-format lake schema for heterogeneous CSV-family instrument runs:
#: different exports carry different channel sets, so the scan emits one
#: row per (file, row, channel) instead of forcing a superset-wide schema —
#: the tidy form a multi-instrument lake can union across families and
#: pivot per analysis.
_TEXT_SCAN_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("instrument_type", StringType()),
        StructField("file_hash", StringType()),
        StructField("row_idx", LongType()),
        StructField("channel", StringType()),
        StructField("unit", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _text_scan_kernel(fmt: str):
    """Per-file parse kernel: decode bytes, find the format's header, parse
    the numeric body, melt to long form.  One Python call per Arrow batch
    of whole files — never per row."""
    import hashlib as _hl
    import os as _os

    from ..meta import detect_encoding_bytes

    find_header = find_mcc_header if fmt == "MCC" else find_sta_header

    def kernel(batches):
        import pandas as _pd

        for pdf in batches:
            frames = []
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                text = raw.decode(
                    detect_encoding_bytes(raw[: 1 << 16]), errors="replace"
                ).lstrip("﻿")
                lines = re.split(r"\r\n|\r|\n", text)
                data_start, header, delim = find_header(lines)
                names_units = [
                    (_standardize(n), u)
                    for n, u in (split_header_token(t) for t in header)
                ]
                body = [
                    ln.split(delim)
                    for ln in lines[data_start:]
                    if ln.strip() and not ln.startswith("#")
                ]
                fh = _hl.blake2b(raw, digest_size=64).hexdigest()
                src = _os.path.basename(path)
                recs = []
                for i, cells in enumerate(body):
                    for (name, unit), cell in zip(names_units, cells):
                        try:
                            v = float(cell)
                        except ValueError:
                            v = None
                        recs.append(
                            (src, fmt, fh, i, name, unit, v)
                        )
                frames.append(
                    _pd.DataFrame(
                        recs,
                        columns=[f.name for f in _TEXT_SCAN_SCHEMA.fields],
                    )
                )
            yield (
                _pd.concat(frames, ignore_index=True)
                if frames
                else _pd.DataFrame(
                    columns=[f.name for f in _TEXT_SCAN_SCHEMA.fields]
                )
            )

    return kernel


def _scan_text_family(
    spark: SparkSession, path_glob: str, fmt: str
) -> DataFrame:
    binary = spark.read.format("binaryFile").load(path_glob)
    return binary.select("path", "content").mapInPandas(
        _text_scan_kernel(fmt), _TEXT_SCAN_SCHEMA
    )


def scan_mcc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed MCC directory scan → long-format lake rows (one per
    file/row/channel).  Pivot back to wide per analysis; the long form is
    what lets runs with different channel sets share one lake table."""
    return _scan_text_family(spark, path_glob, "MCC")


def scan_sta_csv(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed STA-CSV directory scan → long-format lake rows."""
    return _scan_text_family(spark, path_glob, "STA")
