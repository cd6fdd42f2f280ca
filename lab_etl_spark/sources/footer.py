"""Parquet footer / row-group statistics reader — format-native data
skipping, the complement of the commit-log manifest stats
(operators/commitlog.py ``stats_cols``).

The commit log prunes at FILE granularity from the manifest; the parquet
footer carries the same min/max/null-count evidence one level finer — per
ROW GROUP — written by every parquet writer on earth.  Reading it back as
a DataFrame gives the engine (and its users) three things:

  * a pruning planner: which row groups of which files can a range
    predicate touch (``prune_row_groups``) — the decision Spark's own
    parquet reader makes internally, exposed as data so layouts can be
    AUDITED (is the z-order actually clustering? how much would this
    predicate skip?) instead of trusted;
  * a zero-scan table census (rows/bytes/nulls per column per file) for
    lake health dashboards;
  * a second decode path for correctness: ``q_parquet_footer_stats``
    cross-checks footer values against DuckDB aggregating the DATA, so a
    footer-decode bug (sign, epoch unit, truncation) diverges loudly.

Scale shape: footers are listed driver-side (a file LISTING is
manifest-sized — same budget as operators/commitlog.py), then read on
EXECUTORS via an Arrow-batched ``mapInPandas`` kernel — one footer
(a few KB at the file tail) per task row, no data pages touched.  At
100 TB / ~100k files this is exactly the parallel manifest-read pattern
of an Iceberg planning phase: seconds, not a scan.

Stats typing: parquet stores min/max in the column's physical type.  To
keep one stable output schema the reader splits them into ``min_num`` /
``max_num`` (DOUBLE: ints, floats, bools, dates as epoch days,
timestamps as epoch microseconds) and ``min_str`` / ``max_str`` (UTF-8
strings).  ``+ 0.0`` normalizes IEEE ``-0.0`` to ``0.0`` so footer
values compare bit-identical to engine MIN/MAX over the data.  String
min/max may be TRUNCATED bounds in the general case (parquet writers may
shorten long byte arrays to any valid bound); ``prune_row_groups`` only
ever uses them as bounds, which truncation preserves.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from datetime import date, datetime, timezone

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: one row per (file, row group, leaf column)
STATS_SCHEMA = (
    "file STRING, row_group INT, column STRING, physical_type STRING, "
    "n_values BIGINT, null_count BIGINT, "
    "min_num DOUBLE, max_num DOUBLE, min_str STRING, max_str STRING, "
    "rg_rows BIGINT, rg_bytes BIGINT"
)

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _to_num(v, round_up: bool = False) -> float | None:
    """Map a typed parquet stat to the DOUBLE lane (None => string lane).

    ``round_up`` is set for MAX bounds: truncation of sub-microsecond
    components must stay CONSERVATIVE for pruning (floor the min, ceil
    the max), else a bound reported low can falsely skip a boundary row
    group — the never-false-negative contract.
    """
    if isinstance(v, bool):
        return float(v)
    if isinstance(v, (int, float)):
        # + 0.0 folds -0.0 to 0.0 (footer may store the signed zero the
        # engines' MIN/MAX normalize away)
        return float(v) + 0.0
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        # integer microseconds from the timedelta COMPONENTS:
        # total_seconds() * 1e6 is inexact for ~2.5% of us-resolution
        # epochs (float division then multiplication), which would put a
        # footer bound a fraction of a us off and let prune_row_groups
        # drop a boundary row group — breaking the never-false-negative
        # contract
        d = v - _EPOCH
        us = (d.days * 86400 + d.seconds) * 10**6 + d.microseconds
        # nanosecond-unit lakes: pyarrow yields pandas Timestamps whose
        # sub-microsecond component the timedelta arithmetic FLOORS — a
        # floored max can sit up to 999 ns below the true maximum, so a
        # fractional-microsecond predicate bound could falsely prune the
        # boundary group.  Round the max bound up instead (min floors,
        # which is already the conservative direction).
        if round_up and getattr(v, "nanosecond", 0):
            us += 1
        return float(us)  # epoch microseconds
    if isinstance(v, date):
        return float((v - _EPOCH.date()).days)  # epoch days
    return None


def _to_str(v) -> str | None:
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return v.hex()
    if isinstance(v, str):
        return v
    return None


def list_part_files(path: str) -> list[str]:
    """Driver-side listing of the parquet part files under ``path`` (or
    ``[path]`` for a single file) — manifest-sized, like every listing in
    operators/commitlog.py; the footer READS happen on executors."""
    if os.path.isfile(path):
        return [path]
    out: list[str] = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def footer_rowgroup_stats(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    files: list[str] | None = None,
) -> DataFrame:
    """Per-(file, row group, column) footer statistics as a DataFrame.

    One executor task per footer via ``mapInPandas`` over the driver-side
    file listing; each task reads only the footer bytes (pyarrow
    ``ParquetFile.metadata`` — no data pages, no row materialization).
    ``columns=None`` reads stats for every leaf column.

    Schema-evolved / heterogeneous lakes: a wanted column absent from a
    file's footer still yields one PLACEHOLDER row per row group
    (``physical_type`` NULL, all stats NULL, real ``rg_rows``/
    ``rg_bytes``), so every (file, row_group) stays visible to the
    keep/skip decision and the NULL-bounds rule retains it — a file
    written before the column existed is unprunable evidence, not an
    invisible drop.  A column present in NO file therefore yields
    all-placeholder rows rather than an error here (a lazy
    transformation cannot raise at call time without probing every
    footer driver-side); :func:`pruned_scan`, which runs an action
    anyway, raises ``KeyError`` on that case.
    """
    if files is None:
        files = list_part_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet part files under {path}")
    wanted = set(columns) if columns is not None else None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for fp in pdf["file"]:
                meta = pq.ParquetFile(fp).metadata
                for g in range(meta.num_row_groups):
                    rg = meta.row_group(g)
                    present: set[str] = set()
                    for i in range(rg.num_columns):
                        col = rg.column(i)
                        name = col.path_in_schema
                        if wanted is not None and name not in wanted:
                            continue
                        present.add(name)
                        s = col.statistics
                        has = s is not None and s.has_min_max
                        rows.append(
                            {
                                "file": fp,
                                "row_group": g,
                                "column": name,
                                "physical_type": col.physical_type,
                                "n_values": (
                                    s.num_values if s is not None else None
                                ),
                                "null_count": (
                                    s.null_count
                                    if s is not None and s.has_null_count
                                    else None
                                ),
                                "min_num": _to_num(s.min) if has else None,
                                "max_num": (
                                    _to_num(s.max, round_up=True)
                                    if has
                                    else None
                                ),
                                "min_str": _to_str(s.min) if has else None,
                                "max_str": _to_str(s.max) if has else None,
                                "rg_rows": rg.num_rows,
                                # whole-GROUP bytes, not this column's
                                # chunk: pruning skips the group, so the
                                # byte-weighted skip fraction must weigh
                                # every column's pages
                                "rg_bytes": rg.total_byte_size,
                            }
                        )
                    if wanted is not None:
                        # placeholder rows for wanted-but-absent columns
                        # (schema evolution): NULL bounds == unprunable,
                        # so the group survives the keep rule instead of
                        # vanishing from the decision entirely
                        for name in sorted(wanted - present):
                            rows.append(
                                {
                                    "file": fp,
                                    "row_group": g,
                                    "column": name,
                                    "physical_type": None,
                                    "n_values": None,
                                    "null_count": None,
                                    "min_num": None,
                                    "max_num": None,
                                    "min_str": None,
                                    "max_str": None,
                                    "rg_rows": rg.num_rows,
                                    "rg_bytes": rg.total_byte_size,
                                }
                            )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "row_group", "column", "physical_type",
                    "n_values", "null_count", "min_num", "max_num",
                    "min_str", "max_str", "rg_rows", "rg_bytes",
                ],
            )

    # one task row per FILE, spread so ~every footer read runs in parallel
    # (no exchange for a single file — a 1-row local relation is already
    # one partition, and the repartition would only add a SinglePartition
    # shuffle to the plan)
    paths = spark.createDataFrame([(f,) for f in files], "file STRING")
    if len(files) > 1:
        paths = paths.repartition(min(len(files), 256))
    return paths.mapInPandas(kernel, STATS_SCHEMA)


def _keep_expr(lo: float | None, hi: float | None) -> Column:
    """The ONE keep rule both the audit API (:func:`prune_row_groups`)
    and the read path (:func:`pruned_scan`) apply: a row group survives
    when its bounds overlap [lo, hi) OR it has no bounds (NULL stats —
    including the placeholder rows schema-evolved files emit: no
    evidence == cannot skip, the same conservative rule the commit-log
    pruner and every engine's row-group filter apply)."""
    overlap: Column = F.lit(True)
    if lo is not None:
        overlap = overlap & (F.col("max_num") >= F.lit(float(lo)))
    if hi is not None:
        overlap = overlap & (F.col("min_num") < F.lit(float(hi)))
    return F.col("min_num").isNull() | F.col("max_num").isNull() | overlap


def prune_row_groups(
    stats: DataFrame,
    column: str,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Format-native range pruning decision over ``footer_rowgroup_stats``
    output: per (file, row_group), can rows with ``column`` in [lo, hi)
    exist there?  NULL footer bounds keep the group (no evidence ==
    cannot skip — the same conservative rule the commit-log pruner and
    every engine's row-group filter apply).

    Returns (file, row_group, rg_rows, rg_bytes, keep) — aggregate
    ``keep`` for the skip fraction, or join it back to drive an audited
    scan.  The inputs are numeric-lane bounds (epoch micros for
    timestamps, epoch days for dates), matching ``min_num``/``max_num``.
    """
    s = stats.filter(F.col("column") == column).select(
        "file", "row_group", _keep_expr(lo, hi).alias("keep")
    )
    # never-false-negative over the full (file, row_group) universe: when
    # stats were built with columns=None there are no placeholder rows,
    # so a file that predates the prune column has NO row for it — its
    # groups must surface as keep=true (no evidence == cannot skip), not
    # silently vanish from the decision
    universe = stats.select(
        "file", "row_group", "rg_rows", "rg_bytes"
    ).distinct()
    return universe.join(s, ["file", "row_group"], "left").select(
        "file",
        "row_group",
        "rg_rows",
        "rg_bytes",
        F.coalesce("keep", F.lit(True)).alias("keep"),
    )


_ARROW_TO_DDL = {
    "int8": "tinyint", "int16": "smallint", "int32": "int",
    "int64": "bigint", "float": "float", "double": "double",
    "bool": "boolean", "string": "string", "large_string": "string",
    "date32[day]": "date",
}


def _arrow_ddl(t) -> str | None:
    """Spark DDL for a primitive arrow type, or None if unsupported.
    Timestamps are matched STRUCTURALLY (pyarrow.types.is_timestamp), not
    by string form: Spark's TimestampType writes isAdjustedToUTC=true
    parquet, which pyarrow reports as 'timestamp[us, tz=UTC]' — a
    string-keyed map would reject every tz-aware lake."""
    import pyarrow.types as pat

    if pat.is_timestamp(t):
        return "timestamp"
    return _ARROW_TO_DDL.get(str(t))


def pruned_scan(
    spark: SparkSession,
    path: str,
    column: str,
    lo: float | None,
    hi: float | None,
    read_columns: list[str],
) -> DataFrame:
    """Format-native data-skipping READ: materialize only the row groups
    whose footer stats admit ``column`` ∈ [lo, hi) — the read path that
    :func:`prune_row_groups` plans.

    Three stages, all bounded by metadata except the final read:

      1. footer census on executors (:func:`footer_rowgroup_stats`);
      2. the pruning decision collected DRIVER-side — one row per row
         group, manifest-sized (a 100 TB table is ~10⁵-10⁶ groups of
         numbers, the same budget as an Iceberg planning phase), never
         row data;
      3. an Arrow-batched ``mapInPandas`` kernel over the KEPT
         (file, row_group) pairs, each task reading exactly its group's
         pages for ``read_columns`` via pyarrow — skipped groups' bytes
         are never fetched.

    Callers still apply the exact row predicate to the survivors (footer
    bounds admit false positives, never false negatives — the same
    contract as commit-log manifest pruning).  Spark's own parquet
    reader does this internally when filters are pushed; exposing it as
    an operator makes the skipping AUDITABLE (the kept/total ratio is a
    first-class result) and works for predicates Spark cannot push
    (e.g. bounds computed at runtime from another table).

    ``read_columns`` must be primitive-typed (the stats lanes' type
    universe) and present in EVERY file (types are probed from one
    footer; a file missing a read column fails loudly in the read
    kernel).  The PRUNE column, by contrast, may be absent from some
    files (schema evolution): those files' groups carry placeholder
    NULL bounds and are conservatively KEPT, never dropped.  A prune
    column present in no file at all raises ``KeyError`` — that is a
    misspelling, and silently keeping (or dropping) everything would
    hide it.
    """
    import pyarrow.parquet as pq

    files = list_part_files(path)
    if not files:
        # same error (and message shape) footer_rowgroup_stats raises, not
        # an opaque IndexError from the schema probe below
        raise FileNotFoundError(f"no parquet part files under {path}")
    # read-column types from ONE footer, driver-side (read_columns must
    # exist everywhere, so any file's footer answers)
    schema_arrow = pq.ParquetFile(files[0]).schema_arrow
    fields = []
    for c in read_columns:
        ddl = _arrow_ddl(schema_arrow.field(c).type)
        if ddl is None:
            raise TypeError(
                f"pruned_scan reads primitive columns only; "
                f"{c}: {schema_arrow.field(c).type}"
            )
        fields.append(f"{c} {ddl}")
    out_schema = ", ".join(fields)

    # ONE census job collects the keep decision AND column presence —
    # one row per row group, manifest-sized, never row data.  Presence
    # (physical_type non-NULL on at least one row) distinguishes a
    # schema-evolved lake (some placeholder rows — keep those groups)
    # from a misspelled prune column (ALL placeholders — raise).
    decision = footer_rowgroup_stats(
        spark, path, columns=[column], files=files
    ).select(
        "file",
        "row_group",
        _keep_expr(lo, hi).alias("keep"),
        F.col("physical_type").isNotNull().alias("present"),
    ).collect()
    if not any(r["present"] for r in decision):
        raise KeyError(
            f"prune column {column!r} not in any file's schema under {path}"
        )
    kept = [
        (r["file"], r["row_group"]) for r in decision if r["keep"]
    ]  # one tuple per KEPT row group — metadata-sized, never row data
    if not kept:
        return spark.createDataFrame([], out_schema)

    cols = list(read_columns)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq  # executor-side import

        for pdf in batches:
            # one ParquetFile (one footer parse) per FILE, not per row
            # group — a multi-group file would otherwise re-read its
            # footer once per kept group
            for fp, grp in pdf.groupby("file", sort=False):
                pf = pq.ParquetFile(fp)
                for g in grp["row_group"]:
                    yield pf.read_row_group(int(g), cols).to_pandas()[cols]

    pairs = spark.createDataFrame(kept, "file STRING, row_group INT")
    if len(kept) > 1:
        # hash on file so one task holds all of a file's kept groups and
        # the per-file footer reuse above actually engages
        pairs = pairs.repartition(min(len(kept), 256), "file")
    return pairs.mapInPandas(kernel, out_schema)
