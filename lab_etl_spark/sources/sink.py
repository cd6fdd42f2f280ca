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

#: Writer-side row-group bound for every parquet sink in this repo.
#: Parquet scan splits are byte ranges, but a range only reads the row
#: groups whose start falls inside it — so a large SINGLE-row-group file
#: scans as one task no matter how maxPartitionBytes is tuned, serializing
#: flop-bound downstream stages onto one core (the round-9 scan-split
#: finding; operators/similarity.spread_for_compute is the READ-side
#: workaround for foreign lakes).  Bounding the row group at write time
#: fixes it structurally for repo-written lakes: any file over the bound
#: carries >= 2 row groups, so split tuning regains leverage.  16 MiB =
#: 8 groups per 128 MiB compacted file — fine-grained enough for a 32-way
#: local session or a 1000-executor scan, coarse enough that per-group
#: metadata/compression overhead stays negligible.
ROW_GROUP_BYTES = 16 << 20


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
    unit_check: bool = True,
    row_group_bytes: int = ROW_GROUP_BYTES,
) -> None:
    if unit_check:
        # automatic unit-consistency gate on the instrument-lake egress:
        # a plan that added temperature to mass fails HERE, before any
        # executor work.  Driver-side tree walk; frames without unit
        # metadata exit after one schema scan (meta.py
        # check_unit_consistency), so the analytic-lake queries that
        # never declare units pay nothing measurable.
        from ..meta import check_unit_consistency

        check_unit_consistency(df)
    writer = (
        df.write.mode(mode)
        .option("compression", compression)
        .option("parquet.block.size", row_group_bytes)
    )
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


def compact_table(
    spark,
    path: str,
    target_bytes: int = 128 << 20,
    partition_cols: list[str] | None = None,
    row_group_bytes: int = ROW_GROUP_BYTES,
) -> dict:
    """Small-file compaction for a (possibly partitioned) parquet lake table.

    Streaming ingest and frequent appends fragment a lake into many small
    files; at scale the per-file open/footer cost dominates scans long
    before data size does.  This rewrites the table so each partition holds
    ``ceil(partition_bytes / target_bytes)`` files:

      1. file census from the hidden ``_metadata`` column (one metadata-only
         scan — no data read);
      2. one shuffle job: hash-repartition on (partition cols, bounded
         salt), where the per-partition salt modulus is its target file
         count — each (partition, salt) bucket becomes exactly one output
         file, so file sizes land near the target without a per-partition
         driver loop;
      3. write to a staging directory, then swap directories.

    The swap (step 3) is the local-filesystem stand-in for a metastore/
    transaction-log commit — on a real lake this final step is a Delta/
    Iceberg rewrite commit (atomic by log append); everything before it is
    the scale-correct single-job plan either way.  Each RENAME is atomic
    (POSIX same-filesystem), but the two-rename swap is not: a reader
    listing between them sees no table for an instant, and a crash there
    strands the data in the ``._compact_old`` sidecar — both are why
    ``operators/commitlog.py compact_logged`` (manifest commit, no
    directory window) is the preferred path; this variant recovers a
    stranded table at entry (restore ``._compact_old`` when ``path`` is
    missing, clear stale staging/backup) so a crashed run never blocks
    the next one.

    Returns ``{"files_before", "files_after", "bytes"}``.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    # crash recovery BEFORE planning: a crash between the two commit
    # renames leaves path missing with ._compact_old holding the sole
    # copy — restore it first; stale staging/backup from any earlier
    # crash is cleared so os.rename(path, old) can't fail ENOTEMPTY
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    staged, files_before, total_bytes = compaction_plan(
        spark, path, target_bytes, partition_cols
    )
    if staged is None:  # row-empty table: rewriting would strand schema
        return {
            "files_before": files_before,
            "files_after": files_before,
            "bytes": total_bytes,
        }
    partition_cols = partition_cols or []

    writer = staged.write.mode("overwrite").option(
        "parquet.block.size", row_group_bytes
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)

    files_after = (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("fp"))
        .distinct()
        .count()
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }


def compaction_plan(
    spark,
    path: str,
    target_bytes: int = 128 << 20,
    partition_cols: list[str] | None = None,
    schema=None,
):
    """The compaction job MINUS the commit: returns the repartitioned
    frame (one shuffle when written), the current file count, and the
    table byte size.  Shared by :func:`compact_table` (directory-swap
    commit) and :func:`compact_logged` (manifest commit via
    operators/commitlog.py)."""
    import math

    from pyspark.sql import functions as F

    reader = spark.read.schema(schema) if schema is not None else spark.read
    census = (
        reader.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("fp"),
            F.col("_metadata.file_size").alias("sz"),
        )
        .groupBy("fp")
        .agg(F.first("sz").alias("sz"))
        .collect()
    )  # one row per FILE (not per data row) — driver-safe at any row scale
    files_before = len(census)
    total_bytes = sum(r["sz"] for r in census)

    # `schema`: an evolved logged table's footers are MIXED — without the
    # manifest's widened schema, one-footer resolution could silently
    # drop post-evolution columns from the whole rewrite
    df = reader.parquet(path)
    # A row-EMPTY table (zero-row schema-bearing files — pyarrow/trino
    # writers leave these; Spark's own empty writes leave nothing) must
    # make compaction a NO-OP: Spark 4 writes no files for an empty
    # frame, so a rewrite would swap the readable zero-row layout for an
    # unreadable fileless directory.  isEmpty short-circuits after the
    # first non-empty scan partition, so this probe is footer-cheap on
    # real tables.  Callers treat staged=None as "keep current layout".
    if df.isEmpty():
        return None, files_before, total_bytes
    partition_cols = partition_cols or []
    if partition_cols:
        # Per-PARTITION salt modulus: each partition's target file count is
        # ceil(partition_bytes / target), computed in one metadata-weighted
        # aggregate and broadcast-joined back — a single uniform modulus
        # would spread small partitions over max-target files and re-create
        # the fragmentation being fixed.  Per-partition bytes are the
        # ROW-WEIGHTED share of each file (sz * rows_in_partition /
        # rows_in_file): when partition_cols re-partition an existing
        # layout, one file spans many partition values, and attributing
        # its full size to every one would overshoot _n_target and
        # fragment the rewrite — the opposite of compaction.  (For a
        # layout already partitioned on these columns the share reduces
        # to sz exactly.)
        per_file = (
            df.select(
                *partition_cols,
                F.col("_metadata.file_path").alias("fp"),
                F.col("_metadata.file_size").alias("sz"),
            )
            .groupBy(*partition_cols, "fp")
            .agg(F.first("sz").alias("sz"), F.count(F.lit(1)).alias("cnt"))
        )
        file_rows = per_file.groupBy("fp").agg(
            F.sum("cnt").alias("tot")
        )
        part_targets = (
            per_file.join(file_rows, "fp")
            .groupBy(*partition_cols)
            .agg(
                F.greatest(
                    F.lit(1),
                    F.ceil(
                        F.sum(F.col("sz") * F.col("cnt") / F.col("tot"))
                        / F.lit(float(target_bytes))
                    ),
                ).alias("_n_target")
            )
        )
        # explicit shuffle width = total salt buckets: without it the
        # buckets hash into spark.sql.shuffle.partitions tasks and
        # same-partition buckets merge, overshooting the file target.
        # Collect the (tiny: one row per partition value) target table
        # ONCE and rebuild it locally — the old agg().collect() added a
        # second full pass over the scan chain before the join, and SUM
        # over zero groups is NULL (an empty partitioned table must fall
        # through, not TypeError).
        target_rows = part_targets.collect()
        n_total = sum(int(r["_n_target"]) for r in target_rows)
        if n_total == 0:
            return df.repartition(1), files_before, total_bytes
        part_targets = df.sparkSession.createDataFrame(
            target_rows, part_targets.schema
        )
        data_cols = df.columns
        # pmod, not abs(hash) % n: ANSI abs raises ARITHMETIC_OVERFLOW
        # when the 32-bit hash lands on Int.MinValue (certain at the
        # billions-of-rows regime this targets)
        salt = F.pmod(
            F.hash(*[F.col(c) for c in data_cols]), F.col("_n_target")
        )
        # NULL-SAFE join back: an inner equi-join on the partition
        # columns would silently DROP every __HIVE_DEFAULT_PARTITION__
        # (NULL-valued) row from the rewritten table
        bp = F.broadcast(part_targets)
        cond = None
        for c in partition_cols:
            term = df[c].eqNullSafe(bp[c])
            cond = term if cond is None else (cond & term)
        staged = (
            df.join(bp, cond)
            .drop(*[bp[c] for c in partition_cols])
            .withColumn("_salt", salt)
            .repartition(max(1, n_total), *partition_cols, "_salt")
            .drop("_n_target", "_salt")
        )
    else:
        n_target = max(1, math.ceil(total_bytes / target_bytes))
        staged = df.repartition(n_target)
    return staged, files_before, total_bytes


