"""Lake small-file compaction: row-identical rewrite, per-partition file
targets, partition layout preserved."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab_etl_spark.catalog import load_table
from lab_etl_spark.sources.sink import compact_table


def _fingerprint(df):
    cols = [c for c in df.columns]
    return (
        df.select(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
    )


def test_compact_partitioned_table(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_lake")
    # fragment: 40 writer tasks x |event_type| partitions -> many small files
    ev.repartition(40).write.partitionBy("event_type").parquet(path)
    before = _fingerprint(spark.read.parquet(path))
    stats = compact_table(
        spark, path, target_bytes=1 << 30, partition_cols=["event_type"]
    )
    after = _fingerprint(spark.read.parquet(path))
    assert (after["h"], after["n"]) == (before["h"], before["n"])
    n_parts = spark.read.parquet(path).select("event_type").distinct().count()
    # 1 GB target at this scale -> exactly one file per partition
    assert stats["files_after"] == n_parts
    assert stats["files_after"] < stats["files_before"]
    # partition pruning still works on the compacted layout
    plan = (
        spark.read.parquet(path)
        .filter(F.col("event_type") == "click")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan


def test_compact_unpartitioned_table(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_lake")
    li.repartition(32).write.parquet(path)
    before = _fingerprint(spark.read.parquet(path))
    stats = compact_table(spark, path, target_bytes=1 << 30)
    after = _fingerprint(spark.read.parquet(path))
    assert (after["h"], after["n"]) == (before["h"], before["n"])
    assert stats["files_after"] == 1 < stats["files_before"]


def test_repo_written_lake_has_bounded_row_groups(spark, tmp_path):
    """Writer-side fix for the round-9 scan-split finding: a parquet scan
    split only reads row groups whose START falls in its byte range, so a
    large single-row-group file serializes flop-bound downstream stages
    onto one core regardless of maxPartitionBytes
    (operators/similarity.spread_for_compute is the read-side workaround
    for FOREIGN lakes).  Repo-written lakes must never exhibit the
    pathology: compact_table bounds parquet.block.size, so an sf0.1-sized
    table lands with multiple row groups and scans as >1 non-empty split
    once maxPartitionBytes is tuned down."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.1/lineitem.parquet"
    if not _os.path.exists(src):
        import pytest as _pytest

        _pytest.skip("sf0.1 testdata not present")
    path = str(tmp_path / "li_rg_lake")
    spark.read.parquet(src).write.parquet(path)  # fresh writable copy
    # compact to ONE file (huge target) with a 1 MiB row-group bound —
    # the same mechanism as the 16 MiB production default, scaled to the
    # ~10 MB sf0.1 table so the test stays fast
    stats = compact_table(
        spark, path, target_bytes=1 << 30, row_group_bytes=1 << 20
    )
    assert stats["files_after"] == 1
    (part,) = _glob.glob(_os.path.join(path, "*.parquet"))
    n_groups = pq.ParquetFile(part).metadata.num_row_groups
    assert n_groups > 1, (
        f"single-file compaction produced {n_groups} row group(s); the "
        f"parquet.block.size bound is not reaching the writer"
    )
    # and the row groups give scan splits real work: with a matching
    # maxPartitionBytes, >1 split returns rows
    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, str(1 << 20))
        n_busy = (
            spark.read.parquet(path)
            .select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .count()
            .count()
        )
    finally:
        spark.conf.set(key, old)
    assert n_busy > 1, (
        "bounded-row-group file still scans as one non-empty split"
    )


def test_compact_preserves_null_partition_rows(spark, tmp_path):
    """Round-12 review: the per-partition target join must be NULL-SAFE —
    an inner equi-join on the partition columns silently dropped every
    __HIVE_DEFAULT_PARTITION__ row from the rewrite (data loss, flowing
    into compact_logged too)."""
    import os

    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id") % 3)
        .alias("p"),
        (F.col("id") * 1.0).alias("v"),
    )
    path = str(tmp_path / "nullpart")
    df.repartition(4).write.partitionBy("p").parquet(path)
    before = _fingerprint(spark.read.parquet(path).select("k", "v"))
    compact_table(spark, path, target_bytes=1 << 30, partition_cols=["p"])
    after_df = spark.read.parquet(path)
    after = _fingerprint(after_df.select("k", "v"))
    assert after == before, "compaction changed the row multiset"
    assert after_df.filter("p IS NULL").count() == 40, (
        "NULL-partition rows were dropped by the target join"
    )


def test_compact_recovers_from_mid_swap_crash(spark, tmp_path):
    """Round-12 review: a crash between the two swap renames leaves the
    table stranded in ._compact_old; the next run must restore it (and a
    stale backup must not fail the swap with ENOTEMPTY)."""
    import os

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    path = str(tmp_path / "crash")
    df.repartition(4).write.parquet(path)
    # simulate the crash window: table moved aside, new dir never landed
    os.rename(path, path + "._compact_old")
    res = compact_table(spark, path, target_bytes=1 << 30)
    assert res["files_before"] == 4 and res["files_after"] >= 1
    assert spark.read.parquet(path).count() == 100
    assert not os.path.isdir(path + "._compact_old")


def test_compact_empty_partitioned_table(spark, tmp_path):
    """ADVICE r12 (low): SUM over zero groups is NULL — compacting an
    empty (zero-row, schema-bearing) table with partition_cols must fall
    through instead of raising TypeError on int(None)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = tmp_path / "empty_lake"
    path.mkdir()
    # Spark 4 writes no file at all for an empty frame; other lake
    # writers (pyarrow, trino) DO leave zero-row schema-bearing files
    pq.write_table(
        pa.table({"k": pa.array([], pa.int64()),
                  "p": pa.array([], pa.int32())}),
        str(path / "part-00000.parquet"),
    )
    path = str(path)
    assert spark.read.parquet(path).count() == 0  # schema-readable
    stats = compact_table(
        spark, path, target_bytes=1 << 20, partition_cols=["p"]
    )
    got = spark.read.parquet(path)
    assert got.count() == 0
    assert set(got.columns) == {"k", "p"}
    assert stats["files_after"] >= 0
