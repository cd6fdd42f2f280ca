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
