"""Phase-level timing of the DML/lake io queries (guide §1: isolate the
expensive thing before changing it).

Usage: python tools/profile_dml.py [version_diff|upsert|cdf|purge] ...

Replays each query's body with a wall-clock around every phase (ingest
commit, purge, upsert, table_changes build, final aggregate) so the io
recording's single number decomposes into its actual jobs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    which = sys.argv[1:] or ["version_diff", "upsert"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from lab_etl_spark.catalog import load_table, scratch_dir
    from lab_etl_spark.operators.commitlog import (
        LoggedTable,
        append_logged,
        purge_dv,
        table_changes,
        upsert_dv,
    )
    from lab_etl_spark.session import get_spark

    spark = get_spark("profile_dml")
    marks: list[tuple[str, float]] = []

    def mark(label: str, t0: float) -> float:
        t = time.perf_counter()
        marks.append((label, t - t0))
        return t

    if "version_diff" in which:
        marks.clear()
        ev = load_table(spark, sf_dir, "events")
        table = LoggedTable(scratch_dir("prof_vdiff", sf_dir))
        t = time.perf_counter()
        table.commit(
            lambda d: ev.repartition(8).write.parquet(d), op="ingest"
        )
        t = mark("ingest commit", t)
        purge_dv(spark, table, F.col("user_id") % 97 == 0)
        t = mark("purge_dv", t)
        upd = (
            ev.filter(F.col("event_id") % 103 == 0)
            .withColumn("value", F.col("value") + F.lit(500.0))
            .withColumn("event_type", F.lit("patched"))
        )
        upsert_dv(spark, table, upd, key="event_id")
        t = mark("upsert_dv", t)
        changes = table_changes(spark, table, 1, 3)
        t = mark("table_changes build", t)
        (
            changes.withColumnRenamed("_change_type", "change_type")
            .groupBy("change_type", "event_type")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .write.format("noop").mode("overwrite").save()
        )
        t = mark("final agg", t)
        print("== version_diff phases:")
        for label, dt in marks:
            print(f"   {label}: {dt:.2f}s")

    if "upsert" in which:
        marks.clear()
        ev = load_table(spark, sf_dir, "events")
        table = LoggedTable(scratch_dir("prof_upsert", sf_dir))
        t = time.perf_counter()
        table.commit(
            lambda d: ev.repartition(8)
            .write.partitionBy("event_type")
            .parquet(d),
            op="ingest",
        )
        t = mark("ingest commit (partitioned)", t)
        upd = (
            ev.filter(F.col("event_id") % 101 == 0)
            .withColumn("value", F.col("value") + F.lit(1000.0))
            .withColumn("event_type", F.lit("updated"))
        )
        new = spark.range(5).select(
            (-F.col("id") - 1).alias("event_id"),
            F.lit("2024-01-01 00:00:00")
            .cast(ev.schema["ts"].dataType)
            .alias("ts"),
            F.lit(-1).cast("bigint").alias("user_id"),
            F.lit("new").alias("event_type"),
            F.lit(1.5).alias("value"),
            F.lit(None).cast(ev.schema["props"].dataType).alias("props"),
        )
        upsert_dv(spark, table, upd.unionByName(new), key="event_id")
        t = mark("upsert_dv", t)
        widened = spark.range(7).select(
            (-F.col("id") - 100).alias("event_id"),
            F.lit("2024-02-01 00:00:00")
            .cast(ev.schema["ts"].dataType)
            .alias("ts"),
            F.lit(-2).cast("bigint").alias("user_id"),
            F.lit("backfill").alias("event_type"),
            F.lit(2.5).alias("value"),
            F.lit(None).cast(ev.schema["props"].dataType).alias("props"),
            F.lit("crawl").alias("origin"),
        )
        append_logged(spark, table, widened)
        t = mark("append_logged (evolution)", t)
        (
            table.read(spark)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .write.format("noop").mode("overwrite").save()
        )
        t = mark("final read+agg", t)
        print("== upsert phases:")
        for label, dt in marks:
            print(f"   {label}: {dt:.2f}s")

    spark.stop()


if __name__ == "__main__":
    main()
