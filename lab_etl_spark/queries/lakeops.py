"""Physical-layout and maintenance queries: the lake-side techniques that
decide whether a 100 TB join/scan is feasible at all.

  * bucketed co-located join — both sides pre-bucketed+sorted on the join
    key at write time, so the join runs with ZERO exchanges: the shuffle
    was paid ONCE when the table was written, not per query.  This is the
    layout the orders⋈lineitem family would get on a real lake.
  * partition pruning — directory-level data skipping: a filter on the
    partition column never opens non-matching files (complements z-order
    row-group skipping, queries/analytics.py q_zorder_skipping).
  * incremental aggregate maintenance — merge a late delta batch into a
    materialized aggregate using the mergeable-state algebra
    (count/sum/min/max), instead of recomputing over the full history.
    At 100 TB the recompute is hours; the merge is proportional to the
    delta.  The oracle IS the full recompute, so the check proves
    merge ≡ recompute.

All three write eagerly at plan-build time (scratch lake layouts), so they
sit in tests/test_plans.py _SWEEP_SKIP with dedicated plan assertions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, scratch_dir
from . import register
from .exact import dsum

BUCKETS = 8


def _bucketed_table(
    spark: SparkSession, df: DataFrame, family: str, sf_dir: str, key: str
) -> DataFrame:
    """Write ``df`` as a bucketed+sorted external table under a unique
    scratch path and return it re-read through the catalog (bucket metadata
    only attaches via the table, not a bare parquet path).  Older
    same-family tables from earlier invocations are dropped — same
    per-invocation-uniqueness discipline as catalog.scratch_dir."""
    # Unique name per invocation (same discipline as scratch_dir: an
    # earlier invocation's returned DataFrame reads ITS table lazily, so
    # never reuse or eagerly drop names; stale data dirs are TTL-pruned by
    # scratch_dir, and the in-memory catalog entries die with the session).
    path = scratch_dir(family, sf_dir)
    name = os.path.basename(path)
    # ONE file per bucket: Spark only trusts a bucket's sortBy order when
    # the bucket is a single file (multiple files per bucket → per-task
    # re-Sort under the join, losing half the layout's win).  Repartition
    # on the bucket key with numPartitions == numBuckets uses the same
    # Murmur3-pmod hash as the bucket spec, so each write task holds
    # exactly one bucket's rows.
    (
        df.repartition(BUCKETS, F.col(key))
        .write.bucketBy(BUCKETS, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )
    return spark.table(name)


@register(
    "q_bucketed_join",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_items,
           {dsum('l_extendedprice')} AS sum_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Co-located large⋈large join over a bucketed lake layout: orders "
    "and lineitem are written bucketBy(8, orderkey).sortBy(orderkey), so "
    "the SortMergeJoin consumes both scans DIRECTLY — zero Exchange, zero "
    "per-task Sort on the join key (asserted by "
    "tests/test_plans.py::test_bucketed_join_query_plan). The shuffle is "
    "paid once at write time; every subsequent join on the bucket key is "
    "shuffle-free, which at 100 TB turns the nightly orders⋈lineitem "
    "family from a network-bound job into a map-side merge.",
    bench=False,  # dominated by the eager bucketed write, not the join
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _bucketed_table(
        spark,
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus"
        ),
        "bucket_od",
        sf_dir,
        "o_orderkey",
    )
    li = _bucketed_table(
        spark,
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        ),
        "bucket_li",
        sf_dir,
        "l_orderkey",
    )
    return (
        od.hint("MERGE")
        .join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(dsum("l_extendedprice")).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


#: the one partition the pruned scan reads (events span 2024-01-01 onward)
PRUNE_DATE = "2024-01-02"


@register(
    "q_partition_pruning",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {dsum('value', 6)} AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) = DATE '{PRUNE_DATE}'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Directory-level partition pruning: events are laid out "
    "partitionBy(event_date), and the day-filtered query's scan carries "
    "the predicate as a PartitionFilter — non-matching directories are "
    "never listed, never opened (asserted by tests/test_plans.py::"
    "test_partition_pruning_in_plan). At 100 TB with daily partitions "
    "this is the difference between scanning one day and scanning three "
    "years. The oracle filters the unpartitioned table — identical rows "
    "prove the pruned layout loses nothing.",
    bench=False,  # dominated by the eager partitioned write
)
def q_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch = scratch_dir("events_bydate", sf_dir)
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date"
    ).mode("overwrite").parquet(scratch)
    back = spark.read.parquet(scratch)
    return (
        back.where(F.col("event_date") == F.lit(PRUNE_DATE).cast("date"))
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q_incremental_agg",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {dsum('value', 6)} AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Incremental view maintenance via mergeable aggregate states: the "
    "materialized per-type aggregate (history = 90% of events) absorbs a "
    "late delta batch (the other 10%) by MERGING partial states — counts "
    "and decimal sums add, min/max take least/greatest, with full-outer "
    "null-completion for groups new to either side. The oracle recomputes "
    "over the full table, proving merge ≡ recompute. At 100 TB this is "
    "how a daily rollup absorbs late data in O(delta) instead of "
    "re-scanning the history; the same algebra is why Spark's partial "
    "aggregation works at all (map-side states merge the same way).",
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def agg_state(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).alias("sum_dec"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    # History vs late-arriving delta: a deterministic 90/10 split.
    hist = agg_state(ev.where(F.col("event_id") % 10 != 0))
    delta = agg_state(ev.where(F.col("event_id") % 10 == 0))
    h, d = hist.alias("h"), delta.alias("d")
    merged = h.join(
        d, F.col("h.event_type") == F.col("d.event_type"), "full_outer"
    )
    zero = F.lit(0).cast("decimal(30,6)")
    return (
        merged.select(
            F.coalesce("h.event_type", "d.event_type").alias("event_type"),
            (
                F.coalesce("h.n_events", F.lit(0))
                + F.coalesce("d.n_events", F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce("h.sum_dec", zero) + F.coalesce("d.sum_dec", zero)
            )
            .cast("double")
            .alias("sum_value"),
            F.least(
                F.coalesce("h.min_value", "d.min_value"),
                F.coalesce("d.min_value", "h.min_value"),
            ).alias("min_value"),
            F.greatest(
                F.coalesce("h.max_value", "d.max_value"),
                F.coalesce("d.max_value", "h.max_value"),
            ).alias("max_value"),
        )
        .orderBy("event_type")
    )


@register(
    "q_time_travel",
    oracle=f"""
    WITH v1 AS (
        SELECT event_type, COUNT(*) AS n, {dsum('value', 6)} AS sum_value
        FROM events WHERE event_id % 4 != 0 GROUP BY event_type
    ),
    v2 AS (
        SELECT event_type, COUNT(*) AS n, {dsum('value', 6)} AS sum_value
        FROM events GROUP BY event_type
    )
    SELECT v2.event_type,
           v1.n AS n_v1, v2.n AS n_v2,
           v2.n - v1.n AS n_added,
           v2.sum_value - v1.sum_value AS sum_added
    FROM v2 JOIN v1 ON v2.event_type = v1.event_type
    ORDER BY v2.event_type
    """,
    doc="Time travel over the commit log (operators/commitlog.py): commit "
    "events snapshot v1 (3/4 of the stream), commit v2 (all of it), then "
    "aggregate BOTH versions — v1 via an explicit version read, v2 via "
    "the latest manifest — and diff them. Every manifest resolves to an "
    "immutable snapshot directory, so reading history costs one manifest "
    "lookup, same as reading HEAD; this is how a 100 TB pipeline audits "
    "what a late batch changed without keeping a second copy of the "
    "table. The oracle recomputes both versions from the source table; "
    "the sum delta subtracts two exact-decimal doubles (deterministic "
    "IEEE subtraction in both engines).",
    bench=False,  # dominated by the two eager snapshot writes
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.commitlog import LoggedTable

    ev = load_table(spark, sf_dir, "events")
    table = LoggedTable(scratch_dir("timetravel_events", sf_dir))
    m1 = table.commit(
        lambda d: ev.where(F.col("event_id") % 4 != 0).write.parquet(d),
        op="ingest",
    )
    table.commit(lambda d: ev.write.parquet(d), op="late-batch")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )

    v1 = agg(table.read(spark, version=m1["version"])).alias("v1")
    v2 = agg(table.read(spark)).alias("v2")
    return (
        v2.join(v1, F.col("v2.event_type") == F.col("v1.event_type"))
        .select(
            F.col("v2.event_type").alias("event_type"),
            F.col("v1.n").alias("n_v1"),
            F.col("v2.n").alias("n_v2"),
            (F.col("v2.n") - F.col("v1.n")).alias("n_added"),
            (F.col("v2.sum_value") - F.col("v1.sum_value")).alias(
                "sum_added"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "q_delta_export",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {dsum('o_totalprice', 6)} AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Delta-protocol interop for the commit-log lake "
    "(operators/commitlog.py export_delta_log): commit a partial snapshot "
    "v1, export the _delta_log, commit the full snapshot v2, VACUUM v1's "
    "manifest away, then export again — the incremental export must "
    "reconstruct v2's remove actions from v1's already-exported add "
    "actions (the round-8 fix; re-emitting protocol/metaData mid-log or "
    "skipping the removes makes Delta readers see the union of both "
    "snapshots).  The query then replays the exported log exactly the "
    "way an off-the-shelf Delta reader does — fold add/remove across "
    "versions, scan the surviving files — and returns that result, so "
    "the driver's value check proves the folded log resolves to "
    "snapshot v2 bit-for-bit (the oracle recomputes v2 from the source "
    "table).  The export itself is one manifest-sized JSON mapping pass "
    "(parquet footers read driver-side, no Spark job), independent of "
    "table size — the property that makes the interop viable at 100 TB.",
    bench=False,  # dominated by the two eager snapshot writes
)
def q_delta_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    from ..operators.commitlog import (
        DELTA_LOG_DIR,
        LoggedTable,
        export_delta_log,
    )

    od = load_table(spark, sf_dir, "orders")
    agg = od.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(dsum("o_totalprice", 6)).alias("sum_price"),
    ).persist()  # |priorities|-sized, written by TWO eager snapshot
    # commits (multi-consumer rule: without it the orders agg runs once
    # per commit)
    table = LoggedTable(scratch_dir("delta_export", sf_dir))
    table.commit(
        lambda d: agg.filter(
            F.col("o_orderpriority") <= "3-MEDIUM"
        ).write.parquet(d),
        op="ingest",
    )
    export_delta_log(table, spark, table_id="q-delta-export")
    table.commit(lambda d: agg.write.parquet(d), op="overwrite")
    table.vacuum(keep=1)  # v1's manifest is gone; only its export remains
    export_delta_log(table, spark)

    # replay the log the way a Delta reader does: fold add/remove in
    # version order, then scan exactly the surviving files
    delta_dir = os.path.join(table.table_dir, DELTA_LOG_DIR)
    live: dict[str, bool] = {}
    for name in sorted(os.listdir(delta_dir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(delta_dir, name)) as f:
            for line in f:
                a = json.loads(line)
                if "add" in a:
                    live[a["add"]["path"]] = True
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
    paths = [os.path.join(table.table_dir, p) for p in sorted(live)]
    return spark.read.parquet(*paths).orderBy("o_orderpriority")


@register(
    "q_user_purge",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {dsum('value', 6)} AS sum_value
    FROM events
    WHERE user_id % 97 != 0
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Right-to-be-forgotten purge over the commit log "
    "(operators/commitlog.py purge_logged): commit events as snapshot v1, "
    "purge every user_id ≡ 0 (mod 97) into snapshot v2 (filtered rewrite "
    "published by manifest append — no shuffle, earlier versions intact "
    "until vacuum), then aggregate the purged table. The oracle filters "
    "the source directly — identical results prove the rewrite dropped "
    "exactly the targeted users and nothing else. Vacuum is the actual "
    "compliance deletion (pinned in tests/test_commitlog.py); at 100 TB "
    "a z-ordered layout limits the rewrite to files whose min/max "
    "overlap the purged keys.",
    bench=False,  # dominated by the two eager snapshot writes
)
def q_user_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.commitlog import LoggedTable, purge_logged

    ev = load_table(spark, sf_dir, "events")
    table = LoggedTable(scratch_dir("purge_events", sf_dir))
    table.commit(lambda d: ev.write.parquet(d), op="ingest")
    purge_logged(spark, table, F.col("user_id") % 97 == 0)
    return (
        table.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "q_purge_dv",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {dsum('value', 6)} AS sum_value
    FROM events
    WHERE user_id % 97 != 0
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Row-level delete WITHOUT table rewrite (operators/commitlog.py "
    "purge_dv): commit events as a multi-file snapshot, then delete every "
    "user_id ≡ 0 (mod 97) as a DELETION VECTOR — one filtered scan "
    "records the matches' (file, row_index) positions from the parquet "
    "_metadata struct into a sidecar, and the manifest commit REUSES the "
    "immutable data files (bytes written ∝ deleted rows, never ∝ table "
    "size — q_user_purge's full rewrite is the 100 TB scale-killer this "
    "replaces).  The read then subtracts the DV via a broadcast "
    "anti-join at scan time (merge-on-read).  The oracle filters the "
    "source directly, proving the DV read path drops exactly the "
    "targeted rows; compact_dv equivalence + the bytes-rewritten-scale-"
    "with-affected-files pin live in tests/test_commitlog.py.",
    bench=False,  # dominated by the eager snapshot write
)
def q_purge_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.commitlog import LoggedTable, purge_dv

    ev = load_table(spark, sf_dir, "events")
    table = LoggedTable(scratch_dir("purge_dv_events", sf_dir))
    # multi-file snapshot so the DV actually exercises per-file positions
    table.commit(lambda d: ev.repartition(8).write.parquet(d), op="ingest")
    purge_dv(spark, table, F.col("user_id") % 97 == 0)
    return (
        table.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "q_version_diff",
    oracle=f"""
    SELECT * FROM (
        SELECT 'delete' AS change_type,
               event_type,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT user_id) AS n_users,
               {dsum('value', 6)} AS sum_value
        FROM events
        WHERE user_id % 97 = 0 OR event_id % 103 = 0
        GROUP BY event_type
        UNION ALL
        SELECT 'insert' AS change_type,
               'patched' AS event_type,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT user_id) AS n_users,
               {dsum('value + 500.0', 6)} AS sum_value
        FROM events
        WHERE event_id % 103 = 0
    )
    ORDER BY change_type, event_type
    """,
    doc="Change-data-feed across a DELETE + UPSERT chain "
    "(operators/commitlog.py table_changes): ingest events as v1, "
    "deletion-vector-purge user_id ≡ 0 (mod 97) as v2, merge-on-read "
    "upsert every event_id ≡ 0 (mod 103) (value + 500, type 'patched') "
    "as v3, then ask 'what changed from v1 to v3' and aggregate deletes "
    "and inserts.  LINK FAST PATH exercised (round 12): v3's snapshot "
    "contains v1's files verbatim (purge reuses the data_dir, upsert "
    "hardlinks), so deletes come from the window's DV delta over the "
    "shared files (one broadcast semi-join — a row both purged AND "
    "superseded counts once, the DV is a position SET) and inserts from "
    "the appended batch files, with no exceptAll table shuffle: cost ∝ "
    "changed rows, never a two-sided diff.  This is how an incremental "
    "consumer at 100 TB advances between versions without re-reading "
    "snapshots (Delta CDF shape).  The oracle recomputes both change "
    "sets directly from the source; general-path (rewrite commit) "
    "equivalence is pinned in tests/test_commitlog.py.",
    bench=False,  # dominated by the eager snapshot write
)
def q_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.commitlog import (
        LoggedTable,
        purge_dv,
        table_changes,
        upsert_dv,
    )

    ev = load_table(spark, sf_dir, "events")
    table = LoggedTable(scratch_dir("vdiff_events", sf_dir))
    table.commit(lambda d: ev.repartition(8).write.parquet(d), op="ingest")
    purge_dv(spark, table, F.col("user_id") % 97 == 0)
    upd = (
        ev.filter(F.col("event_id") % 103 == 0)
        .withColumn("value", F.col("value") + F.lit(500.0))
        .withColumn("event_type", F.lit("patched"))
    )
    upsert_dv(spark, table, upd, key="event_id")
    changes = table_changes(spark, table, 1, 3)
    return (
        changes.withColumnRenamed("_change_type", "change_type")
        .groupBy("change_type", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .orderBy("change_type", "event_type")
    )


@register(
    "q_upsert_dv",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {dsum('value', 6)} AS sum_value,
           COUNT(origin) AS n_origin
    FROM (
        SELECT event_type, user_id, value, CAST(NULL AS VARCHAR) AS origin
        FROM events WHERE event_id % 101 != 0
        UNION ALL
        SELECT 'updated' AS event_type, user_id, value + 1000.0 AS value,
               CAST(NULL AS VARCHAR) AS origin
        FROM events WHERE event_id % 101 = 0
        UNION ALL
        SELECT 'new' AS event_type, CAST(-1 AS BIGINT) AS user_id,
               1.5 AS value, CAST(NULL AS VARCHAR) AS origin
        FROM range(5)
        UNION ALL
        SELECT 'backfill' AS event_type, CAST(-2 AS BIGINT) AS user_id,
               2.5 AS value, 'crawl' AS origin
        FROM range(7)
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="MERGE-on-read upsert (operators/commitlog.py upsert_dv): ingest "
    "events as a multi-file snapshot, then apply a CDC batch — every "
    "event_id ≡ 0 (mod 101) updated (value + 1000, type 'updated') plus "
    "5 brand-new rows — WITHOUT rewriting a single existing file: "
    "matched rows join the deletion vector via one broadcast semi-join, "
    "existing files are hardlinked into the new snapshot (metadata-only), "
    "and the batch lands as fresh part files; readers subtract the DV so "
    "old versions of updated keys vanish.  Bytes written scale with the "
    "batch, never the table — at 100 TB this is the difference between a "
    "nightly CDC merge costing minutes and one costing a full rewrite.  "
    "A follow-up append_logged batch carries a NEW column (origin) — "
    "round-13 additive schema evolution: the widened schema is recorded "
    "in the manifest and the final read NULL-backfills every "
    "pre-evolution row through the explicit scan schema.  "
    "The snapshot is hive-partitioned by event_type and every updated "
    "key MOVES partition (its type becomes 'updated'), so the driver "
    "check also proves the round-12 partitioned merge-on-read path: "
    "untouched partition dirs carry over as hardlinks, the batch lands "
    "partitionBy into matching/new key=value dirs, and the DV "
    "supersedes moved keys in their OLD partitions.  "
    "The oracle recomputes the post-merge table from the source with the "
    "same transformation, so the driver check proves update, insert, and "
    "no-op rows all land exactly; conflict/retry and the stats-inherit "
    "path are pinned in tests/test_commitlog.py.",
    bench=False,  # dominated by the eager snapshot write
)
def q_upsert_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.commitlog import LoggedTable, append_logged, upsert_dv

    ev = load_table(spark, sf_dir, "events")
    table = LoggedTable(scratch_dir("upsert_events", sf_dir))
    table.commit(
        lambda d: ev.repartition(8)
        .write.partitionBy("event_type")
        .parquet(d),
        op="ingest",
    )
    upd = (
        ev.filter(F.col("event_id") % 101 == 0)
        .withColumn("value", F.col("value") + F.lit(1000.0))
        .withColumn("event_type", F.lit("updated"))
    )
    new = spark.range(5).select(
        (-F.col("id") - 1).alias("event_id"),
        F.lit("2024-01-01 00:00:00").cast(ev.schema["ts"].dataType).alias(
            "ts"
        ),
        F.lit(-1).cast("bigint").alias("user_id"),
        F.lit("new").alias("event_type"),
        F.lit(1.5).alias("value"),
        F.lit(None).cast(ev.schema["props"].dataType).alias("props"),
    )
    upsert_dv(spark, table, upd.unionByName(new), key="event_id")
    # round-13 additive schema evolution: a second batch carries a NEW
    # column (origin) — append_logged accepts the superset, records the
    # widened schema in the manifest, and the read below NULL-backfills
    # every pre-evolution row via the explicit scan schema (no
    # mergeSchema footer sweep)
    widened = spark.range(7).select(
        (-F.col("id") - 100).alias("event_id"),
        F.lit("2024-02-01 00:00:00").cast(ev.schema["ts"].dataType).alias(
            "ts"
        ),
        F.lit(-2).cast("bigint").alias("user_id"),
        F.lit("backfill").alias("event_type"),
        F.lit(2.5).alias("value"),
        F.lit(None).cast(ev.schema["props"].dataType).alias("props"),
        F.lit("crawl").alias("origin"),
    )
    append_logged(spark, table, widened)
    return (
        table.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.expr(dsum("value", 6)).alias("sum_value"),
            F.count("origin").alias("n_origin"),
        )
        .orderBy("event_type")
    )


#: histogram bin width over events.value (fixed so both engines bin alike)
HIST_BIN_W = 100.0


@register(
    "q_histogram",
    oracle=f"""
    SELECT event_type,
           CAST(FLOOR(value / {HIST_BIN_W}) AS BIGINT) AS bin,
           CAST(FLOOR(value / {HIST_BIN_W}) AS BIGINT) * {HIST_BIN_W}
               AS bin_lo,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY event_type, bin
    """,
    doc="Equi-width histogram of value per event_type — the profiling "
    "primitive behind range statistics, skew detection, and histogram-"
    "equalized bucketing. One hash-aggregate on (type, bin): bin counts "
    "are mergeable partial states, so at 100 TB the shuffle carries "
    "|types|×|bins| rows regardless of input size. Binning is a single "
    "IEEE divide + floor, identical in both engines.",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.floor(F.col("value") / HIST_BIN_W).cast("long")
    return (
        ev.groupBy(
            "event_type",
            bin_.alias("bin"),
            (bin_ * F.lit(HIST_BIN_W)).alias("bin_lo"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bin")
    )


@register(
    "q_data_quality",
    oracle="""
    SELECT 'orders_null_custkey' AS rule,
           (SELECT COUNT(*) FROM orders) AS n_checked,
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
               AS n_violations
    UNION ALL
    SELECT 'orders_orphan_custkey',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'orders_dup_orderkey',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
    UNION ALL
    SELECT 'lineitem_nonpositive_qty',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'lineitem_discount_domain',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 0.1)
    ORDER BY rule
    """,
    doc="Declarative data-quality audit — the expectations layer every "
    "ingest pipeline needs: null-key, referential-integrity (FK orphans "
    "via anti join), duplicate-key, and domain-range rules, each returning (checked, violations) counts. Every rule is "
    "an aggregate or anti-join the optimizer runs in parallel branches; "
    "nothing is collected row-wise, so the audit scales with the "
    "violation COUNT, not the table. The anti join broadcasts the "
    "dimension side exactly like the production semi-join pattern.",
)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def rule(name: str, checked: DataFrame, violations: DataFrame):
        n_c = checked.groupBy().agg(F.count(F.lit(1)).alias("n_checked"))
        n_v = violations.groupBy().agg(
            F.count(F.lit(1)).alias("n_violations")
        )
        return n_c.crossJoin(n_v).select(
            F.lit(name).alias("rule"), "n_checked", "n_violations"
        )

    dup = od.groupBy().agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias(
            "n_violations"
        ),
        F.count(F.lit(1)).alias("n_checked"),
    ).select(
        F.lit("orders_dup_orderkey").alias("rule"),
        "n_checked",
        "n_violations",
    )
    rules = [
        rule(
            "orders_null_custkey", od, od.where(F.col("o_custkey").isNull())
        ),
        rule(
            "orders_orphan_custkey",
            od,
            od.join(
                F.broadcast(cu.select("c_custkey")),
                od.o_custkey == cu.c_custkey,
                "left_anti",
            ),
        ),
        dup,
        rule(
            "lineitem_nonpositive_qty",
            li,
            li.where(F.col("l_quantity") <= 0),
        ),
        rule(
            "lineitem_discount_domain",
            li,
            li.where(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
            ),
        ),
    ]
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out.orderBy("rule")


@register(
    "q_orc_roundtrip",
    oracle=f"""
    SELECT event_type,
           strftime(ts, '%Y-%m-%d') AS event_date,
           COUNT(*) AS n_events,
           {dsum('value', 6)} AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, event_date
    """,
    doc="ORC interchange round-trip: events written as ORC (Spark's other "
    "built-in columnar format — the interchange surface for Hive/Trino "
    "shops), read back, and aggregated per (type, day). Parity vs the "
    "oracle over the source parquet proves the format conversion is "
    "lossless for longs, doubles, strings, and microsecond timestamps. "
    "ORC predicate pushdown and column pruning work like parquet's, so "
    "the lake layouts elsewhere in this module apply unchanged.",
    bench=False,  # dominated by the eager format-conversion write
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch = scratch_dir("events_orc", sf_dir)
    ev = load_table(spark, sf_dir, "events")
    ev.write.mode("overwrite").orc(scratch)
    back = spark.read.orc(scratch)
    return (
        back.groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .orderBy("event_type", "event_date")
    )


@register(
    "q_dynamic_partition_pruning",
    oracle=f"""
    WITH day_dim AS (
        SELECT DISTINCT CAST(ts AS DATE) AS event_date,
               CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow
        FROM events
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           {dsum('e.value', 6)} AS sum_value
    FROM events e
    JOIN day_dim d ON CAST(e.ts AS DATE) = d.event_date
    WHERE d.dow = 1  -- Mondays (DuckDB dayofweek: Sunday=0; Spark: Sunday=1)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    doc="Dynamic partition pruning: the fact side is laid out "
    "partitionBy(event_date) and joined to a day dimension filtered at "
    "RUNTIME (dow = Monday) — the partition filter cannot be written "
    "statically because the matching dates come from the dim scan, so "
    "Catalyst injects a dynamicpruning subquery into the fact scan "
    "(asserted by tests/test_plans.py::test_dynamic_partition_pruning_"
    "in_plan) and only Monday directories are read. At 100 TB this is "
    "the star-schema workhorse: dim predicates prune fact partitions "
    "without materializing the dim filter into the query text. The "
    "oracle joins the unpartitioned table — identical results prove "
    "pruning loses nothing.",
    bench=False,  # dominated by the eager partitioned write
)
def q_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch = scratch_dir("events_bydate_dpp", sf_dir)
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date"
    ).mode("overwrite").parquet(scratch)
    fact = spark.read.parquet(scratch)
    day_dim = (
        ev.select(F.to_date("ts").alias("event_date"))
        .distinct()
        .withColumn("dow", F.dayofweek("event_date").cast("long"))
    )
    return (
        fact.join(
            F.broadcast(day_dim.where(F.col("dow") == 2)), "event_date"
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "q_stats_pruning",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {dsum('l_extendedprice', 2)} AS sum_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1995-04-01'
    GROUP BY l_returnflag
    """,
    doc="Manifest-level data skipping (operators/commitlog.py): lineitem "
    "is committed range-partitioned on l_shipdate with per-file MIN/MAX "
    "stats recorded in the commit manifest, and the reader resolves WHICH "
    "files can hold Q1-1995 rows from the manifest alone — no directory "
    "listing, no footer reads for skipped files — then applies the exact "
    "row predicate on the survivors.  This is the Delta/Iceberg stats-"
    "pruning mechanism the z-order writer relies on, now carried by the "
    "table format itself; at 100 TB a 3-month scan touches ~1/28 of the "
    "files instead of all of them.  The oracle is the plain full-scan "
    "filter, so the driver check proves skipping loses no rows.  "
    "Effectiveness (files actually skipped) is pinned by "
    "tests/test_commitlog.py::test_stats_pruning_skips_files.",
    bench=False,  # dominated by the eager snapshot write
)
def q_stats_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.commitlog import LoggedTable

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_returnflag", "l_extendedprice"
    )
    table = LoggedTable(scratch_dir("statsprune_li", sf_dir))
    table.commit(
        lambda d: li.repartitionByRange(BUCKETS, "l_shipdate").write.parquet(
            d
        ),
        op="ingest",
        spark=spark,
        stats_cols=["l_shipdate"],
    )
    pruned = table.read_pruned(
        spark,
        {"l_shipdate": ("1995-01-01 00:00:00", "1995-04-01 00:00:00")},
    )
    return (
        pruned.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1995-04-01")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(dsum("l_extendedprice", 2)).alias("sum_price"),
        )
    )


@register(
    "q_xml_roundtrip",
    oracle=f"""
    SELECT event_type,
           strftime(ts, '%Y-%m-%d') AS event_date,
           COUNT(*) AS n_events,
           {dsum('value', 6)} AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, event_date
    """,
    doc="XML interchange round-trip via Spark 4's NATIVE xml source "
    "(spark-xml folded into core): events written as <row> elements, "
    "schema-read back (explicit schema — no inference scan), aggregated "
    "per (type, day), value-checked against the source parquet.  Proves "
    "the text round-trip is lossless for longs, doubles, strings, and "
    "microsecond timestamps (timestampFormat pinned to ISO-8601 with "
    "micros).  XML is the instrument-adjacent interchange format the "
    "reference's lab world actually emits (SpreadsheetML inside "
    ".xlsm — sources/cone.py parses it by hand); this registers the "
    "generic columnar path for standalone XML exports.",
    bench=False,  # dominated by the eager format-conversion write
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch = scratch_dir("events_xml", sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ev.write.mode("overwrite").format("xml").option("rowTag", "row").option(
        "timestampFormat", fmt
    ).save(scratch)
    back = (
        spark.read.format("xml")
        .option("rowTag", "row")
        .option("timestampFormat", fmt)
        .schema("event_id bigint, event_type string, ts timestamp_ntz, value double")
        .load(scratch)
    )
    return (
        back.groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .orderBy("event_type", "event_date")
    )


@register(
    "q_point_lookup_bloom",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {dsum('o_totalprice')} AS sum_price
    FROM orders
    WHERE o_custkey = 1
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Point-lookup file skipping from per-file MEMBERSHIP BLOOMS in the "
    "commit manifest: orders are committed HASH-distributed on o_custkey "
    "— the layout real ingest produces, where per-file MIN/MAX spans the "
    "whole key range and interval stats can never skip anything — and "
    "each file carries an 8192-bit md5-keyed bloom (2 KB of manifest).  "
    "The reader resolves which files can contain custkey 1 from the "
    "manifest alone (~1 of 16 at sf0.01; false positives only cost an "
    "extra file), then applies the exact predicate.  Complements "
    "q_stats_pruning: intervals prune range layouts, blooms prune hash "
    "layouts — together they are the manifest half of Delta-style data "
    "skipping.  Oracle is the plain full-scan filter; skipping "
    "effectiveness pinned in tests/test_commitlog.py.",
    bench=False,  # dominated by the eager snapshot write
)
def q_point_lookup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.commitlog import LoggedTable, read_point_pruned

    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    table = LoggedTable(scratch_dir("bloomlookup_od", sf_dir))
    table.commit(
        lambda d: od.repartition(16, "o_custkey").write.parquet(d),
        op="ingest",
        spark=spark,
        bloom_cols=["o_custkey"],
    )
    pruned = read_point_pruned(spark, table, "o_custkey", 1)
    return (
        pruned.filter(F.col("o_custkey") == 1)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(dsum("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_arrow_roundtrip",
    priority=1,
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {dsum('value', 6)} AS sum_value,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Arrow IPC (Feather V2) interchange round-trip: events written as "
    "one .arrow shard per partition (sources/arrow_ipc.py mapInPandas "
    "writer — Spark ships no Arrow *file* codec even though its Python "
    "exchange layer is Arrow), read back via a binaryFile-per-shard "
    "record-batch reader, and aggregated per type.  Parity vs the oracle "
    "over the source parquet proves the conversion is lossless for "
    "longs, doubles, strings, and microsecond tz-naive timestamps.  "
    "Arrow IPC shards are what PyTorch/Polars/DuckDB loaders mmap "
    "directly — the zero-copy handoff from a 100 TB Spark curation job "
    "to the training stack, columnar sibling of the WebDataset tar "
    "shards.  (mapInPandas here is the justified per-FILE Python "
    "surface, not row-path UDF work.)",
    bench=False,  # dominated by the eager format-conversion write
)
def q_arrow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.arrow_ipc import (
        EVENTS_SCHEMA,
        read_arrow_ipc,
        write_arrow_ipc,
    )

    scratch = scratch_dir("events_arrow", sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    write_arrow_ipc(ev, scratch, n_shards=8)
    back = read_arrow_ipc(spark, scratch, EVENTS_SCHEMA)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.expr(dsum("value", 6)).alias("sum_value"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("event_type")
    )


#: (name, lane) — the lineitem columns q_parquet_footer_stats censuses:
#: every numeric/temporal column rides the DOUBLE lane (timestamps as
#: epoch microseconds), the two flag columns ride the string lane.
_FOOTER_COLS = [
    ("l_orderkey", "num"), ("l_partkey", "num"), ("l_suppkey", "num"),
    ("l_linenumber", "num"), ("l_quantity", "num"),
    ("l_extendedprice", "num"), ("l_discount", "num"), ("l_tax", "num"),
    ("l_shipdate", "ts"), ("l_returnflag", "str"), ("l_linestatus", "str"),
]


def _footer_oracle() -> str:
    parts = []
    for c, lane in _FOOTER_COLS:
        if lane == "num":
            mn = f"CAST(MIN({c}) AS DOUBLE) + 0.0"
            mx = f"CAST(MAX({c}) AS DOUBLE) + 0.0"
            ms = msx = "CAST(NULL AS VARCHAR)"
        elif lane == "ts":
            mn = f"CAST(epoch_us(MIN({c})) AS DOUBLE) + 0.0"
            mx = f"CAST(epoch_us(MAX({c})) AS DOUBLE) + 0.0"
            ms = msx = "CAST(NULL AS VARCHAR)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
            ms, msx = f"MIN({c})", f"MAX({c})"
        parts.append(
            f"SELECT '{c}' AS col_name, CAST(COUNT({c}) AS BIGINT) AS"
            f" n_values, CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS"
            f" null_count, {mn} AS min_num, {mx} AS max_num,"
            f" {ms} AS min_str, {msx} AS max_str FROM lineitem"
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register(
    "q_parquet_footer_stats",
    oracle=_footer_oracle(),
    doc="Format-native statistics census (sources/footer.py): read the "
    "parquet FOOTER row-group stats of the lineitem table — executor-side "
    "mapInPandas over the driver-side file listing, one few-KB footer "
    "read per task, zero data pages — and roll them up per column "
    "(Σ n_values, Σ null_count, min of mins, max of maxes).  The oracle "
    "computes the same census from the DATA, so the driver check proves "
    "the footer decode (int/double/epoch-unit/sign, the -0.0 fold, "
    "non-null counting) against a second engine's full scan: the stats "
    "the pruning planner trusts are the stats the rows actually have.  "
    "This is the row-group-granular twin of the commit-log manifest "
    "stats (q_stats_pruning prunes FILES from the manifest; "
    "operators/footer.prune_row_groups prunes GROUPS from the footer — "
    "tests/test_footer_stats.py pins the skip fraction on a z-ordered "
    "multi-row-group layout).  At 100 TB this is the Iceberg planning-"
    "phase shape: a parallel manifest/footer read in seconds, no scan.",
    bench=False,  # one footer read + a tiny agg; timing is all task setup
)
def q_parquet_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.footer import footer_rowgroup_stats

    stats = footer_rowgroup_stats(
        spark,
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[c for c, _lane in _FOOTER_COLS],
    )
    return (
        stats.withColumnRenamed("column", "col_name").groupBy("col_name")
        .agg(
            F.sum("n_values").alias("n_values"),
            F.sum("null_count").alias("null_count"),
            (F.min("min_num") + F.lit(0.0)).alias("min_num"),
            (F.max("max_num") + F.lit(0.0)).alias("max_num"),
            F.min("min_str").alias("min_str"),
            F.max("max_str").alias("max_str"),
        )
        .orderBy("col_name")
    )


#: Q1-1996 shipdate window for the footer-pruned scan, as epoch
#: microseconds (the stats reader's numeric lane for timestamps)
_FP_LO_US = 820454400000000.0  # 1996-01-01
_FP_HI_US = 828316800000000.0  # 1996-04-01


@register(
    "q_footer_pruned_scan",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {dsum('l_extendedprice', 2)} AS sum_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_returnflag
    """,
    doc="Format-native data skipping as a READ PATH (sources/footer.py "
    "pruned_scan): lineitem is rewritten shipdate-sorted with bounded "
    "row groups (the ROW_GROUP_BYTES writer discipline, scaled down to "
    "the test corpus), the footer census plans which row groups can "
    "hold Q1-1996 rows, and ONLY those groups' pages are read — "
    "skipped groups' bytes are never fetched — before the exact "
    "predicate runs on the survivors.  The row-group-granular twin of "
    "q_stats_pruning (manifest prunes files; footer prunes groups "
    "inside files), and the operator form of what Spark's parquet "
    "reader does internally for pushed filters — exposed so skipping "
    "is auditable and usable for predicates Spark cannot push.  The "
    "oracle is the plain full-scan filter, so the driver check proves "
    "pruning loses no rows; skip effectiveness is pinned by "
    "tests/test_footer_stats.py::test_pruned_scan_reads_fewer_groups.",
    bench=False,  # dominated by the eager scratch-lake write
)
def q_footer_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.footer import pruned_scan

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_returnflag", "l_extendedprice"
    )
    path = scratch_dir("footerprune_li", sf_dir)
    (
        # FIXTURE-ONLY layout: repartition(1) + sortWithinPartitions is a
        # single-partition global sort — fine for a hundreds-of-KB test
        # corpus, a scale-killer if pattern-copied.  A production sorted
        # rewrite uses the range-partitioned z-order writer
        # (operators/zorder.py write_zordered) or compact_table, which
        # sort WITHIN bounded tasks.
        li.repartition(1)
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        # tiny bounds (64 KiB groups / 16 KiB pages): the production
        # ROW_GROUP_BYTES discipline scaled to the hundreds-of-KB test
        # corpus so the scratch lake carries MULTIPLE row groups and the
        # pruning path is actually exercised at sf0.001/sf0.01
        .option("parquet.block.size", 64 << 10)
        .option("parquet.page.size", 16 << 10)
        .parquet(path)
    )
    rows = pruned_scan(
        spark,
        path,
        "l_shipdate",
        _FP_LO_US,
        _FP_HI_US,
        ["l_shipdate", "l_returnflag", "l_extendedprice"],
    )
    return (
        rows.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(dsum("l_extendedprice", 2)).alias("sum_price"),
        )
    )


@register(
    "q_cdf_consumer",
    oracle=f"""
    SELECT * FROM (
        SELECT 1 AS poll, 'insert' AS change_type, event_type,
               COUNT(*) AS n_rows, {dsum('value', 6)} AS sum_value
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 2 AS poll, 'delete' AS change_type, event_type,
               COUNT(*) AS n_rows, {dsum('value', 6)} AS sum_value
        FROM events
        WHERE user_id % 89 = 0
           OR (event_id % 97 = 0 AND user_id % 89 != 0)
        GROUP BY event_type
        UNION ALL
        SELECT 2 AS poll, 'insert' AS change_type,
               'patched' AS event_type,
               COUNT(*) AS n_rows, {dsum('value + 500.0', 6)} AS sum_value
        FROM events
        WHERE event_id % 97 = 0 AND user_id % 89 != 0
    )
    ORDER BY poll, change_type, event_type
    """,
    doc="CDF as an incremental CONSUMER surface (streaming/jobs.py "
    "consume_changes): a cursor-backed poll drains table_changes from "
    "the last consumed version to the current latest — the consumer "
    "half of the streaming-CDC loop whose producer half is "
    "upsert_latest_dv.  Poll 1 seeds from the full first snapshot as "
    "inserts; a purge (user_id ≡ 0 mod 89) and an upsert (event_id ≡ 0 "
    "mod 97 of the survivors, value+500, type 'patched') then land as "
    "DV commits, and poll 2 drains BOTH in one multi-commit window "
    "through the LINK fast path — deletes from the DV delta, inserts "
    "from the appended files, zero table-sized shuffles, cost ∝ the "
    "change set.  At 100 TB this is the nightly 'what changed' query "
    "costing kilobytes of metadata instead of a two-sided diff.  The "
    "oracle recomputes each poll's change set from the source in SQL, "
    "so the driver check proves seed, delete, and insert frames all "
    "match exactly; crash-replay and vacuum-guard semantics are pinned "
    "in tests/test_cdc.py.",
    bench=False,  # dominated by the eager snapshot writes
)
def q_cdf_consumer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.commitlog import LoggedTable, purge_dv, upsert_dv
    from ..streaming.jobs import consume_changes

    ev = load_table(spark, sf_dir, "events")
    table_dir = scratch_dir("cdf_consumer_events", sf_dir)
    cursor = os.path.join(table_dir, "_cdf_cursor.json")
    table = LoggedTable(table_dir)
    table.commit(
        lambda d: ev.repartition(8).write.parquet(d), op="ingest"
    )
    polls: list[DataFrame] = []

    def apply_fn(changes, v_from, v_to):
        polls.append(
            changes.withColumn("poll", F.lit(len(polls) + 1))
        )

    consume_changes(spark, table_dir, cursor, apply_fn)  # poll 1: seed
    purge_dv(spark, table, F.col("user_id") % 89 == 0)
    upsert_dv(
        spark,
        table,
        ev.filter(
            (F.col("event_id") % 97 == 0) & (F.col("user_id") % 89 != 0)
        )
        .withColumn("value", F.col("value") + F.lit(500.0))
        .withColumn("event_type", F.lit("patched")),
        key="event_id",
    )
    consume_changes(spark, table_dir, cursor, apply_fn)  # poll 2: 2 commits
    allch = polls[0]
    for p in polls[1:]:
        allch = allch.unionByName(p)
    return (
        allch.withColumnRenamed("_change_type", "change_type")
        .groupBy("poll", "change_type", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .orderBy("poll", "change_type", "event_type")
    )
