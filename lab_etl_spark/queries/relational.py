"""Relational query surface (SURVEY.md §2B batch 1).

Filter/project, the join family (hash, broadcast, semi, anti, range),
aggregations, rollup/cube, window functions, sort/limit, set ops, and the
scalar/array function batteries.  Everything here is pure DataFrame API —
Catalyst gets full visibility (pushdown, pruning, join selection, AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register
from .exact import davg, dsum

# ---------------------------------------------------------------------------
# Filter + project
# ---------------------------------------------------------------------------


@register(
    "q_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_quantity > 40
    """,
    doc="Predicate + projection; filters and column pruning push to the scan.",
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_quantity") > 40)
        ).select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "q_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity')} AS sum_qty,
           {dsum('l_extendedprice')} AS sum_base_price,
           {dsum('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
           {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {davg('l_quantity')} AS avg_qty,
           {davg('l_extendedprice')} AS avg_price,
           {davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary (flagship query; entry() runs this).",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(dsum("l_quantity")).alias("sum_qty"),
            F.expr(dsum("l_extendedprice")).alias("sum_base_price"),
            F.expr(dsum("l_extendedprice * (1 - l_discount)", 6)).alias("sum_disc_price"),
            F.expr(dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)).alias(
                "sum_charge"
            ),
            F.expr(davg("l_quantity")).alias("avg_qty"),
            F.expr(davg("l_extendedprice")).alias("avg_price"),
            F.expr(davg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_group",
    oracle=f"""
    SELECT l_suppkey,
           COUNT(*) AS n_items,
           {dsum('l_quantity')} AS sum_qty,
           {davg('l_discount')} AS avg_disc,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_suppkey
    """,
    doc="Grouped numeric aggregation with min/max over timestamps.",
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.expr(dsum("l_quantity")).alias("sum_qty"),
        F.expr(davg("l_discount")).alias("avg_disc"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    doc="Exact distinct aggregation (expand-based in Spark; dedup before count).",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           TRUE AS acd_band_ok
    FROM events
    GROUP BY event_type
    """,
    doc="approx_count_distinct (HyperLogLog++) per event_type; scale path for "
    "distinct-user counts where exact dedup shuffle would dominate.  "
    "VALUE-CHECKED as a certificate (the q_approx_percentile pattern, "
    "queries/scale.py): the output carries the exact group counts plus a "
    "boolean asserting the HLL estimate landed within 5x its configured "
    "rsd (0.02) of the exact distinct count — the sketch's registers stay "
    "engine-specific, the published accuracy contract is what's portable, "
    "and register MAX merges are order-independent so the boolean is "
    "stable under any partitioning.  The oracle supplies exact counts and "
    "TRUE literals.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rsd = 0.02
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.approx_count_distinct("user_id", rsd=rsd).alias("_acd"),
        )
        .select(
            "event_type",
            "n_events",
            "n_users",
            (
                F.abs(F.col("_acd") - F.col("n_users"))
                <= F.lit(5 * rsd) * F.col("n_users")
            ).alias("acd_band_ok"),
        )
    )


@register(
    "q_rollup_cube",
    oracle=f"""
    SELECT 'rollup' AS src, l_returnflag AS dim1, l_linestatus AS dim2,
           CAST(GROUPING(l_returnflag) AS INT) AS g1,
           CAST(GROUPING(l_linestatus) AS INT) AS g2,
           {dsum('l_quantity')} AS sum_val,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS src, o_orderstatus AS dim1, o_orderpriority AS dim2,
           CAST(GROUPING(o_orderstatus) AS INT) AS g1,
           CAST(GROUPING(o_orderpriority) AS INT) AS g2,
           {dsum('o_totalprice')} AS sum_val,
           COUNT(*) AS n_rows
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="Hierarchical grouping-set operators in one surface: ROLLUP over "
    "lineitem(returnflag, linestatus) unioned with CUBE over orders(status, "
    "priority), schemas aligned to (src, dim1, dim2, g1, g2, sum_val, n_rows). "
    "GROUPING() flags disambiguate subtotal rows vs genuine NULL dims. Both "
    "branches are single-shuffle partial aggregations; the union is a no-op "
    "for the planner (no extra exchange).",
)
def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rollup = li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g1"),
        F.grouping("l_linestatus").cast("int").alias("g2"),
        F.expr(dsum("l_quantity")).alias("sum_val"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    rollup = rollup.select(
        F.lit("rollup").alias("src"),
        F.col("l_returnflag").alias("dim1"),
        F.col("l_linestatus").alias("dim2"),
        "g1",
        "g2",
        "sum_val",
        "n_rows",
    )
    od = load_table(spark, sf_dir, "orders")
    cube = od.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g1"),
        F.grouping("o_orderpriority").cast("int").alias("g2"),
        F.expr(dsum("o_totalprice")).alias("sum_val"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    cube = cube.select(
        F.lit("cube").alias("src"),
        F.col("o_orderstatus").alias("dim1"),
        F.col("o_orderpriority").alias("dim2"),
        "g1",
        "g2",
        "sum_val",
        "n_rows",
    )
    return rollup.unionByName(cube)


@register(
    "q_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate  > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style shipping priority: 3-way join with filters on all "
    "three tables pushed to their scans, then top-10 by revenue — Catalyst "
    "orders the joins, the small filtered customer side broadcasts.",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1997-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-03-15"
    )
    return (
        cu.join(od, cu.c_custkey == od.o_custkey)
        .join(li, li.l_orderkey == od.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)", 6)).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-style local supplier volume: 6-way join (two fact tables, "
    "four dims); the dims broadcast, the facts shuffle once each on their "
    "join keys, and the same-nation predicate rides the supplier join.",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey)
        .join(li, li.l_orderkey == od.o_orderkey)
        .join(
            F.broadcast(su),
            (li.l_suppkey == su.s_suppkey)
            & (cu.c_nationkey == su.s_nationkey),
        )
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)", 6)).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------


@register(
    "q_hash_join_inner",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           {dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    doc="Fact-fact equi-join on the shared order key; partial aggregation on "
    "the probe side keeps the post-join shuffle tiny.",
)
def q_hash_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        od.join(li, od.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(dsum("l_extendedprice * (1 - l_discount)", 6)).alias("revenue"),
        )
    )


@register(
    "q_broadcast_join",
    oracle=f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           {dsum('c_acctbal', 2)} AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    doc="Star join: dims broadcast (no shuffle of the fact side at any scale).",
)
def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    return (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr(dsum("c_acctbal", 2)).alias("sum_acctbal"),
        )
    )


@register(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
    doc="Left-semi join (EXISTS): emits each customer at most once.",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cu.join(
        od, cu.c_custkey == od.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@register(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '1999-01-01')
    """,
    doc="Left-anti join (NOT EXISTS): customers with no order since "
    "1999-01-01.  The date filter keeps the check non-vacuous: the synthetic "
    "generator gives every customer at least one all-time order, so the "
    "unfiltered variant returned 0 rows at every SF — a comparison that "
    "could never fail.  This cutoff yields non-empty results at sf0.001, "
    "0.01 and 0.1.",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("date")
    )
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_range_join",
    oracle=f"""
    SELECT b.band_name,
           COUNT(*) AS n_items,
           {dsum('l_extendedprice', 2)} AS sum_price
    FROM lineitem l
    JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'), (25.0, 60.0, 'high'))
         AS b(lo, hi, band_name)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band_name
    """,
    doc="Interval (theta) join against a band dim, executed as a BINNED "
    "range join — the production range-join technique: each band row is "
    "exploded into the fixed-width integer buckets it overlaps, the fact "
    "side joins on floor(qty / width) with a broadcast HASH join (whole-"
    "stage codegen; a theta predicate would force a non-codegen broadcast "
    "nested-loop that evaluates the full band predicate per row x band), "
    "and the original interval predicate remains as a residual filter so "
    "semantics are exactly the theta join's.  Non-overlapping bands emit "
    "at most one match per row; overlapping bands work unchanged.  Bucket "
    "fan-out is bands x (width/bucket) rows in the broadcast dim — still "
    "constant-size at any fact scale.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 25.0, "mid"), (25.0, 60.0, "high")],
        "lo double, hi double, band_name string",
    )
    width = 5.0  # bucket width: bands span [0, 60) -> <= 12 bucket rows
    binned = bands.select(
        "lo",
        "hi",
        "band_name",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / width).cast("int"),
                # ceil(hi/width) - 1, robust when hi is an exact multiple
                (F.ceil(F.col("hi") / width) - 1).cast("int"),
            )
        ).alias("bucket"),
    )
    fact = li.withColumn(
        "bucket", F.floor(F.col("l_quantity") / width).cast("int")
    )
    return (
        fact.join(F.broadcast(binned), "bucket")
        .filter(
            (F.col("l_quantity") >= F.col("lo"))
            & (F.col("l_quantity") < F.col("hi"))
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(dsum("l_extendedprice", 2)).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Windows, sort/limit, set ops
# ---------------------------------------------------------------------------


@register(
    "q_window_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    )
    WHERE rk <= 3
    """,
    doc="Top-k per group via ranked window; unique o_orderkey tie-break keeps "
    "the result deterministic across engines.",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        od.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "q_window_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_sum,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             AS moving_avg
    FROM events
    """,
    doc="Running sum + 4-row moving average per user; decimal accumulation "
    "keeps frames order-exact.",
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dec = F.expr("CAST(value AS DECIMAL(30,6))")
    run = F.sum(dec).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("double")
    frame = w.rowsBetween(-3, 0)
    mov = F.sum(dec).over(frame).cast("double") / F.count("value").over(frame)
    return ev.select(
        "event_id",
        "user_id",
        run.alias("running_sum"),
        mov.alias("moving_avg"),
    )


@register(
    "q_sort_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    doc="Global top-k: Spark runs TakeOrderedAndProject (per-partition heaps, "
    "no full sort) — exactly the 100 TB-safe plan.",
)
def q_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@register(
    "q_set_ops",
    oracle="""
    SELECT 'active_rich' AS cohort, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 1000
      INTERSECT
      SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'rich_inactive' AS cohort, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 1000
      EXCEPT
      SELECT o_custkey FROM orders
    )
    """,
    doc="INTERSECT / EXCEPT / UNION ALL over key projections.",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    rich = cu.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    ordered = od.select(F.col("o_custkey").alias("c_custkey"))
    both = rich.intersect(ordered).select(
        F.lit("active_rich").alias("cohort"), "c_custkey"
    )
    only_rich = rich.subtract(ordered).select(
        F.lit("rich_inactive").alias("cohort"), "c_custkey"
    )
    return both.unionAll(only_rich)


# ---------------------------------------------------------------------------
# Scalar / array function batteries
# ---------------------------------------------------------------------------


@register(
    "q_scalar_fns",
    oracle="""
    SELECT event_id,
           UPPER(event_type) AS type_uc,
           SUBSTRING(event_type, 1, 3) AS type_3,
           CONCAT(event_type, '#', CAST(user_id AS VARCHAR)) AS tag,
           LENGTH(props) AS props_len,
           CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS prop_k,
           DATE_TRUNC('month', ts) AS month_ts,
           ROUND(ABS(value), 4) AS abs_val,
           CASE WHEN value >= 0 THEN 'pos' ELSE 'neg' END AS sign
    FROM events
    """,
    doc="String/regex/date/math battery incl. the reference's value-from-text "
    "regex pattern (op_parse_value_unit family) applied to JSON props.",
)
def q_scalar_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_uc"),
        F.substring("event_type", 1, 3).alias("type_3"),
        F.concat(
            F.col("event_type"), F.lit("#"), F.col("user_id").cast("string")
        ).alias("tag"),
        F.length("props").alias("props_len"),
        F.regexp_extract("props", r'"k": ([0-9]+)', 1).cast("bigint").alias("prop_k"),
        F.date_trunc("month", F.col("ts")).cast("timestamp_ntz").alias("month_ts"),
        F.round(F.abs(F.col("value")), 4).alias("abs_val"),
        F.when(F.col("value") >= 0, "pos").otherwise("neg").alias("sign"),
    )


@register(
    "q_array_fns",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           ROUND(SQRT(list_reduce(
             list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             (a, b) -> a + b)), 6) AS l2_norm,
           list_reduce(list_transform(embedding,
                                      x -> CASE WHEN x > 0 THEN 1 ELSE 0 END),
                       (a, b) -> a + b) AS n_positive
    FROM embeddings
    """,
    doc="Array battery over embedding vectors: size, index, sequential-fold L2 "
    "norm (aggregate ↔ list_reduce are both left-to-right, so doubles match).",
)
def q_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.expr("CAST(embedding[0] AS DOUBLE)").alias("first_elem"),
        F.expr(
            "ROUND(SQRT(aggregate(embedding, CAST(0.0 AS DOUBLE),"
            " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6)"
        ).alias("l2_norm"),
        F.expr(
            "aggregate(embedding, 0, (a, x) -> a + CASE WHEN x > 0 THEN 1 ELSE 0 END)"
        ).alias("n_positive"),
    )


@register(
    "q_map_fns",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           len(json_keys(props)) AS n_entries,
           CAST(props->>'k' AS BIGINT) AS k_value
    FROM events
    """,
    doc="Map-typed column battery: events.props JSON parsed to "
    "map<string,bigint> (from_json), then map_keys / size / element_at — "
    "flat projection output so the oracle check stays value-exact.",
)
def q_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
        F.size(m).alias("n_entries"),
        F.element_at(m, F.lit("k")).alias("k_value"),
    )


@register(
    "q_window_distribution",
    priority=1,
    oracle="""
    SELECT event_id, event_type,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           LAG(value, 1) OVER w AS prev_value,
           LEAD(value, 1) OVER w AS next_value,
           value - LAG(value, 1) OVER w AS delta_prev
    FROM events
    WHERE user_id % 100 = 7
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    doc="Distribution/navigation window battery: ntile quartiles, "
    "percent_rank, cume_dist, lag/lead and a first-difference — all "
    "rank-arithmetic (exact integer ratios) or identity value moves, so "
    "cross-engine exact with no decimal accumulation needed.  One "
    "partitioned sort, no global window; the user_id sample filter is "
    "pushed to the scan.",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 100 == 7
    )
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    prev = F.lag("value", 1).over(w)
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        # raw native outputs: both engines compute (rk-1)/(n-1) and
        # rk/n as single IEEE divisions of identical integers —
        # bit-identical, verified at sf0.001/0.01/0.1 (rational-ROUND
        # discipline, queries/exact.py)
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        prev.alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        (F.col("value") - prev).alias("delta_prev"),
    )


@register(
    "q_sql_udf",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {dsum('l_extendedprice * (1.0 - l_discount)')} AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="User-extensible SQL function surface: a scalar function declared "
    "with CREATE FUNCTION ... RETURN <expr> and used inside an aggregate. "
    "Catalyst INLINES the body into the plan — the aggregation stays in "
    "whole-stage codegen with map-side partial aggregation, unlike a "
    "Python UDF which would drop the hot path out of the JVM. This is the "
    "extension mechanism the reference lacks entirely (SURVEY.md §2: 'no "
    "user-extensible function API'); at 100 TB it is the ONLY acceptable "
    "kind of user function on a per-row path. The oracle inlines the same "
    "expression by hand — identical results prove the inlining is "
    "semantics-preserving.",
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(f"""
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               {dsum('disc_price(l_extendedprice, l_discount)')} AS revenue
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """)


@register(
    "q_udtf_token_offsets",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             string_split(trim(lower(regexp_replace(trim(text), '\\s+', ' ',
                                                    'g'))), ' ') AS ws
      FROM documents
      WHERE text IS NOT NULL
    ),
    tok AS (
      SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, ws[i] AS token
      FROM words, UNNEST(generate_series(1, len(ws))) AS t(i)
    )
    SELECT doc_id, pos, token,
           CAST(COALESCE(SUM(length(token) + 1) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS INTEGER) AS start_off,
           CAST(COALESCE(SUM(length(token) + 1) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + length(token) AS INTEGER) AS end_off
    FROM tok
    """,
    bench=False,  # Python table-function demo, not a hot-path benchmark
    doc="Python USER-DEFINED TABLE FUNCTION surface (PySpark 4 @udtf + "
    "LATERAL): a table function that expands each document into one row "
    "per token with character offsets into the normalized text — the "
    "arbitrary-fan-out extension point q_sql_udf's scalar CREATE FUNCTION "
    "cannot express (a UDTF yields any number of rows per input, with "
    "per-call state).  The normalization runs JVM-side BEFORE the UDTF so "
    "Python only does locale-free splitting and integer arithmetic; the "
    "oracle rebuilds the identical offsets from a window sum over token "
    "lengths.  Deliberately OFF the hot path elsewhere (the row-path "
    "Python ban in tests/test_plans.py still holds for every other "
    "query): this registers the mechanism a user would reach for when an "
    "expansion truly cannot be expressed in codegen.",
)
def q_udtf_token_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, pos int, token string,"
        " start_off int, end_off int"
    )
    class TokenOffsets:
        def eval(self, doc_id, text):
            if text is None:
                return
            off = 0
            for i, tok in enumerate(text.split(" ")):
                yield (doc_id, i, tok, off, off + len(tok))
                off += len(tok) + 1

    spark.udtf.register("token_offsets", TokenOffsets)
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr(
            "trim(lower(regexp_replace(trim(text), '\\\\s+', ' ')))"
        ).alias("ntext"),
    ).createOrReplaceTempView("_udtf_docs_norm")
    return spark.sql(
        "SELECT t.* FROM _udtf_docs_norm,"
        " LATERAL token_offsets(doc_id, ntext) AS t"
    )
