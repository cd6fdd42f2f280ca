"""Extended analytic surface: TPC-H-flavored multi-join/aggregate queries
adapted to the driver schema, JSON-function coverage, and corpus/source
profiling for training-data pipelines.

Cross-engine rules as everywhere (queries/exact.py): double sums accumulate
in DECIMAL, every ranked output carries a deterministic tie-break, shares
divide two exact sums, and all computed columns are identically aliased in
the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, scratch_dir
from . import register
from .exact import davg, dsum


@register(
    "q_returned_items",
    priority=1,
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 adaptation: lost-revenue ranking of customers who "
    "returned items in a window — 3-way fact/dim join, exact-decimal "
    "revenue, TakeOrderedAndProject top-20 (no global sort).  The nation "
    "dim is broadcast; orders/lineitem join shuffles on the order key.",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)", 6)).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_promo_revenue",
    priority=1,
    oracle=f"""
    SELECT ROUND(
             100.0 * {dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 6)}
             / {dsum('l_extendedprice * (1 - l_discount)', 6)}, 6)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    """,
    doc="TPC-H Q14 adaptation: promotional revenue share over a ship-date "
    "window — conditional exact-decimal aggregation; the part dim joins "
    "broadcast, one row out.  The ratio divides two exact sums, so the "
    "double is deterministic cross-engine.",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load_table(spark, sf_dir, "part")
    promo = dsum(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount)"
        " ELSE 0.0 END",
        6,
    )
    total = dsum("l_extendedprice * (1 - l_discount)", 6)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.expr(promo) / F.expr(total), 6
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q_top_supplier",
    priority=1,
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             {dsum('l_extendedprice * (1 - l_discount)', 6)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    ),
    mx AS (SELECT MAX(total_revenue) AS max_rev FROM rev)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.suppkey, mx
    WHERE r.total_revenue = mx.max_rev
    """,
    doc="TPC-H Q15 adaptation: top supplier by quarterly revenue — "
    "per-supplier exact-decimal aggregate, scalar-subquery max (broadcast "
    "1-row cross join, no single-partition window), ties all returned.  "
    "Revenue sums are exact, so the max comparison is boundary-safe.",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.expr(dsum("l_extendedprice * (1 - l_discount)", 6)).alias(
            "total_revenue"
        )
    ).persist()  # supplier-sized agg, consumed by the 1-row max AND the
    # argmax filter (multi-consumer rule)
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q_large_volume_customer",
    priority=1,
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {dsum('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY 1
      HAVING {dsum('l_quantity')} > 200
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18 adaptation: large-volume orders (exact-decimal "
    "quantity sum > 200 — the HAVING boundary is exact, so both engines "
    "admit identical orders) joined back to order + customer detail.  "
    "Aggregate-then-join: the group-by prunes before the joins touch "
    "the dims.",
)
def q_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr(dsum("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
    )


@register(
    "q_region_market_share",
    priority=1,
    oracle=f"""
    WITH rr AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year, r.r_name,
             {dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    )
    SELECT o_year, r_name, revenue,
           ROUND(revenue / CAST(SUM(CAST(revenue AS DECIMAL(30,6)))
                                OVER (PARTITION BY o_year) AS DOUBLE), 6)
             AS share
    FROM rr
    """,
    doc="TPC-H Q8 adaptation: per-year revenue share of each customer "
    "region — 4-way snowflake join (nation/region broadcast), exact-"
    "decimal revenue, share via a year-partitioned window sum that ALSO "
    "accumulates in DECIMAL (a plain double window sum would be "
    "order-dependent across engines).",
)
def q_region_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("o_year"), "r_name"
        )
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)", 6)).alias(
                "revenue"
            )
        )
    )
    return rr.select(
        "o_year",
        "r_name",
        "revenue",
        F.round(
            F.col("revenue")
            / F.expr(
                "CAST(SUM(CAST(revenue AS DECIMAL(30,6)))"
                " OVER (PARTITION BY o_year) AS DOUBLE)"
            ),
            6,
        ).alias("share"),
    )


@register(
    "q_json_functions",
    priority=1,
    oracle="""
    WITH parsed AS (
        SELECT event_type,
               CASE WHEN json_valid(props)
                    THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
               END AS k
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM parsed
    GROUP BY event_type
    """,
    doc="Semi-structured JSON column processing: get_json_object path "
    "extraction (json_extract_string in the oracle) with typed casts and "
    "integer aggregation per event type — JSON parse stays in codegen, "
    "one hash aggregate, no Python.  Semantics are PERMISSIVE on "
    "malformed JSON (a row with broken props contributes NULL, never "
    "fails the job — Spark's get_json_object behavior, the only "
    "acceptable contract at 100 TB where some producer always emits one "
    "bad record); the oracle guards with json_valid because DuckDB's "
    "extractor raises instead, pinned by "
    "tests/test_adversarial_corpus.py::test_json_functions_permissive_on_malformed.",
)
def q_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_doc_source_stats",
    priority=1,
    oracle=f"""
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {davg('CAST(n_chars AS DOUBLE)')} AS avg_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY 1, 2
    """,
    doc="Corpus provenance profiling: per (source, lang) document counts "
    "and size stats — the first query run on any new crawl dump before "
    "spending cluster time on dedup (a source with 10x the average doc "
    "size or a lone-language source is a pipeline smell).  One hash "
    "aggregate, integer + exact-decimal stats.",
)
def q_doc_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.expr(davg("CAST(n_chars AS DOUBLE)")).alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "q_sequence_budget",
    priority=1,
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    )
    SELECT CASE WHEN n_tokens <= 32 THEN '0032'
                WHEN n_tokens <= 64 THEN '0064'
                WHEN n_tokens <= 128 THEN '0128'
                WHEN n_tokens <= 256 THEN '0256'
                ELSE 'long' END AS seq_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN n_tokens <= 32 THEN 32
                         WHEN n_tokens <= 64 THEN 64
                         WHEN n_tokens <= 128 THEN 128
                         WHEN n_tokens <= 256 THEN 256
                         ELSE n_tokens END - n_tokens) AS BIGINT)
             AS padding_waste
    FROM t GROUP BY 1
    """,
    doc="Context-length budget planning: whitespace-token counts bucketed "
    "to power-of-two sequence lengths, with per-bucket padding waste "
    "(bucket capacity minus actual tokens — what a naive fixed-length "
    "batcher burns).  Map-only projection + one hash aggregate; pure "
    "integer arithmetic, engine-exact.",
)
def q_sequence_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)"
    bucket = (
        "CASE WHEN n_tokens <= 32 THEN '0032'"
        " WHEN n_tokens <= 64 THEN '0064'"
        " WHEN n_tokens <= 128 THEN '0128'"
        " WHEN n_tokens <= 256 THEN '0256'"
        " ELSE 'long' END"
    )
    cap = (
        "CASE WHEN n_tokens <= 32 THEN 32"
        " WHEN n_tokens <= 64 THEN 64"
        " WHEN n_tokens <= 128 THEN 128"
        " WHEN n_tokens <= 256 THEN 256"
        " ELSE n_tokens END"
    )
    t = docs.select(F.expr(n_tok).alias("n_tokens"))
    return t.groupBy(F.expr(bucket).alias("seq_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.expr(cap) - F.col("n_tokens")).alias("padding_waste"),
    )


@register(
    "q_customer_order_counts",
    priority=1,
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey AS custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    ) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 adaptation: customer order-count distribution — an "
    "outer join that MUST keep zero-order customers, then a two-level "
    "aggregation (per-customer count, then histogram of counts).  Both "
    "aggregates are integer-exact; the second groupBy input is one row "
    "per customer, so the second shuffle is tiny.  The join predicate "
    "on o_orderpriority lives in the join condition, not a post-filter "
    "(a post-filter would turn the outer join inner).",
)
def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q_small_qty_revenue",
    priority=1,
    oracle=f"""
    WITH thr AS (
      SELECT l_partkey AS t_partkey,
             {davg('l_quantity')} AS avg_qty
      FROM lineitem GROUP BY 1
    )
    SELECT ROUND({dsum('l_extendedprice', 4)} / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN thr ON t_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < 0.5 * avg_qty
    """,
    doc="TPC-H Q17 adaptation: small-quantity order revenue — a "
    "correlated-average filter (lineitems under half their part's mean "
    "quantity) expressed as an aggregate + self-join, NOT a per-row "
    "subquery.  The per-part threshold table is |parts|-sized and "
    "broadcast; the mean uses decimal accumulation so both engines "
    "compute a bit-identical threshold (no boundary flicker).",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    )
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.expr(davg("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(thr), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.expr(dsum("l_extendedprice", 4)) / 7.0, 6
            ).alias("avg_yearly")
        )
    )


@register(
    "q_idle_customers",
    priority=1,
    oracle=f"""
    WITH avg_bal AS (
      SELECT {davg('c_acctbal')} AS v FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {dsum('c_acctbal', 4)} AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.v
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY 1
    ORDER BY 1
    """,
    doc="TPC-H Q22 adaptation: high-balance customers with no urgent "
    "orders — a scalar subquery (global decimal-exact average, broadcast "
    "as a 1-row cross join) feeding an anti join against a filtered "
    "orders subset, then a per-segment rollup.  The anti join's build "
    "side is pre-filtered to urgent orders only (~20% of the table) "
    "before the shuffle.",
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.expr(davg("c_acctbal")).alias("v")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr(dsum("c_acctbal", 4)).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_nation_year_profit",
    priority=1,
    oracle=f"""
    SELECT n_name AS nation,
           CAST(date_part('year', o_orderdate) AS INTEGER) AS o_year,
           {dsum('l_extendedprice * (1 - l_discount)', 6)} AS profit
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN part     ON p_partkey = l_partkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 adaptation: supplier-nation profit by order year for a "
    "part-name pattern — a 5-way star join (fact + 4 dims) with a "
    "non-sargable LIKE that still prunes the part dim before the join, "
    "plus date-part extraction.  nation is broadcast; supplier/part "
    "join via shuffle so the plan survives dims that scale with the "
    "fact table (AQE may still elect broadcast at small SF).",
)
def q_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)", 6)).alias(
                "profit"
            )
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q_disjunctive_join",
    priority=1,
    oracle=f"""
    SELECT {dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 adaptation: disjunctive multi-attribute join filter "
    "(OR of brand/size/quantity conjunctions).  The equi-key "
    "(p_partkey = l_partkey) is conjunct with the whole disjunction, so "
    "Catalyst plans a hash join on the key with the OR as a post-join "
    "filter — not a cartesian product; per-branch single-table "
    "predicates (brand/size, quantity ranges) are also pushed to both "
    "scans as an OR-union filter.",
)
def q_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 30))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 50))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)", 6)).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# Scratch lakes (z-order rewrite, JSONL export) are per-invocation unique
# via catalog.scratch_dir — a fixed shared path let any other execution
# (bench at sf0.1, a concurrent run) overwrite the directory between plan
# build and lazy collection; see the round-3 q_jsonl_roundtrip mismatch.


@register(
    "q_zorder_skipping",
    priority=1,
    bench=False,  # dominated by the rewrite's disk I/O, not query compute
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {dsum('value')} AS sum_value
    FROM events
    WHERE user_id <= 7 AND value <= 5.0
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Z-order lake layout end-to-end (operators/zorder.py): rewrite "
    "events range-partitioned along the Morton curve of (user_id, value) "
    "with quantile rank buckets, then answer a two-dimensional selective "
    "filter from the READ-BACK files.  Parity vs the oracle over the "
    "original table proves the clustered rewrite loses/duplicates nothing; "
    "the data-skipping payoff (a ~5%-selective filter on either dimension "
    "touches <=1/4 of the files vs ~all under a random layout) is pinned "
    "by tests/test_zorder.py via _metadata.file_path.  At 100 TB the "
    "rewrite is one range shuffle, and every file carries tight min/max "
    "footer stats on BOTH columns for row-group pruning.",
)
def q_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.zorder import write_zordered

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    scratch = scratch_dir("events_zorder", sf_dir)
    write_zordered(ev, scratch, ["user_id", "value"], n_files=16)
    back = spark.read.parquet(scratch)
    return (
        back.filter((F.col("user_id") <= 7) & (F.col("value") <= 5.0))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value")).alias("sum_value"),
        )
        .orderBy("user_id")
    )


#: 32-bit md5-derived content hash of the text column, one expression per
#: engine, identical value (same idiom as operators/dedup.py MINHASH_BASE_*)
_TEXT_H32_SPARK = "CAST(CONV(SUBSTRING(MD5(text), 1, 8), 16, 10) AS BIGINT)"
_TEXT_H32_DUCK = "CAST(('0x' || SUBSTRING(MD5(text), 1, 8)) AS BIGINT)"


@register(
    "q_jsonl_roundtrip",
    priority=1,
    bench=False,  # dominated by the export's disk I/O, not query compute
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           bit_xor({_TEXT_H32_DUCK}) AS text_checksum
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="JSONL export/ingest fidelity (the interchange format of LLM data "
    "pipelines): write documents as snappy-less JSON lines with an explicit "
    "schema, read them back through a schema-pinned distributed scan (no "
    "inference job), and aggregate per source with an order-independent "
    "bit_xor content checksum over an md5-derived 32-bit text hash.  "
    "Parity vs the oracle over the ORIGINAL parquet proves the JSON "
    "encode/decode round-trip preserves every document byte-exactly "
    "(escapes, unicode, newlines) — not just row counts.  Map-only write "
    "+ one agg shuffle; at 100 TB the export shards embarrassingly.",
)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scratch = scratch_dir("documents_jsonl", sf_dir)
    docs.write.mode("overwrite").json(scratch)
    back = spark.read.schema(docs.schema).json(scratch)
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.expr(f"bit_xor({_TEXT_H32_SPARK})").alias("text_checksum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-4 decision-support widening: the five classic TPC-H shapes the
# surface was still missing (Q6 forecast, Q7 bi-nation volume, Q12 lateness
# x priority, Q16 supplier counts, Q20 nested semi-join chain), adapted to
# the driver schema (no partsupp / shipmode / commitdate columns — each
# adaptation preserves the original's join/agg shape and notes the swap).
# ---------------------------------------------------------------------------


@register(
    "q_forecast_revenue",
    priority=1,
    oracle=f"""
    SELECT {dsum('l_extendedprice * l_discount', 6)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: revenue-increase forecast — a pure scan-side query: "
    "every predicate (date window, discount band, quantity cap) pushes to "
    "the parquet scan, and the single exact-decimal aggregate runs "
    "map-side with a 1-row exchange.  The canonical 'filters must reach "
    "the scan' benchmark shape; at 100 TB it is I/O-bound by design and "
    "row-group min/max stats prune most of the table.",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.expr(dsum("l_extendedprice * l_discount", 6)).alias("revenue")
    )


@register(
    "q_volume_shipping",
    priority=1,
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
       OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7: shipping volume between two nations by year — the "
    "classic star-with-two-dim-roles query (nation joins TWICE, once "
    "through supplier and once through customer).  Both nation dims and "
    "supplier/customer broadcast; only lineitem-orders meet in a shuffled "
    "join; the disjunctive nation-pair predicate prunes before grouping.",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_18")
        & (F.col("cust_nation") == "NATION_19")
    ) | (
        (F.col("supp_nation") == "NATION_19")
        & (F.col("cust_nation") == "NATION_18")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)", 6)).alias(
                "revenue"
            )
        )
    )


@register(
    "q_shipmode_priority",
    priority=1,
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                THEN 'late'
                WHEN date_diff('day', o_orderdate, l_shipdate) > 30
                THEN 'slow' ELSE 'fast' END AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
    doc="TPC-H Q12 adaptation: order-priority mix per shipping-delay class "
    "(the driver schema has no shipmode/commitdate, so the grouping key is "
    "an order-to-ship-days bucket — same join + dual conditional-count "
    "shape).  One fact-fact join, counts as conditional sums; both counts "
    "are exact integers, so parity is trivially bit-stable.",
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    diff = F.datediff("l_shipdate", "o_orderdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.when(diff > 90, "late")
            .when(diff > 30, "slow")
            .otherwise("fast")
            .alias("ship_class"),
            high.cast("int").alias("_hi"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum("_hi").cast("bigint").alias("high_line_count"),
            F.sum(1 - F.col("_hi")).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q_parts_supplier_count",
    priority=1,
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type <> 'MEDIUM'
      AND p_size IN (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 adaptation: distinct-supplier counts per part "
    "(brand, type, size) — the part-supplier relation comes from lineitem "
    "pairs (driver schema has no partsupp), and the excluded-supplier "
    "subquery (negative account balance standing in for complaints) runs "
    "as a broadcast anti-join.  COUNT(DISTINCT) expands to the standard "
    "two-level aggregate; the part dim broadcasts.",
)
def q_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(list(range(1, 16)))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_potential_promotion",
    priority=1,
    oracle=f"""
    WITH agg AS (
      SELECT l_suppkey,
             {dsum("CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' THEN l_quantity ELSE 0.0 END")}
               AS qty_window,
             {dsum('l_quantity')} AS qty_all
      FROM lineitem
      WHERE l_partkey IN
            (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, n.n_name,
           a.qty_window, a.qty_all
    FROM agg a
    JOIN supplier s ON s.s_suppkey = a.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE a.qty_window * 5.0 > a.qty_all
    """,
    doc="TPC-H Q20 adaptation: suppliers whose shipments of red-named "
    "parts concentrate in one year (>20% of all-time volume in 1996; the "
    "driver schema has no partsupp availqty, so the threshold compares "
    "two shipped-quantity aggregates) — the nested semi-join chain shape: "
    "part-name semi-join gates the fact scan, a conditional/total "
    "exact-decimal aggregate pair feeds the threshold, survivors join "
    "back to supplier + nation detail.  Both sums are exact, and the "
    "5x-integer-scaled comparison is a single identically-rounded double "
    "multiply in both engines, so the boundary is deterministic.",
)
def q_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red %")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    qty_window = dsum(
        "CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'"
        " AND l_shipdate < TIMESTAMP '1997-01-01'"
        " THEN l_quantity ELSE 0.0 END"
    )
    agg = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(
            F.expr(qty_window).alias("qty_window"),
            F.expr(dsum("l_quantity")).alias("qty_all"),
        )
        .filter(F.col("qty_window") * 5.0 > F.col("qty_all"))
    )
    return (
        agg.join(F.broadcast(s), agg.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "qty_window", "qty_all")
    )


@register(
    "q_commitlog_roundtrip",
    priority=1,
    bench=False,  # dominated by the snapshot writes' disk I/O
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           {dsum('n_chars', 0)} AS sum_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="Commit-log lake table end-to-end (operators/commitlog.py): commit "
    "the even-doc_id half of documents as snapshot v1 of a LoggedTable, "
    "land the odd half as a PURE APPEND (round-12 append_logged: every "
    "v1 file hardlinks into v2, only the batch is written — bytes AND "
    "compute ∝ the batch, no probe, no DV), compact into v3 (manifest "
    "append, no directory swap), then aggregate from the READ-BACK of "
    "the latest manifest.  Parity vs the oracle over the original "
    "parquet proves the three commits and the manifest-resolved read "
    "lost/duplicated nothing; the atomicity/race/orphan guarantees are "
    "pinned by tests/test_commitlog.py.  At 100 TB this is the "
    "Delta-style mechanism that lets ingestion append at batch cost and "
    "compaction run behind live readers.",
)
def q_commitlog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.commitlog import (
        LoggedTable,
        append_logged,
        compact_logged,
    )

    docs = load_table(spark, sf_dir, "documents")
    table = LoggedTable(scratch_dir("commitlog_docs", sf_dir))
    table.commit(
        lambda d: docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(8)
        .write.parquet(d),
        op="create",
    )
    append_logged(spark, table, docs.filter(F.col("doc_id") % 2 == 1))
    compact_logged(spark, table, target_bytes=1 << 30)
    back = table.read(spark)
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(dsum("n_chars", 0)).alias("sum_chars"),
        )
        .orderBy("source")
    )


@register(
    "q_date_spine_fill",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(o_orderdate) AS d0, MAX(o_orderdate) AS d1 FROM orders
    ),
    spine AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds
    ),
    daily AS (
        SELECT o_orderdate AS day,
               COUNT(*) AS n_orders,
               {dsum('o_totalprice')} AS revenue
        FROM orders GROUP BY o_orderdate
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.n_orders, 0) AS n_orders,
           COALESCE(d.revenue, 0.0) AS revenue,
           CAST(CASE WHEN d.day IS NULL THEN 1 ELSE 0 END AS INTEGER)
               AS is_gap
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    ORDER BY s.day
    """,
    doc="Calendar-spine densification: generate every day between the first "
    "and last order date (a 1-row bounds aggregate exploded into the "
    "spine — no calendar table needed), left-join the daily revenue "
    "aggregate, and zero-fill the gaps with an is_gap audit flag. The "
    "spine side is |days| rows regardless of data size, so it BROADCASTS "
    "and the fact aggregate never reshuffles — gap-filling a 100 TB fact "
    "table costs one aggregation. This is the densification step every "
    "time-series dashboard and forecasting feature pipeline needs before "
    "windowed models (gaps read as zeros, not missing rows).",
)
def q_date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    bounds = od.groupBy().agg(
        F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    daily = od.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(dsum("o_totalprice")).alias("revenue"),
    )
    s, d = spine.alias("s"), daily.alias("d")
    return (
        s.join(d, F.col("s.day") == F.col("d.day"), "left")
        .select(
            F.date_format("s.day", "yyyy-MM-dd").alias("day"),
            F.coalesce("d.n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("d.revenue", F.lit(0.0)).alias("revenue"),
            F.when(F.col("d.day").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_gap"),
        )
        .orderBy("s.day")
    )


@register(
    "q_corrupt_records",
    priority=1,
    bench=False,  # dominated by the export's disk I/O, not query compute
    oracle="""
    SELECT CASE WHEN doc_id % 37 = 0 THEN NULL ELSE lang END AS lang,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (doc_id % 37 = 0) AS n_corrupt,
           CAST(COALESCE(SUM(CASE WHEN doc_id % 37 <> 0 THEN n_chars END),
                         0) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY 1
    """,
    doc="Malformed-input robustness (the schema-enforcement story of the "
    "reference, exercised on the ingest boundary): a JSONL export with "
    "every 37th record TRUNCATED mid-object is read back in PERMISSIVE "
    "mode with an explicit schema + _corrupt_record column — corrupt "
    "lines land as all-NULL rows carrying their raw text instead of "
    "failing the job or being silently dropped, and the audit aggregate "
    "counts them per group.  This is the posture a 100 TB ingest needs: "
    "FAILFAST dies on one bad record among billions, DROPMALFORMED "
    "silently loses data; PERMISSIVE + corrupt-column quarantines.  The "
    "oracle reproduces the planted corruption rule on the source table, "
    "proving nothing is lost or double-counted across the round-trip.",
)
def q_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    line = F.when(
        F.col("doc_id") % 37 == 0,
        F.concat(
            F.lit('{"doc_id": '),
            F.col("doc_id").cast("string"),
            F.lit(', "lang": '),
        ),
    ).otherwise(F.to_json(F.struct("doc_id", "lang", "source", "n_chars")))
    scratch = scratch_dir("docs_jsonl_corrupt", sf_dir)
    docs.select(line.alias("value")).write.mode("overwrite").text(scratch)
    back = (
        spark.read.schema(
            "doc_id bigint, lang string, source string, n_chars bigint,"
            " _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(scratch)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("_corrupt_record").isNotNull()).alias("n_corrupt"),
        F.coalesce(
            F.sum(
                F.when(F.col("_corrupt_record").isNull(), F.col("n_chars"))
            ),
            F.lit(0).cast("bigint"),
        ).alias("sum_chars"),
    )


@register(
    "q_rfm_segmentation",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             {dsum('o_totalprice')} AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT custkey, frequency, monetary,
             NTILE(4) OVER (ORDER BY last_order, custkey) AS r_score,
             NTILE(4) OVER (ORDER BY frequency, custkey) AS f_score,
             NTILE(4) OVER (ORDER BY monetary, custkey) AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           {dsum('monetary', 2)} AS segment_revenue
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc="RFM customer segmentation: recency/frequency/monetary quartiles "
    "via NTILE with unique custkey tie-breaks (NTILE over ties is "
    "engine-dependent without them), rolled up into the 4x4x4 segment "
    "grid with exact-decimal revenue.  One customer-level aggregate then "
    "three windows over the (small) per-customer frame — the standard "
    "CRM segmentation shape.  NOTE the windows are global by design: "
    "they run over the CUSTOMER aggregate (orders of magnitude smaller "
    "than the fact table), the same compromise every NTILE segmentation "
    "makes; at 100 TB the per-customer frame is still ~millions of rows "
    "— approx percentile cutpoints would replace NTILE beyond that.",
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    od = load_table(spark, sf_dir, "orders")
    rfm = od.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.expr(dsum("o_totalprice")).alias("monetary"),
    )
    scored = rfm.select(
        "custkey",
        "frequency",
        "monetary",
        F.ntile(4).over(W.orderBy("last_order", "custkey")).alias("r_score"),
        F.ntile(4).over(W.orderBy("frequency", "custkey")).alias("f_score"),
        F.ntile(4).over(W.orderBy("monetary", "custkey")).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr(dsum("monetary", 2)).alias("segment_revenue"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "q_gini_concentration",
    oracle=f"""
    WITH rev AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey AS custkey,
             {dsum('o.o_totalprice')} AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT segment, revenue,
             ROW_NUMBER() OVER (PARTITION BY segment
                                ORDER BY revenue, custkey) AS i
      FROM rev
    ),
    sums AS (
      SELECT segment,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(revenue AS DECIMAL(38,4))) AS VARCHAR)
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(i * revenue AS DECIMAL(38,4))) AS VARCHAR)
                  AS DOUBLE) AS sxi
      FROM ranked GROUP BY segment
    )
    SELECT segment, CAST(n AS BIGINT) AS n_customers,
           ROUND(CAST(2.0 AS DOUBLE) * sxi / (n * sx) - (n + CAST(1.0 AS DOUBLE)) / n, 6) AS gini
    FROM sums ORDER BY segment
    """,
    doc="Gini concentration of customer revenue per market segment — the "
    "exact inequality coefficient from its rank formulation "
    "G = 2·Σ(i·x_(i))/(n·Σx) − (n+1)/n: one segment-partitioned rank "
    "window over the per-customer aggregate, two exact-decimal sums "
    "(read out through their decimal strings, the q_linreg_trend "
    "discipline), and a closed-form read-out with identical expression "
    "text on both engines.  The whale-dependence metric every revenue "
    "and every training-data SOURCE-MIX audit wants; shuffles carry "
    "customers, never order lines.",
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    rev = (
        od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(F.expr(dsum("o_totalprice")).alias("revenue"))
    )
    w = W.partitionBy("segment").orderBy("revenue", "custkey")
    ranked = rev.withColumn("i", F.row_number().over(w))
    sums = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.expr(
            "CAST(CAST(SUM(CAST(revenue AS DECIMAL(38,4))) AS STRING)"
            " AS DOUBLE)"
        ).alias("sx"),
        F.expr(
            "CAST(CAST(SUM(CAST(i * revenue AS DECIMAL(38,4))) AS STRING)"
            " AS DOUBLE)"
        ).alias("sxi"),
    )
    return sums.select(
        "segment",
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(
            F.expr("CAST(2.0 AS DOUBLE) * sxi / (n * sx)"
            " - (n + CAST(1.0 AS DOUBLE)) / n"), 6
        ).alias("gini"),
    ).orderBy("segment")


@register(
    "q_webdataset_roundtrip",
    priority=1,
    bench=False,  # dominated by the shard write's disk I/O
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           bit_xor({_TEXT_H32_DUCK}) AS text_checksum
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="WebDataset tar-shard round-trip (the interchange layout of "
    "multimodal LLM training corpora): export documents as 8 tar shards "
    "of paired {key}.txt + {key}.json members (one mapInPandas writer "
    "per partition, no codec dependency — stdlib tarfile), scan them "
    "back through binaryFile + a pairing kernel that joins each text "
    "member to its metadata sidecar inside the shard, and aggregate per "
    "source with an order-independent md5 content checksum.  Parity vs "
    "the oracle over the ORIGINAL parquet proves the tar member bytes, "
    "the utf-8 round-trip, and the member pairing preserved every "
    "document exactly.  Shards write and read embarrassingly parallel — "
    "this is how petabyte text/image corpora actually ship.",
)
def q_webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.webdataset import read_webdataset, write_webdataset

    docs = load_table(spark, sf_dir, "documents")
    scratch = scratch_dir("documents_wds", sf_dir)
    write_webdataset(docs, scratch, n_shards=8)
    back = read_webdataset(spark, scratch)
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.expr(f"bit_xor({_TEXT_H32_SPARK})").alias("text_checksum"),
        )
        .orderBy("source")
    )
