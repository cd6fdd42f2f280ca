"""Scale-technique query surface (SURVEY.md §2B + BASELINE.json scale mandate).

Each query here demonstrates a 100 TB-relevant physical technique while
remaining value-exact against the DuckDB oracle:

  * salted skew join      — hot-key fan-out (events.user_id has few, hot keys)
  * shuffle-hash join     — large⋈large where sorting both sides is waste
  * full-outer join       — null-completing merge of two keyed sets
  * scalar subquery       — one-row aggregate broadcast into a filter
  * pivot / unpivot       — wide↔long reshapes (op_pivot_setpoints_to_rows's
                            relational cousins; fox_hfm_parser.py:407-479)
  * grouping sets         — multi-dimensional rollup in one shuffle pass
  * exact percentiles     — interpolated quantiles (sort-based, per group)

All plans stay in builtin expressions — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register
from .exact import davg, dsum

SALT_BUCKETS = 16


@register(
    "q_skew_join_salted",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           {dsum('value')} AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Skew-proof equi-join: events.user_id concentrates on few hot keys, "
    "so the fact side carries a deterministic salt (pmod(xxhash64(event_id)))"
    " and the dim side explodes across all salt buckets; the shuffle then "
    "spreads each hot key over SALT_BUCKETS reducers. Result is identical to "
    "the unsalted join (oracle checks it).",
)
def q_skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS))
    )
    cu = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1)))
        )
        .withColumn("salt", F.col("salt").cast("long"))
    )
    return (
        ev.join(cu, (ev.user_id == cu.c_custkey) & (ev.salt == cu.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value")).alias("sum_value"),
        )
    )


@register(
    "q_shuffle_hash_join",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_items,
           {dsum('l_quantity')} AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
    doc="Large⋈large equi-join pinned to shuffled hash join via hint: when "
    "neither side broadcasts but one side's per-partition slice fits in "
    "memory, hashing beats sorting both sides (no sort, no spill-merge).",
)
def q_shuffle_hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").hint("SHUFFLE_HASH")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(dsum("l_quantity")).alias("sum_qty"),
        )
    )


@register(
    "q_outer_join",
    oracle=f"""
    SELECT COALESCE(c_custkey, o_custkey) AS custkey,
           c_name,
           COUNT(o_orderkey) AS n_orders,
           {dsum('o_totalprice')} AS sum_spend
    FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY COALESCE(c_custkey, o_custkey), c_name
    """,
    doc="Full-outer join + null-completing aggregate: customers with no "
    "orders keep NULL sums; COUNT(o_orderkey) ignores the null-extended rows.",
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "full_outer")
        .groupBy(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.col("c_name"),
        )
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.expr(dsum("o_totalprice")).alias("sum_spend"),
        )
    )


@register(
    "q_scalar_subquery",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_above,
           {dsum('l_extendedprice', 2)} AS sum_price
    FROM lineitem
    WHERE l_quantity > (SELECT {davg('l_quantity')} FROM lineitem)
    GROUP BY l_returnflag
    """,
    doc="Scalar-subquery filter: the one-row global average broadcasts into "
    "every partition's filter — two scans, zero wide shuffles of the filter "
    "input.",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    avg_row = li.agg(F.expr(davg("l_quantity")).alias("global_avg"))
    return (
        li.join(F.broadcast(avg_row))
        .filter(F.col("l_quantity") > F.col("global_avg"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.expr(dsum("l_extendedprice", 2)).alias("sum_price"),
        )
    )


@register(
    "q_pivot_wide",
    oracle=f"""
    SELECT l_linestatus,
           {dsum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_a,
           {dsum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_n,
           {dsum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_r
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="Long→wide pivot with a fixed value list (no discovery job): one "
    "hash-aggregate pass emitting all pivot cells — the relational analogue "
    "of op_pivot_setpoints_to_rows (fox_hfm_parser.py:407-479).",
)
def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.expr(dsum("l_quantity")))
        .withColumnsRenamed({"A": "qty_a", "N": "qty_n", "R": "qty_r"})
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    """,
    doc="Wide→long unpivot (melt): narrow per-row explode, no shuffle at all.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = load_table(spark, sf_dir, "part").withColumn(
        "p_size", F.col("p_size").cast("double")
    )
    return pt.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "q_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           {dsum('l_quantity')} AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit grouping sets (neither rollup nor cube): three groupings "
    "computed in one expand+shuffle pass instead of three scans + union.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.expr(dsum("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS q25,
           ROUND(quantile_cont(l_quantity, 0.50), 6) AS q50,
           ROUND(quantile_cont(l_quantity, 0.75), 6) AS q75
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (sort-based within group); "
    "the approx_percentile sketch is the 100 TB path when exactness can be "
    "traded (engine-specific, so the exact variant carries the oracle).",
)
def q_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 6).alias("q50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("q75"),
    )


# md5-based bucket: portable across Spark (CONV) and DuckDB (0x cast), so the
# sampled set is engine-identical — the property that makes hash sampling
# reproducible across reruns, engines, and cluster sizes (unlike RAND()).
_BUCKET_SPARK = (
    "CAST(CONV(SUBSTRING(MD5(CAST(event_id AS STRING)), 1, 8), 16, 10)"
    " AS BIGINT) % 100"
)
_BUCKET_DUCK = (
    "CAST(('0x' || SUBSTRING(MD5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 100"
)


@register(
    "q_deterministic_sample",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_sampled,
           {dsum('value')} AS sum_value
    FROM events
    WHERE {_BUCKET_DUCK} < 10
    GROUP BY event_type
    """,
    doc="Deterministic 10% hash sample (md5 bucket of the row key): "
    "reproducible across engines/reruns/cluster sizes, embarrassingly "
    "parallel, no coordination — the scale-safe sampling primitive "
    "(RAND()-based sampling is none of these).",
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.expr(_BUCKET_SPARK) < 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.expr(dsum("value")).alias("sum_value"),
        )
    )


#: GK accuracy parameter -> rank guarantee: for percentile p over n rows,
#: the returned value's rank interval must intersect
#: [floor((p-eps)n), ceil((p+eps)n)] with eps = 1/accuracy.
APPROX_PCT_ACCURACY = 10000
#: HLL relative standard deviation passed to approx_count_distinct; the
#: certificate band below allows 5x that (the estimate is deterministic
#: for a given dataset — register MAX merges are order-independent — so
#: the boolean is stable across partitionings and reruns).
APPROX_CD_RSD = 0.02


@register(
    "q_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           TRUE AS q25_band_ok, TRUE AS q50_band_ok, TRUE AS q75_band_ok,
           TRUE AS acd_band_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Approximate percentiles via Spark's Greenwald-Khanna sketch plus "
    "an HLL distinct count (mergeable, single pass, bounded memory — the "
    "100 TB path where q_percentile_exact's per-group sort is not worth "
    "the exactness), VALUE-CHECKED as a certificate: the output carries "
    "the exact group counts plus booleans asserting each sketch met its "
    "published contract — every GK percentile's rank interval intersects "
    "the +/-(1/accuracy)*n guarantee band (computed Spark-side against "
    "the exact per-group CDF; ANY valid GK merge order satisfies it, so "
    "the boolean survives repartitioning even though the raw sketch "
    "values need not), and the HLL estimate lands within 5x its "
    "configured rsd of the exact distinct count.  The oracle supplies "
    "the exact counts and TRUE literals — the q_lsh_recall "
    "checked-against-ground-truth pattern (sketch internals stay "
    "engine-specific; the contract is what's portable).  The CDF used "
    "for rank verification is |groups| x |distinct quantities| (~50 "
    "values), so the certificate costs one small window + broadcast "
    "join on top of the sketches at any scale.",
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    # ONE sketch per group (array percentile form): three separate
    # percentile_approx calls build three GK sketches over the same column
    # — measured 2.15x the single-sketch cost at sf0.1.
    #
    # The EXACT countDistinct lives in its OWN aggregate: mixing a
    # DISTINCT aggregate with percentile_approx triggers Catalyst's
    # multi-distinct EXPAND rewrite, which funnels every expanded row
    # through the GK merge path — measured 28.5 s vs 2.5 s for the sketch
    # aggregate alone at sf0.1 (round-8 cold-bench finding; the warm
    # cross-invocation cache had masked it).  Two scans + a group-sized
    # join cost ~2 s total.
    sk = li.groupBy("l_returnflag").agg(
        F.expr(
            f"percentile_approx(l_quantity, array(0.25, 0.5, 0.75),"
            f" {APPROX_PCT_ACCURACY})"
        ).alias("_qs"),
        F.expr(f"approx_count_distinct(l_partkey, {APPROX_CD_RSD})").alias(
            "_acd"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ex = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )
    # |groups| rows, TWO consumers (pv carries n_rows through the
    # posexplode so the band check never reads agg a second time; final
    # select is the other) — NOT persisted: under the cold policy the
    # persist's materialization barrier costs more than it saves
    # (interleaved min-of-4 A/B at sf0.1: 1.12 s unpersisted vs 1.20 s
    # persisted vs 1.41 s for the r8 three-consumer persisted shape; a
    # grouping-sets merge of the exact-distinct and CDF scans was also
    # measured and lost, 1.76 s — the Expand doubling beats the scan it
    # saves).
    agg = sk.join(ex, "l_returnflag")
    # exact CDF over the distinct quantity values (~50 per group): rank
    # interval of value v in its group is [cum - c + 1, cum]
    cdf = (
        li.groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "cum",
            F.sum("c").over(
                W.partitionBy("l_returnflag").orderBy("l_quantity")
            ),
        )
    )
    # percentile_approx returns actual data values, so each approx value
    # joins one CDF row exactly; the approx side is |groups| x 3 rows —
    # broadcast it into the (also small) CDF.  Both frames descend from
    # the same lineitem scan, so the group key is RENAMED on the probe
    # side — joining cdf.l_returnflag == pv.l_returnflag would resolve
    # both sides to the same attribute (Spark warns "trivially true
    # equals predicate") and silently drop the group equality.
    pv = agg.select(
        F.col("l_returnflag").alias("_g"),
        "n_rows",
        F.posexplode("_qs").alias("_i", "_v"),
    ).selectExpr(
        "_g",
        "_v",
        "n_rows",
        "ELEMENT_AT(ARRAY(0.25, 0.5, 0.75), _i + 1) AS p",
    )
    eps = 1.0 / APPROX_PCT_ACCURACY
    band_ok = (
        cdf.join(
            F.broadcast(pv),
            (F.col("l_returnflag") == F.col("_g"))
            & (F.col("l_quantity") == F.col("_v")),
        )
        .select(
            "l_returnflag",
            "p",
            F.col("cum").alias("rank_hi"),
            (F.col("cum") - F.col("c") + 1).alias("rank_lo"),
            "n_rows",
        )
        .withColumn(
            "ok",
            (
                F.col("rank_hi")
                >= F.floor((F.col("p") - F.lit(eps)) * F.col("n_rows"))
            )
            & (
                F.col("rank_lo")
                <= F.ceil((F.col("p") + F.lit(eps)) * F.col("n_rows"))
            ),
        )
        .groupBy("l_returnflag")
        .pivot("p", [0.25, 0.5, 0.75])
        .agg(F.first("ok"))
        .withColumnRenamed("0.25", "q25_band_ok")
        .withColumnRenamed("0.5", "q50_band_ok")
        .withColumnRenamed("0.75", "q75_band_ok")
    )
    return (
        agg.join(F.broadcast(band_ok), "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            F.col("n_parts").cast("bigint").alias("n_parts"),
            "q25_band_ok",
            "q50_band_ok",
            "q75_band_ok",
            (
                F.abs(F.col("_acd") - F.col("n_parts"))
                <= F.lit(5.0 * APPROX_CD_RSD) * F.col("n_parts")
            ).alias("acd_band_ok"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_zscore_anomaly",
    priority=1,
    oracle="""
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             stddev_pop(value) AS sigma,
             COUNT(*) AS n
      FROM events
      GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE ROUND(abs(e.value - s.mu) - 3 * s.sigma, 9) > 0
    """,
    doc="Per-key z-score anomaly flags: one aggregation builds the "
    "per-event_type mean/stddev table (|keys| rows, broadcast back), one "
    "map-side pass flags |value - mu| > 3 sigma.  Two scans, zero "
    "data-sized shuffles on the flagging side — the streaming-friendly "
    "outlier gate shape.  zscore rounded to 4 (not 6): the division "
    "amplifies the one-ulp stddev_pop difference between engines.  The "
    "3-sigma boundary test itself is rounded to 9 decimals in BOTH engines "
    "so a value within one ulp of the threshold lands on the same side.",
)
def q_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(
            F.round(
                F.abs(F.col("value") - F.col("mu")) - 3 * F.col("sigma"), 9
            )
            > 0
        )
        .select(
            "event_id",
            "event_type",
            "value",
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4).alias(
                "zscore"
            ),
        )
    )


@register(
    "q_stratified_sample",
    priority=1,
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           {dsum('value')} AS sum_value
    FROM events
    WHERE {_BUCKET_DUCK} < CASE event_type
        WHEN 'error' THEN 50 WHEN 'purchase' THEN 20 ELSE 5 END
    GROUP BY event_type
    """,
    doc="Stratified deterministic sampling: per-stratum rates (50% errors, "
    "20% purchases, 5% rest) applied through the same portable md5-bucket "
    "predicate as q_deterministic_sample — reproducible across engines, "
    "reruns, and cluster sizes, embarrassingly parallel, no coordination.  "
    "The standard class-rebalancing primitive for training-data curation.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rate = (
        F.when(F.col("event_type") == "error", 50)
        .when(F.col("event_type") == "purchase", 20)
        .otherwise(5)
    )
    return (
        ev.filter(F.expr(_BUCKET_SPARK) < rate)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.expr(dsum("value")).alias("sum_value"),
        )
    )


@register(
    "q_seq_packing",
    priority=1,
    oracle="""
    WITH t AS (
      SELECT doc_id, doc_id % 32 AS shard,
             len(string_split_regex(trim(text), ' +')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum_before
      FROM t
    )
    SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
           cum_before // 2048 AS seq_start,
           cum_before % 2048 AS seq_offset,
           (cum_before + n_tokens - 1) // 2048
             - cum_before // 2048 + 1 AS seqs_spanned
    FROM c
    """,
    doc="Training-sequence packing accounting (concat-and-chunk): documents "
    "are concatenated in deterministic order within a hash shard and cut "
    "into fixed 2048-token sequences; each doc gets its sequence index, "
    "intra-sequence offset, and span count from ONE partitioned running "
    "sum — no per-sequence loop, no driver state.  Shards (doc_id % 32) "
    "bound every window to a partition, so packing a 100 TB corpus is 32+ "
    "independent sorted streams (scale shards with the cluster); the "
    "output is exactly the manifest a data loader needs to slice packed "
    "training batches.",
)
def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.pmod("doc_id", F.lit(32)).alias("shard"),
        F.size(F.split(F.trim("text"), " +")).alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_before",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
    )
    return c.select(
        "doc_id",
        "shard",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.expr("cum_before DIV 2048").alias("seq_start"),
        (F.col("cum_before") % 2048).alias("seq_offset"),
        F.expr(
            "(cum_before + n_tokens - 1) DIV 2048"
            " - cum_before DIV 2048 + 1"
        ).alias("seqs_spanned"),
    )


@register(
    "q_training_shuffle",
    priority=1,
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hv
      FROM documents
    )
    SELECT doc_id, hv % 64 AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY hv % 64
                                   ORDER BY hv, doc_id) AS BIGINT) AS pos
    FROM h
    """,
    doc="Deterministic global training shuffle: md5(doc_id) orders the "
    "corpus pseudo-randomly and assigns each doc a shard (hash % 64) and "
    "position within the shard — one hash per row plus a per-shard window "
    "sort, no global ordering anywhere.  Reproducible across engines, "
    "reruns, and cluster sizes (the property a training run needs to "
    "resume mid-epoch); shards are written/read independently, so the "
    "shuffle of a 100 TB corpus is 64 parallel sorted writes.",
)
def q_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.expr(
            "CAST(CONV(SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT)"
        ).alias("hv"),
    )
    w = W.partitionBy(F.col("hv") % 64).orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        (F.col("hv") % 64).alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


#: shared regression read-out: identical double-arithmetic expression text
#: evaluated by both engines over bit-identical (n, sx, sy, sxx, sxy, syy).
_LINREG_READOUT = """
       CAST(n AS DOUBLE) AS n_points,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
           AS intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
"""
#: Spark twin of _LINREG_READOUT: ANSI mode makes a bare / THROW when the
#: variance term is zero (a group whose x never varies — e.g. one point),
#: killing the whole job; try_divide returns NULL there and is the exact
#: same double division otherwise.  DuckDB's / already yields NULL on a
#: zero double divisor, so the twins agree row-for-row on degenerate
#: groups too (tests/test_ansi_division.py pins both properties).  The
#: final `/ n` stays bare: n = COUNT(*) >= 1 by construction.  A tuple of
#: one expression per output column (NOT one comma-joined blob split back
#: apart at the call site — a reformat that moves a comma would silently
#: split inside try_divide and hand selectExpr invalid fragments).
_LINREG_READOUT_SPARK = (
    "CAST(n AS DOUBLE) AS n_points",
    "try_divide((n * sxy - sx * sy), (n * sxx - sx * sx)) AS slope",
    "(sy - try_divide((n * sxy - sx * sy), (n * sxx - sx * sx)) * sx) / n"
    " AS intercept",
    "try_divide(((n * sxy - sx * sy) * (n * sxy - sx * sy)),"
    " ((n * sxx - sx * sx) * (n * syy - sy * sy))) AS r2",
)


@register(
    "q_linreg_trend",
    oracle=f"""
    WITH pts AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 1000000 AS DOUBLE) AS x,
               value AS y
        FROM events
    ),
    sums AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(CAST(SUM(CAST(x AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(x * y AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sxy,
               CAST(CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS syy
        FROM pts GROUP BY event_type
    )
    SELECT event_type, {_LINREG_READOUT}
    FROM sums ORDER BY event_type
    """,
    doc="Distributed least-squares trend (value vs event-time seconds) per "
    "event_type via the sufficient-statistics decomposition: ONE pass "
    "accumulates (n, Σx, Σy, Σx², Σxy, Σy²) — six mergeable sums, the "
    "same partial-aggregate algebra Spark uses map-side — and slope/"
    "intercept/r² are closed-form read-outs. Spark's own regr_slope "
    "accumulates in doubles (order-dependent, irreproducible across "
    "engines); here each product is one deterministic double rounding, the "
    "sums are exact DECIMAL, and the decimal→double read-out goes through "
    "the exact decimal STRING (strtod/parseDouble are correctly rounded; "
    "a direct wide-decimal→double cast is not, in either engine), so both "
    "engines agree on every output "
    "bit. At 100 TB this shape is why regression-per-group is cheap: the "
    "shuffle carries six numbers per group, never the points.",
)
def q_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000 AS DOUBLE)"
        ).alias("x"),
        F.col("value").alias("y"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.expr("CAST(CAST(SUM(CAST(x AS DECIMAL(38,4))) AS STRING) AS DOUBLE)").alias("sx"),
        F.expr("CAST(CAST(SUM(CAST(y AS DECIMAL(38,6))) AS STRING) AS DOUBLE)").alias("sy"),
        F.expr(
            "CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,2))) AS STRING) AS DOUBLE)"
        ).alias("sxx"),
        F.expr(
            "CAST(CAST(SUM(CAST(x * y AS DECIMAL(38,4))) AS STRING) AS DOUBLE)"
        ).alias("sxy"),
        F.expr(
            "CAST(CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS STRING) AS DOUBLE)"
        ).alias("syy"),
    )
    return sums.selectExpr(
        "event_type", *_LINREG_READOUT_SPARK
    ).orderBy("event_type")


#: 52 exact uniform bits for the weighted-sample key (same scaling trick as
#: the KMV sketch: /2^52 is a pure exponent shift, bit-identical anywhere).
#: +0.5 shifts the lattice into (0,1) — h+0.5 is exactly representable for
#: h < 2^52, and u=0 (which LN below cannot take) becomes impossible.
_WS_U_SPARK = (
    "(CAST(CONV(SUBSTRING(MD5(CONCAT('wsamp:', CAST(doc_id AS STRING))), 1,"
    " 13), 16, 10) AS DOUBLE) + 0.5) / 4503599627370496"
)
_WS_U_DUCK = (
    "(CAST(CAST(('0x' || SUBSTRING(MD5('wsamp:' || CAST(doc_id AS VARCHAR)),"
    " 1, 13)) AS BIGINT) AS DOUBLE) + 0.5) / 4503599627370496"
)
_WS_K = 10


@register(
    "q_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT lang, doc_id, n_chars,
             LN({_WS_U_DUCK}) / n_chars AS k
      FROM documents
    ),
    ranked AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY k DESC, doc_id) AS rk
      FROM keyed
    )
    SELECT lang, rk, doc_id, n_chars
    FROM ranked WHERE rk <= {_WS_K}
    """,
    doc=f"Deterministic WEIGHTED sampling without replacement (Efraimidis-"
    f"Spiliotopoulos A-ES): per-document key ln(u)/w — the order-"
    "preserving log form of u^(1/w), used because ln is correctly rounded "
    "in both engines while pow's rounding is only 1-ulp guaranteed — with "
    "w = n_chars and u a 52-bit md5 uniform shifted into (0,1); the top-k "
    "keys per language are an exact "
    "weighted sample — inclusion probability proportional to weight — "
    "computed as one window over independently-keyed rows.  Reproducible "
    "across engines, reruns, and cluster sizes (RAND()-based weighted "
    "sampling is none of these), and mergeable: the top-k of a union is "
    "the top-k of per-part top-ks, so at 100 TB this runs as a "
    "TakeOrdered-style partial aggregation with no global sort.  The "
    "size-biased sample is the standard curation primitive for building "
    "length-balanced training mixes.",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        # try_divide: an empty document (n_chars = 0) must not kill the
        # sample job; NULL key ranks last (desc) = excluded, matching the
        # oracle's native /0 NULL
        F.expr(f"try_divide(LN({_WS_U_SPARK}), n_chars)").alias("k"),
    )
    w = W.partitionBy("lang").orderBy(F.col("k").desc(), "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _WS_K)
        .select("lang", "rk", "doc_id", "n_chars")
    )


#: correlation-matrix columns (lineitem numeric measures)
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_sums(engine: str) -> list[str]:
    """The mergeable sufficient statistics for all pairwise correlations:
    n, Σc and Σc² per column, Σab per pair — each accumulated as an exact
    HI/LO BIGINT FIXED-POINT pair instead of a wide DECIMAL sum.

    Why: Spark's SUM(DECIMAL(38,_)) leaves the codegen fast path
    (measured 0.3 s PER SUM over 600 k rows — 15 sums cost 3.7 s at
    sf0.1), while pure 64-bit integer pipelines run at double-sum speed
    (0.4 s for all 15, a 10× win).  Each addend x becomes
    p = trunc(x·10⁶) — one deterministic double multiply then integer
    truncation, identical in both engines for the NON-NEGATIVE measures
    here (Spark's double→BIGINT cast truncates; DuckDB's rounds, so its
    text goes through trunc() first; every p ≤ 1.44e16 < 2^54 is exactly
    representable, so both engines truncate the same double).  p splits
    as hi = p div 10⁹, lo = p % 10⁹ — integer ops — so both running SUMs
    fit signed 64-bit out to ~10¹¹ rows per group.  The exact total
    hi·10⁹ + lo is recombined ONCE per group in DECIMAL(38,0), read out
    through its decimal string (strtod is correctly rounded everywhere;
    a direct wide-decimal→double cast is not), and unscaled by /10⁶.
    The statistic is thus "sum of inputs truncated at 6 decimal places"
    — deterministic, mergeable, bit-identical in both engines."""
    cast_str, intdiv = (
        ("STRING", "div") if engine == "spark" else ("VARCHAR", "//")
    )

    def fxsum(expr: str, alias: str) -> str:
        if engine == "spark":
            p = f"CAST(({expr}) * 1000000.0 AS BIGINT)"
        else:
            p = f"CAST(trunc(({expr}) * 1000000.0) AS BIGINT)"
        return (
            f"CAST(CAST(CAST(SUM({p} {intdiv} 1000000000) AS DECIMAL(38,0))"
            f" * 1000000000 + SUM({p} % 1000000000)"
            f" AS {cast_str}) AS DOUBLE) / 1000000.0 AS {alias}"
        )

    out = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for i, c in enumerate(_CORR_COLS):
        out.append(fxsum(c, f"s_{i}"))
        out.append(fxsum(f"{c} * {c}", f"ss_{i}"))
    for i in range(len(_CORR_COLS)):
        for j in range(i + 1, len(_CORR_COLS)):
            out.append(
                fxsum(f"{_CORR_COLS[i]} * {_CORR_COLS[j]}", f"sp_{i}_{j}")
            )
    return out


def _corr_readout(i: int, j: int) -> str:
    """Identical double-expression text on both engines (sqrt is correctly
    rounded by IEEE in both JVMs and libm, so the read-out is bit-stable).
    Each variance factor is GREATEST-clamped at 0 (the q_anomaly_seasonal
    NaN-sigma class, 4th live instance — found by the strengthened
    tools/audit_variance_clamp.py): a (near-)constant measure column
    cancels n*ss - s*s slightly negative in doubles, and unclamped the
    engines fail differently (Spark NaN corr rows vs a DuckDB sqrt
    error).  Clamped, a constant column divides by 0 -> NULL on both."""
    return (
        f"(n * sp_{i}_{j} - s_{i} * s_{j})"
        f" / sqrt(GREATEST(n * ss_{i} - s_{i} * s_{i}, 0)"
        f" * GREATEST(n * ss_{j} - s_{j} * s_{j}, 0))"
    )


def _corr_readout_spark(i: int, j: int) -> str:
    """Spark twin of :func:`_corr_readout`: try_divide instead of a bare /
    — in ANSI mode a constant column (zero variance → zero denominator)
    would otherwise kill the whole job; DuckDB's / yields NULL on a zero
    double divisor, so the twins agree on degenerate columns too."""
    return (
        f"try_divide((n * sp_{i}_{j} - s_{i} * s_{j}),"
        f" sqrt(GREATEST(n * ss_{i} - s_{i} * s_{i}, 0)"
        f" * GREATEST(n * ss_{j} - s_{j} * s_{j}, 0)))"
    )


@register(
    "q_corr_matrix",
    oracle=f"""
    WITH sums AS (
        SELECT {", ".join(_corr_sums("duck"))} FROM lineitem
    )
    {" UNION ALL ".join(
        f"SELECT '{_CORR_COLS[i]}' AS col_a, '{_CORR_COLS[j]}' AS col_b,"
        f" {_corr_readout(i, j)} AS corr FROM sums"
        for i in range(len(_CORR_COLS))
        for j in range(i + 1, len(_CORR_COLS))
    )}
    ORDER BY col_a, col_b
    """,
    doc="Full pairwise Pearson correlation matrix of the lineitem measures "
    "from ONE pass of mergeable sufficient statistics (n, Σc, Σc², Σab) — "
    "15 exact-decimal sums whose partial states merge map-side, so at "
    "100 TB the shuffle carries fifteen numbers total, never the rows "
    "(Spark's own corr() accumulates in doubles and is order-dependent). "
    "Read-outs go through the exact decimal string and identical "
    "expression text on both engines; sqrt is IEEE-correctly-rounded "
    "everywhere, so every correlation agrees to the last bit.  The "
    "feature-screening primitive run before any model fit.",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sums = li.selectExpr(*_CORR_COLS).agg(
        *[F.expr(e.rsplit(" AS ", 1)[0]).alias(e.rsplit(" AS ", 1)[1])
          for e in _corr_sums("spark")]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(_CORR_COLS[i]).alias("col_a"),
                F.lit(_CORR_COLS[j]).alias("col_b"),
                F.expr(_corr_readout_spark(i, j)).alias("corr"),
            )
            for i in range(len(_CORR_COLS))
            for j in range(i + 1, len(_CORR_COLS))
        ]
    )
    return (
        sums.select(F.explode(pairs).alias("_p"))
        .select("_p.col_a", "_p.col_b", "_p.corr")
        .orderBy("col_a", "col_b")
    )


#: negative-sampling fan-out: attempts per user and negatives kept
_NEG_ATTEMPTS = 8
_NEG_KEEP = 3
_NEG_H_SPARK = (
    "CAST(CONV(SUBSTRING(MD5(CONCAT('neg:', CAST(user_id AS STRING), ':',"
    " CAST(attempt AS STRING))), 1, 13), 16, 10) AS BIGINT)"
)
_NEG_H_DUCK = (
    "CAST(CAST(('0x' || SUBSTRING(MD5('neg:' || CAST(user_id AS VARCHAR)"
    " || ':' || CAST(attempt AS VARCHAR)), 1, 13)) AS BIGINT) AS BIGINT)"
)


@register(
    "q_negative_sampling",
    oracle=f"""
    WITH positives AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS item
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    np AS (SELECT COUNT(*) AS n_parts FROM part),
    attempts AS (
      SELECT p.user_id, t.attempt,
             {_NEG_H_DUCK} % np.n_parts + 1 AS item
      FROM (SELECT DISTINCT user_id FROM positives) p
      CROSS JOIN np
      CROSS JOIN (SELECT unnest(generate_series(0, {_NEG_ATTEMPTS - 1}))
                  AS attempt) t
    ),
    negs AS (
      SELECT a.user_id, a.attempt, a.item
      FROM attempts a
      LEFT JOIN positives pos
        ON pos.user_id = a.user_id AND pos.item = a.item
      WHERE pos.item IS NULL
    )
    SELECT user_id, rank, neg_item FROM (
      SELECT user_id, item AS neg_item,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY attempt) AS rank
      FROM negs
    ) WHERE rank <= {_NEG_KEEP}
    """,
    doc="Deterministic NEGATIVE SAMPLING for recommender/contrastive "
    f"training pairs: for every user with purchases, {_NEG_ATTEMPTS} "
    "md5-derived candidate items are drawn, the user's true positives "
    "are removed by an anti join, and the first "
    f"{_NEG_KEEP} surviving attempts become the negatives — reproducible "
    "across engines, reruns, and cluster sizes (RAND() sampling is "
    "none of those), with collision handling that keeps the per-user "
    "negative count stable instead of silently shrinking.  Shuffles: "
    "one distinct over positives (reused by the anti join) and the "
    "per-user window; candidate generation is a codegen explode.",
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    positives = (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item"),
        )
        .distinct()
    )
    np_row = load_table(spark, sf_dir, "part").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    attempts = (
        positives.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(np_row))
        .select(
            "user_id",
            "n_parts",
            F.explode(
                F.sequence(F.lit(0), F.lit(_NEG_ATTEMPTS - 1))
            ).alias("attempt"),
        )
        .select(
            "user_id",
            "attempt",
            (F.expr(_NEG_H_SPARK) % F.col("n_parts") + 1).alias("item"),
        )
    )
    negs = attempts.join(positives, ["user_id", "item"], "left_anti")
    w = W.partitionBy("user_id").orderBy("attempt")
    return (
        negs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _NEG_KEEP)
        .select("user_id", "rank", F.col("item").alias("neg_item"))
    )


@register(
    "q_ntile_binning",
    priority=1,  # deliberate round-5 window spill: same check class as
    # driver-green q_window_distribution (r3)
    oracle="""
    WITH binned AS (
      SELECT p_brand, p_retailprice,
             NTILE(10) OVER (PARTITION BY p_brand
                             ORDER BY p_retailprice, p_partkey) AS decile
      FROM part
    )
    SELECT p_brand AS brand, decile,
           COUNT(*) AS n_parts,
           MIN(p_retailprice) AS lo,
           MAX(p_retailprice) AS hi
    FROM binned
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Quantile feature binning: NTILE(10) assigns each part its within-"
    "brand price decile — the discretization step that turns a continuous "
    "feature into a categorical one for GBDT/embedding-table training, "
    "and the exact counterpart of the approx-quantile bucketing the "
    "z-order writer samples.  The unique (price, partkey) tie-break makes "
    "bin membership deterministic on any engine/partitioning; MIN/MAX "
    "per bin double as the bin-edge table a serving layer would export.  "
    "One window over brand partitions, one (brand × 10)-row rollup.",
)
def q_ntile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return (
        part.select(
            "p_brand", "p_retailprice", F.ntile(10).over(w).alias("decile")
        )
        .groupBy(F.col("p_brand").alias("brand"), "decile")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_retailprice").alias("lo"),
            F.max("p_retailprice").alias("hi"),
        )
        .orderBy("brand", "decile")
    )


#: 52-bit md5 uniform in (0,1) keyed by segment (the weighted-sample
#: idiom: +0.5 shifts the lattice off 0 so ln stays finite)
_DP_U_SPARK = (
    "(CAST(CONV(SUBSTRING(MD5(CONCAT('dp:', c_mktsegment)), 1, 13),"
    " 16, 10) AS DOUBLE) + 0.5) / 4503599627370496"
)
_DP_U_DUCK = (
    "(CAST(CAST(('0x' || SUBSTRING(MD5('dp:' || c_mktsegment), 1, 13))"
    " AS BIGINT) AS DOUBLE) + 0.5) / 4503599627370496"
)
#: Laplace(b=2) via inverse CDF — identical text on both engines; SIGN/LN/
#: ABS are correctly rounded, so the noise double is bit-identical
_DP_NOISE = "-2.0 * SIGN(u - 0.5) * LN(1.0 - 2.0 * ABS(u - 0.5))"


@register(
    "q_dp_counts",
    oracle=f"""
    WITH agg AS (
      SELECT c_mktsegment AS segment, COUNT(*) AS n_true,
             {_DP_U_DUCK} AS u
      FROM customer GROUP BY c_mktsegment
    )
    SELECT segment, n_true,
           ROUND(n_true + {_DP_NOISE}, 6) AS noisy_count
    FROM agg ORDER BY segment
    """,
    doc="Differentially-private count release (Laplace mechanism, ε=0.5 → "
    "b=2): per-segment counts plus inverse-CDF Laplace noise drawn from a "
    "keyed md5 uniform — the deterministic-noise trick that makes a DP "
    "release REPRODUCIBLE across engines, reruns, and cluster sizes "
    "(RNG-based noise is unauditable; hash-derived noise can be "
    "re-derived by an auditor holding the release key).  One aggregation "
    "shuffle; the noise is O(groups) post-processing.  The oracle "
    "re-derives the identical noise, so parity proves the mechanism "
    "end-to-end (n_true is emitted here only for that verification; a "
    "production release would drop it).",
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    agg = cu.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    # u depends only on the group key, so compute it post-aggregation on
    # |groups| rows (alias the key back to its source name for the shared
    # expression text)
    u_expr = _DP_U_SPARK.replace("c_mktsegment", "segment")
    return (
        agg.selectExpr("segment", "n_true", f"{u_expr} AS u")
        .selectExpr(
            "segment",
            "n_true",
            f"ROUND(n_true + {_DP_NOISE}, 6) AS noisy_count",
        )
        .orderBy("segment")
    )


BOOT_B = 32
#: deterministic replicate membership from ONE md5 per row: the digest's
#: 32 hex nibbles are 32 independent 4-bit uniforms, and replicate b takes
#: the row when nibble b < 8 (a fair coin).  One hash per row instead of
#: one per (row, replicate) — 32x less hashing on the 100 TB fact side.
_BOOT_H_SPARK = "MD5(CONCAT('boot:', CAST(event_id AS STRING)))"
_BOOT_H_DUCK = "MD5('boot:' || CAST(event_id AS VARCHAR))"
_BOOT_IN_SPARK = (
    "CAST(CONV(SUBSTRING(h, b + 1, 1), 16, 10) AS BIGINT) < 8"
)
_BOOT_IN_DUCK = (
    "CAST(('0x' || SUBSTRING(h, b + 1, 1)) AS BIGINT) < 8"
)
#: identical-text readouts over EXACT integer microunit sums (s, ssq are
#: BIGINT; every double op below is deterministic IEEE on identical
#: operands).  No ROUND: rounding a replicate-mean rational (denominator =
#: replicate count) sits exactly on a half-microunit boundary with
#: probability ~1/n — the cross-engine ROUND/decimal-cast trap that bit
#: q_seasonal_decompose at sf0.1.
_BOOT_MEAN_READOUT = (
    "CAST(s AS DOUBLE) / CAST(1000000 AS DOUBLE) / n AS boot_mean"
)
#: GREATEST clamp (same class as q_anomaly_seasonal's fixed NaN-sigma
#: gap): when every replicate mean is identical the true variance is 0
#: but ssq - s*s/n can cancel slightly NEGATIVE in doubles — Spark SQRT
#: would emit a NaN boot_sd row while DuckDB sqrt(negative) throws, so
#: the engines wouldn't even fail the same way.  Clamped identically in
#: both texts (this constant feeds both), a degenerate group reads 0.
_BOOT_SD_READOUT = (
    "SQRT(GREATEST(CAST(ssq AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 0)"
    " / (n - 1)) / CAST(1000000 AS DOUBLE) AS boot_sd"
)
#: replicate mean quantized to integer microunits: one deterministic IEEE
#: multiply + floor on a bit-identical double, then exact BIGINT sums.
_BOOT_MM = "CAST(FLOOR(m * CAST(1000000 AS DOUBLE)) AS BIGINT)"


@register(
    "q_bootstrap_ci",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, value, {_BOOT_H_DUCK} AS h FROM events
    ),
    reps AS (
      SELECT e.event_type, b.b, e.value
      FROM ev e JOIN (SELECT unnest(range({BOOT_B})) AS b) b
        ON {_BOOT_IN_DUCK}
    ),
    rep_means AS (
      SELECT event_type, b, {davg('value', 6)} AS m
      FROM reps GROUP BY 1, 2
    ),
    micro AS (
      SELECT event_type, {_BOOT_MM} AS mm FROM rep_means
    ),
    stats AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(mm) AS BIGINT) AS s,
             SUM(CAST(mm AS DECIMAL(38,0)) * mm) AS ssq
      FROM micro GROUP BY 1
    )
    SELECT event_type, n AS n_replicates,
           {_BOOT_MEAN_READOUT},
           {_BOOT_SD_READOUT}
    FROM stats ORDER BY event_type
    """,
    doc=f"Distributed subsample bootstrap: {BOOT_B} deterministic half-"
    "samples per group (membership = keyed md5 coin per (row, replicate) "
    "— reproducible on any engine/partitioning, unlike RNG resampling), "
    "each reduced to an exact-decimal mean, then the spread of replicate "
    "means estimates the statistic's sampling variability — the "
    "poor-man's confidence interval that actually scales: explode ×B, "
    "one (group, replicate) aggregate, one |groups|-row reduce, all "
    "partial-aggregatable.  The n/2 subsample variant (vs Poisson "
    "resampling) keeps membership a single comparison; its variance "
    "inflation is a known constant the doc-reader can correct for.",
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "value", f"{_BOOT_H_SPARK} AS h"
    )
    # membership expansion as explode(sequence) + WHERE rather than a
    # theta join against a broadcast replicate-id range (round 13): the
    # emitted (event_type, b, value) rows are IDENTICAL — the membership
    # predicate is the same text the oracle uses — with both the x B
    # fan-out (Generate) and the hex-digit coin running in whole-stage
    # codegen.  NOT filter(sequence, b -> coin): higher-order functions
    # are CodegenFallback, and the interpreted per-row lambda measured
    # SLOWER than the BroadcastNestedLoopJoin it replaced.
    reps = ev.select(
        "event_type",
        "value",
        "h",
        F.explode(F.expr(f"sequence(0, {BOOT_B - 1})")).alias("b"),
    ).where(F.expr(_BOOT_IN_SPARK)).drop("h")
    rep_means = reps.groupBy("event_type", "b").agg(
        F.expr(davg("value", 6)).alias("m")
    )
    micro = rep_means.selectExpr("event_type", f"{_BOOT_MM} AS mm")
    # ssq accumulates through DECIMAL(38,0): mm*mm as a BIGINT multiply
    # wraps silently in Spark's non-ANSI mode once a replicate mean
    # reaches ~537 units (floor(537e6)^2 * 32 reps ~ int64 max) while
    # DuckDB raises — the decimal path is exact on both engines and the
    # readout casts it back to DOUBLE (_BOOT_SD_READOUT).
    stats = micro.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mm").alias("s"),
        F.expr("SUM(CAST(mm AS DECIMAL(38,0)) * mm)").alias("ssq"),
    )
    return stats.selectExpr(
        "event_type",
        "n AS n_replicates",
        _BOOT_MEAN_READOUT,
        _BOOT_SD_READOUT,
    ).orderBy("event_type")


KANON_K = 5
#: class-size bucket, shared expression text (sz is the class size)
_KANON_BUCKET = (
    "CASE WHEN sz = 1 THEN '1 (unique)' WHEN sz < 5 THEN '2-4'"
    " WHEN sz < 10 THEN '5-9' ELSE '10+' END"
)


@register(
    "q_kanonymity",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz
      FROM customer GROUP BY 1, 2
    )
    SELECT {_KANON_BUCKET} AS size_bucket,
           COUNT(*) AS n_classes,
           CAST(SUM(sz) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN sz < {KANON_K} THEN sz ELSE 0 END) AS BIGINT)
             AS n_below_k
    FROM classes
    GROUP BY 1
    ORDER BY 1
    """,
    doc=f"k-anonymity audit over the quasi-identifier pair (nation, "
    f"segment): every equivalence class smaller than k={KANON_K} is a "
    "re-identification risk, and this emits the class-size histogram "
    "plus the row count still below k — the release-gate report that "
    "decides whether a dataset needs further generalization or "
    "suppression before publication (the privacy sibling of "
    "q_dp_counts/q_user_purge/q_pii_redact).  One aggregation shuffle "
    "keyed by the quasi-identifiers, then a 4-row rollup — at 100 TB "
    "the class table is bounded by the quasi-identifier domain, not the "
    "row count.",
)
def q_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    classes = cu.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        classes.selectExpr(f"{_KANON_BUCKET} AS size_bucket", "sz")
        .groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("sz").cast("bigint").alias("n_rows"),
            F.sum(
                F.when(F.col("sz") < KANON_K, F.col("sz")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_below_k"),
        )
        .orderBy("size_bucket")
    )


#: per-cell MI term from integer counts — identical readout text; counts
#: are exact, the doubles they produce are identical, ln is correctly
#: rounded, and the cell terms sum in exact decimal
_MI_TERM = (
    "(CAST(n_xy AS DOUBLE) / n) *"
    " LN((CAST(n_xy AS DOUBLE) * n) / (CAST(n_x AS DOUBLE) * n_y))"
)


@register(
    "q_mutual_information",
    oracle=f"""
    WITH joint AS (
      SELECT e.event_type AS x, c.c_mktsegment AS y, COUNT(*) AS n_xy
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1, 2
    ),
    mx AS (SELECT x, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM joint GROUP BY x),
    my AS (SELECT y, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM joint GROUP BY y),
    tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM joint),
    cells AS (
      SELECT j.x, j.y, j.n_xy, mx.n_x, my.n_y, tot.n
      FROM joint j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
    )
    SELECT COUNT(*) AS n_cells,
           ROUND({dsum(_MI_TERM, 9)}, 6) AS mi_nats
    FROM cells
    """,
    doc="Mutual information I(event_type; market segment) in nats — the "
    "dependence screen run before any feature is admitted to a training "
    "set (near-zero MI = drop the feature; high MI against a protected "
    "attribute = fairness flag).  The joint-count table is one "
    "aggregation; marginals and the total REUSE it (no second fact "
    "scan), so the fact table is read once and everything downstream is "
    "|X|x|Y| rows.  Cell terms are doubles derived from exact integer "
    "counts through shared expression text and summed in exact decimal "
    "— bit-identical cross-engine.",
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cu = load_table(spark, sf_dir, "customer")
    joint = (
        ev.join(F.broadcast(cu), ev.user_id == cu.c_custkey)
        .groupBy(
            F.col("event_type").alias("x"),
            F.col("c_mktsegment").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .localCheckpoint(eager=True)  # reused by marginals + cells
    )
    mx = joint.groupBy("x").agg(F.sum("n_xy").cast("bigint").alias("n_x"))
    my = joint.groupBy("y").agg(F.sum("n_xy").cast("bigint").alias("n_y"))
    tot = joint.groupBy().agg(F.sum("n_xy").cast("bigint").alias("n"))
    cells = (
        joint.join(mx, "x").join(my, "y").crossJoin(F.broadcast(tot))
    )
    return cells.selectExpr(
        "x", "y", "n_xy", "n_x", "n_y", "n"
    ).groupBy().agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.expr(dsum(_MI_TERM, 9)), 6).alias("mi_nats"),
    )


@register(
    "q_skyline_2d",
    oracle="""
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
        AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice)
    )
    ORDER BY p.p_partkey
    """,
    doc="2-D skyline (Pareto frontier: maximize p_size, minimize "
    "p_retailprice) without the O(n^2) dominance self-join the oracle's "
    "NOT EXISTS literally states.  Physical plan: (1) bucket parts by "
    "floor(price) and aggregate each bucket's max size — |buckets| rows; "
    "(2) the running best-size over strictly-cheaper buckets becomes a "
    "tiny dominance-bound dim (every point in a cheaper bucket has "
    "strictly lower price, so bound >= my size proves domination); "
    "(3) broadcast anti-join prunes the full table to the per-bucket "
    "frontier candidates — survivors are ~|skyline| + bucket-edge noise, "
    "orders of magnitude below n; (4) the exact strict-dominance "
    "anti-join runs only on the pruned survivor set, with the small side "
    "broadcast.  Stages 1-3 are one scan + one tiny agg; only the "
    "final exact pass is quadratic, on a set whose size is governed by "
    "the skyline (expected O(log n) for independent dims).  Degenerate "
    "single-bucket price distributions would shrink the prune; recursive "
    "re-bucketing on finer quantiles is the standard escalation.",
)
def q_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    pb = part.withColumn(
        "bucket", F.floor("p_retailprice").cast("bigint")
    )
    # per-bucket max size -> running best over strictly-cheaper buckets.
    # |buckets| ~ price range (~100 rows): aggregate per bucket in the
    # cluster, then the cumulative max over this TINY frame is computed
    # with a per-bucket self-join (b2 < b) instead of a global-order
    # window, keeping every stage partition-parallel.
    bmax = pb.groupBy("bucket").agg(F.max("p_size").alias("mx"))
    bound = (
        bmax.alias("a")
        .join(
            F.broadcast(bmax.alias("b")),
            F.col("b.bucket") < F.col("a.bucket"),
            "left",
        )
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.max(F.col("b.mx")).alias("best_cheaper"))
    )
    survivors = (
        pb.join(F.broadcast(bound), "bucket", "left")
        .filter(
            F.col("best_cheaper").isNull()
            | (F.col("p_size") > F.col("best_cheaper"))
        )
        .select("p_partkey", "p_size", "p_retailprice")
        .persist()  # bucket-pruned candidate set, consumed by BOTH sides
        # of the domination self-join (multi-consumer rule)
    )
    s2 = survivors.select(
        F.col("p_size").alias("q_size"),
        F.col("p_retailprice").alias("q_price"),
    )
    dominated = (
        (F.col("q_size") >= F.col("p_size"))
        & (F.col("q_price") <= F.col("p_retailprice"))
        & (
            (F.col("q_size") > F.col("p_size"))
            | (F.col("q_price") < F.col("p_retailprice"))
        )
    )
    return survivors.join(
        F.broadcast(s2), dominated, "left_anti"
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# A/B experiment analysis with CUPED variance reduction
# ---------------------------------------------------------------------------

#: portable deterministic 50/50 assignment — same md5 bucket family as
#: q_deterministic_sample, so the split is identical on any engine/run
_AB_GROUP_SPARK = (
    "CAST(CONV(SUBSTRING(MD5(CONCAT('ab:', CAST(user_id AS STRING))), 1, 8),"
    " 16, 10) AS BIGINT) % 2"
)
_AB_GROUP_DUCK = (
    "CAST(('0x' || SUBSTRING(MD5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))"
    " AS BIGINT) % 2"
)
#: CUPED theta and mean-pre from pooled sufficient statistics — IDENTICAL
#: readout text on both engines (sx/sy/sxx/sxy are exact-decimal sums)
#: zero-variance pre-period (all users identical covariate) would divide
#: by zero — theta degrades to 0 explicitly (adjusted = post), the same
#: make-the-guard-explicit discipline as q_top_movers' denominator
_AB_THETA = (
    "(CASE WHEN (sxx - sx * sx / n) = 0.0 THEN 0.0"
    " ELSE (sxy - sx * sy / n) / (sxx - sx * sx / n) END)"
)
_AB_ADJ = f"(post - {_AB_THETA} * (pre - sx / n))"


@register(
    "q_abtest_cuped",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             COALESCE({dsum("CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'"
                            " THEN value END", 6)}, 0.0) AS pre,
             COALESCE({dsum("CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'"
                            " THEN value END", 6)}, 0.0) AS post
      FROM events GROUP BY user_id
    ),
    assigned AS (
      SELECT user_id, pre, post, {_AB_GROUP_DUCK} AS grp FROM per_user
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             {dsum('pre', 6)} AS sx, {dsum('post', 6)} AS sy,
             {dsum('pre * pre', 6)} AS sxx, {dsum('pre * post', 6)} AS sxy
      FROM assigned
    ),
    adj AS (
      SELECT grp, post, {_AB_ADJ} AS adjusted
      FROM assigned CROSS JOIN stats
    )
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           {dsum('post', 6)} / COUNT(*) AS mean_post,
           {dsum('adjusted', 6)} / COUNT(*) AS mean_adjusted,
           {dsum('post * post', 6)} / COUNT(*)
                 - ({dsum('post', 6)} / COUNT(*))
                   * ({dsum('post', 6)} / COUNT(*)) AS var_post,
           {dsum('adjusted * adjusted', 6)} / COUNT(*)
                 - ({dsum('adjusted', 6)} / COUNT(*))
                   * ({dsum('adjusted', 6)} / COUNT(*)) AS var_adjusted
    FROM adj GROUP BY grp ORDER BY grp
    """,
    doc="A/B experiment readout with CUPED variance reduction — the "
    "modern experimentation-platform workload: users split 50/50 by a "
    "PORTABLE md5 hash (reproducible across engines, runs, and cluster "
    "sizes — the property rand() assignment lacks), outcome = post-period "
    "revenue, covariate = pre-period revenue, and the CUPED adjustment "
    "post - theta*(pre - mean_pre) computed from POOLED exact-decimal "
    "sufficient statistics (one extra 1-row broadcast — no second scan).  "
    "var_adjusted < var_post by construction when pre correlates with "
    "post, which is the entire point: smaller variance = smaller "
    "detectable effect at the same sample size.  Plan: one user-keyed "
    "aggregation (the only data-sized shuffle), a 1-row stats aggregate "
    "broadcast back, a map-only adjustment, and a 2-row group readout.  "
    "Every double appears in identical expression text on both engines; "
    "theta's two divisions are correctly-rounded IEEE ops.",
)
def q_abtest_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "COALESCE("
            + dsum(
                "CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'"
                " THEN value END",
                6,
            )
            + ", 0.0)"
        ).alias("pre"),
        F.expr(
            "COALESCE("
            + dsum(
                "CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'"
                " THEN value END",
                6,
            )
            + ", 0.0)"
        ).alias("post"),
    )
    assigned = per_user.selectExpr(
        "user_id", "pre", "post", f"{_AB_GROUP_SPARK} AS grp"
    )
    stats = assigned.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(dsum("pre", 6)).alias("sx"),
        F.expr(dsum("post", 6)).alias("sy"),
        F.expr(dsum("pre * pre", 6)).alias("sxx"),
        F.expr(dsum("pre * post", 6)).alias("sxy"),
    )
    adj = assigned.crossJoin(F.broadcast(stats)).selectExpr(
        "grp", "post", f"{_AB_ADJ} AS adjusted"
    )
    return (
        adj.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            # raw identical-text readouts, no ROUND: the means are
            # small-denominator rationals (microunit sums / COUNT) that
            # can land exactly on half-microunit boundaries where the
            # engines' ROUND pipelines disagree (the q_seasonal_decompose
            # class); the raw IEEE ops on identical operands are
            # bit-identical everywhere.
            F.expr(f"{dsum('post', 6)} / COUNT(*)").alias("mean_post"),
            F.expr(f"{dsum('adjusted', 6)} / COUNT(*)").alias(
                "mean_adjusted"
            ),
            F.expr(
                f"{dsum('post * post', 6)} / COUNT(*)"
                f" - ({dsum('post', 6)} / COUNT(*))"
                f" * ({dsum('post', 6)} / COUNT(*))"
            ).alias("var_post"),
            F.expr(
                f"{dsum('adjusted * adjusted', 6)} / COUNT(*)"
                f" - ({dsum('adjusted', 6)} / COUNT(*))"
                f" * ({dsum('adjusted', 6)} / COUNT(*))"
            ).alias("var_adjusted"),
        )
        .orderBy("grp")
    )
