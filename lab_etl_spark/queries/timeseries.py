"""Event-time queries over ``events`` (SURVEY.md §2B): tumbling and session
windows (batch form of the streaming operators), as-of alignment, and linear
interpolation onto a regular grid.

The tumbling/session queries use the same `window()`/`session_window()`
expressions the Structured Streaming versions use (streaming/), so the batch
oracle check validates the streaming semantics too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.interpolation import interpolate_to_grid
from . import register
from .exact import davg, dsum


@register(
    "q_stream_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {dsum('value', 6)} AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="Tumbling 1h event-time windows per event_type (batch form of the "
    "streaming tumbling aggregation).",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_stream_session",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           {dsum('value', 6)} AS sum_value
    FROM sess
    GROUP BY user_id, sid
    """,
    doc="Session windows (30 min gap) per user via session_window(); oracle "
    "reconstructs sessions with gaps-and-islands. A new session starts when "
    "the gap is >= the timeout (Spark merges only strictly-overlapping "
    "[ts, ts+gap) windows).",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_stream_sliding",
    oracle=f"""
    WITH slides AS (
      SELECT unnest(generate_series(0, 1)) AS k
    ),
    assigned AS (
      SELECT date_trunc('hour', ts - k * INTERVAL 30 MINUTE)
               + k * INTERVAL 30 MINUTE AS window_start,
             event_type, value
      FROM events, slides
      WHERE ts >= date_trunc('hour', ts - k * INTERVAL 30 MINUTE)
                  + k * INTERVAL 30 MINUTE
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {dsum('value', 6)} AS sum_value
    FROM assigned
    GROUP BY 1, 2, 3
    """,
    doc="Sliding 1h windows every 30min (each event lands in 2 windows) — "
    "batch form of the streaming sliding aggregation; oracle replicates "
    "Spark's window assignment arithmetic.",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_asof_align",
    oracle="""
    SELECT event_id, user_id, ts, prev_click_ts,
           epoch_us(ts) - epoch_us(prev_click_ts) AS gap_us
    FROM (
      SELECT event_id, user_id, ts, event_type,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_click_ts
      FROM events
    )
    WHERE event_type = 'purchase'
    """,
    doc="As-of (backward) alignment: each purchase joined to the user's most "
    "recent strictly-prior click — one window pass, no range join. "
    "Generalizes the reference's time_shift alignment (docs/mcc.md).",
)
def q_asof_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_click = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("prev_click_ts", prev_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            "prev_click_ts",
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("prev_click_ts").cast("timestamp"))
            ).alias("gap_us"),
        )
    )


@register(
    "q_interp_linear",
    oracle="""
    WITH series AS (
      SELECT ts, value FROM events WHERE event_type = 'view'
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1 FROM series
    ),
    grid AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts FROM bounds
    ),
    pts AS (
      SELECT ts AS _ts, CAST(value AS DOUBLE) AS _val, 0 AS _is_grid FROM series
      UNION ALL
      SELECT ts, NULL, 1 FROM grid
    ),
    win AS (
      SELECT _ts, _is_grid,
        LAST_VALUE(_val IGNORE NULLS) OVER wp AS prev_val,
        LAST_VALUE(CASE WHEN _is_grid = 0 THEN _ts END IGNORE NULLS) OVER wp AS prev_ts,
        FIRST_VALUE(_val IGNORE NULLS) OVER wn AS next_val,
        FIRST_VALUE(CASE WHEN _is_grid = 0 THEN _ts END IGNORE NULLS) OVER wn AS next_ts
      FROM pts
      WINDOW
        wp AS (ORDER BY _ts, _is_grid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (ORDER BY _ts, _is_grid
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT _ts AS ts,
           ROUND(CASE WHEN prev_ts = next_ts THEN prev_val
                 ELSE prev_val + (next_val - prev_val)
                      * (CAST(epoch_us(_ts) - epoch_us(prev_ts) AS DOUBLE)
                         / CAST(epoch_us(next_ts) - epoch_us(prev_ts) AS DOUBLE))
                 END, 6) AS interp_value
    FROM win
    WHERE _is_grid = 1
    """,
    doc="Linear interpolation of the 'view' value series onto an hourly grid "
    "— window-only formulation of the reference's np.interp resample "
    "(bruker_ftir_parser.py:74-86).",
)
def q_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    series = ev.filter(F.col("event_type") == "view").select("ts", "value")
    bounds = series.agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("t0"),
        F.max("ts").alias("t1"),
    )
    grid = bounds.select(
        F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("ts")
    )
    return interpolate_to_grid(series, grid)


@register(
    "q_interp_by_key",
    oracle="""
    WITH series AS (
      SELECT event_type, ts, value FROM events
    ),
    bounds AS (
      SELECT event_type, date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1
      FROM series GROUP BY 1
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts
      FROM bounds
    ),
    pts AS (
      SELECT event_type, ts AS _ts, CAST(value AS DOUBLE) AS _val,
             0 AS _is_grid
      FROM series
      UNION ALL
      SELECT event_type, ts, NULL, 1 FROM grid
    ),
    win AS (
      SELECT event_type, _ts, _is_grid,
        LAST_VALUE(_val IGNORE NULLS) OVER wp AS prev_val,
        LAST_VALUE(CASE WHEN _is_grid = 0 THEN _ts END IGNORE NULLS)
          OVER wp AS prev_ts,
        FIRST_VALUE(_val IGNORE NULLS) OVER wn AS next_val,
        FIRST_VALUE(CASE WHEN _is_grid = 0 THEN _ts END IGNORE NULLS)
          OVER wn AS next_ts
      FROM pts
      WINDOW
        wp AS (PARTITION BY event_type ORDER BY _ts, _is_grid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY event_type ORDER BY _ts, _is_grid
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, _ts AS ts,
           ROUND(CASE WHEN prev_ts = next_ts THEN prev_val
                 ELSE prev_val + (next_val - prev_val)
                      * (CAST(epoch_us(_ts) - epoch_us(prev_ts) AS DOUBLE)
                         / CAST(epoch_us(next_ts) - epoch_us(prev_ts) AS DOUBLE))
                 END, 6) AS interp_value
    FROM win
    WHERE _is_grid = 1
    """,
    doc="Per-key linear interpolation: each event_type's value series onto "
    "its own hourly grid via partitioned cumulative windows — the 100 TB "
    "scale path for op_interp_resample (bruker_ftir_parser.py:74-86): "
    "window state stays local to the series partition, no global sort.",
)
def q_interp_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    series = ev.select("event_type", "ts", "value")
    bounds = series.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("t0"),
        F.max("ts").alias("t1"),
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("ts"),
    )
    return interpolate_to_grid(series, grid, part_cols=["event_type"])


@register(
    "q_stream_stateful_ewma",
    # The stateful fold IS SQL-expressible as an order-identical
    # list_reduce: the operator computes `0.3*x + (1.0-0.3)*acc` per event
    # in ts order (first value seeds the accumulator — list_reduce's
    # no-initial semantics), and both engines constant-fold (1.0-0.3) to
    # the same double, so every intermediate is bit-identical.  Valid
    # because the driver's events table is ONE file → one micro-batch →
    # a single globally-ts-sorted fold; cross-batch state carry-over is
    # separately pinned by tests/test_streaming_multimodal.py.
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           list_reduce(list(value ORDER BY ts),
                       (acc, x) -> 0.3 * x + (1.0 - 0.3) * acc) AS ewma
    FROM events GROUP BY user_id
    """,
    bench=False,  # drains a streaming query; not a plan-timing benchmark
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user EWMA of value with O(1) state per key carried across "
    "micro-batches, drained via availableNow. Value-checked against a "
    "sequential list_reduce oracle (identical fold order and float "
    "arithmetic), not just rows-only; multi-batch state carry-over is "
    "pinned by tests/test_streaming_multimodal.py.",
)
def q_stream_stateful_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import (
        final_state,
        run_available_now,
        stream_events,
        user_value_ewma,
    )

    # Fixed name: run_available_now drops any previous drain's memory table
    # first, so repeated invocations don't leak temp views.
    name = "q_ewma_mem"
    # final_state: an update sink holds one row per key per micro-batch;
    # reduce to the max-n_events (final) row so correctness never depends
    # on the drain being a single batch (ADVICE r10).
    return final_state(
        run_available_now(
            user_value_ewma(stream_events(spark, sf_dir), alpha=0.3),
            name,
            output_mode="update",
        )
    )


@register(
    "q_stream_running_stats",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events,
           {dsum('value', 6)} AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY user_id
    """,
    bench=False,  # drains a streaming query; not a plan-timing benchmark
    doc="Arbitrary-state streaming running stats (streaming/jobs.py "
    "user_running_stats): per-user running count/sum/min/max with O(1) "
    "state per key carried across micro-batches, drained via "
    "availableNow.  Engine path is capability-gated: Spark 4's "
    "transformWithState API (named typed ValueState column families, "
    "TTL, timers) when the runtime carries its protobuf dependency, "
    "else the applyInPandasWithState fold — BOTH paths share one exact "
    "fold (_running_stats_fold) and are bit-identical by construction; "
    "this container lacks the protobuf wheel, so the driver exercises "
    "the legacy path and the tws path is pinned by a documented-skip "
    "test (test_running_stats_tws_api).  The double sum is accumulated "
    "as an exact 6-dp decimal (string-carried state), so output is "
    "bit-identical for ANY batch arrival order and the oracle is plain "
    "dsum algebra; multi-batch state carry-over is pinned by "
    "tests/test_streaming_multimodal.py::"
    "test_running_stats_batch_invariant.",
)
def q_stream_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import (
        final_state,
        run_available_now,
        stream_events,
        user_running_stats,
    )

    name = "q_running_stats_mem"
    # final_state: an update sink holds one row per key per micro-batch;
    # reduce to the max-n_events (final) row so correctness never depends
    # on the drain being a single batch (ADVICE r10).
    return final_state(
        run_available_now(
            user_running_stats(stream_events(spark, sf_dir)),
            name,
            output_mode="update",
        )
    )


@register(
    "q_interval_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.ts AS click_ts,
           p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    doc="Event-time interval join (purchase attributed to a prior click by "
    "the same user within 1h) — the batch twin of the stream-stream join "
    "in streaming/jobs.py purchase_after_click; equality of the two modes "
    "is pinned by tests/test_streaming_multimodal.py.",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import purchase_after_click

    ev = load_table(spark, sf_dir, "events")
    return purchase_after_click(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


@register(
    "q_hierarchical_rollup",
    oracle=f"""
    WITH minute AS (
      SELECT event_type,
             date_trunc('minute', ts) AS m_ts,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(30,6))) AS dv
      FROM events GROUP BY 1, 2
    ),
    hour AS (
      SELECT event_type, date_trunc('hour', m_ts) AS h_ts,
             SUM(n) AS n, SUM(dv) AS dv
      FROM minute GROUP BY 1, 2
    ),
    day AS (
      SELECT event_type, date_trunc('day', h_ts) AS d_ts,
             SUM(n) AS n, SUM(dv) AS dv
      FROM hour GROUP BY 1, 2
    )
    SELECT 'hour' AS level, event_type, h_ts AS bucket_ts,
           CAST(n AS BIGINT) AS n_events, CAST(dv AS DOUBLE) AS sum_value
    FROM hour
    UNION ALL
    SELECT 'day' AS level, event_type, d_ts AS bucket_ts,
           CAST(n AS BIGINT) AS n_events, CAST(dv AS DOUBLE) AS sum_value
    FROM day
    """,
    doc="Hypertable-style continuous aggregate: minute-level partials are "
    "computed once and RE-aggregated into hour and day levels via GROUPING "
    "SETS (sums of decimal sums are exact), instead of re-scanning raw "
    "events per resolution — at 100 TB the raw scan happens once "
    "STRUCTURALLY (one FileScan in the plan), coarser levels aggregate "
    "~1/60th and ~1/1440th of the rows, and the Expand doubling applies "
    "only to the already-minute-sized partials.",
)
def q_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = F.expr("CAST(value AS DECIMAL(30,6))")
    minute = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("m_ts")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(dec).alias("dv"))
    # Hour and day levels in ONE grouping-sets pass over the minute
    # partials.  The r8 shape (hour frame persisted, day re-aggregating
    # it) paid the persist materialization cold and — because the hour
    # branch and the day branch canonicalize differently under the union —
    # got no ReusedExchange, so dropping the persist alone would re-scan
    # raw events twice (wrong at 100 TB even though it times fine at
    # sf0.1).  Grouping sets keep the single structural scan AND drop the
    # persist: interleaved min-of-4 cold A/B at sf0.1: 0.59 s vs 1.14 s
    # persisted; executed plan has exactly one FileScan, Expand sits
    # above the minute aggregate (x2 on ~minute-count rows, not raw).
    mm = minute.select(
        "event_type",
        F.date_trunc("hour", "m_ts").alias("h_ts"),
        F.date_trunc("day", "m_ts").alias("d_ts"),
        "n",
        "dv",
    )
    lv = (
        mm.groupingSets(
            [["event_type", "h_ts"], ["event_type", "d_ts"]],
            "event_type",
            "h_ts",
            "d_ts",
        ).agg(
            F.sum("n").alias("n"),
            F.sum("dv").alias("dv"),
            F.grouping_id().alias("_gid"),
        )
    )
    # grouping_id bit order is (event_type, h_ts, d_ts): the hour set
    # aggregates d_ts away -> 0b001, the day set h_ts -> 0b010.
    return lv.select(
        F.when(F.col("_gid") == 1, F.lit("hour"))
        .otherwise(F.lit("day"))
        .alias("level"),
        "event_type",
        F.coalesce("h_ts", "d_ts").cast("timestamp_ntz").alias("bucket_ts"),
        F.col("n").alias("n_events"),
        F.col("dv").cast("double").alias("sum_value"),
    )


@register(
    "q_asof_join",
    priority=1,
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.ts AS asof_ts, r.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc="Two-table as-of join (each click annotated with the user's most "
    "recent prior error): implemented as operators/asof.py "
    "asof_join_backward — union + one key-partitioned window pass with "
    "ignorenulls forward-fill, O(n+m) rows and a single shuffle, instead of "
    "the range-join + argmax formulation whose intermediate pair count is "
    "O(n·m) per key.  The DuckDB oracle is the engine-native ASOF LEFT "
    "JOIN, so the cross-engine check pins the exact at-or-before matching "
    "semantics including no-match NULLs.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    out = asof_join_backward(
        clicks, errors, by=["user_id"], ts="ts", r_cols=["ts", "value"]
    )
    return out.select(
        "event_id", "user_id", "ts", "value",
        F.col("asof_ts"), F.col("asof_value"),
    )


@register(
    "q_funnel",
    priority=1,
    oracle="""
    WITH f AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events
      GROUP BY user_id
    ),
    staged AS (
      SELECT user_id,
             CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s_view,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view
                  THEN 1 ELSE 0 END AS s_click,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view
                       AND t_purchase > t_click
                  THEN 1 ELSE 0 END AS s_purchase
      FROM f
    )
    SELECT CAST(SUM(s_view) AS BIGINT) AS n_view,
           CAST(SUM(s_click) AS BIGINT) AS n_click_after_view,
           CAST(SUM(s_purchase) AS BIGINT) AS n_purchase_after_click,
           COUNT(*) AS n_users
    FROM staged
    """,
    doc="Ordered conversion funnel (view -> click -> purchase): per-user "
    "first-event times via one conditional aggregation — a single shuffle "
    "on user_id for the whole funnel, never an n-way self-join of the "
    "events table (the naive formulation joins events to itself once per "
    "stage: at 100 TB that is stages× the scan and shuffle volume).  "
    "Strict ordering (> not >=) keeps the stage predicate unambiguous in "
    "both engines.",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(
            F.when(F.col("event_type") == etype, F.col("ts"))
        )

    f = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s_view = F.when(F.col("t_view").isNotNull(), 1).otherwise(0)
    reached_click = F.col("t_view").isNotNull() & (
        F.col("t_click") > F.col("t_view")
    )
    s_click = F.when(reached_click, 1).otherwise(0)
    s_purchase = F.when(
        reached_click & (F.col("t_purchase") > F.col("t_click")), 1
    ).otherwise(0)
    return f.select(
        s_view.alias("s_view"),
        s_click.alias("s_click"),
        s_purchase.alias("s_purchase"),
    ).agg(
        F.sum("s_view").alias("n_view"),
        F.sum("s_click").alias("n_click_after_view"),
        F.sum("s_purchase").alias("n_purchase_after_click"),
        F.count(F.lit(1)).alias("n_users"),
    )


@register(
    "q_sessionize",
    priority=1,
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR CAST(floor(epoch(ts)) AS BIGINT)
                          - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
                          > 1800
                  THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    ),
    per_session AS (
      SELECT user_id, sid, COUNT(*) AS n
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(MAX(n) AS BIGINT) AS max_session_events
    FROM per_session
    GROUP BY user_id
    """,
    doc="Gap-based sessionization (30-min inactivity threshold) built from "
    "window primitives: lag -> new-session flag -> running sum = session "
    "id, then two aggregations.  One shuffle on user_id serves the lag, "
    "the running sum, AND the per-session aggregation (the sort/partition "
    "is reused); the batch twin of session_window with an explicit, "
    "portable construction both engines execute identically.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import session_stats

    ev = load_table(spark, sf_dir, "events")
    return session_stats(
        ev.select("user_id", "ts", "event_id"), gap_s=1800
    )


@register(
    "q_retention",
    priority=1,
    oracle="""
    WITH firstday AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firstday f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM activity
    GROUP BY 1, 2
    """,
    doc="Cohort retention: users bucketed by first-seen day, counted per "
    "day-offset of later activity.  The cohort table is one aggregation of "
    "the events scan (|users| rows, not |events|); the join back is left "
    "un-hinted so AQE picks broadcast when the cohort table fits and a "
    "sort-merge/shuffle-hash join when |users| is billions — a forced "
    "broadcast hint would bypass the size check and OOM at 100 TB.  The "
    "distinct-activity set shuffles once on user_id.  The standard "
    "DAU-retention matrix, engine-portable via date arithmetic only.",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firstday = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    activity = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .join(firstday, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("d", "cohort_day").alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort_day").cast("string").alias("cohort_day"), "day_offset"
    ).agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "q_interarrival",
    priority=1,
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id, event_type
                                             ORDER BY ts, event_id)) AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(gap_s, 0.50), 6) AS p50_s,
           ROUND(quantile_cont(gap_s, 0.95), 6) AS p95_s
    FROM gaps
    GROUP BY event_type
    """,
    doc="Inter-arrival-time distribution per event type: per-(user, type) "
    "lag gaps from one partitioned window pass, then exact interpolated "
    "p50/p95 per type.  The workload-characterization query behind "
    "watermark and session-gap tuning — these percentiles ARE the inputs "
    "to choosing the streaming job's lateness budget.",
)
def q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("double")
    gap = sec - F.lag(sec).over(w)
    gaps = ev.select("event_type", gap.alias("gap_s"))
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        F.round(F.expr("percentile(gap_s, 0.50)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(gap_s, 0.95)"), 6).alias("p95_s"),
    )


@register(
    "q_stream_hourly_users",
    priority=1,
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1
    """,
    doc="Distinct users per event-time hour — the batch twin of the "
    "streaming hourly-uniques job (streaming/jobs.py hourly_unique_users): "
    "identical window expression, so this oracle check validates the "
    "streaming semantics.  In streaming mode the same result comes from "
    "watermarked dropDuplicates(user, window) + count — exact distinct "
    "with state bounded by the watermark horizon, the standard pattern "
    "when HLL sketch error is not acceptable.",
)
def q_stream_hourly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_users", "n_events"
        )
    )


EWMA_LAGS = 30

#: denominator for the fixed-point read-out: weights are 2^(29-k) over a
#: 2^30 base, values are micro-unit integers → /(2^30 · 1e6).  The constant
#: is an integer < 2^53, so its double is exact and the single final IEEE
#: division is identical in both engines.
_EWMA_DENOM = float((1 << 30) * 1_000_000)

_EWMA_ORACLE = f"""
WITH seq AS (
    SELECT event_id, user_id, value,
           CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vmicro,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
),
contrib AS (
    -- NULL values contribute zero weight (COALESCE matches the Spark
    -- fold's coalesce(x, 0L)): a missing measurement decays the average
    -- instead of poisoning it or silently carrying the previous value
    SELECT a.event_id, a.user_id, a.value,
           COALESCE(b.vmicro, 0) * (1 << (29 - (a.rn - b.rn))) AS c
    FROM seq a JOIN seq b
      ON a.user_id = b.user_id
     AND b.rn BETWEEN a.rn - {EWMA_LAGS - 1} AND a.rn
)
SELECT event_id, user_id, value,
       CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / {_EWMA_DENOM!r} AS ewma
FROM contrib
GROUP BY event_id, user_id, value
ORDER BY event_id
"""


@register(
    "q_ewma_batch",
    oracle=_EWMA_ORACLE,
    doc="Deterministic batch EWMA per user: s_i = Σ_k value_{i-k} · 2^-(k+1) "
    "truncated at 30 lags. Exact fixed-point arithmetic makes it "
    "bit-reproducible across engines: values quantize to integer "
    "micro-units (one decimal cast, identical both sides), α=½ weights are "
    "integers 2^(29-k), the weighted sum stays in int64 (< 2^60 — exact), "
    "and ONE final double division reads it out. One window pass — an "
    "array of 30 lags folded with a (sum, weight) struct accumulator, all "
    "inside whole-stage codegen; no self-join, no Python. The untruncated "
    "recurrence is the streaming operator (q_stream_stateful_ewma, O(1) "
    "state); this is its oracle-checkable batch twin, the form a backfill "
    "job would use at 100 TB because it shuffles each user's series "
    "exactly once. NULL measurements contribute zero weight in both "
    "engines (pinned on a null-riddled corpus by "
    "tests/test_adversarial_corpus.py).",
)
def q_ewma_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "vmicro", F.expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lags = F.array(*[F.lag("vmicro", k).over(w) for k in range(EWMA_LAGS)])
    fold = f"""
    CAST(aggregate(
        lags,
        named_struct('s', 0L, 'w', {1 << 29}L),
        (acc, x) -> named_struct(
            's', acc.s + coalesce(x, 0L) * acc.w,
            'w', acc.w DIV 2L),
        acc -> acc.s) AS DOUBLE) / {_EWMA_DENOM!r}
    """
    return (
        ev.select("event_id", "user_id", "value", lags.alias("lags"))
        .select(
            "event_id", "user_id", "value", F.expr(fold).alias("ewma")
        )
        .orderBy("event_id")
    )


#: trailing-hour frame in event-time microseconds (inclusive of current row)
_HOUR_US = 3_600_000_000 - 1


@register(
    "q_rolling_1h",
    oracle=f"""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    doc="Trailing-1-hour per-user rolling count/sum via a RANGE window over "
    "event-time microseconds — the frame is defined by VALUE distance, not "
    "row count, so irregular event spacing is handled exactly (and ties "
    "into the frame are peer-inclusive identically in both engines). Sums "
    "accumulate in DECIMAL for order-free exactness. One shuffle on "
    "user_id; at 100 TB this is the standard sort-window plan, with "
    "range-frame evaluation O(n) per partition via two moving pointers.",
)
def q_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "tus", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-_HOUR_US, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .over(w)
            .cast("double")
            .alias("sum_1h"),
        )
        .orderBy("event_id")
    )


@register(
    "q_scd2_lookup",
    oracle=f"""
    WITH dim AS (
        SELECT user_id, ts, event_type AS state FROM events
        WHERE event_type != 'purchase'
    ),
    facts AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
        SELECT f.value, d.state
        FROM facts f ASOF LEFT JOIN dim d
          ON f.user_id = d.user_id AND f.ts >= d.ts
    )
    SELECT COALESCE(state, 'none') AS state,
           COUNT(*) AS n_purchases,
           {dsum('value', 6)} AS sum_value
    FROM matched GROUP BY 1 ORDER BY 1
    """,
    doc="Point-in-time dimension lookup — the read side of SCD2: every "
    "purchase is joined to the user's state AS OF the purchase instant "
    "(most recent non-purchase event at or before it; purchases before "
    "any state map to 'none'). Composed from the as-of operator "
    "(operators/asof.py): union + ONE key-partitioned window forward-"
    "fill — O(n+m) rows, no (fact × earlier-dim) pair blow-up, which is "
    "what makes point-in-time joins feasible when both sides are 100 TB "
    "fact/dimension histories. The oracle uses DuckDB's native ASOF "
    "JOIN, so two independent as-of implementations must agree exactly.",
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    dim = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "ts", F.col("event_type").alias("state")
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join_backward(
        facts, dim, by=["user_id"], ts="ts", r_cols=["state"]
    )
    return (
        joined.groupBy(
            F.coalesce("asof_state", F.lit("none")).alias("state")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.expr(dsum("value", 6)).alias("sum_value"),
        )
        .orderBy("state")
    )


#: minimum segment length on each side of a candidate changepoint
_CPT_MIN_SEG = 5

#: shared changepoint cost read-out — identical double-expression text on
#: both engines over exact-decimal prefix sums read out through their
#: string form (the q_linreg_trend discipline).  Cost of splitting after
#: row i = SSE(left) + SSE(right) with SSE = Σv² - (Σv)²/n.
_CPT_COST = (
    "(qd - sd * sd / i)"
    " + ((qtotd - qd) - (stotd - sd) * (stotd - sd) / (n - i))"
)


@register(
    "q_changepoint",
    oracle=f"""
    WITH ordered AS (
      SELECT event_type, ts, event_id, value,
             ROW_NUMBER() OVER w AS i,
             SUM(CAST(value AS DECIMAL(38,6))) OVER w AS scum,
             SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS qcum,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(CAST(value AS DECIMAL(38,6)))
               OVER (PARTITION BY event_type) AS stot,
             SUM(CAST(value * value AS DECIMAL(38,6)))
               OVER (PARTITION BY event_type) AS qtot
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    costs AS (
      SELECT event_type, ts, i0,
             {_CPT_COST} AS cost
      FROM (
        SELECT event_type, ts, i AS i0,
               CAST(CAST(scum AS VARCHAR) AS DOUBLE) AS sd,
               CAST(CAST(qcum AS VARCHAR) AS DOUBLE) AS qd,
               CAST(CAST(stot AS VARCHAR) AS DOUBLE) AS stotd,
               CAST(CAST(qtot AS VARCHAR) AS DOUBLE) AS qtotd,
               CAST(i AS DOUBLE) AS i,
               CAST(n AS DOUBLE) AS n
        FROM ordered
        WHERE i >= {_CPT_MIN_SEG} AND i <= n - {_CPT_MIN_SEG}
      )
    ),
    ranked AS (
      SELECT event_type, ts, i0 AS k, cost,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cost, i0) AS rk
      FROM costs
    )
    SELECT event_type, k, ts AS change_ts, ROUND(cost, 6) AS sse_cost
    FROM ranked WHERE rk = 1
    ORDER BY event_type
    """,
    doc="Optimal single CHANGEPOINT per event_type series: the split index "
    "k minimizing SSE(left)+SSE(right), found from exact-decimal prefix "
    "sums (Σv, Σv²) in ONE window pass — the dynamic program reduced to "
    "prefix sums, entirely in whole-stage codegen, no per-group Python "
    "and no quadratic split scan (each candidate's cost is O(1) from the "
    "cumulative sums).  Segment-length floor of "
    f"{_CPT_MIN_SEG} on both sides; deterministic (cost, k) tie-break.  "
    "Decimal sums are read out through their string form and the cost "
    "expression text is identical on both engines, so the argmin is "
    "bit-stable.  The sensor-drift / regime-shift detector of every "
    "instrument QA pipeline, at 100 TB cost = one partitioned window "
    "plus a per-group top-1.",
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wc = W.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wp = W.partitionBy("event_type")
    dec = "CAST(value AS DECIMAL(38,6))"
    dec2 = "CAST(value * value AS DECIMAL(38,6))"
    ordered = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("ts", "event_id")
        ).alias("i0"),
        F.sum(F.expr(dec)).over(wc).alias("scum"),
        F.sum(F.expr(dec2)).over(wc).alias("qcum"),
        F.count(F.lit(1)).over(wp).alias("n0"),
        F.sum(F.expr(dec)).over(wp).alias("stot"),
        F.sum(F.expr(dec2)).over(wp).alias("qtot"),
    )
    costs = (
        ordered.filter(
            (F.col("i0") >= _CPT_MIN_SEG)
            & (F.col("i0") <= F.col("n0") - _CPT_MIN_SEG)
        )
        .select(
            "event_type",
            "ts",
            "i0",
            F.expr("CAST(CAST(scum AS STRING) AS DOUBLE)").alias("sd"),
            F.expr("CAST(CAST(qcum AS STRING) AS DOUBLE)").alias("qd"),
            F.expr("CAST(CAST(stot AS STRING) AS DOUBLE)").alias("stotd"),
            F.expr("CAST(CAST(qtot AS STRING) AS DOUBLE)").alias("qtotd"),
            F.col("i0").cast("double").alias("i"),
            F.col("n0").cast("double").alias("n"),
        )
        .select(
            "event_type", "ts", "i0", F.expr(_CPT_COST).alias("cost")
        )
    )
    wr = W.partitionBy("event_type").orderBy("cost", "i0")
    return (
        costs.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("i0").alias("k"),
            F.col("ts").alias("change_ts"),
            F.round("cost", 6).alias("sse_cost"),
        )
        .orderBy("event_type")
    )


#: DTW oracle: the SAME O(n·m) dynamic program replayed as a DuckDB
#: wavefront recursion (anti-diagonal k = i+j).  A recursive CTE's working
#: table only holds the previous step, but cell (i,j) needs wavefronts
#: k-1 (up/left) AND k-2 (diagonal) — so each step CARRIES the k-1 rows
#: forward tagged 'old' alongside the freshly computed 'new' cells, and
#: every row expands to its successor contributions via one UNNEST (single
#: scan of the recursive table, as required).  Cell value =
#: cost + MIN(available predecessors) — missing boundary predecessors are
#: simply absent (= +inf), exactly like the kernel's dp initialization.
#: Float ops match the Pandas kernel bit-for-bit: abs() of the same
#: exact-decimal daily means, then one addition of the predecessor MIN.
_DTW_ORACLE = """
WITH RECURSIVE
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS STRING)
              AS DOUBLE) / COUNT(*) AS v
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
xs AS (
  SELECT event_type AS et,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         v AS x
  FROM daily
),
rs AS (
  SELECT row_number() OVER (ORDER BY day) AS j, v AS r
  FROM daily WHERE event_type = 'view'
),
bounds AS (
  SELECT et, MAX(i) AS n, (SELECT MAX(j) FROM rs) AS m
  FROM xs GROUP BY et
),
dp AS (
  SELECT et, 'new' AS tag, 0 AS i, 0 AS j, CAST(0.0 AS DOUBLE) AS v
  FROM bounds
  UNION ALL
  SELECT u.et,
         CASE WHEN u.tag2 = 'cand' THEN 'new' ELSE 'old' END AS tag,
         u.i, u.j,
         CASE WHEN u.tag2 = 'cand'
              THEN (SELECT abs(x.x - r.r) FROM xs x, rs r
                    WHERE x.et = u.et AND x.i = u.i AND r.j = u.j) + u.v
              ELSE u.v END AS v
  FROM (
    SELECT et, tag2, ci AS i, cj AS j, MIN(vv) AS v
    FROM (
      SELECT d.et, s.ci, s.cj, s.vv, s.tag2
      FROM dp d
      JOIN bounds b ON b.et = d.et,
      UNNEST(CASE WHEN d.tag = 'new' THEN
               [struct_pack(ci := d.i + 1, cj := d.j, vv := d.v,
                            tag2 := 'cand'),
                struct_pack(ci := d.i, cj := d.j + 1, vv := d.v,
                            tag2 := 'cand'),
                struct_pack(ci := d.i, cj := d.j, vv := d.v,
                            tag2 := 'carry')]
             ELSE
               [struct_pack(ci := d.i + 1, cj := d.j + 1, vv := d.v,
                            tag2 := 'cand')]
             END) AS t(s)
      WHERE (s.tag2 = 'cand'
             AND s.ci BETWEEN 1 AND b.n AND s.cj BETWEEN 1 AND b.m)
         OR (s.tag2 = 'carry' AND d.i + d.j + 1 < b.n + b.m)
    ) z
    GROUP BY et, tag2, ci, cj
  ) u
)
SELECT d.et AS event_type, b.n AS n_x, b.m AS n_ref,
       ROUND(d.v, 6) AS dtw
FROM dp d JOIN bounds b ON b.et = d.et
WHERE d.tag = 'new' AND d.i = b.n AND d.j = b.m
ORDER BY d.et
"""


@register(
    "q_dtw_distance",
    oracle=_DTW_ORACLE,
    bench=False,
    doc="Dynamic Time Warping distance from each event_type's daily-mean "
    "series to the 'view' reference series — the grouped-map "
    "``applyInPandas`` surface on its ONE legitimate use: a per-group "
    "O(n·m) dynamic program (optimal monotone alignment) that no "
    "composition of DataFrame operators expresses.  Everything around "
    "the DP stays JVM-side: daily means reduce exact-decimal in codegen, "
    "the constant-size reference series is replicated per group by a "
    "broadcast-style tiny cross join, and Python receives one Arrow "
    "batch per group containing two short aligned series.  At 100 TB "
    "the group count (series count) is the parallelism and the per-group "
    "payload stays bounded by the series length, not the corpus.  "
    "Promoted from rows-only to a FULL value oracle in round 5: DuckDB "
    "replays the identical DP as an anti-diagonal wavefront recursion "
    "(see _DTW_ORACLE) — even the grouped-map Pandas kernel is now "
    "hash-checked cell-for-cell, not waved through.",
)
def q_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.expr(
            "CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS STRING)"
            " AS DOUBLE) / COUNT(*)"
        ).alias("v")
    )
    x = daily.select("event_type", F.lit("x").alias("role"), "day", "v")
    ref_series = daily.filter(F.col("event_type") == "view").select(
        F.lit("ref").alias("role"), "day", "v"
    )
    types = daily.select("event_type").distinct()
    ref = types.crossJoin(F.broadcast(ref_series)).select(
        "event_type", "role", "day", "v"
    )
    both = x.unionAll(ref)

    def dtw(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        xs = pdf[pdf.role == "x"].sort_values("day").v.to_numpy()
        rs = pdf[pdf.role == "ref"].sort_values("day").v.to_numpy()
        n, m = len(xs), len(rs)
        dp = np.full((n + 1, m + 1), np.inf)
        dp[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                c = abs(xs[i - 1] - rs[j - 1])
                dp[i, j] = c + min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1])
        return pd.DataFrame(
            {
                "event_type": [pdf.event_type.iloc[0]],
                "n_x": [n],
                "n_ref": [m],
                # raw double; rounding happens in Spark SQL below so both
                # engines share ROUND's half-away semantics (Python's
                # round() is banker's — a silent cross-engine trap)
                "dtw": [float(dp[n, m])],
            }
        )

    return (
        both.groupBy("event_type")
        .applyInPandas(
            dtw, "event_type string, n_x long, n_ref long, dtw double"
        )
        .selectExpr(
            "event_type", "n_x", "n_ref", "ROUND(dtw, 6) AS dtw"
        )
        .orderBy("event_type")
    )


@register(
    "q_attribution",
    oracle=f"""
    WITH touched AS (
      SELECT event_type, value,
             COALESCE(LAST_VALUE(
               CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER w, 'none') AS last_touch,
             COALESCE(FIRST_VALUE(
               CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER w, 'none') AS first_touch
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    purchases AS (SELECT * FROM touched WHERE event_type = 'purchase')
    SELECT model, touch, COUNT(*) AS n_purchases,
           {dsum('value', 6)} AS revenue
    FROM (
      SELECT 'last_touch' AS model, last_touch AS touch, value
      FROM purchases
      UNION ALL
      SELECT 'first_touch', first_touch, value FROM purchases
    )
    GROUP BY model, touch
    ORDER BY model, touch
    """,
    doc="First-touch / last-touch revenue attribution: each purchase "
    "credits its value to the user's earliest and most recent prior "
    "non-purchase event type.  BOTH touch columns come from the SAME "
    "user-partitioned window pass (first_value / last_value IGNORE NULLS "
    "over the strictly-prior frame — the as-of alignment primitive of "
    "q_asof_align doing marketing analytics), so the whole model "
    "comparison costs one shuffle on user_id plus a tiny rollup.  Users "
    "whose purchase has no prior event land in the 'none' bucket rather "
    "than being dropped.",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    non_purchase = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    touched = ev.select(
        "event_type",
        "value",
        F.coalesce(
            F.last(non_purchase, ignorenulls=True).over(w), F.lit("none")
        ).alias("last_touch"),
        F.coalesce(
            F.first(non_purchase, ignorenulls=True).over(w), F.lit("none")
        ).alias("first_touch"),
    ).filter(F.col("event_type") == "purchase")
    stacked = touched.selectExpr(
        "stack(2, 'last_touch', last_touch, 'first_touch', first_touch)"
        " AS (model, touch)",
        "value",
    )
    return (
        stacked.groupBy("model", "touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.expr(dsum("value", 6)).alias("revenue"),
        )
        .orderBy("model", "touch")
    )


@register(
    "q_seasonal_decompose",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(FLOOR(({davg('value', 6)})
                        * CAST(1000000 AS DOUBLE)) AS BIGINT) AS hm
      FROM events
      GROUP BY 1, 2
    ),
    seasonal AS (
      SELECT event_type, hour(h) AS hour_of_day,
             COUNT(*) AS n_buckets,
             CAST(SUM(hm) AS BIGINT) AS sm
      FROM hourly GROUP BY 1, 2
    ),
    overall AS (
      SELECT event_type, COUNT(*) AS tn, CAST(SUM(hm) AS BIGINT) AS tm
      FROM hourly GROUP BY 1
    )
    SELECT s.event_type, s.hour_of_day, s.n_buckets,
           CAST(s.sm AS DOUBLE) / CAST(1000000 AS DOUBLE) / s.n_buckets
             AS seasonal_mean,
           CAST(s.sm AS DOUBLE) / CAST(1000000 AS DOUBLE) / s.n_buckets
             - CAST(o.tm AS DOUBLE) / CAST(1000000 AS DOUBLE) / o.tn
             AS seasonal_index
    FROM seasonal s JOIN overall o ON o.event_type = s.event_type
    ORDER BY s.event_type, s.hour_of_day
    """,
    doc="Additive seasonal decomposition of the event-value series: hourly "
    "bucket means, a per-(type, hour-of-day) seasonal profile over them, "
    "and the seasonal index as deviation from the type-level mean — the "
    "classic pre-forecasting decomposition (and the input q_date_spine_"
    "fill's gap handling feeds).  Determinism: level 1 is an exact-"
    "decimal mean of the 2-decimal source values (bit-identical double "
    "on both engines); level 2 re-accumulates the bucket means as FIXED-"
    "POINT INTEGER MICROUNITS — floor(hv * 1e6) is one deterministic "
    "IEEE multiply plus floor, summed exactly as BIGINT — because "
    "casting an arbitrary double mean back to DECIMAL(30,6) rounds at "
    "the 6th-decimal HALF boundary, where Spark (exact BigDecimal "
    "HALF_UP) and DuckDB (scaled-double) can disagree: bucket means are "
    "small-count rationals that LAND on those boundaries (first seen at "
    "sf0.1; sf0.01 never hit one).  Readout is identical-text double "
    "division, no output ROUND.  Shuffles carry (type, hour) "
    "cardinality, never raw events, at any scale; the integer-microunit "
    "re-aggregation is the standard deterministic distributed "
    "accumulator (exact, mergeable, order-free).",
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.expr(
            f"CAST(FLOOR(({davg('value', 6)})"
            " * CAST(1000000 AS DOUBLE)) AS BIGINT)"
        ).alias("hm")
    )
    seasonal = hourly.groupBy(
        "event_type", F.hour("h").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("hm").alias("sm"),
    )
    overall = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("tn"), F.sum("hm").alias("tm")
    )
    mean_sql = (
        "CAST(sm AS DOUBLE) / CAST(1000000 AS DOUBLE) / n_buckets"
    )
    type_mean_sql = "CAST(tm AS DOUBLE) / CAST(1000000 AS DOUBLE) / tn"
    return (
        seasonal.join(overall, "event_type")
        .selectExpr(
            "event_type",
            "hour_of_day",
            "n_buckets",
            f"{mean_sql} AS seasonal_mean",
            f"{mean_sql} - {type_mean_sql} AS seasonal_index",
        )
        .orderBy("event_type", "hour_of_day")
    )


@register(
    "q_anomaly_seasonal",
    oracle=f"""
    WITH sums AS (
      SELECT event_type, hour(ts) AS hour_of_day,
             {davg('value', 6)} AS s_mean,
             {dsum('value', 6)} AS s1,
             {dsum('value * value', 6)} AS s2,
             COUNT(*) AS n
      FROM events
      GROUP BY 1, 2
    ),
    seasonal AS (
      SELECT event_type, hour_of_day, s_mean, n,
             SQRT(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0)) AS s_sigma
      FROM sums
    )
    SELECT e.event_id, e.event_type, hour(e.ts) AS hour_of_day, e.value,
           ROUND((e.value - s.s_mean) / s.s_sigma, 4) AS seasonal_z
    FROM events e
    JOIN seasonal s
      ON s.event_type = e.event_type AND s.hour_of_day = hour(e.ts)
    WHERE s.n >= 30 AND s.s_sigma > 0
      AND abs((e.value - s.s_mean) / s.s_sigma) > 3.0
    ORDER BY e.event_id
    """,
    doc="Seasonally-adjusted anomaly gate: each event is scored against "
    "the mean/sigma of ITS OWN (type, hour-of-day) stratum, so a value "
    "that is normal at the daily peak no longer false-alarms and a "
    "quiet-hour spike no longer hides in the global variance — the "
    "composition of q_seasonal_decompose's profile with q_zscore_"
    "anomaly's 3-sigma gate.  The stratum stats table is (types × 24) "
    "rows — broadcast-joined back, one aggregation shuffle total; "
    "strata with <30 points are excluded rather than scored against "
    "noise.  Sigma is NOT native stddev_pop (each engine streams "
    "Welford merges in its own order — a last-ulp difference there "
    "could flip membership at the unrounded 3-sigma boundary): it is "
    "derived from exact-decimal sufficient statistics (n, Σv, Σv²) "
    "through the identical double expression on both engines, so the "
    "boundary comparison is bit-identical — and the sketch stays "
    "mergeable, which is what a 100 TB partial-aggregation plan needs "
    "anyway.",
)
def q_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sums = ev.groupBy(
        "event_type", F.hour("ts").alias("hour_of_day")
    ).agg(
        F.expr(davg("value", 6)).alias("s_mean"),
        F.expr(dsum("value", 6)).alias("s1"),
        F.expr(dsum("value * value", 6)).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    seasonal = sums.selectExpr(
        "event_type",
        "hour_of_day",
        "s_mean",
        "n",
        # GREATEST(..., 0): fp cancellation on a near-constant stratum can
        # make the variance identity slightly negative; Spark's SQRT would
        # yield NaN (which passes BOTH s_sigma > 0 and abs(z) > 3 — NaN
        # compares true in both engines) while DuckDB's sqrt(negative)
        # throws.  Clamping in BOTH engine texts makes a degenerate bucket
        # sigma = 0, excluded identically by the existing s_sigma > 0 gate.
        "SQRT(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0)) AS s_sigma",
    )
    # try_divide, NOT a bare / guarded by the s_sigma > 0 conjunct below:
    # Spark does not guarantee conjunct evaluation order (the optimizer may
    # split/reorder Filter predicates), so in ANSI mode a zero-sigma
    # (constant) hour bucket could still evaluate the division and kill
    # the job; try_divide yields NULL there and abs(NULL) > 3 filters it.
    z = F.try_divide(F.col("value") - F.col("s_mean"), F.col("s_sigma"))
    return (
        ev.withColumn("hour_of_day", F.hour("ts"))
        .join(F.broadcast(seasonal), ["event_type", "hour_of_day"])
        .filter(
            (F.col("n") >= 30) & (F.col("s_sigma") > 0) & (F.abs(z) > 3.0)
        )
        .select(
            "event_id",
            "event_type",
            "hour_of_day",
            "value",
            F.round(z, 4).alias("seasonal_z"),
        )
        .orderBy("event_id")
    )


@register(
    "q_stream_enrich",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (event_type = 'purchase') AS n_purchases
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1
    """,
    doc="Stream-static enrichment rollup (batch form of streaming/jobs.py "
    "enrich_stream, which is test-pinned equal under availableNow "
    "replay): every event picks up its user's market segment from a "
    "static broadcast dimension and rolls up per segment.  In streaming "
    "mode the join is STATELESS — the dim is re-planned per micro-batch, "
    "no state store, no watermark — the lookup shape every event "
    "pipeline needs before stream-stream machinery is warranted.",
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import enrich_stream

    ev = load_table(spark, sf_dir, "events")
    cu = load_table(spark, sf_dir, "customer")
    return enrich_stream(ev, cu)


#: 32-bit md5-derived hash of the event id, one expression per engine,
#: identical value (the analytics.py _TEXT_H32 idiom on a BIGINT key)
_EID_H32_SPARK = (
    "CAST(CONV(SUBSTRING(MD5(CAST(event_id AS STRING)), 1, 8), 16, 10)"
    " AS BIGINT)"
)
_EID_H32_DUCK = (
    "CAST(('0x' || SUBSTRING(MD5(CAST(event_id AS VARCHAR)), 1, 8))"
    " AS BIGINT)"
)


@register(
    "q_stream_dedup",
    priority=-1,
    bench=False,  # drains a streaming query; not a plan-timing benchmark
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {dsum('value', 6)} AS sum_value,
           bit_xor({_EID_H32_DUCK}) AS id_checksum
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Streaming exact deduplication with bounded state: every event is "
    "delivered TWICE (union of two file streams over the same parquet) "
    "and dropDuplicatesWithinWatermark must emit each event_id exactly "
    "once, holding each key in the state store only until the watermark "
    "passes it — the 100 TB-stream answer to at-least-once delivery, "
    "where plain dropDuplicates would grow state without bound.  The "
    "oracle aggregates the ORIGINAL table (count + exact-decimal value "
    "sum + order-independent id checksum per type), so parity proves the "
    "doubled stream deduped to exactly the source content — not just "
    "matching row counts.",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import (
        dedup_events,
        run_available_now,
        stream_events,
    )

    doubled = stream_events(spark, sf_dir).union(
        stream_events(spark, sf_dir)
    )
    out = run_available_now(
        dedup_events(doubled), "q_stream_dedup_mem", output_mode="append"
    )
    return (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value", 6)).alias("sum_value"),
            F.expr(f"bit_xor({_EID_H32_SPARK})").alias("id_checksum"),
        )
        .orderBy("event_type")
    )


@register(
    "q_top_movers",
    oracle=f"""
    WITH weekly AS (
      SELECT event_type, date_trunc('week', ts) AS week,
             {dsum('value', 6)} AS revenue
      FROM events GROUP BY 1, 2
    ),
    delta AS (
      SELECT event_type, week, revenue,
             LAG(revenue) OVER (PARTITION BY event_type ORDER BY week)
               AS prev_revenue
      FROM weekly
    )
    SELECT event_type, week, revenue, prev_revenue,
           ROUND(revenue - prev_revenue, 6) AS delta,
           ROUND((revenue - prev_revenue) / prev_revenue, 6) AS pct_change
    FROM delta
    WHERE prev_revenue > 0
      AND abs(revenue - prev_revenue) / prev_revenue > 0.1
    ORDER BY event_type, week
    """,
    doc="Period-over-period movers: weekly revenue per event_type, "
    "previous week via LAG, and the rows whose week-over-week change "
    "exceeds 10% — the what-changed report behind every operational "
    "dashboard.  Weekly sums are exact-decimal so the deltas and the "
    "boundary comparison are bit-identical cross-engine; the window "
    "partitions by type (types × weeks rows, no data-sized window).",
)
def q_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week")
    ).agg(F.expr(dsum("value", 6)).alias("revenue"))
    w = W.partitionBy("event_type").orderBy("week")
    prev = F.lag("revenue").over(w)
    return (
        weekly.withColumn("prev_revenue", prev)
        # > 0 (not just NOT NULL): a zero or negative weekly sum would
        # divide by zero with engine-divergent inf/NULL semantics; make the
        # guard explicit instead of relying on strictly-positive values
        # try_divide, NOT a bare / relying on the prev_revenue > 0 conjunct:
        # Spark does not guarantee conjunct evaluation order, so in ANSI
        # mode a zero previous week could still evaluate the division and
        # kill the job; try_divide yields NULL → comparison NULL → filtered
        .filter(
            (F.col("prev_revenue") > 0)
            & (
                F.try_divide(
                    F.abs(F.col("revenue") - F.col("prev_revenue")),
                    F.col("prev_revenue"),
                )
                > 0.1
            )
        )
        .select(
            "event_type",
            "week",
            "revenue",
            "prev_revenue",
            F.round(F.col("revenue") - F.col("prev_revenue"), 6).alias(
                "delta"
            ),
            F.round(
                (F.col("revenue") - F.col("prev_revenue"))
                / F.col("prev_revenue"),
                6,
            ).alias("pct_change"),
        )
        .orderBy("event_type", "week")
    )


@register(
    "q_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    cnt AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_type, SUM(n) AS row_total FROM cnt GROUP BY 1
    )
    SELECT c.from_type, c.to_type, c.n,
           CAST(c.n AS DOUBLE) / t.row_total AS p
    FROM cnt c JOIN tot t ON t.from_type = c.from_type
    ORDER BY c.from_type, c.to_type
    """,
    doc="First-order Markov transition matrix of the user journey: each "
    "user's consecutive event pairs via one LEAD window, counted into a "
    "(from, to) matrix and row-normalized to transition probabilities — "
    "the Sankey/journey-analytics primitive and the input to any "
    "sequence model baseline.  One user-partitioned window pass + a "
    "(types²)-row rollup; the probability is a single integer division "
    "emitted RAW (no ROUND: n/row_total is a small-denominator rational, "
    "and rounding one that lands on a half-microunit boundary is the "
    "cross-engine trap documented on q_bootstrap_ci — the raw IEEE "
    "quotient of two exact integers is bit-identical everywhere).",
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    ).persist()  # |types|^2-sized, consumed by the row totals AND the
    # probability readout (multi-consumer rule)
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (
        cnt.join(tot, "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("row_total")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


#: Each variance factor is GREATEST-clamped at 0 (the q_anomaly_seasonal
#: NaN-sigma class): a constant series cancels n*sxx - sx*sx slightly
#: negative in doubles, making the product negative — Spark SQRT yields
#: NaN while DuckDB sqrt(negative) THROWS, so without the clamp the
#: engines fail differently.  Clamped, a flat series divides by 0.
_ACF_READOUT = (
    "ROUND((n * sxy - sx * sy)"
    " / SQRT(GREATEST(n * sxx - sx * sx, 0)"
    " * GREATEST(n * syy - sy * sy, 0)), 6) AS acf"
)
#: Spark twin: try_divide — ANSI mode makes the bare / THROW on a
#: constant (zero-variance) series instead of yielding NULL, killing the
#: whole job for one flat metric; DuckDB's / already NULLs on a zero
#: double divisor, so the twins agree on degenerate series too.
_ACF_READOUT_SPARK = (
    "ROUND(try_divide((n * sxy - sx * sy),"
    " SQRT(GREATEST(n * sxx - sx * sx, 0)"
    " * GREATEST(n * syy - sy * sy, 0))), 6) AS acf"
)


@register(
    "q_acf",
    priority=1,
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             {dsum('value', 6)} AS v
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, v,
             LAG(v, 1) OVER (PARTITION BY event_type ORDER BY h) AS l1,
             LAG(v, 2) OVER (PARTITION BY event_type ORDER BY h) AS l2,
             LAG(v, 3) OVER (PARTITION BY event_type ORDER BY h) AS l3
      FROM hourly
    ),
    pairs AS (
      SELECT event_type, 1 AS lag, v AS x, l1 AS y FROM lagged
      WHERE l1 IS NOT NULL
      UNION ALL
      SELECT event_type, 2 AS lag, v AS x, l2 AS y FROM lagged
      WHERE l2 IS NOT NULL
      UNION ALL
      SELECT event_type, 3 AS lag, v AS x, l3 AS y FROM lagged
      WHERE l3 IS NOT NULL
    ),
    stats AS (
      SELECT event_type, lag, COUNT(*) AS n,
             {dsum('x', 6)} AS sx, {dsum('y', 6)} AS sy,
             {dsum('x * x', 6)} AS sxx, {dsum('y * y', 6)} AS syy,
             {dsum('x * y', 6)} AS sxy
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, lag, n, {_ACF_READOUT}
    FROM stats
    ORDER BY event_type, lag
    """,
    doc="Autocorrelation function: Pearson correlation of each type's "
    "hourly-revenue series with itself at lags 1-3 — THE diagnostic for "
    "seasonality/memory before fitting any forecast (q_forecast_revenue) "
    "or anomaly model (q_anomaly_seasonal).  Hourly sums are exact-"
    "decimal; the three lags come from ONE window pass (no self-joins), "
    "are unpivoted to (lag, x, y) pairs, and reduce to mergeable exact "
    "sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) whose correlation "
    "readout expression text is shared verbatim by both engines — "
    "bit-identical, and at 100 TB the stats merge as partial aggregates "
    "with only a (types × lags)-row final state.",
)
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.expr(dsum("value", 6)).alias("v"))
    w = W.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("l1"),
        F.lag("v", 2).over(w).alias("l2"),
        F.lag("v", 3).over(w).alias("l3"),
    ).persist()  # hour-bucket-sized window output, consumed by one union
    # branch per lag (multi-consumer rule)
    pairs = None
    for k in (1, 2, 3):
        p = lagged.filter(F.col(f"l{k}").isNotNull()).select(
            "event_type",
            F.lit(k).alias("lag"),
            F.col("v").alias("x"),
            F.col(f"l{k}").alias("y"),
        )
        pairs = p if pairs is None else pairs.unionAll(p)
    stats = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(dsum("x", 6)).alias("sx"),
        F.expr(dsum("y", 6)).alias("sy"),
        F.expr(dsum("x * x", 6)).alias("sxx"),
        F.expr(dsum("y * y", 6)).alias("syy"),
        F.expr(dsum("x * y", 6)).alias("sxy"),
    )
    return stats.selectExpr(
        "event_type", "lag", "n", _ACF_READOUT_SPARK
    ).orderBy("event_type", "lag")


@register(
    "q_interval_merge",
    priority=1,
    oracle="""
    WITH b AS (
      SELECT user_id, ts, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + 600 AS e
      FROM events
    ),
    o AS (
      SELECT user_id, ts, event_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM b
    ),
    f AS (
      SELECT user_id, ts, event_id, s, e,
             CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS ns
      FROM o
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS iid
      FROM f
    ),
    m AS (
      SELECT user_id, iid, MIN(s) AS st, MAX(e) AS en
      FROM isl GROUP BY user_id, iid
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(en - st) AS BIGINT) AS covered_s,
           CAST(MAX(en - st) AS BIGINT) AS max_interval_s
    FROM m GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Gaps-and-islands interval coalescing: each event opens a 10-min "
    "activity interval [ts, ts+600s); overlapping/touching intervals per "
    "user merge into islands via the classic running-max construction — "
    "prev-rows MAX(end) -> new-island flag -> running SUM = island id — "
    "then per-island MIN(start)/MAX(end) gives the merged cover.  The "
    "user_id-keyed window means ONE shuffle serves the running max, the "
    "island numbering, and both aggregations (sort order reused; no "
    "self-join of intervals, which is the O(n^2) naive formulation).  "
    "All arithmetic is integer epoch seconds, so cross-engine parity is "
    "exact.  The merged-interval primitive underlies uptime/SLA cover, "
    "ad-session stitching, and genomic range union at any scale.",
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import merge_intervals

    ev = load_table(spark, sf_dir, "events")
    return merge_intervals(
        ev.select("user_id", "ts", "event_id"), dur_s=600
    ).orderBy("user_id")


@register(
    "q_funnel_windowed",
    priority=1,  # deliberate round-6 queue: late round-5 addition kept out
    # of the full round-5 window so the documented spill set stays fixed
    oracle="""
    WITH staged AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
      FROM events
    ),
    clicked AS (
      SELECT user_id, t_view,
             MIN(CASE WHEN event_type = 'click' AND ts > t_view
                       AND ts <= t_view + INTERVAL 3 DAY THEN ts END)
               OVER (PARTITION BY user_id) AS t_click
      FROM (SELECT e.user_id, e.event_type, e.ts, s.t_view
            FROM events e JOIN (SELECT DISTINCT user_id, t_view
                                FROM staged) s USING (user_id))
    ),
    bought AS (
      SELECT user_id, t_view, t_click,
             MIN(CASE WHEN event_type = 'purchase' AND ts > t_click
                       AND ts <= t_click + INTERVAL 3 DAY THEN ts END)
               OVER (PARTITION BY user_id) AS t_purchase
      FROM (SELECT e.user_id, e.event_type, e.ts, c.t_view, c.t_click
            FROM events e JOIN (SELECT DISTINCT user_id, t_view, t_click
                                FROM clicked) c USING (user_id))
    ),
    per_user AS (
      SELECT DISTINCT user_id, t_view, t_click, t_purchase FROM bought
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t_view) AS BIGINT) AS n_view,
           CAST(COUNT(t_click) AS BIGINT) AS n_click_3d,
           CAST(COUNT(t_purchase) AS BIGINT) AS n_purchase_3d
    FROM per_user
    """,
    doc="Time-bounded conversion funnel (view -> click within 3 days -> "
    "purchase within 3 more days): the product-analytics shape where "
    "each stage must land inside a window anchored at the PREVIOUS "
    "stage's time, which plain min-per-stage conditional aggregation "
    "(q_funnel) cannot express.  Built as chained per-user window MINs — "
    "t_view is a window aggregate, t_click a conditional window MIN "
    "referencing t_view, t_purchase referencing t_click — so every stage "
    "shares ONE user_id-keyed layout (the joins back are user-keyed and "
    "AQE-coalesced onto the same exchange), never an events-to-events "
    "self-join per stage.  Strict > plus closed <= bounds on exact "
    "microsecond timestamps keep the stage predicates engine-exact.",
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    wu = W.partitionBy("user_id")
    staged = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
    )
    sv = staged.select("user_id", "t_view").distinct()
    clicked = ev.join(sv, "user_id").withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view"))
                & (F.col("ts") <= F.expr("t_view + INTERVAL 3 DAY")),
                F.col("ts"),
            )
        ).over(wu),
    )
    cv = clicked.select("user_id", "t_view", "t_click").distinct()
    bought = ev.join(cv, "user_id").withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click"))
                & (F.col("ts") <= F.expr("t_click + INTERVAL 3 DAY")),
                F.col("ts"),
            )
        ).over(wu),
    )
    per_user = bought.select(
        "user_id", "t_view", "t_click", "t_purchase"
    ).distinct()
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("t_view").cast("bigint").alias("n_view"),
        F.count("t_click").cast("bigint").alias("n_click_3d"),
        F.count("t_purchase").cast("bigint").alias("n_purchase_3d"),
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution
# ---------------------------------------------------------------------------

MARKOV_K = 8  #: absorption iterations (= max credited path length)
MARKOV_CHANNELS = ["click", "error", "signup", "view"]


def _markov_chain_ctes(tag: str, where_from: str, to_expr: str) -> str:
    return f"""t_{tag} AS (
      SELECT from_state, {to_expr} AS to_state,
             CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM base_t WHERE {where_from}
      GROUP BY 1, 2
    ),
    p_{tag} AS (
      SELECT from_state, to_state,
             CAST(cnt AS DOUBLE) / SUM(cnt)
               OVER (PARTITION BY from_state) AS p
      FROM t_{tag}
    )"""


def _markov_iter_ctes(tag: str, k_iters: int) -> list[str]:
    out = [
        f"v_{tag}_0 AS (SELECT 'CONV' AS state, CAST(1.0 AS DOUBLE) AS prob)"
    ]
    for k in range(1, k_iters + 1):
        out.append(f"""v_{tag}_{k} AS (
          SELECT p.from_state AS state,
                 CAST(SUM(CAST((p.p * COALESCE(v.prob, 0.0))
                               AS DECIMAL(30,12))) AS DOUBLE) AS prob
          FROM p_{tag} p
          LEFT JOIN v_{tag}_{k - 1} v ON v.state = p.to_state
          GROUP BY p.from_state
          UNION ALL SELECT 'CONV', CAST(1.0 AS DOUBLE)
        )""")
    return out


def _markov_oracle(k_iters: int) -> str:
    ctes = [
        """seq AS (
  SELECT user_id,
         CASE WHEN event_type = 'purchase' THEN 'CONV'
              ELSE event_type END AS state,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS ord
  FROM (
    SELECT e.*,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END)
             OVER (PARTITION BY user_id) AS t_conv
    FROM events e
  ) WHERE t_conv IS NULL OR ts <= t_conv
)""",
        """pairs AS (
  SELECT user_id, from_state, to_state FROM (
    SELECT user_id, state AS from_state,
           COALESCE(LEAD(state) OVER (PARTITION BY user_id ORDER BY ord),
                    'LOST') AS to_state
    FROM seq
  ) WHERE from_state <> 'CONV'
  UNION ALL
  SELECT user_id, 'START', MIN_BY(state, ord) FROM seq GROUP BY user_id
)""",
        """base_t AS (
  SELECT from_state, to_state, COUNT(*) AS cnt
  FROM pairs GROUP BY 1, 2
)""",
        _markov_chain_ctes("base", "TRUE", "to_state"),
    ]
    ctes += _markov_iter_ctes("base", k_iters)
    for c in MARKOV_CHANNELS:
        ctes.append(
            _markov_chain_ctes(
                c,
                f"from_state <> '{c}'",
                f"CASE WHEN to_state = '{c}' THEN 'LOST' ELSE to_state END",
            )
        )
        ctes += _markov_iter_ctes(c, k_iters)
    per_channel = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS channel,
        (SELECT prob FROM v_base_{k_iters} WHERE state = 'START') AS p_base,
        COALESCE((SELECT prob FROM v_{c}_{k_iters}
                  WHERE state = 'START'), 0.0) AS p_without"""
        for c in MARKOV_CHANNELS
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
raw AS (
  SELECT channel, p_base, p_without,
         CASE WHEN p_base = 0.0 THEN 0.0
              ELSE CAST(1.0 AS DOUBLE) - p_without / p_base END AS effect
  FROM ({per_channel})
),
tot AS (SELECT {dsum('effect', 12)} AS s FROM raw)
SELECT channel,
       ROUND(p_base, 6) AS p_base,
       ROUND(p_without, 6) AS p_without,
       ROUND(effect, 6) AS removal_effect,
       ROUND(CASE WHEN s = 0.0 THEN 0.0 ELSE effect / s END, 6)
         AS attribution
FROM raw CROSS JOIN tot
ORDER BY channel"""
    )


def _markov_dterm(x: float):
    """Spark's ``CAST(double AS DECIMAL(30,12))``: the double's
    shortest-roundtrip decimal string (Java ``Double.toString`` ==
    Python ``repr`` for every finite double), then setScale(12,
    HALF_UP) — the per-term half of the exact.dsum(…, 12) idiom."""
    from decimal import ROUND_HALF_UP, Decimal

    return Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-12), rounding=ROUND_HALF_UP
    )


def _markov_driver_fold(
    base: dict, channels: list[str], k: int
) -> dict:
    """The q_attribution_markov chain algebra on the driver: from the
    collected base (from, to) -> cnt sketch, derive each removal chain's
    transition table, its row-normalized probabilities (IEEE-double
    cnt/tot, exactly Spark's ``cnt.cast(double)/sum(cnt)``), and run
    ``k`` absorption iterations where every per-state reduction is the
    dsum(…, 12) fold: each double term quantized to DECIMAL(30,12) via
    its shortest-roundtrip string (``_markov_dterm``), summed exactly,
    cast back to the nearest double.  Returns {(chain, state): prob}.

    Bit-equality with the in-Spark formulation is pinned by
    tests/test_advanced.py::test_markov_driver_fold_matches_spark_dsum.
    """
    from decimal import Decimal

    tables: dict[str, dict] = {"base": dict(base)}
    for c in channels:
        t: dict = {}
        for (f_, to), cnt in base.items():
            if f_ == c:
                continue
            to2 = "LOST" if to == c else to
            t[(f_, to2)] = t.get((f_, to2), 0) + cnt
        tables[c] = t
    p_all = {}
    for tag, t in tables.items():
        tot: dict = {}
        for (f_, _to), cnt in t.items():
            tot[f_] = tot.get(f_, 0) + cnt
        for (f_, to), cnt in t.items():
            p_all[(tag, f_, to)] = float(cnt) / float(tot[f_])

    vv = {(tag, "CONV"): 1.0 for tag in ["base"] + list(channels)}
    for _ in range(k):
        terms: dict = {}
        for (tag, f_, to), p in p_all.items():
            terms.setdefault((tag, f_), []).append(
                p * vv.get((tag, to), 0.0)
            )
        nv = {
            key: float(sum((_markov_dterm(x) for x in ts), Decimal(0)))
            for key, ts in terms.items()
        }
        for tag in ["base"] + list(channels):
            nv[(tag, "CONV")] = 1.0
        vv = nv
    return vv


@register(
    "q_attribution_markov",
    priority=1,  # self-queued for round 6 like q_funnel_windowed
    bench=False,  # 40 eager sketch-sized iteration jobs dominate timing
    oracle=_markov_oracle(MARKOV_K),
    doc="Data-driven (Markov removal-effect) attribution — completes the "
    "attribution family: q_attribution credits first/last touch by "
    "decree; this one MEASURES each channel's causal contribution as "
    "the drop in chain conversion probability when the channel is "
    "removed (its transitions redirected to the LOST sink) — the "
    "standard alternative to Shapley for production attribution.  "
    "Scale shape: ONE user-keyed window pass builds journeys truncated "
    "at first purchase and reduces them to the (from, to) transition "
    "count table — the only data-sized work, persisted once; the chain "
    "algebra (base + 4 removal chains x 8 absorption iterations of "
    "transition-matrix-vector products) runs entirely on that "
    f"|states|^2 <= 49-row sketch.  {MARKOV_K} unrolled iterations = "
    "conversion probability within 8 steps, the same fixed-unroll "
    "semantics as q_kcore (well-defined mid-convergence on any "
    "engine); products accumulate exact-decimal so every probability "
    "is bit-identical cross-engine.",
)
def q_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    wu = W.partitionBy("user_id")
    trunc = ev.withColumn(
        "t_conv",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(wu),
    ).filter(F.col("t_conv").isNull() | (F.col("ts") <= F.col("t_conv")))
    # ONE windowed pass emits both pair kinds (round 13): the old
    # lead-branch/starts-branch union re-derived the whole journey window
    # chain twice (union branches share no subtree), so the data-sized
    # pass ran twice per invocation.  row_number and lead share a single
    # (user_id, ts, event_id) window; each row then fans out to its
    # lead-pair (when state != CONV) plus a START pair (when it is the
    # user's first row) through one codegen Generate — the multiset of
    # (from_state, to_state) rows is identical, so counts (and the
    # oracle, which keeps the two-branch CTE form) are unchanged.
    state_c = (
        F.when(F.col("event_type") == "purchase", F.lit("CONV"))
        .otherwise(F.col("event_type"))
    )
    wo = wu.orderBy("ts", "event_id")
    _pair_t = "array<struct<f:string,t:string>>"
    marked = trunc.select(
        state_c.alias("state"),
        F.row_number().over(wo).alias("rn"),
        F.coalesce(F.lead(state_c).over(wo), F.lit("LOST")).alias("nxt"),
    )
    pairs = marked.select(
        F.explode(
            F.concat(
                F.when(
                    F.col("state") != "CONV",
                    F.array(
                        F.struct(
                            F.col("state").alias("f"),
                            F.col("nxt").alias("t"),
                        )
                    ),
                ).otherwise(F.array().cast(_pair_t)),
                F.when(
                    F.col("rn") == 1,
                    F.array(
                        F.struct(
                            F.lit("START").alias("f"),
                            F.col("state").alias("t"),
                        )
                    ),
                ).otherwise(F.array().cast(_pair_t)),
            )
        ).alias("p")
    )
    # one consumer (the driver-fold collect below), so no checkpoint:
    # the data-sized journey pass runs exactly once into the collect
    base_t = pairs.groupBy(
        F.col("p.f").alias("from_state"), F.col("p.t").alias("to_state")
    ).agg(F.count(F.lit(1)).alias("cnt"))

    # DRIVER-SIDE chain fold (round 13).  The chain algebra iterates a
    # |states|^2 <= 49-row transition sketch (x5 chains <= 245 rows, a
    # hard bound set by the 7-value state vocabulary, not by data size) —
    # but each Spark iteration, however batched, costs a full job
    # round-trip: the previous form (8 eager sketch-sized jobs) spent
    # ~0.5-1 s of scheduler/shuffle overhead per iteration, and a lazy
    # 8-deep unroll measured WORSE (8 sequential AQE-replanned stages).
    # This is the k-means-centroid pattern: state that fits in a bounded
    # broadcast iterates on the driver (guide §5 bounds DATA work, and
    # this collect is sketch-sized by construction).  The fold
    # (_markov_driver_fold below) replicates Spark's arithmetic EXACTLY
    # — verified bit-identical to the former in-Spark fold on every
    # state at sf0.01 and sf0.1 (26 keys, 0 mismatches) before the
    # switch, pinned forever after by tests/test_advanced.py::
    # test_markov_driver_fold_matches_spark_dsum on adversarial counts;
    # the DuckDB oracle (unchanged) re-verifies it on every driver run.
    base = {
        (r["from_state"], r["to_state"]): r["cnt"] for r in base_t.collect()
    }
    vv = _markov_driver_fold(base, MARKOV_CHANNELS, MARKOV_K)

    v = spark.createDataFrame(
        [(tag, st, prob) for (tag, st), prob in sorted(vv.items())],
        "chain string, state string, prob double",
    )

    starts_v = v.filter(F.col("state") == "START").select("chain", "prob")
    p_base = starts_v.filter(F.col("chain") == "base").select(
        F.col("prob").alias("p_base")
    )
    # one left join from the literal channel list replaces the old
    # 4x (range(1) crossJoin broadcast-filter) union — same rows (a
    # chain with no START row still reads 0.0), 1 tiny subplan not 4
    ch_names = spark.createDataFrame(
        [(c,) for c in MARKOV_CHANNELS], "channel string"
    )
    per_channel = (
        ch_names.join(
            starts_v.filter(F.col("chain") != "base").select(
                F.col("chain").alias("channel"),
                F.col("prob").alias("p_without"),
            ),
            ["channel"],
            "left",
        )
        .select(
            "channel",
            F.coalesce("p_without", F.lit(0.0)).alias("p_without"),
        )
    )

    raw = per_channel.crossJoin(F.broadcast(p_base)).selectExpr(
        "channel",
        "p_base",
        "p_without",
        "CASE WHEN p_base = 0.0 THEN 0.0"
        " ELSE CAST(1.0 AS DOUBLE) - p_without / p_base END AS effect",
    ).localCheckpoint(eager=True)  # read twice: grand total + readout
    tot = raw.agg(F.expr(dsum("effect", 12)).alias("s"))
    return (
        raw.crossJoin(F.broadcast(tot))
        .selectExpr(
            "channel",
            "ROUND(p_base, 6) AS p_base",
            "ROUND(p_without, 6) AS p_without",
            "ROUND(effect, 6) AS removal_effect",
            "ROUND(CASE WHEN s = 0.0 THEN 0.0 ELSE effect / s END, 6)"
            " AS attribution",
        )
        .orderBy("channel")
    )
