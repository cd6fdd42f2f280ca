"""Gap-based sessionization as a reusable operator.

Reference analogue: none (the reference has no event analytics); this is
part of the §2B query-surface extension.  Built from window primitives —
lag → new-session flag → running sum — so one shuffle on the key serves
the lag, the running session-id sum, and any downstream per-session
aggregation (the sort order and partitioning are reused across all three).
At 100 TB this is the canonical single-shuffle sessionizer; the streaming
twin is ``session_window`` (see ``streaming/jobs.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def assign_sessions(
    events: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    gap_s: int = 1800,
    epoch: Column | None = None,
) -> DataFrame:
    """Events + a ``sid`` column: per-key session ordinal (1-based), with a
    new session whenever the gap since the previous event exceeds ``gap_s``
    seconds.

    ``epoch`` overrides the seconds expression (default: ``ts`` cast
    through timestamp to long — equal to DuckDB's ``epoch()`` on naive
    timestamps in a UTC session).  Ties on ``ts`` are ordered by
    ``tiebreak`` so the running sum is deterministic.
    """
    w = W.partitionBy(by).orderBy(ts, tiebreak)
    e = epoch if epoch is not None else F.col(ts).cast("timestamp").cast("long")
    gap = e - F.lag(e).over(w)
    ns = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    return events.withColumn(
        "sid",
        F.sum(ns).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


def session_stats(
    events: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    gap_s: int = 1800,
    epoch: Column | None = None,
) -> DataFrame:
    """Per-key session summary: session count, event count, busiest session."""
    s = assign_sessions(events, by, ts, tiebreak, gap_s, epoch)
    per_session = s.groupBy(by, "sid").agg(F.count(F.lit(1)).alias("n"))
    return per_session.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_session_events"),
    )


def merge_intervals(
    events: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    dur_s: int = 600,
    epoch: Column | None = None,
) -> DataFrame:
    """Gaps-and-islands interval coalescing: each event opens the interval
    ``[epoch, epoch + dur_s)``; overlapping or touching intervals per key
    merge into islands via the running-max construction (prev-rows MAX of
    interval end → new-island flag → running SUM = island id).  Returns
    per-key ``(n_intervals, covered_s, max_interval_s)`` — the merged
    cover, all integer-exact.

    One ``by``-keyed window serves the running max, the island numbering,
    and both aggregations (sort order reused) — never the O(n²) interval
    self-join.  ``epoch`` overrides the seconds expression, matching
    :func:`assign_sessions`.
    """
    e = epoch if epoch is not None else F.unix_timestamp(ts)
    ev = events.select(
        F.col(by),
        F.col(ts),
        F.col(tiebreak),
        e.alias("s"),
        (e + dur_s).alias("e"),
    )
    w = W.partitionBy(by).orderBy(ts, tiebreak)
    prev = ev.withColumn(
        "pmax", F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    )
    flagged = prev.withColumn(
        "ns",
        F.when(
            F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1
        ).otherwise(0),
    )
    isl = flagged.withColumn(
        "iid", F.sum("ns").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    merged = isl.groupBy(by, "iid").agg(
        F.min("s").alias("st"), F.max("e").alias("en")
    )
    return merged.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("en") - F.col("st")).alias("covered_s"),
        F.max(F.col("en") - F.col("st")).alias("max_interval_s"),
    )
