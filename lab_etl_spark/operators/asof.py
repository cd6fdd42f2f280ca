"""As-of join: for each left row, the most recent right row at or before its
timestamp, per key — the temporal-alignment primitive Spark's join family
lacks natively (reference analogue: the MCC ``time_shift`` alignment,
faa_mcc_parser.py metadata, generalized to two-table alignment).

Scale design — union + window, NOT a range join:
  * The naive formulation (theta-join ``l.ts >= r.ts`` + argmax per left row)
    materializes every (left, right-earlier) pair before picking one: for a
    key with n left and m right rows that is O(n·m) intermediate rows.  At
    100 TB a hot key makes that a join island.
  * Instead: tag the two sides, union them into one stream, and run ONE
    window pass partitioned by key and ordered by time, forward-filling the
    right side's payload (``last(..., ignorenulls=True)`` over unbounded
    preceding).  Cost is a single shuffle on the key + a per-partition sort
    — O(n + m) rows end to end, no pair blow-up, and Catalyst keeps the
    whole fill in one WindowExec.
  * Tie rule: a right row at exactly the left row's timestamp IS matched
    (``at or before``); the sort places right rows before left rows at
    equal timestamps (`_is_r` descending).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts: str,
    r_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: all left rows, each annotated with ``prefix<c>`` for
    every ``c`` in ``r_cols`` taken from the latest right row with
    ``right.ts <= left.ts`` on the same ``by`` key (NULLs when no such row).

    ``r_cols`` must not overlap ``by``; include the right timestamp itself in
    ``r_cols`` to expose the matched time.

    Precondition (same as DuckDB/pandas as-of joins): at most one right row
    per (key, ts) instant.  With duplicate right instants the winner among
    them is tie-broken arbitrarily by the sort, i.e. nondeterministic —
    dedup the right side first if that can occur.

    The right payload is forward-filled as ONE struct, not per column:
    per-column ``last(ignorenulls)`` would tear columns from different
    right rows whenever a payload column is legitimately NULL (a NULL
    ``value`` in the matched row must stay NULL, not inherit an older
    row's value).
    """
    lcols = [c for c in left.columns if c not in by and c != ts]
    l_schema = {f.name: f.dataType for f in left.schema.fields}

    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(ts).alias(ts),
        F.lit(1).alias("_is_r"),
        F.struct(*[F.col(c).alias(c) for c in r_cols]).alias("_r"),
        *[F.lit(None).cast(l_schema[c]).alias(c) for c in lcols],
    )
    r_struct_type = r_tagged.schema["_r"].dataType
    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(ts).alias(ts),
        F.lit(0).alias("_is_r"),
        F.lit(None).cast(r_struct_type).alias("_r"),
        *[F.col(c) for c in lcols],
    )
    u = r_tagged.unionByName(l_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts).asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *by,
        ts,
        "_is_r",
        *lcols,
        F.last("_r", ignorenulls=True).over(w).alias("_rf"),
    )
    return filled.filter(F.col("_is_r") == 0).select(
        *by,
        ts,
        *lcols,
        *[F.col(f"_rf.{c}").alias(f"{prefix}{c}") for c in r_cols],
    )
