"""Linear interpolation of an irregular time series onto a regular grid,
expressed entirely in window functions (no Python, no collect of the series).

Reference analogue: op_interp_resample — np.interp of secondary spectra onto
the primary wavelength grid (bruker_ftir_parser.py:74-86).  The Spark-first
form: union the grid points with the data points, then one forward-looking
and one backward-looking IGNORE NULLS window pass gives each grid point its
bracketing samples; blend linearly.  Cost: one sort per series partition —
at scale you partition by series key (``part_cols``), so state stays local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def interpolate_to_grid(
    series: DataFrame,
    grid: DataFrame,
    part_cols: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Linearly interpolate ``series`` (ts, value) onto ``grid`` (ts).

    Grid points outside the observed range get NULL.  Data rows sort before
    grid rows at equal ts, so an exact-hit grid point reproduces the sample
    value exactly (zero-length blend).
    """
    part_cols = part_cols or []
    data = series.select(
        *part_cols,
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("double").alias("_val"),
        F.lit(0).alias("_is_grid"),
    )
    gpts = grid.select(
        *part_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(None).cast("double").alias("_val"),
        F.lit(1).alias("_is_grid"),
    )
    pts = data.unionAll(gpts)

    # Both passes use *cumulative* frames (UNBOUNDED PRECEDING .. CURRENT),
    # which Spark's WindowExec evaluates incrementally in O(n).  The naive
    # forward-looking frame (CURRENT .. UNBOUNDED FOLLOWING) is recomputed
    # from scratch per row — O(n²), 40+ s on a 20k-row series — so the
    # "next bracketing sample" is instead a cumulative pass over the
    # *descending* order, which sees exactly the rows at-or-after each point.
    # In BOTH passes the data row must be processed before a grid row at the
    # same instant (_is_grid asc), so an exact-hit grid point sees its
    # bracketing sample on each side.  With _is_grid desc in the backward
    # pass, a grid point at the LAST sample's ts found no next sample and
    # interpolated to NULL (caught by tests/test_property_ops.py).
    asc = [F.col("_ts").asc(), F.col("_is_grid").asc()]
    desc = [F.col("_ts").desc(), F.col("_is_grid").asc()]
    base_asc = (
        W.partitionBy(*part_cols).orderBy(*asc) if part_cols else W.orderBy(*asc)
    )
    base_desc = (
        W.partitionBy(*part_cols).orderBy(*desc) if part_cols else W.orderBy(*desc)
    )
    w_prev = base_asc.rowsBetween(W.unboundedPreceding, 0)
    w_next = base_desc.rowsBetween(W.unboundedPreceding, 0)

    prev_val = F.last("_val", ignorenulls=True).over(w_prev)
    prev_ts = F.last(
        F.when(F.col("_is_grid") == 0, F.col("_ts")), ignorenulls=True
    ).over(w_prev)
    next_val = F.last("_val", ignorenulls=True).over(w_next)
    next_ts = F.last(
        F.when(F.col("_is_grid") == 0, F.col("_ts")), ignorenulls=True
    ).over(w_next)

    # Epoch microseconds as exact integers → double ratios are deterministic.
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    frac = (us(F.col("_ts")) - us(prev_ts)).cast("double") / (
        us(next_ts) - us(prev_ts)
    ).cast("double")
    blended = F.when(prev_ts == next_ts, prev_val).otherwise(
        prev_val + (next_val - prev_val) * frac
    )
    return (
        pts.withColumn("_interp", blended)
        .filter(F.col("_is_grid") == 1)
        .select(
            *part_cols,
            F.col("_ts").alias(ts_col),
            F.round("_interp", 6).alias("interp_value"),
        )
    )
