"""Z-order (Morton-curve) clustering for lake writes: multi-column data
skipping without a table format.

Sorting a table by one column tightens parquet min/max footer stats for
that column only; a range filter on any OTHER column still touches every
file.  Interleaving the bits of several columns' rank-buckets produces a
space-filling-curve key whose contiguous ranges are small hyper-rectangles
in the original column space — range-partitioning files by that key gives
every z-ordered column tight per-file bounds, so selective filters on ANY
of them concentrate their rows in a few files (parquet row-group pruning
then skips the rest; a file-index layer like Delta/Iceberg would skip
whole files from the same stats).

Buckets are QUANTILE ranks, not linear min/max scaling: real columns are
skewed (the sf0.1 ``events.value`` packs 27% of rows into the lowest 5%
of its range), and linear buckets collapse most of a skewed column into a
handful of codes, destroying curve resolution exactly where the data is.
One ``approxQuantile`` pass per z-ordered column (driver gets 2^bits - 1
doubles — bounded, scale-safe) yields boundaries; the per-row bucket is an
unrolled binary-search CASE tree over the literal boundaries.  This is
the same rank-based design as Delta's OPTIMIZE ZORDER
(range_partition_id), expressed with open Spark APIs.

All pure Catalyst: one quantile pass, one range-shuffle write, bit
arithmetic unrolled into a codegen expression.  No reference analogue
(lab-etl writes one file per instrument run); this is lake-layout
infrastructure for the 100 TB regime.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension: 8 -> 256 rank buckets per column, z-key fits in a
#: BIGINT for up to 8 columns.  File-level clustering saturates long before
#: bucket resolution does, so more bits only lengthen the codegen expr.
DEFAULT_BITS = 8


def _quantile_bucket(col: Column, boundaries: list[float]) -> Column:
    """Rank bucket = number of quantile boundaries <= value, as an unrolled
    BINARY-SEARCH ``CASE`` tree over the sorted literal boundaries:
    log2(2^bits) comparisons per row, entirely inside whole-stage codegen.

    The previous form — ``F.aggregate`` over a literal boundary array —
    computed the same count, but higher-order functions are
    CodegenFallback: the 2^bits-element lambda ran INTERPRETED for every
    row, twice per z-ordered column (the range-partitioner samples the key
    expression before the real pass).  The tree is the standard upper-bound
    search, so the count is identical for every input: duplicates compare
    by value, a NULL comparison takes the low branch at every level and
    lands on bucket 0 (the fold's NULL -> 0), and NaN compares above every
    boundary (bucket 2^bits) exactly as each ``>=`` term did."""
    v = col.cast("double")

    def search(lo: int, hi: int) -> Column:
        # invariant: answer (the upper-bound index) lies in [lo, hi]
        if lo >= hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(v >= boundaries[mid], search(mid + 1, hi)).otherwise(
            search(lo, mid)
        )

    return search(0, len(boundaries)).cast("bigint")


def zorder_key(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> Column:
    """Morton key column over ``cols`` (numeric), bits interleaved
    round-robin so every column gets equal weight in the curve.

    Runs one multi-column ``approxQuantile`` job on ``df`` (a bounded
    sketch aggregate — no row data reaches the driver) to learn per-column
    rank boundaries; the returned Column must be used against ``df`` or a
    distribution-compatible derivative.
    """
    ndim = len(cols)
    if bits * ndim > 63:
        # Spark's shiftleft uses Java semantics (shift & 63): past 63 the
        # shift silently WRAPS and distinct points collide on the curve;
        # at exactly 64 the top bit would be the BIGINT sign bit and the
        # upper half of the curve would range-partition BELOW the lower.
        # Fail loudly instead of silently declustering.
        raise ValueError(
            f"z-order key needs bits*len(cols) <= 63 (got {bits}*{ndim}="
            f"{bits * ndim}); lower bits= or drop columns"
        )
    n_buckets = 1 << bits
    probs = [(i + 1) / n_buckets for i in range(n_buckets - 1)]
    # relativeError trades sketch size for boundary precision; 1/(4*buckets)
    # keeps adjacent buckets distinct without an expensive exact pass.
    all_bounds = df.approxQuantile(cols, probs, 1.0 / (4 * n_buckets))
    buckets = [
        _quantile_bucket(F.col(c), bounds)
        for c, bounds in zip(cols, all_bounds)
    ]
    parts = [
        F.shiftleft(
            F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * ndim + i
        )
        for i, b in enumerate(buckets)
        for bit in range(bits)
    ]
    return reduce(lambda a, x: a.bitwiseOR(x), parts)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = DEFAULT_BITS,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned along the
    z-curve of ``cols``: one range shuffle (sampled bounds, same mechanism
    as a global sort) and an in-partition sort to tighten row-group stats
    within each file."""
    from ..sources.sink import ROW_GROUP_BYTES

    if "_z" in df.columns:
        # withColumn would silently REPLACE the user's column and drop it
        raise ValueError(
            "input column '_z' collides with the z-order scratch column"
        )
    z = zorder_key(df, cols, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .option("parquet.block.size", ROW_GROUP_BYTES)
        .parquet(path)
    )
