"""Parquet footer statistics reader (sources/footer.py): row-group
granularity, format-native pruning against the actual data, and the
null-count lane.  The per-column VALUE correctness of the census is
driver-checked by the q_parquet_footer_stats oracle (DuckDB aggregates
the data; Spark reads the footer)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lab_etl_spark.catalog import load_table
from lab_etl_spark.sources.footer import (
    footer_rowgroup_stats,
    list_part_files,
    prune_row_groups,
)

SF01 = "/root/testdata/sf0.1"

# epoch-microsecond bounds for the pruning predicate: Q1-1996 shipdates
LO_US = 820454400000000.0  # 1996-01-01
HI_US = 828316800000000.0  # 1996-04-01


@pytest.fixture(scope="module")
def sorted_lake(spark, tmp_path_factory):
    """sf0.1 lineitem written SORTED by l_shipdate into one file with
    ~1 MiB row groups — the layout where footer pruning should shine."""
    if not os.path.exists(os.path.join(SF01, "lineitem.parquet")):
        pytest.skip("sf0.1 testdata not present")
    path = str(tmp_path_factory.mktemp("footer") / "li_sorted")
    (
        load_table(spark, SF01, "lineitem")
        .repartition(1)
        .sortWithinPartitions("l_shipdate")
        .write.option("parquet.block.size", 1 << 20)
        .parquet(path)
    )
    return path


def test_rowgroup_granularity(spark, sorted_lake):
    stats = footer_rowgroup_stats(
        spark, sorted_lake, columns=["l_shipdate"]
    ).toPandas()
    assert stats["row_group"].nunique() > 1, (
        "bounded-block-size write produced a single row group; the "
        "granularity premise of footer pruning is gone"
    )
    # sorted layout => per-group [min, max] ranges are (weakly) ordered
    s = stats.sort_values("row_group")
    mins, maxs = list(s["min_num"]), list(s["max_num"])
    assert all(a <= b for a, b in zip(mins, maxs))
    assert mins == sorted(mins)


def test_prune_decision_matches_data(spark, sorted_lake):
    """No SKIPPED row group may contain an in-range row (checked against
    the actual pages via pyarrow), and on the sorted layout a 3-month
    predicate must skip a real fraction of the groups."""
    import pyarrow.parquet as pq

    stats = footer_rowgroup_stats(spark, sorted_lake)
    decision = prune_row_groups(
        stats, "l_shipdate", lo=LO_US, hi=HI_US
    ).toPandas()
    kept = decision[decision["keep"]]
    skipped = decision[~decision["keep"]]
    assert len(skipped) > 0, "sorted 6-year layout skipped nothing"
    assert len(kept) < len(decision) / 2, (
        f"3-month predicate kept {len(kept)}/{len(decision)} groups of a "
        f"sorted layout — clustering or bounds are broken"
    )
    (part,) = list_part_files(sorted_lake)
    pf = pq.ParquetFile(part)
    for _, row in skipped.iterrows():
        tbl = pf.read_row_group(int(row["row_group"]), ["l_shipdate"])
        us = tbl.column(0).cast("int64").to_pandas()
        in_range = ((us >= LO_US) & (us < HI_US)).sum()
        assert in_range == 0, (
            f"row group {row['row_group']} was pruned but holds "
            f"{in_range} in-range rows"
        )
    # and the kept groups cover every in-range row: total in-range count
    # equals the full-scan count
    full = (
        spark.read.parquet(sorted_lake)
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .count()
    )
    in_kept = 0
    for _, row in kept.iterrows():
        tbl = pf.read_row_group(int(row["row_group"]), ["l_shipdate"])
        us = tbl.column(0).cast("int64").to_pandas()
        in_kept += int(((us >= LO_US) & (us < HI_US)).sum())
    assert in_kept == full


def test_null_counts_reach_the_stats(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    path = str(tmp_path / "ev_nulls")
    ev.coalesce(1).write.parquet(path)
    expected = ev.filter(F.col("value").isNull()).count()
    stats = (
        footer_rowgroup_stats(spark, path, columns=["value"])
        .agg(F.sum("null_count").alias("nc"), F.sum("n_values").alias("nv"))
        .first()
    )
    assert stats["nc"] == expected
    assert stats["nv"] == ev.count() - expected


def test_unreadable_path_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        footer_rowgroup_stats(spark, str(tmp_path / "nope"))


def test_pruned_scan_reads_fewer_groups(spark, sorted_lake):
    """The pruned READ path: bit-identical rows to a full scan + filter,
    while planning strictly fewer row groups than the file holds."""
    from lab_etl_spark.sources.footer import (
        footer_rowgroup_stats,
        pruned_scan,
    )

    got = pruned_scan(
        spark,
        sorted_lake,
        "l_shipdate",
        LO_US,
        HI_US,
        ["l_orderkey", "l_shipdate", "l_quantity"],
    ).filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    want = (
        spark.read.parquet(sorted_lake)
        .select("l_orderkey", "l_shipdate", "l_quantity")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, want.collect()))
    assert a == b and len(a) > 0
    # and it actually skipped: kept groups < total groups
    stats = footer_rowgroup_stats(spark, sorted_lake, ["l_shipdate"])
    total = stats.count()
    from lab_etl_spark.sources.footer import prune_row_groups

    kept = prune_row_groups(stats, "l_shipdate", LO_US, HI_US).filter(
        "keep"
    ).count()
    assert 0 < kept < total


def test_pruned_scan_empty_range(spark, sorted_lake):
    """A predicate outside the data range prunes EVERYTHING and returns
    an empty frame with the declared schema, not an error."""
    from lab_etl_spark.sources.footer import pruned_scan

    out = pruned_scan(
        spark, sorted_lake, "l_shipdate", 1e18, 2e18, ["l_orderkey"]
    )
    assert out.columns == ["l_orderkey"]
    assert out.count() == 0


def test_misspelled_column_raises(spark, sf_dir, tmp_path):
    """A wrong prune column must fail LOUDLY on the read path, and the
    census must never yield zero stats rows that downstream pruning
    would read as drop-everything: a wanted-but-absent column emits one
    placeholder row per row group (NULL bounds, NULL physical_type),
    which the keep rule retains (ADVICE r10 — schema-evolved lakes)."""
    from lab_etl_spark.sources.footer import pruned_scan

    path = str(tmp_path / "ev")
    load_table(spark, sf_dir, "events").coalesce(1).write.parquet(path)
    # pruned_scan runs an action, so it can (and must) distinguish a
    # column present in NO file from schema evolution — KeyError.
    with pytest.raises(KeyError):
        pruned_scan(spark, path, "ship_date", 0, 1, ["event_id"])
    # the lazy census yields VISIBLE placeholder rows, not zero rows
    rows = footer_rowgroup_stats(
        spark, path, columns=["no_such_col"]
    ).collect()
    assert len(rows) > 0
    assert all(r["physical_type"] is None for r in rows)
    assert all(r["min_num"] is None and r["max_num"] is None for r in rows)
    assert all(r["rg_rows"] > 0 for r in rows)
    # and the keep rule retains every placeholder group
    dec = prune_row_groups(
        footer_rowgroup_stats(spark, path, columns=["no_such_col"]),
        "no_such_col",
        lo=0.0,
        hi=1.0,
    ).collect()
    assert len(dec) > 0 and all(r["keep"] for r in dec)


def test_schema_evolved_lake_keeps_columnless_files(spark, tmp_path):
    """A lake where LATER files lack the prune column (schema evolution)
    must keep those files' row groups — the ADVICE r10 medium finding:
    the old census emitted no stats row for them, so the decision never
    saw them and their rows were silently lost, violating the
    never-false-negative contract (and the old files[0]-only guard
    missed it entirely)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lab_etl_spark.sources.footer import pruned_scan

    path = tmp_path / "evolved"
    path.mkdir()
    # a.parquet carries (k, v); b.parquet predates the v column
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array([10.0, 20.0], pa.float64())}),
        str(path / "a.parquet"),
    )
    pq.write_table(
        pa.table({"k": pa.array([3, 4], pa.int64())}),
        str(path / "b.parquet"),
    )
    stats = footer_rowgroup_stats(spark, str(path), columns=["v"])
    rows = {r["file"]: r for r in stats.collect()}
    assert len(rows) == 2, "the v-less file vanished from the census"
    # pruning on v with a range matching NOTHING in a.parquet: b.parquet's
    # groups have no evidence and must survive
    dec = {
        r["file"]: r["keep"]
        for r in prune_row_groups(stats, "v", lo=100.0, hi=200.0).collect()
    }
    assert dec[str(path / "a.parquet")] is False  # bounds prove no match
    assert dec[str(path / "b.parquet")] is True  # no bounds -> unprunable
    got = sorted(
        r["k"] for r in pruned_scan(
            spark, str(path), "v", 100.0, 200.0, ["k"]
        ).collect()
    )
    assert got == [3, 4], (
        f"pruned_scan dropped the column-less file's rows (got {got})"
    )


def test_ns_unit_lake_max_bound_rounds_up(spark, tmp_path):
    """Nanosecond-unit foreign lakes: the timedelta decode floors sub-us
    components, so a max bound could sit up to 999 ns LOW and falsely
    prune a boundary row group (ADVICE r10).  The max bound must round
    UP (min keeps flooring — already conservative)."""
    import pandas as pd_
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lab_etl_spark.sources.footer import pruned_scan

    path = tmp_path / "ns_lake"
    path.mkdir()
    # one row at epoch + 999 ns: true value 0.999 us
    pq.write_table(
        pa.table({
            "k": pa.array([7], pa.int64()),
            "ts": pa.array(
                [pd_.Timestamp("1970-01-01 00:00:00.000000999")],
                pa.timestamp("ns"),
            ),
        }),
        str(path / "part.parquet"),
    )
    stats = footer_rowgroup_stats(spark, str(path), columns=["ts"])
    row = stats.collect()[0]
    assert row["min_num"] == 0.0  # floored — conservative for min
    assert row["max_num"] == 1.0  # rounded UP — conservative for max
    # predicate [0.9, 2.0) us contains the 0.999-us row; a floored max
    # (0.0) would have pruned the group
    got = pruned_scan(
        spark, str(path), "ts", 0.9, 2.0, ["k"]
    ).collect()
    assert [r["k"] for r in got] == [7]


def test_footer_stats_literal_ground_truth(spark, tmp_path):
    """Direction pin against HAND-COMPUTED constants, not a second
    engine: the q_parquet_footer_stats oracle re-derives stats from the
    data, so a shared misunderstanding (epoch unit, sign fold, null
    counting) could pass engine-vs-engine.  Here every expected number
    is written down by a human: a -0.0 min folds to 0.0, the timestamp
    lane is exact integer epoch microseconds (sub-second component
    included — the round-10 self-review found total_seconds()*1e6
    inexact), and nulls are counted out of n_values."""
    from datetime import datetime

    rows = [
        (5, 2.5, datetime(2020, 3, 4, 5, 6, 7, 123456), "b"),
        (1, -0.0, datetime(2020, 3, 4, 5, 6, 7, 123457), "a"),
        (9, None, datetime(2021, 1, 1, 0, 0, 0, 1), "c"),
    ]
    path = str(tmp_path / "truth")
    spark.createDataFrame(
        rows, "k BIGINT, v DOUBLE, ts TIMESTAMP, s STRING"
    ).coalesce(1).write.parquet(path)
    got = {
        r["column"]: r
        for r in footer_rowgroup_stats(spark, path).collect()
    }
    assert (got["k"]["min_num"], got["k"]["max_num"]) == (1.0, 9.0)
    assert (got["k"]["n_values"], got["k"]["null_count"]) == (3, 0)
    v = got["v"]
    assert (v["min_num"], v["max_num"]) == (0.0, 2.5)  # -0.0 folded
    assert str(v["min_num"]) == "0.0"  # positively signed zero
    assert (v["n_values"], v["null_count"]) == (2, 1)
    ts = got["ts"]
    # 2020-03-04T05:06:07.123456Z = 1583298367123456 us (hand-computed:
    # 18325 days * 86400 + 18367 s, * 1e6, + 123456 us)
    assert ts["min_num"] == 1583298367123456.0
    # 2021-01-01T00:00:00.000001Z = 1609459200000001 us
    assert ts["max_num"] == 1609459200000001.0
    assert (got["s"]["min_str"], got["s"]["max_str"]) == ("a", "c")
    assert got["s"]["min_num"] is None


def test_prune_row_groups_keeps_groups_of_column_less_files(
    spark, tmp_path
):
    """Round-12 review: with stats built columns=None (no placeholder
    rows), a file that predates the prune column must still surface its
    row groups as keep=true — absence of evidence cannot skip, and
    silently vanishing from the decision drops the file from any scan
    driven by the keep set."""
    from lab_etl_spark.sources.footer import (
        footer_rowgroup_stats,
        prune_row_groups,
    )

    old = spark.range(0, 50).select(F.col("id").alias("k"))
    new = spark.range(50, 100).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("x")
    )
    path = str(tmp_path / "evolved")
    old.coalesce(1).write.parquet(path)
    new.coalesce(1).write.mode("append").parquet(path)
    stats = footer_rowgroup_stats(spark, path)  # columns=None
    dec = prune_row_groups(stats, "x", 0.0, 10.0).collect()
    n_groups = (
        stats.select("file", "row_group").distinct().count()
    )
    assert len(dec) == n_groups, (
        "groups of the x-less file vanished from the decision"
    )
    kept_files = {r["file"] for r in dec if r["keep"]}
    xless = {
        r["file"]
        for r in stats.groupby("file")
        .agg(F.collect_set("column").alias("cols"))
        .collect()
        if "x" not in r["cols"]
    }
    assert xless and xless <= kept_files, (
        "the column-less file's groups must be conservatively kept"
    )
