"""Lake round-trip: write an instrument family partitioned, read it back
partition-pruned, and keep the committed oracle snapshot in sync.

The committed snapshot at ``lake/hfm`` is what the DuckDB oracle for
``q_lake_roundtrip`` reads; it is (re)built here from the same deterministic
pipeline, so a parser change that alters output values fails
``test_committed_lake_matches_pipeline`` locally before the driver ever
sees a parity break — rebuild via ``test_rebuild_committed_lake`` (opt-in
env flag) and commit the new files.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lab_etl_spark.queries.instruments import (
    _FIX,
    _LAKE_COLS,
    _LAKE_ORACLE_DIR,
    q_lake_roundtrip,
)

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(f"{_FIX}/HFM"), reason="reference HFM fixtures absent"
)


def _pipeline_rows(spark):
    from lab_etl_spark.sources import scan_hfm

    df = scan_hfm(spark, f"{_FIX}/HFM/*.tst").filter(
        F.col("run_mode") == "conductivity"
    )
    return sorted(
        tuple(r[c] for c in _LAKE_COLS) for r in df.select(*_LAKE_COLS).collect()
    )


@needs_fixtures
def test_rebuild_committed_lake(spark):
    """Builds lake/hfm if absent (or when LAB_ETL_REBUILD_LAKE=1 forces it).
    Normally a no-op assert that the snapshot exists."""
    if os.environ.get("LAB_ETL_REBUILD_LAKE") == "1" and os.path.isdir(
        _LAKE_ORACLE_DIR
    ):
        shutil.rmtree(_LAKE_ORACLE_DIR)
    if not os.path.isdir(_LAKE_ORACLE_DIR):
        from lab_etl_spark.sources import scan_hfm
        from lab_etl_spark.sources.sink import write_parquet

        write_parquet(
            scan_hfm(spark, f"{_FIX}/HFM/*.tst"),
            _LAKE_ORACLE_DIR,
            mode="overwrite",
            partition_by=["run_mode"],
        )
    assert os.path.isdir(f"{_LAKE_ORACLE_DIR}/run_mode=conductivity")


@needs_fixtures
def test_committed_lake_matches_pipeline(spark):
    # snapshot staleness guard: committed parquet == today's pipeline output
    if not os.path.isdir(_LAKE_ORACLE_DIR):
        pytest.skip("committed lake not built yet")
    snap = spark.read.parquet(_LAKE_ORACLE_DIR).filter(
        F.col("run_mode") == "conductivity"
    )
    got = sorted(
        tuple(r[c] for c in _LAKE_COLS)
        for r in snap.select(*_LAKE_COLS).collect()
    )
    assert got == _pipeline_rows(spark)


@needs_fixtures
def test_roundtrip_query_returns_written_rows(spark):
    out = q_lake_roundtrip(spark, "unused")
    rows = sorted(tuple(r[c] for c in _LAKE_COLS) for r in out.collect())
    assert rows == _pipeline_rows(spark)
    assert len(rows) > 0
    assert all(r[1] == "conductivity" for r in rows)


@needs_fixtures
def test_roundtrip_scan_is_partition_pruned(spark):
    # The read-back filter must reach the file source as a PartitionFilter —
    # at lake scale only the run_mode=conductivity directory may be listed.
    back = q_lake_roundtrip(spark, "unused")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "run_mode" in plan.split("PartitionFilters")[1].split("]")[0]
