#!/usr/bin/env python3
"""sf1 scale point for the DML layer (round-13, VERDICT r12 #4).

The merge-on-read DML trio's 100 TB claim is "cost ∝ batch, never ∝
table".  This measures it empirically at two data decades — the same
upsert/purge/compact chain over a logged events table built from sf0.1
(100k rows) and sf1 (1M rows, tools/gen_sf1.py), with an IDENTICAL
batch at both scales — and records wall-clock and BYTES WRITTEN per
operation into ``replay_sf1_dml.json``.

Byte accounting is inode-exact: a new snapshot's bytes-written are the
sizes of files whose inode did NOT exist in the prior snapshot
(hardlinked carry-overs share inodes and cost zero bytes), plus the DV
sidecar.  What "∝ batch" predicts across the 10x table growth:

* upsert_dv (fixed 500-key batch): bytes ≈ flat (same batch lands),
  wall ≈ flat (bloom-pruned probe scans candidate files ∝ keys; the
  O(files) hardlink namespace walk is equal at equal file counts).
* purge_dv point-delete (one user): DV bytes ∝ MATCHED rows (~10x rows
  for the same user at sf1 — still KB against a GB table), wall bounded
  by the bloom-candidate scan, not the table.
* compact_dv: bytes ∝ AFFECTED files' contents, wall likewise.

tests/test_scale_growth_sf1.py::test_dml_artifact_ratios enforces
per-op ceilings on the committed artifact.

Usage: python tools/measure_sf1_dml.py        # writes replay_sf1_dml.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, "testdata_sf1")

#: equal file count at both scales so the O(files) hardlink walk — the
#: honest namespace cost of the dir-per-snapshot model — is held fixed
#: and the measured deltas isolate the data-dependent work
N_FILES = 32

#: fixed upsert batch: these event_ids exist at BOTH scales (ids are
#: dense from 0), so the CDC batch is identical in size and key set
BATCH_KEYS = 500

#: point-delete target: one user's rows (~rows/users per table)
PURGE_USER = 7


def _snapshot_bytes_written(table, m_prev: dict, m_new: dict) -> int:
    """Bytes of m_new's snapshot NOT hardlink-shared with m_prev's, plus
    the new DV sidecar when one was written this commit."""
    prev_dir = os.path.join(table.table_dir, m_prev["data_dir"])
    new_dir = os.path.join(table.table_dir, m_new["data_dir"])
    prev_inodes = set()
    if m_prev["data_dir"] != m_new["data_dir"]:
        for root, _d, names in os.walk(prev_dir):
            for n in names:
                prev_inodes.add(os.stat(os.path.join(root, n)).st_ino)
    out = 0
    if m_new["data_dir"] != m_prev["data_dir"]:
        for root, _d, names in os.walk(new_dir):
            for n in names:
                st = os.stat(os.path.join(root, n))
                if st.st_ino not in prev_inodes:
                    out += st.st_size
    if m_new.get("dv_dir") and m_new["dv_dir"] != m_prev.get("dv_dir"):
        dvd = os.path.join(table.table_dir, m_new["dv_dir"])
        for root, _d, names in os.walk(dvd):
            for n in names:
                out += os.stat(os.path.join(root, n)).st_size
    return out


def measure(spark, sf_dir: str, scratch: str) -> dict:
    from pyspark.sql import functions as F

    from lab_etl_spark.operators.commitlog import (
        LoggedTable,
        compact_dv,
        purge_dv,
        upsert_dv,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    table = LoggedTable(os.path.join(scratch, "events_dml"))
    table.commit(
        lambda d: ev.repartition(N_FILES, "event_id").write.parquet(d),
        op="ingest",
        spark=spark,
        stats_cols=["event_id"],
        bloom_cols=["event_id", "user_id"],
    )
    table_bytes = sum(
        os.stat(os.path.join(r, n)).st_size
        for r, _d, ns in os.walk(
            os.path.join(table.table_dir, table.latest()["data_dir"])
        )
        for n in ns
    )
    out: dict = {"table_rows": ev.count(), "table_bytes": table_bytes}

    # -- upsert: identical 500-key CDC batch at both scales
    batch = (
        ev.filter(F.col("event_id") < BATCH_KEYS)
        .withColumn("value", F.col("value") + F.lit(1000.0))
    )
    batch = batch.localCheckpoint()  # pre-compute: time the DML, not the scan
    m_prev = table.latest()
    t0 = time.perf_counter()
    m = upsert_dv(spark, table, batch, key="event_id")
    wall = time.perf_counter() - t0
    out["upsert"] = {
        "wall_s": round(wall, 3),
        "bytes_written": _snapshot_bytes_written(table, m_prev, m),
        "probe_files_scanned": m.get("probe_files_scanned"),
        "probe_files_total": m.get("probe_files_total"),
        "batch_rows": batch.count(),
    }

    # -- purge: point-delete one user (bloom-pruned probe)
    m_prev = table.latest()
    t0 = time.perf_counter()
    m = purge_dv(spark, table, point=("user_id", PURGE_USER))
    wall = time.perf_counter() - t0
    out["purge"] = {
        "wall_s": round(wall, 3),
        "bytes_written": _snapshot_bytes_written(table, m_prev, m),
        "rows_purged": m["rows_purged"],
        "probe_files_scanned": m.get("probe_files_scanned"),
        "probe_files_total": m.get("probe_files_total"),
    }

    # -- compact: materialize the accumulated DV (affected files only)
    m_prev = table.latest()
    t0 = time.perf_counter()
    m = compact_dv(spark, table)
    wall = time.perf_counter() - t0
    out["compact"] = {
        "wall_s": round(wall, 3),
        "bytes_written": _snapshot_bytes_written(table, m_prev, m),
        "files_rewritten": m["files_rewritten"],
        "files_linked": m["files_linked"],
    }
    return out


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from lab_etl_spark.session import get_spark

    if not os.path.isdir(SF1):
        print("sf1 lake absent — run tools/gen_sf1.py first")
        return 1
    spark = get_spark("measure_sf1_dml")
    result: dict = {"sf": {}}
    for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        scratch = tempfile.mkdtemp(prefix=f"dml_{label}_")
        try:
            result["sf"][label] = measure(spark, sf_dir, scratch)
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    a, b = result["sf"]["sf0.1"], result["sf"]["sf1"]
    result["ratios"] = {
        op: {
            "wall": round(b[op]["wall_s"] / max(a[op]["wall_s"], 1e-9), 2),
            "bytes": round(
                b[op]["bytes_written"]
                / max(a[op]["bytes_written"], 1), 2
            ),
        }
        for op in ("upsert", "purge", "compact")
    }
    result["table_growth"] = round(
        b["table_bytes"] / max(a["table_bytes"], 1), 2
    )
    with open(os.path.join(ROOT, "replay_sf1_dml.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["ratios"], indent=1))
    print("table bytes growth:", result["table_growth"])
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
