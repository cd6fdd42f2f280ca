"""Streaming-drain profiler: where does an availableNow drain spend time?

Usage:
    python tools/profile_streaming.py ewma running_stats dedup cms

Builds each streaming job directly from streaming/jobs.py (same shapes the
q_stream_* queries drain), keeps the StreamingQuery handle, and prints each
micro-batch's ``durationMs`` breakdown (addBatch / getBatch / walCommit /
triggerExecution / commitOffsets) plus state-operator commit times — the
headless stand-in for the Spark UI's structured streaming tab (guide §7.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    which = sys.argv[1:] or ["ewma", "running_stats", "dedup", "cms"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from lab_etl_spark.session import get_spark
    from lab_etl_spark.streaming import jobs as J

    spark = get_spark("profile_streaming")

    def build(kind):
        ev = J.stream_events(spark, sf_dir)
        if kind == "ewma":
            return J.user_value_ewma(ev, alpha=0.3), "update"
        if kind == "running_stats":
            return J.user_running_stats(ev), "update"
        if kind == "dedup":
            return J.dedup_events(ev), "append"
        if kind == "cms":
            # mirror q_stream_cms_merge's stateful shape if present
            return J.user_running_stats(ev), "update"
        raise SystemExit(f"unknown kind {kind}")

    for kind in which:
        t0 = time.perf_counter()
        df, mode = build(kind)
        t1 = time.perf_counter()
        name = f"prof_{kind}"
        spark.catalog.dropTempView(name)
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        t2 = time.perf_counter()
        n = spark.table(name).count()
        t3 = time.perf_counter()
        print(f"== {kind}: build={t1 - t0:.2f}s drain={t2 - t1:.2f}s "
              f"read({n} rows)={t3 - t2:.2f}s")
        for p in q.recentProgress:
            d = p.get("durationMs", {})
            ops = [
                {
                    "rows": so.get("numRowsTotal"),
                    "commitMs": so.get("commitTimeMs"),
                    "mem": so.get("memoryUsedBytes"),
                }
                for so in p.get("stateOperators", [])
            ]
            print(
                f"   batch {p.get('batchId')}: in={p.get('numInputRows')} "
                f"durations={json.dumps(d)} state={json.dumps(ops)}"
            )

    spark.stop()


if __name__ == "__main__":
    main()
