#!/usr/bin/env python3
"""Simulate the driver's correctness window before the driver runs it.

Runs the FIRST N (default 50 — the driver's checked prefix) registry
entries through the driver-identical compare (row count + column names +
value parity) against their DuckDB oracles at sf0.01, in registry order.
Rows-only entries are executed and counted.  This is the per-round
pre-flight: a red row here is a red row in CORRECTNESS_r{N}.json.

Usage:
    python tools/simulate_window.py            # first 50 at sf0.01
    python tools/simulate_window.py 201        # the whole registry
    SPARK_GRAFT_SIM_SF_DIR=... python tools/simulate_window.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

    from lab_etl_spark.queries import load_all
    from lab_etl_spark.session import get_spark
    from tests.compare import compare, duck_con

    spark = get_spark("simulate_window")
    con = duck_con(sf)
    reg = load_all()
    names = list(reg)[:n]
    green = rows_only = 0
    reds: list[tuple[str, str]] = []
    for i, name in enumerate(names, 1):
        q = reg[name]
        try:
            if q.oracle:
                compare(q.fn(spark, sf), con.execute(q.oracle).fetchdf(), name)
                green += 1
            else:
                q.fn(spark, sf).collect()
                rows_only += 1
        except Exception as e:  # noqa: BLE001 — report every red, keep going
            reds.append((name, str(e).splitlines()[0][:200]))
        finally:
            # drop cached plans between queries (CacheManager holds strong
            # refs; 207 queries x persisted sub-frames would accumulate)
            spark.catalog.clearCache()
        print(f"[{i}/{len(names)}] {name}: "
              f"{'RED' if reds and reds[-1][0] == name else 'ok'}",
              file=sys.stderr)
    print(f"window sim @ {sf}: {green} hash-green, {rows_only} rows-only, "
          f"{len(reds)} red of {len(names)}")
    for name, err in reds:
        print(f"  RED {name}: {err}")
    spark.stop()
    return 1 if reds else 0


if __name__ == "__main__":
    raise SystemExit(main())
