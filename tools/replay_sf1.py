#!/usr/bin/env python3
"""Replay the heaviest registered queries at sf0.1 AND sf1 (tools/gen_sf1.py)
and report the wall-time scaling factor per query — the empirical time
counterpart to tests/test_scale_growth_sf1.py's candidate-work pins.

Methodology matches bench.py: noop materialization (full column
evaluation, no driver deserialization), min-of-N INTERLEAVED passes so a
host steal storm must hit every pass to corrupt a number, and a map-only
floor probe per pass per sf to calibrate fixed job overhead.  A query
whose sf1/sf0.1 time ratio is ~<= the row-growth ratio (10x lineitem/
documents; less for queries dominated by fixed-size readouts) scales
linearly; a ratio near 100x means something quadratic is hiding.

Usage: python tools/replay_sf1.py [trials=2]   # prints a markdown table

Round-13 OPTIMIZATION phase: REGENERATED (the skip condition finally
tripped — the optimization diff touches sketches.py, advanced.py,
timeseries.py and similarity.py, all of which host REPLAY-listed
queries).  Fresh sf1 lake via tools/gen_sf1.py, full min-of-2
interleaved replay, zero failures; q_kcore and q_semdedup_kmeans were
re-measured min-of-3 isolated after a host steal storm inflated their
sf1 halves ~2.8x in the full run (see the artifact's `note`), landing
at 3.46x/3.96x — comfortably under their 9.2/6.3 ceilings.  The DML
layer keeps its OWN sf1 scale point: tools/measure_sf1_dml.py ->
replay_sf1_dml.json, ceiling-tested by tests/test_scale_growth_sf1.py::
test_dml_artifact_ratios_batch_priced.
Regenerate when any REPLAY-listed query's module diff is non-empty.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, "testdata_sf1")

#: the top of bench_r6_final.json's cost ranking plus the new sf1-motivated
#: q_semdedup_kmeans — the queries where a superlinear term would show.
HEAVIEST = [
    "q_entity_resolution", "q_label_propagation", "q_kcore",
    "q_shortest_path", "q_pagerank", "q_semdedup", "q_semdedup_kmeans",
    "q_graph_ann",
    "q_dedup_clusters", "q_bootstrap_ci", "q_triangle_count",
    "q_langid_confusion", "q_setsim_join", "q_dedup_minhash_lsh",
    "q_bloom_join_prune", "q_ewma_batch", "q_market_basket",
    "q_dedup_simhash", "q_lang_id_ngram", "q_importance_resampling",
    "q_dedup_ngram_jaccard", "q_dedup_containment", "q_negative_sampling",
    "q_dedup_embedding", "q_dedup_cross_source", "q_pricing_summary",
    # round-9 argmin-rewrite cohort: prototype-assignment stages whose
    # superlinear failure mode (points x prototypes shuffle) the rewrite
    # specifically removed — keep them measured so a regression shows
    "q_kmeans_lloyd", "q_pq_adc",
]


def replay(
    spark,
    names: list[str] | None = None,
    trials: int = 2,
) -> tuple[dict[str, dict[str, float]], dict[str, str], dict[str, float]]:
    """Measure the HEAVIEST queries at sf0.1 and sf1 on an existing
    session; returns ({name: {sf0.1, sf1, ratio}}, failed, floor) —
    importable by tests/test_scale_growth_sf1.py's live ceiling test so
    the ratio enforcement and this tool can never drift apart."""
    from lab_etl_spark.queries import load_all

    reg = load_all()
    names = [n for n in (names or HEAVIEST) if n in reg]

    # warm-up at sf0.01: compile every plan once outside the timings
    for n in names:
        try:
            reg[n].fn(spark, "/root/testdata/sf0.01").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as e:
            print(f"# warmup {n} failed: {e}", file=sys.stderr)
    print("# warmup complete", file=sys.stderr)

    dirs = [SF01, SF1]
    t = {d: {n: float("inf") for n in names} for d in dirs}
    failed: dict[str, str] = {}
    floor = {d: float("inf") for d in dirs}
    for p in range(trials):
        for d in dirs:
            for n in names:
                if n in failed:
                    continue
                try:
                    t0 = time.perf_counter()
                    df = reg[n].fn(spark, d)
                    df.write.format("noop").mode("overwrite").save()
                    t[d][n] = min(t[d][n], time.perf_counter() - t0)
                    del df
                except Exception as e:
                    # one red query must not abort a multi-hour replay and
                    # lose every other timing — record it and keep going
                    failed[n] = str(e).splitlines()[0][:200]
                    print(f"# FAILED {n} at {d}: {failed[n]}", file=sys.stderr)
                gc.collect()
                spark.catalog.clearCache()  # no warm-cache passes
            t0 = time.perf_counter()
            spark.read.parquet(f"{d}/lineitem.parquet").selectExpr(
                "l_orderkey", "l_quantity + 1.0 AS q1"
            ).write.format("noop").mode("overwrite").save()
            floor[d] = min(floor[d], time.perf_counter() - t0)
        print(f"# pass {p + 1}/{trials} done", file=sys.stderr)

    rows = {
        n: {
            "sf0.1": round(t[SF01][n], 3),
            "sf1": round(t[SF1][n], 3),
            "ratio": round(t[SF1][n] / t[SF01][n], 2),
        }
        for n in names
        if n not in failed
    }
    return rows, failed, {d: round(v, 4) for d, v in floor.items()}


def main() -> int:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if not os.path.isdir(SF1):
        print("sf1 lake absent — run tools/gen_sf1.py first", file=sys.stderr)
        return 1

    from lab_etl_spark.session import get_spark

    spark = get_spark("replay_sf1")
    rows, failed, floor = replay(spark, trials=trials)
    spark.stop()

    print("| query | sf0.1 s | sf1 s | time ratio (10x rows) |")
    print("|---|---|---|---|")
    for n, fmsg in failed.items():
        print(f"| {n} | FAILED | FAILED | {fmsg} |")
    for n, r in rows.items():
        print(f"| {n} | {r['sf0.1']:.2f} | {r['sf1']:.2f} | {r['ratio']:.2f}x |")
    print(f"| _map-only floor_ | {floor[SF01]:.2f} | {floor[SF1]:.2f} "
          f"| {floor[SF1] / floor[SF01]:.2f}x |")
    print(json.dumps({"queries": rows, "failed": failed, "floor": floor}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
