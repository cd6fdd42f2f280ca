"""Invocation-independence: calling a query's fn() twice in one session must
produce identical values, with the FIRST result still collectable after the
second invocation ran.

This pins the failure class behind round 3's only driver-red row
(q_jsonl_roundtrip): queries that write scratch lakes at build time and
read them back lazily silently change under a later invocation if the
scratch path is shared.  catalog.scratch_dir gives each invocation a
unique path; this test proves the property end-to-end for every
eager-writing and streaming-draining query (the bench=False set), plus a
couple of plan-only controls."""

from __future__ import annotations

import pytest

from lab_etl_spark.queries import load_all
from tests.compare import normalize

REGISTRY = load_all()

#: every query that executes work at fn() time (disk round-trips, streaming
#: drains, iterative materialization) — the population at risk — plus two
#: lazy controls.
AT_RISK = sorted(
    [n for n, q in REGISTRY.items() if not q.bench]
    + ["q_pricing_summary", "q_dedup_exact"]
)


@pytest.mark.parametrize("name", AT_RISK)
def test_second_invocation_does_not_disturb_first(spark, sf_dir, name):
    q = REGISTRY[name]
    first = q.fn(spark, sf_dir)
    a_early = normalize(first.toPandas())
    second = q.fn(spark, sf_dir)  # may overwrite state a shared path would
    b = normalize(second.toPandas())
    # the first DataFrame must STILL return its original values (lazy
    # re-collection after the second run is the round-3 failure mode)
    a_late = normalize(first.toPandas())
    assert a_early == a_late, f"{name}: first result changed under re-run"
    assert a_early == b, f"{name}: invocations disagree"
