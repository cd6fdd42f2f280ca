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
    # lazy .persist() carriers: a second invocation cache-HITS the first's
    # entry (Spark caches by analyzed plan), which must be value-neutral
    + ["q_bpe_train", "q_kl_divergence", "q_kmeans_lloyd", "q_hll_portable"]
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


def test_scratch_ttl_prunes_only_own_pid_dirs(tmp_path, monkeypatch):
    # Two horizons (round 11): within the short TTL window only THIS
    # process's stale dirs are swept — a concurrent process holding a
    # lazy DataFrame over ITS dir past the short TTL must survive.  But
    # a foreign dir past the ORPHAN horizon (2h — beyond any plausible
    # live run) is a dead process's leak and must be reclaimed, else
    # every short-lived process leaks its lakes for a whole round.
    import os
    import time

    from lab_etl_spark import catalog

    monkeypatch.setattr(catalog, "_WAREHOUSE", str(tmp_path))
    now = time.time()
    mid = now - catalog._SCRATCH_TTL_S - 600  # stale, but under 2h
    ancient = now - catalog._SCRATCH_ORPHAN_TTL_S - 600
    foreign_live = tmp_path / "fam_p99999999_deadbeef_cafe0000"
    foreign_live.mkdir()
    os.utime(foreign_live, (mid, mid))
    foreign_dead = tmp_path / "fam_p99999998_deadbeef_cafe0001"
    foreign_dead.mkdir()
    os.utime(foreign_dead, (ancient, ancient))
    mine_old = tmp_path / f"fam_p{os.getpid()}_deadbeef_cafe0000"
    mine_old.mkdir()
    os.utime(mine_old, (mid, mid))
    p = catalog.scratch_dir("fam", "/root/testdata/sf0.001")
    assert foreign_live.exists(), (
        "foreign dir inside the orphan horizon must survive the sweep"
    )
    assert not foreign_dead.exists(), "dead process's ancient dir leaked"
    assert not mine_old.exists(), "own stale scratch dir must be pruned"
    assert f"_p{os.getpid()}_" in os.path.basename(p)
