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
    # A concurrent process holding a lazy DataFrame over ITS scratch dir
    # past the TTL must never have it swept by this process's sweep.
    import os
    import time

    from lab_etl_spark import catalog

    monkeypatch.setattr(catalog, "_WAREHOUSE", str(tmp_path))
    old = time.time() - 10_000
    foreign = tmp_path / "fam_p99999999_deadbeef_cafe0000"
    foreign.mkdir()
    os.utime(foreign, (old, old))
    mine_old = tmp_path / f"fam_p{os.getpid()}_deadbeef_cafe0000"
    mine_old.mkdir()
    os.utime(mine_old, (old, old))
    p = catalog.scratch_dir("fam", "/root/testdata/sf0.001")
    assert foreign.exists(), "foreign-pid scratch dir must survive the sweep"
    assert not mine_old.exists(), "own stale scratch dir must be pruned"
    assert f"_p{os.getpid()}_" in os.path.basename(p)
