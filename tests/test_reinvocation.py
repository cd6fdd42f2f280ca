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
    # Liveness-first sweep (round 12, refining round 11's two age
    # horizons): a foreign dir is judged by whether its owning pid is
    # ALIVE — a live owner's dirs survive regardless of age (it may hold
    # a lazy DataFrame over them indefinitely), a provably-dead owner's
    # dirs sweep on the short TTL (no plan outlives its JVM; leaving
    # them for the 2h horizon let dead test processes' dirs inflate io
    # timings 2-4x within one hour), and unparsable names keep the 2h
    # age-only fallback.
    import os
    import time

    from lab_etl_spark import catalog

    monkeypatch.setattr(catalog, "_WAREHOUSE", str(tmp_path))
    now = time.time()
    mid = now - catalog._SCRATCH_TTL_S - 600  # stale, but under 2h
    ancient = now - catalog._SCRATCH_ORPHAN_TTL_S - 600
    # pid 1 is always alive (init) and never ours: the concurrent-run case
    foreign_live = tmp_path / "fam_p1_deadbeef_cafe0000"
    foreign_live.mkdir()
    os.utime(foreign_live, (ancient, ancient))
    foreign_dead_mid = tmp_path / "fam_p99999998_deadbeef_cafe0001"
    foreign_dead_mid.mkdir()
    os.utime(foreign_dead_mid, (mid, mid))
    foreign_dead_young = tmp_path / "fam_p99999997_deadbeef_cafe0002"
    foreign_dead_young.mkdir()  # dead owner but fresh: inside short TTL
    unparsable_mid = tmp_path / "fam_pxx_deadbeef_cafe0003"
    unparsable_mid.mkdir()
    os.utime(unparsable_mid, (mid, mid))
    unparsable_old = tmp_path / "fam_pyy_deadbeef_cafe0004"
    unparsable_old.mkdir()
    os.utime(unparsable_old, (ancient, ancient))
    mine_old = tmp_path / f"fam_p{os.getpid()}_deadbeef_cafe0000"
    mine_old.mkdir()
    os.utime(mine_old, (mid, mid))
    p = catalog.scratch_dir("fam", "/root/testdata/sf0.001")
    assert foreign_live.exists(), (
        "a LIVE process's dir must survive the sweep at any age"
    )
    assert not foreign_dead_mid.exists(), (
        "dead process's dir survived the short TTL"
    )
    assert foreign_dead_young.exists(), (
        "dead process's dir inside the short TTL must get its grace"
    )
    assert unparsable_mid.exists(), (
        "unparsable name must keep the conservative 2h horizon"
    )
    assert not unparsable_old.exists(), "unparsable ancient dir leaked"
    assert not mine_old.exists(), "own stale scratch dir must be pruned"
    assert f"_p{os.getpid()}_" in os.path.basename(p)
