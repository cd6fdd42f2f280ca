"""Pin that AQE's skew-join split actually FIRES under a hot key in this
engine's session config — the "AQE handles moderate skew" claim becomes a
tested mechanism instead of an asserted one (round-6 verdict item 7).

Scope note (what AQE can and cannot split, learned by testing): Spark's
OptimizeSkewedJoin only rewrites SMJ(Sort(ShuffleStage), Sort(
ShuffleStage)) — a join whose input partitioning is REUSED from an
upstream aggregate (the dedup pipeline's pairs->sizes join, where a
HashAggregate sits between the sort and the exchange) is structurally
unsplittable, because duplicating a partition would re-run the agg.  The
dedup operators therefore bound their own skew (posting-list formulation
+ the max_shingle_freq stop-shingle cap caps any doc's pair fan-out);
the splittable shape below is the residual enrichment/verify join class
(candidates back to documents, events to entities) where a hot key is
data-driven and AQE is the backstop.  operators/dedup.py's design note
cross-references this test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

#: production-default thresholds scaled to the fixture's KB-sized shuffle
#: (defaults are 256 MB partitions; the mechanism is identical);
#: autoBroadcast off so the join stays a shuffled SMJ.
_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8192",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_skew_join_split_fires_on_hot_key(spark, skew_confs):
    # hot-key candidate table: doc 0 is a near-dup hub paired with every
    # other doc (the shape a mega-cluster produces), verified against a
    # uniform per-doc attribute table — the dedup family's
    # candidates-back-to-documents enrichment join.  localCheckpoint
    # makes each side a materialized leaf so the SMJ's children are bare
    # shuffle stages — the splittable shape (see module doc).
    n = 60000
    cands = (
        spark.range(n)
        .select(
            F.lit(0).alias("doc_a"),
            (F.col("id") + 1).alias("doc_b"),
            # payload pads the row so the hot partition clears the
            # (fixture-scaled) 16 KB skew threshold after compression
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .localCheckpoint(eager=True)
    )
    attrs = (
        spark.range(n + 1)
        .select(
            F.col("id").alias("doc_a"),
            F.sha2(F.col("id").cast("string"), 512).alias("attr"),
        )
        .localCheckpoint(eager=True)
    )
    joined = cands.join(attrs, "doc_a").select("doc_a", "doc_b", "attr")
    got = joined.count()
    assert got == n

    # count() planned its own query; re-execute the join frame itself so
    # ITS queryExecution holds the finalized adaptive plan
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan[:200]
    assert "skew=true" in plan, (
        "AQE did not mark the hot partition skewed; plan:\n" + plan[:4000]
    )
