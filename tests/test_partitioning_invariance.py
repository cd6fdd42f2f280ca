"""Partitioning-invariance pins: the determinism story's direct evidence.

Every exact-decimal accumulator, sequential fold, and hash-derived key in
this repo claims "bit-identical across partitionings, engines, and cluster
sizes".  The oracle checks prove the cross-ENGINE half; these prove the
cross-PARTITIONING half by running the same query under radically
different ``spark.sql.shuffle.partitions`` (a runtime conf) and requiring
EXACT row equality — any order-dependent double accumulation shows up as
a last-ulp diff the first time the shuffle layout changes, which is
exactly what happens on a real cluster when executors scale.
"""

from __future__ import annotations

import pytest

from lab_etl_spark.queries import load_all

from .conftest import SF_DIR

REGISTRY = load_all()

#: determinism-sensitive cross-section: decimal-sum readouts, broadcast
#: k-means folds, iterative rank sums, LN-derived sampling keys, sketch
#: registers, cell-join cosine folds
CASES = [
    "q_pricing_summary",
    "q_kmeans_lloyd",
    "q_pagerank",
    "q_mutual_information",
    "q_hll_portable",
    "q_weighted_sample",
    "q_semdedup",
    "q_importance_resampling",
    # round-7 adds: Lloyd assignment + within-cell cosine prune (seed
    # selection, argmin windows, and DECIMAL centroid means must all be
    # layout-independent), and the 3-hop beam traversal (every hop's
    # top-beam cut rides raw-cosine ranks)
    "q_semdedup_kmeans",
    "q_graph_ann",
]


def _rows(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    # sort by every column so row order itself can't mask/introduce diffs
    return [tuple(r) for r in df.orderBy(*df.columns).collect()]


@pytest.mark.parametrize("name", CASES)
def test_shuffle_partitioning_invariance(spark, name):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    try:
        spark.conf.set(key, "32")
        wide = _rows(spark, name)
        spark.conf.set(key, "3")
        narrow = _rows(spark, name)
    finally:
        spark.conf.set(key, before)
    assert wide == narrow, f"{name}: output depends on shuffle partitioning"
