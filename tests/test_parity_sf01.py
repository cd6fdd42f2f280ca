"""Scale-stability spot-check: cross-engine value parity at sf0.1.

The driver's correctness gate runs at sf0.01; tests/test_oracle_parity.py
covers sf0.001 and (via SPARK_GRAFT_TEST_SF_DIR) sf0.01.  This suite runs
a targeted sample at sf0.1 — 10x the driver scale — chosen for
floating-point discipline risk: exact-decimal sums feeding double
readouts, sigma/correlation boundaries, hash-derived sampling keys.  A
determinism idiom that only holds at small row counts (accumulation
width, boundary ulps, HUGEINT widening) fails HERE before it can fail on
a cluster.
"""

from __future__ import annotations

import pytest

from lab_etl_spark.queries import load_all

from .compare import compare, duck_con

SF01 = "/root/testdata/sf0.1"

#: float-discipline cross-section: exact-sum readouts, variance/correlation
#: boundaries, ln/sqrt readouts, hash-keyed sampling, window lag algebra
SAMPLE = [
    "q_pricing_summary",
    "q_acf",
    "q_anomaly_seasonal",
    "q_corr_matrix",
    "q_weighted_sample",
    "q_top_movers",
    "q_unigram_logprob",
    "q_bootstrap_ci",
    "q_dp_counts",
    "q_random_projection",
    "q_mutual_information",
    "q_linreg_trend",
    # round-5 batch: sketch readout, KL ln sums, k-means fold/mean chain,
    # DTW wavefront DP — each an exact-double discipline under 10x rows
    "q_hll_portable",
    "q_hll_rollup",
    "q_kl_divergence",
    "q_kmeans_lloyd",
    "q_dtw_distance",
    "q_skyline_2d",
    "q_interval_merge",
    "q_quantile_histogram",
    "q_bpe_train",
    "q_label_propagation",
    "q_abtest_cuped",
    "q_funnel_windowed",
    "q_rrf_fusion",
    # round-6 batch: subspace-fold distances + exact-decimal ADC sums, and
    # the md5-keyed bottom-k sample rank readout — both hash/fold
    # disciplines under 10x rows
    "q_pq_adc",
    "q_bottomk_quantile",
    # rational-ROUND class (late r6): queries whose outputs are small-
    # denominator rationals — the exact population that flipped at sf0.1
    # before the microunit/raw-quotient fixes.  Pinned here so a
    # reintroduced ROUND or DECIMAL re-cast fails at 10x immediately.
    "q_seasonal_decompose",
    "q_transition_matrix",
    "q_dedup_ngram_jaccard",
    "q_dedup_containment",
    "q_dedup_passages",
    "q_lsh_recall",
    # raw-quotient distribution windows (PERCENT_RANK/CUME_DIST emitted
    # unrounded after the allowlist retirement)
    "q_window_distribution",
    # late-r6 curation flagships: cell-join cosine folds + the ROUNDed
    # Gumbel/logw readouts (the LN-1ulp class absorber) under 10x rows
    "q_semdedup",
    "q_importance_resampling",
]

REGISTRY = load_all()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF01)
    yield c
    c.close()


@pytest.mark.parametrize("name", SAMPLE)
def test_sf01_parity(spark, con, name):
    q = REGISTRY[name]
    compare(q.fn(spark, SF01), con.execute(q.oracle).fetchdf(), name)
