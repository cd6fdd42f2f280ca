"""Degenerate-input robustness: every representative query must run (not
crash) on completely EMPTY lake tables and return an empty (or
zero-counter) result.  At 100 TB empty inputs are routine — a new
partition with no data yet, a filter that matches nothing, a fresh
tenant — and an engine that NPEs on them fails its first day."""

from __future__ import annotations

import pytest

from lab_etl_spark.catalog import TABLES
from lab_etl_spark.queries import load_all

#: cross-section of the surface: scan/agg, LSH dedup, window fold, sketches,
#: graph, composed pipeline, sessionization, as-of, merge algebra, range
#: window, temporal lookup, profiling, bloom join, regression, interpolation
SAMPLE = [
    "q_pricing_summary",
    "q_dedup_minhash_lsh",
    "q_ewma_batch",
    "q_heavy_hitters_cms",
    "q_kmv_distinct",
    "q_triangle_count",
    "q_curation_pipeline",
    "q_sessionize",
    "q_asof_join",
    "q_incremental_agg",
    "q_rolling_1h",
    "q_scd2_lookup",
    "q_histogram",
    "q_bloom_join_prune",
    "q_linreg_trend",
    "q_interp_linear",
    "q_tfidf",
    # round-5 additions: iterative peel, LM scoring, resampling, eval join
    "q_kcore",
    "q_unigram_logprob",
    "q_bootstrap_ci",
    "q_acf",
]

#: queries whose contract is a fixed-row summary even over no data
_FIXED_ROWS = {"q_funnel": 1, "q_lsh_recall": 1}  # global aggregates


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.mark.parametrize("name", SAMPLE + list(_FIXED_ROWS))
def test_query_survives_empty_tables(spark, empty_dir, name):
    n = load_all()[name].fn(spark, empty_dir).count()
    assert n == _FIXED_ROWS.get(name, 0), (name, n)
