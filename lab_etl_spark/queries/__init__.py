"""Query catalog: every operator from SURVEY.md §2 that is exposed through the
driver harness registers here as a (spark_fn, oracle_sql) pair.

``spark_fn(spark, sf_dir) -> DataFrame`` is the Spark-native implementation;
``oracle_sql`` is the equivalent ANSI SQL DuckDB runs on the same parquet
(None for non-SQL-expressible ops → driver does a rows-only check).

Cross-engine determinism rules (see queries/exact.py):
  * sums/avgs of doubles accumulate in DECIMAL (exact) and cast back to double
  * array folds run left-to-right in both engines (aggregate ↔ list_reduce)
  * every ORDER BY carries a unique tie-break key
  * all computed columns share the same alias on both sides
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    bench: bool = True  # include in bench.py headline set
    tags: list[str] = field(default_factory=list)
    priority: int = 0  # lower = earlier in the driver-checked prefix


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = True,
    tags: list[str] | None = None,
    priority: int = 0,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name, fn, oracle, doc, bench, tags or [], priority)
        return fn

    return deco


# The driver's correctness harness checks only the FIRST 50 registered
# entries each round, but the registry has outgrown that cap, so coverage
# is made cumulative by ROTATING the window per round:
#
#   round 1: all 41 then-registered queries fit -> all driver-checked.
#   round 2: oracle-backed-first ordering -> the 50 core oracle queries.
#   round 3: the 18 round-2 additions + rows-only entries + round-3 adds.
#   round 4 (this list): the 15 late-round-3 advanced.py additions that
#     have never had a driver CORRECTNESS row, the two disk-round-trip
#     queries whose scratch dirs were made per-invocation-unique this
#     round (q_jsonl_roundtrip was round 3's one red row — the fixed
#     shared path, not the query logic), and the round-4 additions —
#     veterans (all green in r1/r2/r3) auto-fill the remaining window
#     slots in their round-2 order.
#
# Every name listed here is green in the local twin at sf0.01, so promoting
# it into the checked prefix is low-risk.  Keep this list <= ~40 so a core
# veteran cohort stays in every round's window as a regression canary.
_WINDOW_FRONT = [
    # late-round-3 advanced.py cohort, never driver-checked (oracle-backed)
    "q_global_share",
    "q_scd2_build",
    "q_vocab_oov",
    "q_source_mix_weights",
    "q_cdc_merge",
    "q_pagerank",
    "q_event_pattern",
    "q_schema_evolution",
    "q_null_semantics",
    "q_fuzzy_match",
    "q_doc_chunking",
    "q_group_sample",
    "q_robust_stats",
    "q_entity_resolution",
    # never driver-checked rows-only (mergeable-sketch algebra)
    "q_hll_rollup",
    # round 3's one red row: fixed shared scratch path made
    # per-invocation-unique this round — must re-appear to show green
    "q_jsonl_roundtrip",
    # same scratch-path pattern fixed this round — re-front to re-verify
    "q_zorder_skipping",
    # round-4 additions (registered later this round)
    "q_forecast_revenue",
    "q_volume_shipping",
    "q_shipmode_priority",
    "q_parts_supplier_count",
    "q_potential_promotion",
    "q_commitlog_roundtrip",
    # round-4 sketch/graph/time-series cohort
    "q_heavy_hitters_cms",
    "q_kmv_distinct",
    "q_bloom_join_prune",
    "q_triangle_count",
    "q_ewma_batch",
    "q_rolling_1h",
    # round-4 lake-layout cohort
    "q_bucketed_join",
    "q_partition_pruning",
    "q_incremental_agg",
    "q_linreg_trend",
    "q_time_travel",
    "q_user_purge",
    "q_histogram",
    "q_data_quality",
    "q_curation_pipeline",
    "q_stream_cms_merge",
    "q_orc_roundtrip",
    "q_video_frames",
    "q_sql_udf",
    "q_scd2_lookup",
    "q_dynamic_partition_pruning",
    "q_date_spine_fill",
]

# ROUND-5 ROTATION DUTY: the front above holds 45 entries, so CORRECTNESS_r04
# checks all of them plus 5 veterans; once it lands green, every query
# registered through EARLY round 4 has a driver row.  The LATE-round-4
# additions are outside this round's window (fronting them would push
# never-checked early-round-4 entries out) and are therefore round 5's
# first fronting duty, all local-twin-green at sf0.001/sf0.01:
#   q_setsim_join, q_dedup_passages, q_dedup_containment, q_bm25,
#   q_cooccurrence_pmi, q_stats_pruning, q_kmv_intersect, q_shortest_path,
#   q_weighted_sample, q_udtf_token_offsets, q_xml_roundtrip,
#   q_corr_matrix, q_bigram_novelty, q_changepoint, q_attribution,
#   q_stats_pruning's bloom complement q_point_lookup_bloom,
#   q_corrupt_records, q_seasonal_decompose, q_embedding_quantize,
#   q_negative_sampling, q_anomaly_seasonal, q_stream_enrich,
#   q_market_basket, q_recursive_cte, q_top_movers,
#   q_transition_matrix, q_rfm_segmentation, q_gini_concentration, and
#   rows-only q_dtw_distance + q_phash_dedup +
#   q_audio_fingerprint
# Round 5: front those thirty-two plus any round-4 front entry that came back
# red, then resume cycling veterans by the age of their last driver-green
# row (r1-cohort first — not driver-checked since round 2's window).


def load_all() -> dict[str, Query]:
    """Import every query module and return the registry, ordered so the
    driver's 50-entry checked prefix rotates across rounds (see
    ``_WINDOW_FRONT``): stale/never-checked entries first this round, then
    oracle-backed veterans (round-2 order: oracle-first, priority,
    definition order), then the rest.  Queries outside the prefix are still
    bench'd and value-verified locally by tests/test_oracle_parity.py at
    sf0.001 and sf0.01 — the identical rows+schema+value-hash check.
    """
    from . import (  # noqa: F401
        advanced,
        analytics,
        dedup,
        instruments,
        lakeops,
        multimodal_q,
        relational,
        scale,
        similarity,
        sketches,
        text,
        timeseries,
    )

    order = list(REGISTRY)
    front = {n: i for i, n in enumerate(_WINDOW_FRONT)}
    ordered = sorted(
        REGISTRY.values(),
        key=lambda q: (
            (0, front[q.name], False, 0, 0)
            if q.name in front
            else (1, 0, q.oracle is None, q.priority, order.index(q.name))
        ),
    )
    return {q.name: q for q in ordered}
