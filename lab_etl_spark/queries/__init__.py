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
# entries each round, but the registry has outgrown that cap (74+ queries),
# so coverage is made cumulative by ROTATING the window per round:
#
#   round 1: all 41 then-registered queries fit -> all driver-checked.
#   round 2: oracle-backed-first ordering -> the 50 core oracle queries.
#   round 3 (this list): the 18 round-2 additions whose only verification so
#     far was the local twin harness (tests/test_oracle_parity.py), the
#     rows-only entries whose last driver rows date from round 1, and the
#     queries newly added this round — veterans (all green in r1/r2) fill
#     the remaining slots in their round-2 order.
#
# Every name listed here is green in the local twin at sf0.01, so promoting
# it into the checked prefix is low-risk.  Keep this list <= ~40 so a core
# veteran cohort stays in every round's window as a regression canary.
_WINDOW_FRONT = [
    # round-2 additions, never driver-checked (oracle-backed)
    "q_zscore_anomaly",
    "q_stratified_sample",
    "q_seq_packing",
    "q_training_shuffle",
    "q_embedding_lsh",
    "q_embedding_stats",
    "q_text_repetition",
    "q_contamination",
    "q_pii_redact",
    "q_tfidf",
    "q_quality_filter",
    "q_asof_join",
    "q_funnel",
    "q_sessionize",
    "q_retention",
    "q_interarrival",
    "q_stream_hourly_users",
    # never driver-checked rows-only (arbitrary stateful streaming)
    "q_stream_stateful_ewma",
    # rows-only entries last driver-checked in round 1
    "q_instrument_peak_hrr",
    "q_instrument_sta_mass_loss",
    "q_approx_distinct",
    "q_approx_percentile",
    "q_similarity_ivf",
    # round-2's one red row (HUGEINT oracle cast, fixed this round) — must
    # re-appear in the driver file to show green
    "q_hierarchical_rollup",
    # implementation reworked this round (code-point-array bucketing) —
    # promote for fresh driver eyes
    "q_lang_id_ngram",
    # round-3 additions
    "q_lake_roundtrip",
    "q_returned_items",
    "q_promo_revenue",
    "q_top_supplier",
    "q_large_volume_customer",
    "q_region_market_share",
    "q_json_functions",
    "q_doc_source_stats",
    "q_sequence_budget",
    "q_dedup_cross_source",
    "q_customer_order_counts",
    "q_small_qty_revenue",
    "q_idle_customers",
    "q_nation_year_profit",
    "q_disjunctive_join",
    "q_multimodal_decode",
    "q_window_distribution",
    "q_zorder_skipping",
    "q_frequent_ngrams",
    "q_jsonl_roundtrip",
    # de-vacuized this round (were 0-row == 0-row in r2, now return real
    # rows) — must re-appear in the driver file to prove the fix
    "q_anti_join",
    "q_dedup_embedding",
]

# ROUND-4 ROTATION DUTY: the late-round-3 queries/advanced.py additions past
# slot 50 have never been driver-checked (all green in the local twin at
# sf0.01): q_global_share, q_scd2_build, q_vocab_oov, q_source_mix_weights,
# q_cdc_merge, q_pagerank, q_event_pattern, q_schema_evolution,
# q_null_semantics, q_fuzzy_match, q_doc_chunking, q_group_sample,
# q_robust_stats, q_entity_resolution, and the rows-only q_hll_rollup.
# Front them next round, back-filled with veterans.


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
        multimodal_q,
        relational,
        scale,
        similarity,
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
