"""Correctness under pathological key skew: rewrite events so ONE user owns
half the stream (the hot-key shape that breaks naive distributed plans),
then re-run the oracle value check for the queries whose plans have the
most to lose — salted joins, per-key windows, sessionization, sketches,
temporal lookups.  The driver's synthetic corpus is mild; this pins that
correctness is not an artifact of friendly key distributions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lab_etl_spark.catalog import TABLES, load_table
from lab_etl_spark.queries import load_all
from tests.compare import compare, duck_con

REGISTRY = load_all()

#: queries re-checked on the skewed corpus (oracle-backed, key-sensitive)
SKEW_SENSITIVE = [
    "q_skew_join_salted",
    "q_sessionize",
    "q_ewma_batch",
    "q_rolling_1h",
    "q_kmv_distinct",
    "q_retention",
    "q_scd2_lookup",
    "q_stream_session",
    "q_funnel",
    "q_interarrival",
    # round-5 additions with per-key windows / vocab joins: the hot user
    # owns half of every interval island and HLL register stream
    "q_interval_merge",
    "q_hll_portable",
    "q_hll_rollup",
    "q_kl_divergence",
    "q_bpe_train",
]


@pytest.fixture(scope="module")
def skew_dir(spark, sf_dir, tmp_path_factory):
    # single-FILE parquet per table (pandas writer): both engines read the
    # same layout the driver's testdata uses
    dst = tmp_path_factory.mktemp("sf_skew")
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        if t == "events":
            # half the stream lands on user 7; event ids stay unique so
            # every tie-break and dedup key still works
            df = df.withColumn(
                "user_id",
                F.when(F.col("event_id") % 2 == 0, F.lit(7)).otherwise(
                    F.col("user_id")
                ),
            )
        df.toPandas().to_parquet(str(dst / f"{t}.parquet"), index=False)
    return str(dst)


@pytest.mark.parametrize("name", SKEW_SENSITIVE)
def test_oracle_parity_under_skew(spark, skew_dir, name):
    q = REGISTRY[name]
    con = duck_con(skew_dir)
    compare(q.fn(spark, skew_dir), con.execute(q.oracle).df(), name)
