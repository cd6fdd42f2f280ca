"""Lake-table catalog for the driver-generated parquet tables.

All queries go through :func:`load_table` so per-table normalization (the
ns-timestamp conversion for ``events``) happens exactly once, and a future
move to partitioned/bucketed lake layouts only touches this file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one lake table, normalized to analysis-ready types.

    ``events.ts`` is stored as parquet INT64 TIMESTAMP(NANOS) which Spark
    cannot represent natively; with ``spark.sql.legacy.parquet.nanosAsLong``
    it scans as a long, and we convert ns→µs with *integer* division (the
    values exceed 2^53, so float division would corrupt them) into a
    TIMESTAMP_NTZ matching every other table's timestamp flavor.
    """
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition IFF the plan has fewer input partitions than
    the session's parallelism.

    A small dim stored as one parquet row group scans as ONE task, and any
    expensive derived work fused into that stage (shingle explodes, hash
    families, per-row DPs) serializes with it — measured 3.4 s -> 1.2 s on
    q_lang_id_ngram at sf0.1.  The shuffle moves only the source bytes
    (hundreds of KB for these dims), and the guard makes this a structural
    no-op whenever the source is already split (a real lake at 100 TB), so
    map-only plans on properly laid-out data stay map-only.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
