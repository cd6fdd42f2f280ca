"""Lake-table catalog for the driver-generated parquet tables.

All queries go through :func:`load_table` so per-table normalization (the
ns-timestamp conversion for ``events``) happens exactly once, and a future
move to partitioned/bucketed lake layouts only touches this file.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import time
import uuid

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


#: repo-local warehouse for runtime scratch lakes (gitignored)
_WAREHOUSE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "spark-warehouse"
)

#: scratch dirs older than this are pruned on the next same-family call;
#: generous vs the seconds-scale window between plan build and collection
_SCRATCH_TTL_S = 1800.0

#: ANY-pid orphan horizon: dirs from other (usually dead) processes are
#: pruned past this age.  Round-11 finding: the same-pid-only rule leaked
#: every predecessor process's dirs for an entire round (2267 dirs /
#: ~900 MB of write-back pressure by late round — the io-family trend
#: gate flagged the drift).  Two hours is an order of magnitude beyond
#: any single run here, so a concurrent process cannot still be holding
#: a lazy plan over a dir this old.
_SCRATCH_ORPHAN_TTL_S = 7200.0


def scratch_dir(family: str, sf_dir: str) -> str:
    """Unique per-invocation scratch directory under the repo warehouse.

    Queries that round-trip through disk (JSONL export, z-order rewrite,
    schema-evolution batches) must never share a path across invocations:
    the returned DataFrame reads the directory LAZILY, so a later run
    overwriting the same fixed path silently changes an earlier result
    between plan-build and collection while per-group row counts stay
    identical — exactly the round-3 ``q_jsonl_roundtrip`` driver-mismatch
    signature.  The path is keyed on a hash of the RESOLVED ``sf_dir``
    (same-named basenames or different scale factors can't collide) plus a
    fresh uuid per call (concurrent bench/correctness runs can't either).
    Stale same-family siblings are pruned best-effort after
    ``_SCRATCH_TTL_S``, but within that window ONLY those created by THIS
    process (the pid is part of the dir name): a concurrent run holding a
    lazy DataFrame over its own scratch dir for longer than the TTL must
    never have it swept from under the plan by another process (round-4
    verdict item #4).  Dirs from OTHER pids are judged by LIVENESS first
    (round-12): a provably-dead owner's dirs sweep on the same short TTL
    (no lazy plan can outlive its JVM; round-11 measured 2267 orphans /
    ~900 MB of filesystem pressure building up within a round, and
    round-12 measured dead test processes' dirs inflating io-family
    bench timings 2-4x within one hour), a live owner's dirs are never
    swept regardless of age, and unparsable names fall back to the 2h
    ``_SCRATCH_ORPHAN_TTL_S`` age horizon.  ``spark-warehouse/`` stays
    gitignored runtime state either way.
    """
    now = time.time()
    mine = f"{family}_p{os.getpid()}_"
    try:
        for entry in os.listdir(_WAREHOUSE):
            path = os.path.join(_WAREHOUSE, entry)
            try:
                if entry.startswith(mine):
                    if now - os.path.getmtime(path) > _SCRATCH_TTL_S:
                        shutil.rmtree(path, ignore_errors=True)
                elif "_p" in entry:
                    # Liveness beats age in both directions.  A dir whose
                    # owning pid is provably DEAD (kill -0 raises
                    # ProcessLookupError) can hold no in-flight lazy plan
                    # — its JVM died with it — so it sweeps on the SHORT
                    # TTL; round-12 measured the 2h-only horizon leaving
                    # hundreds of dead test processes' dirs inflating the
                    # io-family bench 2-4x within a single hour.  A LIVE
                    # owner (incl. alive-other-uid PermissionError) is
                    # never swept regardless of age: a soak session can
                    # hold a lazy plan past any horizon.  Unparsable
                    # names keep the age-only 2h fallback.  Pid reuse
                    # errs toward leaking, never deleting early: a dead
                    # owner's reused pid keeps its dirs protected until
                    # the squatting process exits (rare, bounded by that
                    # process's lifetime, and the next sweep reclaims).
                    age = now - os.path.getmtime(path)
                    m = re.search(r"_p(\d+)_", entry)
                    alive = None
                    if m is not None:
                        try:
                            os.kill(int(m.group(1)), 0)
                            alive = True
                        except ProcessLookupError:
                            alive = False
                        except PermissionError:
                            alive = True
                    if alive is False:
                        if age > _SCRATCH_TTL_S:
                            shutil.rmtree(path, ignore_errors=True)
                    elif alive is None and age > _SCRATCH_ORPHAN_TTL_S:
                        shutil.rmtree(path, ignore_errors=True)
            except OSError:
                pass
    except OSError:
        pass
    key = hashlib.sha1(os.path.realpath(sf_dir).encode()).hexdigest()[:8]
    return os.path.join(
        _WAREHOUSE, f"{mine}{key}_{uuid.uuid4().hex[:8]}"
    )


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
