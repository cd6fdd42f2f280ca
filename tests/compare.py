"""Cross-engine result comparison mimicking the driver's correctness gate:
row count + column-name schema + order-insensitive value comparison.

Stricter than a hash: on mismatch it reports the first differing rows so the
query can be fixed instead of guessing.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd

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


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 17 significant digits = exact double round-trip; queries are built
        # so both engines produce bit-identical doubles.
        return f"{v:.17g}"
    if isinstance(v, Decimal):
        return f"{float(v):.17g}"
    if isinstance(v, (datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return repr(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort()
    return out


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a pandas dtype to the kind the driver's value-hash is
    sensitive to: 'i' (integer) vs 'f' (float) vs everything else.

    DuckDB widens SUM(BIGINT) to HUGEINT, which ``fetchdf`` renders as
    float64 (``7949.0``) while Spark returns int64 (``7949``) — the
    driver's value-hash sees different strings while the old ``_norm_cell``
    collapsed them.  Failing on kind mismatch makes that class visible
    locally (round-4 verdict item #2; ``q_jsonl_roundtrip`` was red at the
    driver for two rounds because the twin masked exactly this).
    """
    k = s.dtype.kind
    if k in "iu":
        return "i"
    if k == "f":
        # A float column whose every value is integral usually means the
        # engine widened an integer aggregate (HUGEINT/DECIMAL -> float64).
        return "f"
    if k == "O":
        # A Spark DecimalType column reaches pandas as object/Decimal while
        # the DuckDB oracle renders DECIMAL as float64 — the driver's
        # value-hash sees Decimal('0.016393') vs 0.016393 as different
        # strings even when the values are identical (round-5 q_rrf_fusion:
        # a bare 1.0 literal in selectExpr made the division decimal).
        # Classify such columns 'd' so the kind check below rejects them.
        for v in s:
            if v is None:
                continue
            return "d" if isinstance(v, Decimal) else "O"
    return k


def compare(spark_df, duck_df: pd.DataFrame, name: str = "?") -> None:
    spd = spark_df.toPandas()
    assert sorted(spd.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch spark={sorted(spd.columns)} "
        f"duck={sorted(duck_df.columns)}"
    )
    for c in spd.columns:
        ka, kb = _dtype_kind(spd[c]), _dtype_kind(duck_df[c])
        if {ka, kb} == {"i", "f"}:
            raise AssertionError(
                f"{name}: column {c!r} integer-vs-float dtype kind mismatch "
                f"(spark={spd[c].dtype} duck={duck_df[c].dtype}); the "
                "driver's value-hash distinguishes 7949 from 7949.0 — cast "
                "the oracle aggregate (CAST(... AS BIGINT)) or the Spark "
                "column so both engines agree"
            )
        if "d" in {ka, kb} and ka != kb:
            raise AssertionError(
                f"{name}: column {c!r} decimal-vs-{'f' if 'f' in {ka, kb} else ka + kb} "
                f"dtype kind mismatch "
                f"(spark={spd[c].dtype} duck={duck_df[c].dtype}); a "
                "DECIMAL result column reaches the driver's value-hash as "
                "Decimal objects on one side and float64 on the other — "
                "CAST the output column to DOUBLE (bare N.M literals in "
                "selectExpr are DECIMAL in Spark SQL)"
            )
    assert len(spd) == len(duck_df), (
        f"{name}: row count spark={len(spd)} duck={len(duck_df)}"
    )
    a = normalize(spd)
    b = normalize(duck_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs duck):\n"
            + "\n".join(f"  {x}\n  {y}\n" for x, y in diffs)
        )
