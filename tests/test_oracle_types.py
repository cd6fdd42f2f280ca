"""Static oracle-type audit (round-4 verdict item #2).

DuckDB widens ``SUM(BIGINT)`` to HUGEINT; ``fetchdf`` renders HUGEINT as
float64 (``7949.0``) while the matching Spark aggregate returns int64
(``7949``), so the driver's value-hash mismatches even though rows and
schema agree — this is the exact mechanism behind the only driver-red row
in the project's history (``q_jsonl_roundtrip``, rounds 3-4).

This test plans every registered oracle with ``DESCRIBE`` (no data is
read, so it is fast and covers all 160+ oracles) and fails if any result
column is HUGEINT/INT128: the fix is always ``CAST(... AS BIGINT)``, the
repo's established convention (e.g. ``q_source_mix_weights``).

DECIMAL result columns are deliberately allowed: both engines render them
as float64 through pandas (``q_histogram`` is driver-green with a
DECIMAL(23,1) bin edge), and the repo's exact-accumulation idiom reads
wide decimals out through strings anyway (queries/exact.py).
"""

from __future__ import annotations

from lab_etl_spark.queries import load_all

from .compare import duck_con
from .conftest import SF_DIR


def test_no_hugeint_oracle_columns():
    con = duck_con(SF_DIR)
    offenders = {}
    for name, q in load_all().items():
        if not q.oracle:
            continue
        rows = con.execute(f"DESCRIBE {q.oracle}").fetchall()
        hits = [
            (col, typ)
            for col, typ, *_ in rows
            if "HUGEINT" in typ or "INT128" in typ
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "oracle result columns with HUGEINT type (pandas renders these as "
        "float64 while Spark returns int64, breaking the driver's "
        "value-hash) — wrap the aggregate in CAST(... AS BIGINT): "
        f"{offenders}"
    )
