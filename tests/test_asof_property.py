"""Property test: asof_join_backward matches a brute-force per-row reference
on randomized inputs (keys, duplicate timestamps, missing matches)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lab_etl_spark.operators.asof import asof_join_backward

_row = st.tuples(
    st.integers(min_value=0, max_value=3),  # key
    st.integers(min_value=0, max_value=50),  # ts
    st.integers(min_value=-100, max_value=100),  # payload
)


def _brute(left_rows, right_rows):
    out = {}
    for i, (k, ts, v) in enumerate(left_rows):
        best = None
        for rk, rts, rv in right_rows:
            if rk == k and rts <= ts:
                # latest wins; ties on rts broken by the larger payload NOT
                # being defined — inputs are deduped on (key, ts) upstream
                if best is None or rts > best[0]:
                    best = (rts, rv)
        out[i] = best
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(_row, min_size=1, max_size=12),
    right=st.lists(_row, min_size=0, max_size=12),
)
def test_asof_matches_bruteforce(spark, left, right):
    # Dedup right side on (key, ts): the as-of contract assumes at most one
    # right row per (key, instant) — same precondition DuckDB ASOF has.
    seen = {}
    for k, ts, v in right:
        seen[(k, ts)] = v
    right_rows = [(k, ts, v) for (k, ts), v in seen.items()]
    left_rows = [(k, ts, v) for k, ts, v in left]

    ldf = spark.createDataFrame(
        [(k, ts, i, v) for i, (k, ts, v) in enumerate(left_rows)],
        "k bigint, ts bigint, row_id bigint, v bigint",
    )
    rdf = spark.createDataFrame(
        right_rows or [], "k bigint, ts bigint, rv bigint"
    )
    out = asof_join_backward(
        ldf, rdf, by=["k"], ts="ts", r_cols=["ts", "rv"]
    ).collect()
    expect = _brute(left_rows, right_rows)
    assert len(out) == len(left_rows)
    for r in out:
        best = expect[r.row_id]
        if best is None:
            assert r.asof_ts is None and r.asof_rv is None, r
        else:
            assert (r.asof_ts, r.asof_rv) == best, (r, best)
