"""Property tests: sessionization and grid interpolation match brute-force
references on randomized inputs (duplicate timestamps, exact-gap boundaries,
out-of-range grid points)."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lab_etl_spark.operators.interpolation import interpolate_to_grid
from lab_etl_spark.operators.sessionize import session_stats

_event = st.tuples(
    st.integers(min_value=0, max_value=2),  # user
    st.integers(min_value=0, max_value=8000),  # ts seconds
)


def _brute_sessions(rows, gap_s):
    """rows: (user, ts, event_id) → {user: (n_sessions, n_events, max)}."""
    out = {}
    by_user = {}
    for u, ts, eid in rows:
        by_user.setdefault(u, []).append((ts, eid))
    for u, evs in by_user.items():
        evs.sort()
        sizes, cur, prev = [], 0, None
        for ts, _ in evs:
            if prev is None or ts - prev > gap_s:
                if cur:
                    sizes.append(cur)
                cur = 0
            cur += 1
            prev = ts
        sizes.append(cur)
        out[u] = (len(sizes), len(evs), max(sizes))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(_event, min_size=1, max_size=25))
def test_sessionize_matches_bruteforce(spark, events):
    rows = [(u, ts, i) for i, (u, ts) in enumerate(events)]
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint, event_id bigint")
    got = {
        r.user_id: (r.n_sessions, r.n_events, r.max_session_events)
        for r in session_stats(
            df, gap_s=600, epoch=F.col("ts")
        ).collect()
    }
    assert got == _brute_sessions(rows, 600)


_sample = st.tuples(
    st.integers(min_value=0, max_value=1000),  # ts seconds
    st.integers(min_value=-50, max_value=50),  # value
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    samples=st.lists(_sample, min_size=2, max_size=15),
    grid=st.lists(
        st.integers(min_value=-100, max_value=1100), min_size=1, max_size=15
    ),
)
def test_interpolation_matches_numpy(spark, samples, grid):
    # contract precondition: one sample per instant
    dedup = {}
    for ts, v in samples:
        dedup[ts] = v
    pts = sorted(dedup.items())
    if len(pts) < 2:
        return
    xs = np.array([p[0] for p in pts], dtype=float)
    ys = np.array([p[1] for p in pts], dtype=float)
    grid = sorted(set(grid))

    sdf = spark.createDataFrame(
        [(F_ts, float(v)) for F_ts, v in pts], "ts bigint, value double"
    ).select(F.timestamp_seconds("ts").alias("ts"), "value")
    gdf = spark.createDataFrame([(g,) for g in grid], "ts bigint").select(
        F.timestamp_seconds("ts").alias("ts")
    )
    from datetime import timezone

    out = {
        r.ts.replace(tzinfo=timezone.utc).timestamp(): r.interp_value
        for r in interpolate_to_grid(sdf, gdf).collect()
    }
    assert len(out) == len(grid)
    for g in grid:
        got = out[float(g)]
        if g < xs[0] or g > xs[-1]:
            assert got is None, (g, got)
        else:
            want = float(np.interp(g, xs, ys))
            # operator output is rounded to 6 dp
            assert got is not None and abs(got - want) <= 5e-7 + 1e-9 * abs(
                want
            ), (g, got, want)


_iv_event = st.tuples(
    st.integers(min_value=0, max_value=2),  # user
    st.integers(min_value=0, max_value=3000),  # ts seconds
)


def _brute_cover(rows, dur):
    """rows: (user, ts, eid) → {user: (n_intervals, covered, max)} via
    explicit second-by-second union of [ts, ts+dur)."""
    out = {}
    by_user = {}
    for u, ts, _ in rows:
        by_user.setdefault(u, set()).update(range(ts, ts + dur))
    for u, secs in by_user.items():
        secs = sorted(secs)
        runs, start = [], secs[0]
        for a, b in zip(secs, secs[1:]):
            if b != a + 1:
                runs.append(a + 1 - start)
                start = b
        runs.append(secs[-1] + 1 - start)
        out[u] = (len(runs), sum(runs), max(runs))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(_iv_event, min_size=1, max_size=25))
def test_merge_intervals_matches_bruteforce(spark, events):
    from lab_etl_spark.operators.sessionize import merge_intervals

    rows = [(u, ts, i) for i, (u, ts) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint"
    )
    got = {
        r.user_id: (r.n_intervals, r.covered_s, r.max_interval_s)
        for r in merge_intervals(
            df, dur_s=60, epoch=F.col("ts")
        ).collect()
    }
    assert got == _brute_cover(rows, 60)
