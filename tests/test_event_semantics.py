"""Semantic direction pins for the event-ordering queries: oracle parity
replicates a reversed-order or flipped-sign formula faithfully, so planted
event logs assert the semantics point the right way — funnel stages must
be ORDERED, Markov removal effects must be POSITIVE for the conversion-
carrying channel, first/last touch must break ties the documented way,
and as-of alignment must take the latest STRICTLY-prior row (round-6
verdict item 6; the sibling of tests/test_ranking_directions.py)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from lab_etl_spark.queries import load_all

REGISTRY = load_all()

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(tmp_path, rows):
    """rows: (event_id, user_id, +seconds, event_type, value)."""
    pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": T0 + dt.timedelta(seconds=s),
                "user_id": uid,
                "event_type": et,
                "value": float(v),
                "props": "{}",
            }
            for eid, uid, s, et, v in rows
        ]
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    return str(tmp_path)


def test_funnel_counts_only_ordered_stages(spark, tmp_path):
    # user 1 converts in order; user 2 has all three events but the
    # purchase PRECEDES the click; user 3 clicks before viewing.  A
    # funnel that ignores ordering (pure existence counts) would report
    # 3/3/2; the ordered funnel must report 3 views, 2 ordered clicks,
    # 1 ordered purchase.
    sf = _events(
        tmp_path,
        [
            (1, 1, 0, "view", 1), (2, 1, 10, "click", 1),
            (3, 1, 20, "purchase", 5),
            (4, 2, 0, "view", 1), (5, 2, 30, "purchase", 5),
            (6, 2, 60, "click", 1),
            (7, 3, 0, "click", 1), (8, 3, 10, "view", 1),
        ],
    )
    row = REGISTRY["q_funnel"].fn(spark, sf).collect()[0]
    assert row.n_users == 3
    assert row.n_view == 3
    assert row.n_click_after_view == 2, row
    assert row.n_purchase_after_click == 1, row


def test_funnel_windowed_enforces_stage_anchored_deadlines(spark, tmp_path):
    # user 1: click 1 day after view, purchase 1 day after click — both
    # inside their 3-day windows.  user 2: click comes 5 days after the
    # view (outside the window anchored at t_view) — must NOT count even
    # though a purchase follows.  user 3: click in time, but the purchase
    # lands 5 days after the click — purchase must not count.
    day = 86400
    sf = _events(
        tmp_path,
        [
            (1, 1, 0, "view", 1), (2, 1, day, "click", 1),
            (3, 1, 2 * day, "purchase", 5),
            (4, 2, 0, "view", 1), (5, 2, 5 * day, "click", 1),
            (6, 2, 6 * day, "purchase", 5),
            (7, 3, 0, "view", 1), (8, 3, day, "click", 1),
            (9, 3, 6 * day, "purchase", 5),
        ],
    )
    row = REGISTRY["q_funnel_windowed"].fn(spark, sf).collect()[0]
    assert (row.n_users, row.n_view) == (3, 3)
    assert row.n_click_3d == 2, row
    assert row.n_purchase_3d == 1, row


def test_attribution_tie_breaks_and_buckets(spark, tmp_path):
    # user 1 journey: view -> click -> purchase.  First touch must credit
    # 'view', last touch 'click' — a swapped FIRST/LAST (or a frame that
    # includes the current row, crediting 'purchase' itself) flips these.
    # user 2 purchases with no prior events: both models credit 'none'.
    sf = _events(
        tmp_path,
        [
            (1, 1, 0, "view", 1), (2, 1, 10, "click", 1),
            (3, 1, 20, "purchase", 7),
            (4, 2, 0, "purchase", 3),
        ],
    )
    out = {
        (r.model, r.touch): (r.n_purchases, r.revenue)
        for r in REGISTRY["q_attribution"].fn(spark, sf).collect()
    }
    assert out[("first_touch", "view")] == (1, 7.0), out
    assert out[("last_touch", "click")] == (1, 7.0), out
    assert out[("first_touch", "none")] == (1, 3.0), out
    assert out[("last_touch", "none")] == (1, 3.0), out
    assert ("first_touch", "purchase") not in out, out
    assert ("last_touch", "purchase") not in out, out


def test_attribution_same_ts_tie_breaks_by_event_id(spark, tmp_path):
    # Two prior events at the IDENTICAL timestamp: the window orders by
    # (ts, event_id), so the lower event_id is the first touch and the
    # higher the last.  Without the event_id tie-break the result is
    # partitioning-dependent — this pins the documented determinism.
    sf = _events(
        tmp_path,
        [
            (10, 1, 0, "view", 1), (11, 1, 0, "click", 1),
            (12, 1, 5, "purchase", 9),
        ],
    )
    out = {
        (r.model, r.touch): r.n_purchases
        for r in REGISTRY["q_attribution"].fn(spark, sf).collect()
    }
    assert out == {("first_touch", "view"): 1, ("last_touch", "click"): 1}, out


def test_markov_removal_effect_sign_and_monopoly(spark, tmp_path):
    # Channel 'click' is on EVERY converting path (view journeys never
    # convert); removing click must zero the chain conversion probability
    # => removal_effect = 1 and attribution = 1 for click, 0 for the
    # never-on-path channels.  A flipped 1 - p_without/p_base (or swapped
    # base/without) would send click to 0 or negative.
    rows = []
    eid = 1
    for uid in range(1, 6):  # 5 users: click -> purchase
        rows += [(eid, uid, 0, "click", 1), (eid + 1, uid, 10, "purchase", 5)]
        eid += 2
    for uid in range(6, 11):  # 5 users: view -> (lost)
        rows += [(eid, uid, 0, "view", 1)]
        eid += 1
    sf = _events(tmp_path, rows)
    out = {
        r.channel: r
        for r in REGISTRY["q_attribution_markov"].fn(spark, sf).collect()
    }
    assert out["click"].removal_effect == 1.0, out["click"]
    assert out["click"].attribution == 1.0, out["click"]
    assert out["view"].removal_effect == 0.0, out["view"]
    assert out["click"].p_base > 0, out["click"]
    assert out["click"].p_without == 0.0, out["click"]


def test_retention_cohorts_anchor_at_first_seen_day(spark, tmp_path):
    # user 1 first seen day 0, active again day 2 (twice — distinct must
    # collapse); user 2 first seen day 1 only.  Offsets must be relative
    # to each user's OWN cohort day, not a global minimum.
    day = 86400
    sf = _events(
        tmp_path,
        [
            (1, 1, 0, "view", 1),
            (2, 1, 2 * day, "click", 1), (3, 1, 2 * day + 60, "view", 1),
            (4, 2, day, "view", 1),
        ],
    )
    out = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in REGISTRY["q_retention"].fn(spark, sf).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }, out


def test_asof_align_takes_latest_strictly_prior_click(spark, tmp_path):
    # clicks at t=0 and t=10; purchase at t=10 — the click AT the
    # purchase timestamp is ordered before the purchase only by the
    # (ts, event_id) tie-break, and the frame ends at 1 PRECEDING, so
    # the purchase sees the t=10 click (same ts, smaller event_id =
    # earlier row) — "latest row ordered strictly before mine", the
    # as-of boundary convention shared with the DuckDB oracle.  A
    # second purchase at t=20 must also pick the t=10 click (latest,
    # not first), and a purchase with no prior click gets NULL.
    sf = _events(
        tmp_path,
        [
            (1, 1, 0, "click", 1), (2, 1, 10, "click", 1),
            (3, 1, 10, "purchase", 5), (4, 1, 20, "purchase", 5),
            (5, 2, 0, "purchase", 2),
        ],
    )
    out = {
        r.event_id: r.prev_click_ts
        for r in REGISTRY["q_asof_align"].fn(spark, sf).collect()
    }
    t10 = T0 + dt.timedelta(seconds=10)
    assert out[3] == t10, out
    assert out[4] == t10, out
    assert out[5] is None, out


def test_asof_join_boundary_is_at_or_before(spark, tmp_path):
    # q_asof_join matches each click to the latest error with
    # error.ts <= click.ts (DuckDB ASOF '>=', i.e. AT-or-before — unlike
    # q_asof_align's strictly-before frame).  An error at the click's
    # exact timestamp must therefore match; a later error must not; a
    # click before any error gets NULLs.
    sf = _events(
        tmp_path,
        [
            (1, 1, 0, "click", 1),          # before any error -> NULL
            (2, 1, 5, "error", 9),
            (3, 1, 5, "click", 1),          # same-ts error matches (<=)
            (4, 1, 10, "click", 1),         # latest prior is still t=5
            (5, 1, 20, "error", 7),
        ],
    )
    out = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in REGISTRY["q_asof_join"].fn(spark, sf).collect()
    }
    t5 = T0 + dt.timedelta(seconds=5)
    assert out[1] == (None, None), out
    assert out[3] == (t5, 9.0), out
    assert out[4] == (t5, 9.0), out
