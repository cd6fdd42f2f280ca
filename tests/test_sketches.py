"""Sketch-operator guarantees, checked against brute force on small inputs:

  * Count-Min never undercounts (est >= exact for EVERY key), and the
    registered query's threshold keeps every true-heavy token.
  * KMV has no false distinct-count when |D| < k (estimate is exact), and
    the (k-1)/h_k estimator lands within a loose 3/sqrt(k) relative band on
    the fixture data (determinism is already pinned by the oracle parity
    suite; this pins that the estimate is USEFUL, not just reproducible).
  * Bloom pruning never drops a real match (no false negatives by
    construction: all k bits of a present key are set).
  * Triangle enumeration equals brute force over the same support-filtered
    edge set.
  * Batch EWMA equals the sequential recurrence within the documented
    truncation bound 2^-EWMA_LAGS · max|value|.
"""

from __future__ import annotations

import hashlib


def _toks(con):
    return con.execute(
        "SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS t"
        " FROM documents"
    ).df()["t"]


def test_cms_never_undercounts_and_keeps_all_heavy(spark, sf_dir):
    from tests.compare import duck_con

    from lab_etl_spark.queries import load_all

    q = load_all()["q_heavy_hitters_cms"]
    out = {
        r["token"]: (r["cms_est"], r["exact_cnt"])
        for r in q.fn(spark, sf_dir).collect()
    }
    assert out, "no heavy hitters found at this sf"
    for tok, (est, exact) in out.items():
        assert est >= exact, (tok, est, exact)
    # every token whose TRUE count clears the threshold must be present
    # (CMS only overcounts, so thresholding the estimate cannot drop it)
    con = duck_con(sf_dir)
    toks = _toks(con)
    total = len(toks)
    from lab_etl_spark.queries.sketches import CMS_PHI

    truth = toks.value_counts()
    for tok, cnt in truth.items():
        if cnt >= total * CMS_PHI:
            assert tok in out, f"true heavy hitter {tok!r} missing"


def test_kmv_exact_below_k_and_bounded_error(spark, sf_dir):
    from lab_etl_spark.queries import load_all
    from lab_etl_spark.queries.sketches import KMV_K

    rows = load_all()["q_kmv_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["exact_distinct"] < KMV_K:
            assert r["est_distinct"] == float(r["exact_distinct"]), r
        else:
            rel = abs(r["est_distinct"] - r["exact_distinct"]) / r[
                "exact_distinct"
            ]
            assert rel < 3.0 / (KMV_K**0.5), r


def test_bloom_has_no_false_negatives():
    # pure-construction property on the hash family the query uses
    from lab_etl_spark.queries.sketches import BLOOM_BITS, BLOOM_HASHES

    def positions(key: int) -> list[int]:
        out = []
        for i in range(BLOOM_HASHES):
            h = hashlib.md5(f"bloom{i}:{key}".encode()).hexdigest()
            out.append(int(h[:8], 16) % BLOOM_BITS)
        return out

    keys = list(range(0, 5000, 7))
    bits = set()
    for k in keys:
        bits.update(positions(k))
    for k in keys:  # every inserted key must probe all-set bits
        assert all(p in bits for p in positions(k))


def test_triangles_match_bruteforce(spark, sf_dir):
    import duckdb

    from lab_etl_spark.queries import load_all

    got = {
        (r["a"], r["b"], r["c"])
        for r in load_all()["q_triangle_count"].fn(spark, sf_dir).collect()
    }
    from lab_etl_spark.queries.sketches import TRIANGLE_MIN_SUPPORT

    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM read_parquet('{sf_dir}/lineitem.parquet'))
        SELECT a.l_partkey p1, b.l_partkey p2
        FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {TRIANGLE_MIN_SUPPORT}
        """
    ).fetchall()
    eset = set(map(tuple, edges))
    adj: dict[int, set[int]] = {}
    for a, b in eset:
        adj.setdefault(a, set()).add(b)
    brute = set()
    for a, b in eset:
        for c in adj.get(b, ()):  # a < b < c by orientation
            if (a, c) in eset:
                brute.add((a, b, c))
    assert got == brute


def test_ewma_batch_matches_recurrence_within_truncation(spark, sf_dir):
    from lab_etl_spark.queries import load_all
    from lab_etl_spark.queries.timeseries import EWMA_LAGS

    # replay one user sequentially from the source table
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_id, user_id, value
        FROM read_parquet('{sf_dir}/events.parquet')
        WHERE user_id = (SELECT min(user_id)
                         FROM read_parquet('{sf_dir}/events.parquet'))
        ORDER BY ts, event_id
        """
    ).fetchall()
    assert rows
    got = {
        r["event_id"]: r["ewma"]
        for r in load_all()["q_ewma_batch"]
        .fn(spark, sf_dir)
        .where(f"user_id = {rows[0][1]}")
        .collect()
    }
    s, maxv = 0.0, max(abs(r[2]) for r in rows)
    for eid, _, v in rows:
        s = 0.5 * v + 0.5 * s  # the untruncated recurrence
        assert abs(got[eid] - s) <= 2.0 ** -(EWMA_LAGS - 1) * maxv + 1e-6, (
            eid,
            got[eid],
            s,
        )


def test_shortest_path_releases_persisted_edges(spark, sf_dir):
    from lab_etl_spark.queries import load_all

    jcache = spark._jsparkSession.sharedState().cacheManager()
    was_empty = jcache.isEmpty()
    rows = load_all()["q_shortest_path"].fn(spark, sf_dir).collect()
    assert rows and all(0 <= r.dist <= 3 for r in rows)
    # source node carries distance 0
    assert min(r.dist for r in rows) == 0
    # unpersist discipline (same contract as pagerank): the symmetrized
    # edge cache must be released before the frame is returned
    if was_empty:
        assert jcache.isEmpty(), "shortest_path left persisted blocks cached"


def test_kcore_reaches_fixpoint_at_shipped_rounds(spark, sf_dir):
    # The registered q_kcore unrolls KCORE_ROUNDS peels; the result is only
    # "the 3-core" (not just "3-core after R peels") if the peel has
    # converged by then.  Pin: one extra round changes nothing.
    from lab_etl_spark.operators.graph import kcore
    from lab_etl_spark.queries.sketches import (
        KCORE_K,
        KCORE_ROUNDS,
        copurchase_edges,
    )

    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    a = sorted(map(tuple, kcore(edges, KCORE_K, KCORE_ROUNDS).collect()))
    b = sorted(map(tuple, kcore(edges, KCORE_K, KCORE_ROUNDS + 1).collect()))
    assert a == b and len(a) > 0
    # every core vertex has induced degree >= k (defining property)
    assert all(d >= KCORE_K for _, d in a)
