"""Independent invariants for the late-round-5 operators — each checked
against a third implementation (numpy / brute force) or a structural bound,
so correctness doesn't rest on the DuckDB oracle alone (the oracle could in
principle share a conceptual bug with the Spark plan; a brute-force replay
can't).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lab_etl_spark.catalog import load_table
from lab_etl_spark.queries import load_all

REGISTRY = load_all()


def test_skyline_matches_bruteforce(spark, sf_dir):
    """The bucketed prune + survivor anti-join equals O(n^2) dominance."""
    pts = [
        (r["p_partkey"], r["p_size"], float(r["p_retailprice"]))
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_size", "p_retailprice")
        .collect()
    ]
    brute = {
        k
        for k, s, p in pts
        if not any(
            (s2 >= s and p2 <= p) and (s2 > s or p2 < p)
            for _, s2, p2 in pts
        )
    }
    got = {
        r["p_partkey"]
        for r in REGISTRY["q_skyline_2d"].fn(spark, sf_dir).collect()
    }
    assert got == brute and len(brute) > 0


def test_label_propagation_two_cliques(spark):
    """Disconnected cliques converge to distinct min-id communities."""
    from lab_etl_spark.operators.graph import label_propagation

    edges = []
    for base in (1, 10):
        members = list(range(base, base + 4))
        edges += [
            (a, b) for a in members for b in members if a < b
        ]
    df = spark.createDataFrame(edges, ["p1", "p2"])
    out = {
        r["v"]: r["label"]
        for r in label_propagation(df, 3).collect()
    }
    assert {out[v] for v in (1, 2, 3, 4)} == {1}
    assert {out[v] for v in (10, 11, 12, 13)} == {10}


def test_quantile_histogram_bound_holds(spark, sf_dir):
    """Bin-midpoint estimate is within BIN/2 of the exact percentile by
    construction — the sketch's advertised error contract."""
    rows = REGISTRY["q_quantile_histogram"].fn(spark, sf_dir).collect()
    assert {r["qpct"] for r in rows} == {50, 90, 99}
    for r in rows:
        assert abs(r["est_mid"] - r["exact_pctl"]) <= 500.0 + 1e-6, r


def test_kmeans_matches_numpy_replay(spark, sf_dir):
    """Replay the exact Lloyd schedule in numpy float64 (third engine):
    same seeding, same tie-break, same mean and WCSS discipline — cluster
    sizes and WCSS (rounded 6) must agree."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb]
    )
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    K = 4
    C = X[ids < K]

    def assign(C):
        # squared L2 via the same fold order: sum of (x-c)^2 left to right
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1), d  # argmin ties -> lowest index (numpy)

    a1, _ = assign(C)
    C1 = np.stack([X[a1 == c].mean(axis=0) for c in range(K)])
    # exact-decimal means vs numpy float means can differ in the last ulp;
    # assignments are robust to that at this data scale, so compare the
    # OUTPUT contract (sizes + wcss within 1e-3), not bit equality.
    a2, d2 = assign(C1)
    sizes = {c: int((a2 == c).sum()) for c in range(K)}
    wcss = {
        c: float(d2[a2 == c, c].sum()) for c in range(K)
    }
    got = {
        r["cluster_id"]: (r["n_points"], r["wcss"])
        for r in REGISTRY["q_kmeans_lloyd"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(sizes)
    for c in range(K):
        assert got[c][0] == sizes[c], (c, got[c], sizes[c])
        assert got[c][1] == pytest.approx(wcss[c], abs=1e-3), c


def test_interval_merge_structural_bounds(spark, sf_dir):
    """Merged cover: per user 1 <= n_intervals <= n_events,
    600 <= covered_s <= 600 * n_events, max <= covered."""
    out = {
        r["user_id"]: r
        for r in REGISTRY["q_interval_merge"].fn(spark, sf_dir).collect()
    }
    nev = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(out) == set(nev)
    for u, r in out.items():
        assert 1 <= r["n_intervals"] <= nev[u]
        assert 600 <= r["covered_s"] <= 600 * nev[u]
        assert r["max_interval_s"] <= r["covered_s"]


def test_hll_portable_error_within_design_band(spark, sf_dir):
    """|rel_error| well inside a few standard errors of the m=256 sketch
    (1.04/sqrt(256) = 6.5%; linear counting tightens the small range)."""
    for r in REGISTRY["q_hll_portable"].fn(spark, sf_dir).collect():
        assert abs(r["rel_error"]) < 0.13, r


def test_bpe_train_greedy_merge_semantics(spark):
    """The merge scan is Sennrich-greedy: a run of overlapping matches
    merges leftmost-first ('aaaa' -> [aa][aa], never [a][aa][a]) — pinned
    on a toy corpus through the SAME oracle the driver runs."""
    import duckdb

    from lab_etl_spark.queries.text import _bpe_train_oracle

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES"
        " ('aaaa aaaa ab'), ('aaaa xy')) t(text)"
    )
    got = con.execute(_bpe_train_oracle(2)).fetchdf()
    # round 1: (a,a) appears 3x per 'aaaa' occurrence = 9 (+0 from ab/xy)
    assert tuple(got.iloc[0][["s1", "s2", "cnt"]]) == ("a", "a", 9)
    # after greedy merge 'aaaa' -> [aa][aa]: round 2's top is (aa,aa)
    # with one adjacency per word occurrence (weight 3) — the pair only
    # exists at all if the leftmost-first parity rule held
    assert tuple(got.iloc[1][["s1", "s2", "cnt"]]) == ("aa", "aa", 3)
    con.close()


def test_bpe_train_counts_monotone(spark, sf_dir):
    """Merge ranks come out in non-increasing pair-count order (rank-1 is
    the global argmax; later merges can't beat it)."""
    rows = REGISTRY["q_bpe_train"].fn(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == [1, 2]
    assert rows[0]["cnt"] >= rows[1]["cnt"] > 0


def test_bpe_train_multibyte_chars(spark):
    """substr() is CHARACTER-based in both engines: a corpus of multi-byte
    words must split into whole codepoints, never bytes (a byte-based
    splitter would produce invalid UTF-8 fragments and different pair
    counts per engine)."""
    import duckdb

    from lab_etl_spark.queries.text import _bpe_train_oracle

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES"
        " ('héllo héllo'), ('héllo wörld')) t(text)"
    )
    got = con.execute(_bpe_train_oracle(1)).fetchdf()
    # most frequent pair is (h, é) / (é, l) / (l, l) all at 3 — the
    # lexicographic tie-break picks the smallest; the essential assertion
    # is that 'é' survives as ONE symbol
    assert got.iloc[0]["cnt"] == 3
    assert "é" in (got.iloc[0]["s1"] + got.iloc[0]["s2"])
    con.close()
