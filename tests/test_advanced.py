"""Semantic pins for the round-3 advanced queries (oracle parity is covered
for all of them by test_oracle_parity.py; these pin properties parity can't
see — sketch accuracy, argmin uniqueness, SCD2 interval chaining)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab_etl_spark.queries import load_all

REGISTRY = load_all()


def test_hll_rollup_accuracy(spark, sf_dir):
    """HLL union estimate within 5% of exact distinct users per type."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["q_hll_rollup"].fn(spark, sf_dir).collect()
    }
    from lab_etl_spark.catalog import load_table

    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact) and len(exact) > 0
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)


def test_argmin_unique_per_part(spark, sf_dir):
    df = REGISTRY["q_argmin_join"].fn(spark, sf_dir)
    n = df.count()
    assert n == df.select("partkey").distinct().count() and n > 0


def test_scd2_intervals_chain(spark, sf_dir):
    """Exactly one open (is_current) row per user; valid_to of row k equals
    valid_from of row k+1 (no gaps/overlaps)."""
    df = REGISTRY["q_scd2_build"].fn(spark, sf_dir)
    open_rows = df.filter("is_current = 1").groupBy("user_id").count()
    assert open_rows.filter("count <> 1").count() == 0
    w_next = F.lead("valid_from").over(
        __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
            "user_id"
        ).orderBy("valid_from", "valid_to")
    )
    chained = df.filter("is_current = 0").withColumn("_nxt", w_next)
    # closed rows: valid_to must equal the next interval's valid_from
    bad = chained.filter(
        F.col("_nxt").isNotNull() & (F.col("valid_to") != F.col("_nxt"))
    )
    assert bad.count() == 0


def test_sole_supplier_wait_is_sole(spark, sf_dir):
    """Every supplier counted by the query must, on some finalized multi-
    supplier order, be the ONLY supplier with a returned line — re-derive
    that set independently and require the query's suppliers to be a
    nonempty subset of it."""
    from lab_etl_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rows = li.join(
        orders.filter("o_orderstatus = 'F'").select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    ).collect()
    by_order = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], []).append(
            (r["l_suppkey"], r["l_returnflag"])
        )
    sole = set()
    for ok, lines in by_order.items():
        supps = {s for s, _ in lines}
        returners = {s for s, f in lines if f == "R"}
        if len(supps) > 1 and len(returners) == 1:
            sole |= returners
    flagged = {
        r["s_suppkey"]
        for r in REGISTRY["q_sole_supplier_wait"].fn(spark, sf_dir).collect()
    }
    assert flagged and flagged <= sole


def test_vocab_oov_bounds(spark, sf_dir):
    df = REGISTRY["q_vocab_oov"].fn(spark, sf_dir)
    bad = df.filter(
        (F.col("oov_rate") < 0) | (F.col("oov_rate") > 1)
        | (F.col("n_oov") > F.col("n_tokens"))
    )
    assert bad.count() == 0
    # vocab is capped below corpus vocabulary, so SOME doc has OOV tokens
    assert df.filter("n_oov > 0").count() > 0


def test_source_mix_weights_sum_to_one(spark, sf_dir):
    rows = REGISTRY["q_source_mix_weights"].fn(spark, sf_dir).collect()
    assert abs(sum(r["actual_frac"] for r in rows) - 1.0) < 1e-4
    # weight * actual_frac == target uniform share for every source
    for r in rows:
        assert abs(r["weight"] * r["actual_frac"] - 1.0 / len(rows)) < 1e-4


def test_pagerank_mass_conservation(spark, sf_dir):
    """Without dangling nodes, total rank mass stays ~1 after 3 iterations."""
    jcache = spark._jsparkSession.sharedState().cacheManager()
    was_empty = jcache.isEmpty()
    rows = REGISTRY["q_pagerank"].fn(spark, sf_dir).collect()
    total = sum(r["pr"] for r in rows)
    assert abs(total - 1.0) < 1e-6 and len(rows) > 0
    assert all(r["pr"] > 0 for r in rows)
    # unpersist discipline: pagerank() must release its persisted
    # edge/degree blocks before returning (session-lifetime cache footgun)
    if was_empty:
        assert jcache.isEmpty(), "pagerank left persisted blocks cached"


def test_event_pattern_counts_vs_python(spark, sf_dir):
    """Re-derive click->purchase adjacency counts in plain Python."""
    from lab_etl_spark.catalog import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append(r["event_type"][0])
    want = {
        u: sum(
            1
            for i in range(len(s) - 1)
            if s[i] == "c" and s[i + 1] == "p"
        )
        for u, s in seqs.items()
    }
    got = {
        r["user_id"]: r["n_click_then_purchase"]
        for r in REGISTRY["q_event_pattern"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_dtw_matches_bruteforce(spark, sf_dir):
    # The applyInPandas DP must equal an independent exponential-recursion
    # reference (memoized) on the same collected series — pinning the DP
    # transition (match/insert/delete with |a-b| cost) rather than trusting
    # two copies of the same loop.
    import functools

    from lab_etl_spark.queries import load_all

    out = {
        r.event_type: r
        for r in load_all()["q_dtw_distance"].fn(spark, sf_dir).collect()
    }
    assert out["view"].dtw == 0.0  # self-alignment is free

    from pyspark.sql import functions as F

    from lab_etl_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS STRING)"
                " AS DOUBLE) / COUNT(*)"
            ).alias("v")
        )
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.v))
    ref = tuple(v for _, v in sorted(series["view"]))

    for etype, rows in series.items():
        xs = tuple(v for _, v in sorted(rows))

        @functools.lru_cache(maxsize=None)
        def d(i, j, xs=xs):
            if i == 0 and j == 0:
                return 0.0
            if i == 0 or j == 0:
                return float("inf")
            return abs(xs[i - 1] - ref[j - 1]) + min(
                d(i - 1, j), d(i, j - 1), d(i - 1, j - 1)
            )

        assert out[etype].dtw == round(d(len(xs), len(ref)), 6), etype


def test_markov_driver_fold_matches_spark_dsum(spark):
    """Round-13 pin: q_attribution_markov's driver-side chain fold must be
    bit-identical to the in-Spark dsum(..., 12) formulation it replaced
    (join + filter + groupBy per iteration over the tagged chain union).

    Adversarial counts on purpose: large coprime values make cnt/tot
    probabilities with full 52-bit mantissas, so the per-term
    double->DECIMAL(30,12) quantization (shortest-roundtrip string +
    HALF_UP) is exercised far from round decimals; a fold that used the
    exact binary expansion, a different rounding mode, or float
    accumulation diverges on these within an iteration or two."""
    from lab_etl_spark.queries.exact import dsum
    from lab_etl_spark.queries.timeseries import _markov_driver_fold

    channels = ["ch_a", "ch_b"]
    k = 8
    base = {
        ("START", "ch_a"): 982451653,
        ("START", "ch_b"): 57885161,
        ("START", "CONV"): 3,
        ("ch_a", "ch_b"): 179424673,
        ("ch_a", "CONV"): 15485863,
        ("ch_a", "LOST"): 32452843,
        ("ch_b", "ch_a"): 49979687,
        ("ch_b", "CONV"): 67867967,
        ("ch_b", "LOST"): 86028121,
    }

    got = _markov_driver_fold(base, channels, k)

    # the replaced in-Spark formulation, verbatim
    base_t = spark.createDataFrame(
        [(f, t, c) for (f, t), c in base.items()],
        "from_state string, to_state string, cnt bigint",
    )
    chains = [base_t.selectExpr("'base' AS chain", "*")]
    for c in channels:
        chains.append(
            base_t.filter(F.col("from_state") != c)
            .withColumn(
                "to_state",
                F.when(F.col("to_state") == c, "LOST").otherwise(
                    F.col("to_state")
                ),
            )
            .groupBy("from_state", "to_state")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            .selectExpr(f"'{c}' AS chain", "*")
        )
    tagged = chains[0]
    for t in chains[1:]:
        tagged = tagged.unionByName(t)
    from pyspark.sql import Window as W

    p_all = tagged.withColumn(
        "p",
        F.col("cnt").cast("double")
        / F.sum("cnt").over(W.partitionBy("chain", "from_state")),
    ).localCheckpoint(eager=True)
    init = spark.createDataFrame(
        [(tag, "CONV", 1.0) for tag in ["base"] + channels],
        "chain string, state string, prob double",
    )
    v = init
    for _ in range(k):
        stepped = (
            p_all.join(
                v.select(
                    F.col("chain").alias("vchain"),
                    F.col("state").alias("to_state"),
                    "prob",
                ),
                ["to_state"],
                "left",
            )
            .filter(
                F.col("vchain").isNull()
                | (F.col("vchain") == F.col("chain"))
            )
            .groupBy("chain", F.col("from_state").alias("state"))
            .agg(F.expr(dsum("p * COALESCE(prob, 0.0)", 12)).alias("prob"))
        )
        v = stepped.unionByName(init).localCheckpoint(eager=True)
    want = {(r["chain"], r["state"]): r["prob"] for r in v.collect()}

    assert set(got) == set(want)
    diverged = {
        key: (got[key], want[key])
        for key in want
        if got[key] != want[key]  # BIT equality, not approx
    }
    assert not diverged, f"driver fold diverged from Spark dsum: {diverged}"
