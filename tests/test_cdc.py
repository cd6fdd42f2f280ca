"""MERGE/upsert semantics: the generic operator (operators/cdc.py), the
registered q_cdc_merge query (oracle parity covered by test_oracle_parity),
and the streaming foreachBatch upsert vs its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab_etl_spark.operators.cdc import merge_upsert


def test_merge_upsert_actions(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "U", "b2", 21.0),   # matched update
            (3, "D", None, None),   # matched delete
            (4, "I", "d", 40.0),    # unmatched insert
            (5, "U", "e", 50.0),    # unmatched update -> upsert insert
            (6, "D", None, None),   # unmatched delete -> no-op
        ],
        "k long, op string, name string, v double",
    )
    got = {
        r["k"]: (r["name"], r["v"])
        for r in merge_upsert(base, changes, key="k").collect()
    }
    assert got == {
        1: ("a", 10.0),
        2: ("b2", 21.0),
        4: ("d", 40.0),
        5: ("e", 50.0),
    }


def test_merge_upsert_idempotent_redelivery(spark):
    """Applying the same change batch twice yields the same table (the
    at-least-once delivery guarantee a CDC consumer needs)."""
    base = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k long, v double"
    )
    changes = spark.createDataFrame(
        [(1, "U", 9.0), (3, "I", 3.0), (2, "D", None)],
        "k long, op string, v double",
    )
    once = merge_upsert(base, changes, key="k")
    twice = merge_upsert(once, changes, key="k")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    ) == [(1, 9.0), (3, 3.0)]


def test_streaming_upsert_matches_batch_latest(spark, sf_dir, tmp_path):
    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.streaming.jobs import (
        latest_per_user,
        stream_events,
        upsert_latest,
    )

    table_dir = str(tmp_path / "latest_state")
    q = upsert_latest(
        stream_events(spark, sf_dir),
        table_dir,
        str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300)
    got = {
        r["user_id"]: (r["event_id"], r["event_type"], r["value"])
        for r in spark.read.parquet(table_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["event_id"], r["event_type"], r["value"])
        for r in latest_per_user(ev).collect()
    }
    assert len(want) > 0 and got == want


def test_streaming_upsert_incremental_batches(spark, sf_dir, tmp_path):
    """Two successive availableNow runs over a growing directory converge to
    the same state as one batch pass (merge across micro-batch boundaries)."""
    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.streaming.jobs import latest_per_user, upsert_latest

    ev = load_table(spark, sf_dir, "events")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    table_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt2")

    half1.write.mode("overwrite").parquet(src + "/b1")
    q = upsert_latest(
        spark.readStream.schema(ev.schema).parquet(src + "/*"), table_dir, ckpt
    )
    assert q.awaitTermination(300)
    half2.write.mode("overwrite").parquet(src + "/b2")
    q = upsert_latest(
        spark.readStream.schema(ev.schema).parquet(src + "/*"), table_dir, ckpt
    )
    assert q.awaitTermination(300)

    got = {
        r["user_id"]: r["event_id"]
        for r in spark.read.parquet(table_dir).collect()
    }
    want = {
        r["user_id"]: r["event_id"] for r in latest_per_user(ev).collect()
    }
    assert got == want


def test_merge_upsert_property_random_batches(spark):
    """Property: merge_upsert over arbitrary op sequences matches a plain
    dict replay (hypothesis-style randomized cases, fixed seeds)."""
    import random

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        base_rows = [(k, float(rng.randint(0, 99))) for k in range(12)]
        state = dict(base_rows)
        df = spark.createDataFrame(base_rows, "k long, v double")
        for _ in range(3):
            batch = []
            for _ in range(8):
                k = rng.randint(0, 19)
                op = rng.choice(["U", "D", "I"])
                v = float(rng.randint(100, 999))
                batch.append((k, op, v))
            # dict replay of the documented semantics: last op per key wins
            # within a batch is NOT assumed — make keys unique per batch to
            # keep semantics well-defined (real CDC batches are key-deduped)
            dedup = {}
            for k, op, v in batch:
                dedup[k] = (op, v)
            batch = [(k, op, v) for k, (op, v) in dedup.items()]
            for k, op, v in batch:
                if op == "D":
                    state.pop(k, None)
                else:
                    state[k] = v
            ch = spark.createDataFrame(batch, "k long, op string, v double")
            df = merge_upsert(df, ch, key="k")
        got = {r["k"]: r["v"] for r in df.collect()}
        assert got == state, f"seed {seed}: {got} != {state}"


def test_streaming_upsert_recovers_from_mid_commit_crash(spark, sf_dir, tmp_path):
    """A crash between the two commit renames leaves table_dir missing and
    .old holding the sole copy of prior state; the next batch must restore
    it before merging — not merge against nothing and delete the backup."""
    import os

    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.streaming.jobs import latest_per_user, upsert_latest

    ev = load_table(spark, sf_dir, "events")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    table_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    half1.write.mode("overwrite").parquet(src + "/b1")
    q = upsert_latest(
        spark.readStream.schema(ev.schema).parquet(src + "/*"), table_dir, ckpt
    )
    assert q.awaitTermination(300)
    # simulate the crash window: table moved aside, replacement never landed
    os.rename(table_dir, table_dir + ".old")

    half2.write.mode("overwrite").parquet(src + "/b2")
    q = upsert_latest(
        spark.readStream.schema(ev.schema).parquet(src + "/*"), table_dir, ckpt
    )
    assert q.awaitTermination(300)

    got = {
        r["user_id"]: r["event_id"]
        for r in spark.read.parquet(table_dir).collect()
    }
    want = {
        r["user_id"]: r["event_id"] for r in latest_per_user(ev).collect()
    }
    assert got == want
    assert not os.path.isdir(table_dir + ".old")


def test_merge_upsert_drops_null_key_changes(spark):
    """A change row with a NULL business key can't address any base row and
    must be dropped, not emitted as an all-NULL merged row."""
    base = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    changes = spark.createDataFrame(
        [(None, "U", 9.0), (3, "I", 3.0)], "k long, op string, v double"
    )
    got = {r["k"]: r["v"] for r in merge_upsert(base, changes, key="k").collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 3.0}


def test_merge_upsert_null_op_acts_as_upsert(spark):
    """op=NULL must not silently delete the matched base row (three-valued
    logic regression): it is documented to behave as an update."""
    base = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    changes = spark.createDataFrame(
        [(2, None, 9.0), (3, None, 3.0)], "k long, op string, v double"
    )
    got = {r["k"]: r["v"] for r in merge_upsert(base, changes, key="k").collect()}
    assert got == {1: 1.0, 2: 9.0, 3: 3.0}


def test_streaming_upsert_dv_matches_batch_latest(spark, sf_dir, tmp_path):
    """Round-12: the DV-backed streaming upsert equals the batch twin —
    same pin as the swap variant, through merge-on-read commits."""
    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.operators.commitlog import LoggedTable
    from lab_etl_spark.streaming.jobs import (
        latest_per_user,
        stream_events,
        upsert_latest_dv,
    )

    table_dir = str(tmp_path / "latest_dv")
    q = upsert_latest_dv(
        stream_events(spark, sf_dir),
        table_dir,
        str(tmp_path / "ckpt_dv"),
    )
    assert q.awaitTermination(300)
    got = {
        r["user_id"]: (r["event_id"], r["event_type"], r["value"])
        for r in LoggedTable(table_dir).read(spark).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["event_id"], r["event_type"], r["value"])
        for r in latest_per_user(ev).collect()
    }
    assert len(want) > 0 and got == want


def test_streaming_upsert_dv_incremental_batches(spark, sf_dir, tmp_path):
    """Two successive availableNow runs over a growing directory converge
    to the batch answer through DV commits — out-of-order across the
    split included (event_id parity does not order ts, so some users'
    winners arrive in the FIRST half) — and the second run's commits
    hardlink the first run's untouched files instead of rewriting."""
    import os

    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.operators.commitlog import LoggedTable
    from lab_etl_spark.streaming.jobs import latest_per_user, upsert_latest_dv

    ev = load_table(spark, sf_dir, "events")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src_dv")
    table_dir = str(tmp_path / "state_dv")
    ckpt = str(tmp_path / "ckpt_dv2")

    half1.write.mode("overwrite").parquet(src + "/b1")
    q = upsert_latest_dv(
        spark.readStream.schema(ev.schema).parquet(src + "/*"),
        table_dir,
        ckpt,
        compact_every=None,
    )
    assert q.awaitTermination(300)
    table = LoggedTable(table_dir)
    v1 = table.latest()["version"]
    half2.write.mode("overwrite").parquet(src + "/b2")
    q = upsert_latest_dv(
        spark.readStream.schema(ev.schema).parquet(src + "/*"),
        table_dir,
        ckpt,
        compact_every=None,
    )
    assert q.awaitTermination(300)
    m = table.latest()
    assert m["version"] > v1 and m["op"] == "upsert_dv"
    # merge-on-read economics: the second run linked, not rewrote —
    # every appended file is batch-sized, and the manifest records a DV
    assert m.get("dv_dir") and m["files_appended"] >= 1
    got = {
        r["user_id"]: r["event_id"]
        for r in table.read(spark).collect()
    }
    want = {
        r["user_id"]: r["event_id"] for r in latest_per_user(ev).collect()
    }
    assert got == want


def test_streaming_upsert_dv_compaction_cadence(spark, sf_dir, tmp_path):
    """With compact_every=2, successive micro-batch commits trigger the
    in-sink compact_dv + vacuum: the DV materializes (latest manifest
    carries no dv_dir), old snapshots are trimmed, and the state still
    equals the batch twin."""
    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.operators.commitlog import LoggedTable
    from lab_etl_spark.streaming.jobs import latest_per_user, upsert_latest_dv

    ev = load_table(spark, sf_dir, "events")
    thirds = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    src = str(tmp_path / "src_cc")
    table_dir = str(tmp_path / "state_cc")
    ckpt = str(tmp_path / "ckpt_cc")
    for i, part in enumerate(thirds):
        part.write.mode("overwrite").parquet(f"{src}/b{i}")
        q = upsert_latest_dv(
            spark.readStream.schema(ev.schema).parquet(src + "/*"),
            table_dir,
            ckpt,
            compact_every=2,
        )
        assert q.awaitTermination(300)
    table = LoggedTable(table_dir)
    m = table.latest()
    # the cadence fired at least once: some committed version is a
    # compact_dv (dv-free) commit on top of upserts
    ops = [table.manifest(v)["op"] for v in table.versions()]
    assert "compact_dv" in ops or not m.get("dv_dir"), ops
    # vacuum trimmed history to the grace window
    assert len(table.versions()) <= 3, table.versions()
    got = {
        r["user_id"]: r["event_id"]
        for r in table.read(spark).collect()
    }
    want = {
        r["user_id"]: r["event_id"] for r in latest_per_user(ev).collect()
    }
    assert got == want


def test_streaming_upsert_dv_wide_batch_skips_keyed_fetch(
    spark, sf_dir, tmp_path, monkeypatch
):
    """VERDICT r12 #6: the touched-keys collect in upsert_latest_dv is
    capped at _BLOOM_PROBE_VALUE_CAP.  A micro-batch touching more
    distinct keys than the cap must SKIP the driver-side key
    materialization (no unbounded collect) and semi-join the full
    current snapshot instead — converging to the identical state."""
    from lab_etl_spark import operators
    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.operators.commitlog import LoggedTable
    from lab_etl_spark.streaming.jobs import (
        latest_per_user,
        stream_events,
        upsert_latest_dv,
    )

    # drop the cap far below this table's distinct-user count so the
    # wide-batch fallback is the path under test
    monkeypatch.setattr(
        operators.commitlog, "_BLOOM_PROBE_VALUE_CAP", 5
    )
    ev = load_table(spark, sf_dir, "events")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src_wide")
    table_dir = str(tmp_path / "state_wide")
    ckpt = str(tmp_path / "ckpt_wide")
    half1.write.parquet(src + "/b1")
    q = upsert_latest_dv(
        spark.readStream.schema(ev.schema).parquet(src + "/*"),
        table_dir, ckpt, compact_every=None,
    )
    assert q.awaitTermination(300)
    half2.write.parquet(src + "/b2")
    q = upsert_latest_dv(
        spark.readStream.schema(ev.schema).parquet(src + "/*"),
        table_dir, ckpt, compact_every=None,
    )
    assert q.awaitTermination(300)
    table = LoggedTable(table_dir)
    got = {
        r["user_id"]: r["event_id"] for r in table.read(spark).collect()
    }
    want = {
        r["user_id"]: r["event_id"] for r in latest_per_user(ev).collect()
    }
    assert len(want) > 5 and got == want


def test_cdf_consumer_incremental_equals_batch(spark, tmp_path):
    """VERDICT r12 #7: consume_changes drains table_changes behind a
    stored cursor.  Consuming a random DML chain in INCREMENTS and
    applying each change frame to a dict materialized view must land on
    exactly table.read at every poll — and equal one BATCH table_changes
    drain over the same span."""
    import random

    from lab_etl_spark.operators.commitlog import (
        LoggedTable,
        append_logged,
        compact_dv,
        purge_dv,
        upsert_dv,
    )
    from lab_etl_spark.streaming.jobs import consume_changes, read_cdf_cursor

    rng = random.Random(13)
    df = spark.range(0, 150).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("p"),
        (F.col("id") * 1.0).alias("v"),
    )
    table_dir = str(tmp_path / "cdf_src")
    cursor = str(tmp_path / "cursor.json")
    table = LoggedTable(table_dir)
    table.commit(
        lambda d: df.repartition(3).write.parquet(d), op="ingest"
    )

    view: dict = {}

    def apply_fn(changes, v_from, v_to):
        # contract: deletes before inserts within a frame (an updated
        # key is delete+insert with no intra-frame row ordering)
        rows = changes.collect()
        for r in rows:
            if r["_change_type"] == "delete":
                view.pop(r["k"], None)
        for r in rows:
            if r["_change_type"] == "insert":
                view[r["k"]] = (r["p"], r["v"])

    # first poll seeds from the full snapshot
    st = consume_changes(spark, table_dir, cursor, apply_fn)
    assert st["advanced"] and read_cdf_cursor(cursor) == 1
    assert view == {k: (k % 4, float(k)) for k in range(150)}

    fresh = 9000
    for step in range(5):
        # 1-2 DML commits per poll: polls span multi-commit windows too
        for _ in range(rng.randint(1, 2)):
            op = rng.choice(["purge", "upsert", "append", "compact"])
            if op == "append":
                rows = [(fresh + i, rng.randint(0, 5), rng.uniform(-9, 9))
                        for i in range(rng.randint(1, 6))]
                fresh += len(rows)
                append_logged(
                    spark, table,
                    spark.createDataFrame(rows, "k long, p long, v double"),
                )
            elif op == "purge":
                mod, rem = rng.choice([(9, 2), (7, 0)])
                purge_dv(spark, table, F.col("k") % mod == rem)
            elif op == "upsert":
                rows = [(k, rng.randint(0, 5), rng.uniform(-9, 9))
                        for k in rng.sample(range(300), rng.randint(1, 9))]
                upsert_dv(
                    spark, table,
                    spark.createDataFrame(rows, "k long, p long, v double"),
                    key="k",
                )
            else:
                compact_dv(spark, table)
        consume_changes(spark, table_dir, cursor, apply_fn)
        want = {
            r["k"]: (r["p"], r["v"]) for r in table.read(spark).collect()
        }
        assert view == want, f"poll {step}: view diverged from table"
        assert read_cdf_cursor(cursor) == table.latest()["version"]

    # idle poll: no changes, no cursor movement, apply_fn not called
    st = consume_changes(
        spark, table_dir, cursor,
        lambda *_: (_ for _ in ()).throw(AssertionError("called on idle")),
    )
    assert not st["advanced"]


def test_cdf_consumer_crash_replay_and_vacuum_guard(spark, tmp_path):
    """At-least-once: a crash in apply_fn leaves the cursor unmoved and
    the SAME window replays next poll.  A cursor that predates the
    oldest retained manifest (vacuum outran the consumer) raises instead
    of silently dropping changes."""
    import pytest

    from lab_etl_spark.operators.commitlog import LoggedTable, purge_dv
    from lab_etl_spark.streaming.jobs import consume_changes, read_cdf_cursor

    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    table_dir = str(tmp_path / "cdf_crash")
    cursor = str(tmp_path / "cur.json")
    table = LoggedTable(table_dir)
    table.commit(lambda d: df.repartition(2).write.parquet(d), op="ingest")
    consume_changes(spark, table_dir, cursor, lambda *_: None)
    purge_dv(spark, table, F.col("k") == 3)

    with pytest.raises(RuntimeError, match="boom"):
        consume_changes(
            spark, table_dir, cursor,
            lambda *_: (_ for _ in ()).throw(RuntimeError("boom")),
        )
    assert read_cdf_cursor(cursor) == 1  # unmoved

    seen = []
    consume_changes(
        spark, table_dir, cursor,
        lambda ch, a, b: seen.append((a, b, ch.count())),
    )
    assert seen == [(1, 2, 1)]  # same window replayed, one delete row

    # sleep through many commits + vacuum, then the guard fires
    for i in range(4):
        purge_dv(spark, table, F.col("k") == 10 + i)
    table.vacuum(keep=2)
    with pytest.raises(ValueError, match="predates the oldest"):
        consume_changes(spark, table_dir, cursor, lambda *_: None)


def test_cdf_consumer_first_poll_across_evolution(spark, tmp_path):
    """A consumer whose FIRST poll lands after an additive schema
    evolution must not crash the seed union — the pre-evolution seed
    NULL-backfills the widened columns and the materialized view equals
    the current table."""
    from lab_etl_spark.operators.commitlog import (
        LoggedTable, append_logged, upsert_dv,
    )
    from lab_etl_spark.streaming.jobs import consume_changes

    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    table_dir = str(tmp_path / "cdf_evo_seed")
    table = LoggedTable(table_dir)
    table.commit(lambda d: df.repartition(2).write.parquet(d), op="ingest")
    append_logged(
        spark, table,
        spark.createDataFrame([(100, 1.0, "x")],
                              "k long, v double, e string"),
    )
    upsert_dv(
        spark, table,
        spark.createDataFrame([(5, -5.0, "y")],
                              "k long, v double, e string"),
        key="k",
    )
    view: dict = {}

    def apply_fn(changes, a, b):
        rows = changes.collect()
        for r in rows:
            if r["_change_type"] == "delete":
                view.pop(r["k"], None)
        for r in rows:
            if r["_change_type"] == "insert":
                view[r["k"]] = (r["v"], r["e"])

    st = consume_changes(spark, table_dir, str(tmp_path / "c.json"),
                         apply_fn)
    assert st["advanced"]
    want = {r["k"]: (r["v"], r["e"]) for r in table.read(spark).collect()}
    assert view == want and view[5] == (-5.0, "y") and view[0][1] is None


def test_streaming_upsert_dv_producer_evolution(spark, sf_dir, tmp_path):
    """A WIDENED micro-batch mid-stream (additive producer evolution)
    lands through upsert_latest_dv: current rows NULL-backfill the new
    column, the manifest records the widened schema, and later reads
    resolve it — while a batch that DROPS a column still fails loudly."""
    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.operators.commitlog import LoggedTable
    from lab_etl_spark.streaming.jobs import upsert_latest_dv

    ev = load_table(spark, sf_dir, "events")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "origin", F.lit("late")
    )
    src = str(tmp_path / "src_evo")
    table_dir = str(tmp_path / "state_evo")
    ckpt = str(tmp_path / "ckpt_evo")
    half1.write.parquet(src + "/b1")
    q = upsert_latest_dv(
        spark.readStream.schema(ev.schema).parquet(src + "/b1"),
        table_dir, ckpt, compact_every=None,
    )
    assert q.awaitTermination(300)
    half2.write.parquet(src + "/b2")
    q = upsert_latest_dv(
        spark.readStream.schema(half2.schema).parquet(src + "/b2"),
        table_dir, str(tmp_path / "ckpt_evo2"), compact_every=None,
    )
    assert q.awaitTermination(300)
    table = LoggedTable(table_dir)
    assert table.latest().get("schema"), "widened schema not recorded"
    got = {r["user_id"]: (r["event_id"], r["origin"])
           for r in table.read(spark).collect()}
    # winners from the widened batch carry the marker, others NULL
    assert any(v[1] == "late" for v in got.values())
    assert any(v[1] is None for v in got.values())
