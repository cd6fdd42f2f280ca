"""Streaming + multimodal tests.

Streaming: availableNow replay over the sf0.001 events file must produce the
same aggregates as the batch queries (which are themselves oracle-checked),
proving the incremental path computes the same thing.

Multimodal: the mapInPandas kernels run end-to-end with the deterministic
stand-in decoder; schema/batching assertions are decoder-independent.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_stream_tumbling_matches_batch(spark, sf_dir):
    from lab_etl_spark.queries import load_all
    from lab_etl_spark.streaming.jobs import (
        run_available_now,
        stream_events,
        tumbling_counts,
    )

    stream_result = run_available_now(
        tumbling_counts(stream_events(spark, sf_dir)), "t_tumbling"
    )
    batch_result = load_all()["q_stream_tumbling"].fn(spark, sf_dir)
    a = {tuple(r) for r in stream_result.collect()}
    b = {tuple(r) for r in batch_result.collect()}
    assert a == b and len(a) > 0


def test_stream_session_matches_batch(spark, sf_dir):
    from lab_etl_spark.queries import load_all
    from lab_etl_spark.streaming.jobs import (
        run_available_now,
        session_counts,
        stream_events,
    )

    stream_result = run_available_now(
        session_counts(stream_events(spark, sf_dir)), "t_session"
    )
    batch_result = load_all()["q_stream_session"].fn(spark, sf_dir)
    a = {tuple(r) for r in stream_result.collect()}
    b = {tuple(r) for r in batch_result.collect()}
    assert a == b and len(a) > 0


def test_stream_stream_join_matches_batch(spark, sf_dir):
    # The interval join in streaming mode (two file-source streams, state
    # bounded by watermarks) must emit exactly the rows the identical batch
    # join produces.
    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.streaming.jobs import (
        purchase_after_click,
        run_available_now,
        stream_events,
    )
    from pyspark.sql import functions as F

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    s_clicks, s_purch = split(stream_events(spark, sf_dir))
    streamed = run_available_now(
        purchase_after_click(s_clicks, s_purch),
        "t_ssjoin",
        output_mode="append",
    )
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    b_clicks, b_purch = split(ev)
    batch = purchase_after_click(b_clicks, b_purch)
    a = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_stream_dedup_within_watermark(spark, sf_dir):
    # Duplicate every event (union of two streams over the same file) and
    # require the watermark-bounded dedup to emit each event_id exactly once.
    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.streaming.jobs import (
        dedup_events,
        run_available_now,
        stream_events,
    )

    doubled = stream_events(spark, sf_dir).union(stream_events(spark, sf_dir))
    out = run_available_now(
        dedup_events(doubled), "t_dedup", output_mode="append"
    )
    assert out.count() == load_table(spark, sf_dir, "events").count()
    assert out.select("event_id").distinct().count() == out.count()


def test_decode_assets_schema_and_determinism(spark):
    from lab_etl_spark.multimodal.columns import decode_assets, make_asset_table

    assets = make_asset_table(spark, n=30)
    decoded = decode_assets(assets)
    rows = {r["asset_id"]: r for r in decoded.collect()}
    assert len(rows) == 30
    # images get dimensions, audio gets duration; features are FEATURE_DIM
    img = next(r for r in rows.values() if r["modality"] == "image")
    aud = next(r for r in rows.values() if r["modality"] == "audio")
    assert img["width"] is not None and img["height"] is not None
    assert img["duration_s"] is None
    assert aud["duration_s"] is not None and aud["width"] is None
    assert len(img["feature"]) == 8
    # deterministic: re-running yields identical features
    again = {r["asset_id"]: r for r in decode_assets(assets).collect()}
    assert again[img["asset_id"]]["feature"] == img["feature"]


def test_sample_frames_and_similarity(spark):
    from lab_etl_spark.multimodal.columns import (
        cosine_to_query,
        decode_assets,
        make_asset_table,
        sample_frames,
    )

    assets = make_asset_table(spark, n=30)
    frames = sample_frames(assets, every_s=2.0)
    fr = frames.collect()
    assert len(fr) > 0
    assert all(len(r["feature"]) == 8 for r in fr)
    # only video assets produce frames
    video_ids = {
        r["asset_id"] for r in assets.select("asset_id", "modality").collect()
        if r["modality"] == "video"
    }
    assert {r["asset_id"] for r in fr} <= video_ids

    scored = cosine_to_query(decode_assets(assets), [1.0] * 8)
    vals = [r["cosine"] for r in scored.collect()]
    assert all(v is not None and -1.0001 <= v <= 1.0001 for v in vals)


def test_stateful_ewma_matches_pandas(spark, sf_dir):
    """The applyInPandasWithState EWMA must equal a sequential per-user
    EWMA computed directly from the parquet file (ts order)."""
    import pandas as pd

    from lab_etl_spark.streaming.jobs import (
        run_available_now,
        stream_events,
        user_value_ewma,
    )

    result = run_available_now(
        user_value_ewma(stream_events(spark, sf_dir), alpha=0.3),
        "t_ewma",
        output_mode="update",
    )
    got = {
        r["user_id"]: (r["n_events"], r["ewma"]) for r in result.collect()
    }

    raw = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values("ts")
    alpha = 0.3
    want: dict[int, tuple[int, float]] = {}
    for uid, grp in raw.groupby("user_id"):
        ewma = None
        for v in grp["value"]:
            v = float(v)
            ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
        want[uid] = (len(grp), ewma)

    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0]
        assert got[uid][1] == pytest.approx(want[uid][1], rel=1e-12)


def test_stream_hourly_users_matches_batch(spark, sf_dir):
    from lab_etl_spark.queries import load_all
    from lab_etl_spark.streaming.jobs import (
        hourly_unique_users,
        run_available_now,
        stream_events,
    )

    stream_result = run_available_now(
        hourly_unique_users(stream_events(spark, sf_dir)), "t_hourly_users"
    )
    batch_result = load_all()["q_stream_hourly_users"].fn(spark, sf_dir)
    a = {(r.window_start, r.n_users) for r in stream_result.collect()}
    b = {(r.window_start, r.n_users) for r in batch_result.collect()}
    assert a == b and len(a) > 0


def test_instrument_ingest_streaming_matches_batch(spark, tmp_path):
    """Streaming binaryFile ingest == batch scan_hfm on the same files, and
    a second availableNow pass decodes ONLY newly-arrived files."""
    import os
    import shutil

    FIX = "/root/reference/tests/test_files/HFM"
    if not os.path.isdir(FIX):
        import pytest

        pytest.skip("reference fixtures not present")
    from lab_etl_spark.sources.hfm import scan_hfm
    from lab_etl_spark.streaming.jobs import instrument_ingest

    watch = tmp_path / "incoming"
    watch.mkdir()
    cond = "Black_PMMA_HFM_Dry_conductivity_211115_R1.tst"
    hc = "Black_PMMA_HFM_Dry_heatcapacity_211117_R3.tst"
    shutil.copy(f"{FIX}/{cond}", watch / cond)

    out = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    instrument_ingest(spark, str(watch), out, ckpt)

    got = spark.read.parquet(out)
    want = scan_hfm(spark, str(watch / cond))
    assert got.count() == want.count() > 0
    # identical decoded values (same kernel): compare sorted projections
    key = ["source_file", "setpoint"]
    a = [tuple(r) for r in got.select(*key, "upper_temperature").orderBy(*key).collect()]
    b = [tuple(r) for r in want.select(*key, "upper_temperature").orderBy(*key).collect()]
    assert a == b
    # run_mode is a partition column in the output lake
    assert any("run_mode=conductivity" in d for d in os.listdir(out))

    # second file arrives -> incremental pass picks up ONLY the new file
    shutil.copy(f"{FIX}/{hc}", watch / hc)
    instrument_ingest(spark, str(watch), out, ckpt)
    got2 = spark.read.parquet(out)
    both = scan_hfm(spark, str(watch / "*.tst"))
    assert got2.count() == both.count()
    # no duplicate rows for the first file (exactly-once across restarts)
    assert (
        got2.filter(got2.source_file.contains(cond)).count() == want.count()
    )


def test_stream_cms_merge_invariant_to_batching(spark, sf_dir, tmp_path):
    """The streaming CMS must produce the SAME cells whether the stream
    arrives as one file or as five micro-batches (cell sums are mergeable,
    so batching cannot matter) — the property that earns this stateful
    job a full value oracle."""
    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.streaming.jobs import (
        cms_cell_counts,
        run_available_now,
    )

    ev = load_table(spark, sf_dir, "events")
    # lay the same events out as 5 files and stream one file per trigger
    src = str(tmp_path / "ev5")
    ev.repartition(5).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = run_available_now(
        cms_cell_counts(stream), "t_cms_5batch", output_mode="complete"
    )
    want = cms_cell_counts(ev)
    a = {(r.d, r.bucket, r.cnt) for r in got.collect()}
    b = {(r.d, r.bucket, r.cnt) for r in want.collect()}
    assert a == b and len(a) > 50


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.streaming.jobs import (
        enrich_stream,
        run_available_now,
        stream_events,
    )

    dim = load_table(spark, sf_dir, "customer")
    stream_result = run_available_now(
        enrich_stream(stream_events(spark, sf_dir), dim), "t_enrich"
    )
    batch_result = enrich_stream(load_table(spark, sf_dir, "events"), dim)
    got = {tuple(r) for r in stream_result.collect()}
    want = {tuple(r) for r in batch_result.collect()}
    assert got == want and len(want) > 0


def test_stateful_agg_survives_restart(spark, sf_dir, tmp_path):
    """TRUE restart recovery: a checkpointed windowed aggregation is
    stopped, more data arrives, and a NEW query start on the same
    checkpoint resumes — the file source reads only the unseen files, so
    matching the full batch aggregate proves the state store (not a
    re-read) supplied the counts for windows that straddle both phases.
    Random file->phase assignment means most windows DO straddle."""
    import shutil
    from pathlib import Path

    from pyspark.sql import functions as F

    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.streaming.jobs import tumbling_counts

    ev = load_table(spark, sf_dir, "events")
    staging = tmp_path / "staging"
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    ev.repartition(5).write.parquet(str(staging))
    parts = sorted(Path(staging).glob("part-*.parquet"))
    assert len(parts) == 5
    schema = spark.read.parquet(str(staging)).schema

    def drain(name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        spark.catalog.dropTempView(name)
        q = (
            tumbling_counts(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        return spark.table(name)

    for p in parts[:3]:
        shutil.copy(p, src / p.name)
    phase_a = drain("t_restart_a").collect()
    assert 0 < len(phase_a)

    for p in parts[3:]:
        shutil.copy(p, src / p.name)
    got = drain("t_restart_b")

    want = tumbling_counts(ev.withColumn("ts", F.col("ts").cast("timestamp")))
    key = ["window_start", "event_type"]
    a = {
        tuple(r[k] for k in key): (r["n_events"], r["sum_value"])
        for r in got.collect()
    }
    b = {
        tuple(r[k] for k in key): (r["n_events"], r["sum_value"])
        for r in want.collect()
    }
    assert a == b and len(a) > 10
    # and the restart really did carry state: phase A alone is NOT the
    # full answer (some window straddled the restart)
    pa = {
        tuple(r[k] for k in key): (r["n_events"], r["sum_value"])
        for r in phase_a
    }
    assert pa != b


def test_running_stats_batch_invariant(spark, sf_dir, tmp_path):
    """transformWithState carry-over: the per-user running stats drained
    as FIVE micro-batches (maxFilesPerTrigger=1) must equal the one-shot
    batch aggregate BIT-IDENTICALLY — count/min/max are order-free and
    the sum is exact-decimal in the value state, so batch boundaries
    cannot show through."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.queries.exact import dsum
    from lab_etl_spark.streaming.jobs import user_running_stats

    ev = load_table(spark, sf_dir, "events")
    staging = tmp_path / "staging"
    ev.repartition(5).write.parquet(str(staging))
    assert len(list(Path(staging).glob("part-*.parquet"))) == 5
    schema = spark.read.parquet(str(staging)).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(staging))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    name = "t_running_stats"
    spark.catalog.dropTempView(name)
    q = (
        user_running_stats(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    # memory sink in update mode APPENDS each batch's updated row; the
    # final state per user is the row with the largest running count
    pdf = spark.table(name).toPandas()
    assert pdf.groupby("user_id").size().max() > 1, (
        "every user landed in one micro-batch; the carry-over premise "
        "of this test is gone (repartition produced degenerate files?)"
    )
    final = pdf.loc[pdf.groupby("user_id")["n_events"].idxmax()]
    got = {
        int(r.user_id): (
            int(r.n_events), r.sum_value, r.min_value, r.max_value
        )
        for r in final.itertuples()
    }
    want = {
        int(r["user_id"]): (
            int(r["n_events"]), r["sum_value"], r["min_value"], r["max_value"]
        )
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value", 6)).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == want
    # the registered queries no longer depend on a single-batch drain:
    # final_state applies this same max-n_events reduce Spark-side
    # (ADVICE r10) — pin it on this genuinely multi-batch sink
    from lab_etl_spark.streaming.jobs import final_state

    fs = {
        int(r["user_id"]): (
            int(r["n_events"]), r["sum_value"], r["min_value"], r["max_value"]
        )
        for r in final_state(spark.table(name)).collect()
    }
    assert fs == want


def test_running_stats_tws_api(spark, sf_dir):
    """The transformWithStateInPandas path of user_running_stats, pinned
    equal to the batch aggregate when the runtime can run it.  Skipped
    (documented) where the protobuf wheel is absent: Spark 4's tws state
    client imports google.protobuf and dies at the first micro-batch
    without it — has_transform_with_state() is exactly that probe, and
    test_running_stats_batch_invariant covers the shared exact fold
    through the legacy engine path either way."""
    from lab_etl_spark.streaming.jobs import has_transform_with_state

    if not has_transform_with_state():
        pytest.skip(
            "google.protobuf not installed: transformWithState's state "
            "client cannot start in this container (fold logic is "
            "identical and covered via the legacy path)"
        )
    from pyspark.sql import functions as F

    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.queries.exact import dsum
    from lab_etl_spark.streaming.jobs import (
        run_available_now,
        stream_events,
        user_running_stats,
    )

    got = run_available_now(
        user_running_stats(stream_events(spark, sf_dir), api="tws"),
        "t_running_stats_tws",
        output_mode="update",
    )
    ev = load_table(spark, sf_dir, "events")
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(dsum("value", 6)).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, want.collect()))
    assert a == b
