"""Z-order clustering: multi-column locality measurably concentrates
selective range filters into few files (the data-skipping proxy), and the
rewrite is row-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab_etl_spark.catalog import load_table
from lab_etl_spark.operators.zorder import write_zordered, zorder_key


def _files_touched(spark, path, predicate):
    return (
        spark.read.parquet(path)
        .filter(predicate)
        .select(F.col("_metadata.file_path"))
        .distinct()
        .count()
    )


def test_zorder_concentrates_both_dimensions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    n_files = 16
    rand_path = str(tmp_path / "rand")
    z_path = str(tmp_path / "zord")
    ev.repartition(n_files).write.parquet(rand_path)
    write_zordered(ev, z_path, ["user_id", "value"], n_files=n_files)

    # row-identical rewrite
    a = ev.agg(F.sum(F.xxhash64("event_id", "user_id", "value").cast("decimal(38,0)"))).collect()[0][0]
    b = spark.read.parquet(z_path).agg(
        F.sum(F.xxhash64("event_id", "user_id", "value").cast("decimal(38,0)"))
    ).collect()[0][0]
    assert a == b

    # thresholds at the 5th PERCENTILE (not 5% of range): events.value is
    # skewed, so a range-based slab would select ~27% of rows — a predicate
    # no layout can concentrate.  Percentile thresholds make both
    # predicates genuinely ~5%-of-rows selective.
    p_u = ev.approxQuantile("user_id", [0.05], 0.001)[0]
    p_v = ev.approxQuantile("value", [0.05], 0.001)[0]
    u_pred = F.col("user_id") <= p_u
    v_pred = F.col("value") <= p_v

    # a ~5%-selective filter on EITHER z-ordered column must hit strictly
    # fewer files than on the random layout (which touches ~all of them)
    for pred in (u_pred, v_pred):
        rand_n = _files_touched(spark, rand_path, pred)
        z_n = _files_touched(spark, z_path, pred)
        assert z_n < rand_n
        assert z_n <= n_files // 2


def test_zorder_key_is_deterministic_and_bounded(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    z1 = ev.select(zorder_key(ev, ["user_id", "value"]).alias("z"))
    row = z1.agg(F.min("z"), F.max("z"), F.count("z")).collect()[0]
    assert row[0] >= 0
    assert row[1] < 1 << 16  # 2 cols x 8 bits
    # deterministic across evaluations
    h = lambda: z1.agg(F.sum(F.col("z").cast("decimal(38,0)"))).collect()[0][0]
    assert h() == h()


def test_zorder_rejects_bit_overflow_and_column_collision(spark):
    """Round-12 review: bits*len(cols) > 63 silently wraps Java shift
    amounts (distinct points collide on the curve) — refuse loudly; and
    a user column named _z must not be clobbered by the scratch key."""
    import pytest

    from lab_etl_spark.operators.zorder import write_zordered, zorder_key

    df = spark.range(100).select(
        *[(F.col("id") % (7 + i)).alias(f"c{i}") for i in range(9)]
    )
    with pytest.raises(ValueError, match="63"):
        zorder_key(df, [f"c{i}" for i in range(9)], bits=8)
    clash = df.withColumn("_z", F.lit(1))
    with pytest.raises(ValueError, match="_z"):
        write_zordered(clash, "/tmp/never_written", ["c0", "c1"])
