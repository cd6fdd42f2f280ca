"""Source-format tests against the reference's real instrument fixture files
(read-only at /root/reference/tests/test_files/), pinned to the golden values
the reference's own tests assert (SURVEY.md §5):

  * MCC:  8 standardized columns × 2,584 rows (test_faa_mcc_parser.py:33-45)
  * STA:  7 columns × 1,094 rows, comma delim (test_netzsch_sta_parser.py:30-45)
  * HFM:  6 conductivity / 5 heat-capacity setpoints (FIXTURES.md A4)
  * NGB:  time/temperature/dsc columns decoded from the binary streams
  * Cone: standardized column set, baseline row with null time
  * FTIR: wavelength grid + ≥1 spectrum, all float64
"""

from __future__ import annotations

import os

import pytest

FIX = "/root/reference/tests/test_files"

MCC_FILE = f"{FIX}/MCC/Hemp_Sheet_MCC_30K_min_220112_R1.txt"
STA_FILE = f"{FIX}/STA/DF_FILED_VAL_STA_N2_10K_240211_R1.csv"
HFM_COND = f"{FIX}/HFM/Black_PMMA_HFM_Dry_conductivity_211115_R1.tst"
HFM_HC = f"{FIX}/HFM/Black_PMMA_HFM_Dry_heatcapacity_211117_R3.tst"
NGB_FILE = f"{FIX}/STA/PT_Deck_Board_3_1.ngb-ss3"
CONE_FILE = f"{FIX}/Cone/Asphalt_Shingle_Cone_HF25_220415_R1.XLSM"
FTIR_FILE = f"{FIX}/FTIR/Upper_Fiber_Cement_Board_3.0"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="reference fixtures not present"
)


# ---------------------------------------------------------------------------
# Pure-Python parser layers (no Spark session needed)
# ---------------------------------------------------------------------------


def test_hfm_parse_conductivity():
    from lab_etl_spark.sources.hfm import parse_hfm_text

    text = open(HFM_COND, "rb").read().decode("utf-16-le", errors="replace")
    meta, rows = parse_hfm_text(text)
    assert meta["type"] == "conductivity"
    assert meta["number_of_setpoints"] == 6
    assert meta["sample_id"] == "BlackPMMA_HFM_Dry_Conductivity_211115_R1"
    assert meta["thickness"]["value"] == 8.67
    assert meta["thickness"]["unit"] == "mm"
    assert meta["thickness"]["rear_left"]["value"] == 8.59
    assert len(rows) == 6
    r1 = rows[0]
    assert r1["setpoint"] == 1
    assert r1["upper_temperature"] == 5.00
    assert r1["lower_temperature"] == 25.01
    assert r1["upper_thermal_conductivity"] == 0.1497
    assert r1["lower_thermal_conductivity"] == 0.1494


def test_hfm_parse_heat_capacity():
    from lab_etl_spark.sources.hfm import parse_hfm_text

    text = open(HFM_HC, "rb").read().decode("utf-16-le", errors="replace")
    meta, rows = parse_hfm_text(text)
    assert meta["type"] == "volumetric_heat_capacity"
    assert meta["number_of_setpoints"] == 5
    # heat-capacity results are deltas between consecutive setpoints → the
    # file's own "Results Table" has n-1 = 4 rows (verified in the fixture)
    assert len(rows) == 4
    assert rows[0]["average_temperature"] == 10.00
    assert rows[0]["volumetric_heat_capacity"] == 1576159
    assert meta["calibration"]["heat_capacity_coefficients"]["A"] == 7.8282


def test_ngb_parse_bytes():
    from lab_etl_spark.sources.ngb import parse_ngb_bytes

    meta, pdf = parse_ngb_bytes(open(NGB_FILE, "rb").read())
    assert {"time", "temperature", "dsc"} <= set(pdf.columns)
    assert len(pdf) > 100
    # temperature ramps: max well above min
    assert pdf["temperature"].max() > pdf["temperature"].min() + 50
    assert "sample_id" in meta or "sample_name" in meta
    assert "date_performed" in meta


def test_cone_parse_bytes():
    from lab_etl_spark.sources.cone import parse_cone_bytes

    meta, pdf, units = parse_cone_bytes(open(CONE_FILE, "rb").read())
    expected = {
        "time",
        "stack_temperature",
        "smoke_temperature",
        "exhaust_pressure",
        "sample_mass",
    }
    assert expected <= set(pdf.columns)
    assert "names" not in pdf.columns  # dropped row label
    assert "extinction_coefficient" not in pdf.columns  # dropped derived col
    # baseline row carries null time (docs/cone.md)
    assert pdf["time"].isna().iloc[0]
    assert pdf["time"].notna().iloc[1:].all()
    assert units.get("stack_temperature") == "°C"
    assert units.get("time") == "s"
    assert meta.get("test_id") is not None or "comment" in meta


def test_ftir_parse_bytes():
    from lab_etl_spark.sources.ftir import opus_to_frame

    params, frame, units = opus_to_frame(open(FTIR_FILE, "rb").read())
    assert not frame.empty
    assert "wavelength" in frame.columns
    assert len(frame.columns) >= 2  # wavelength + >=1 spectrum
    wl = frame["wavelength"].to_numpy()
    assert (wl[1:] >= wl[:-1]).all()  # ascending grid
    assert units["wavelength"] == "µm"


def test_metadata_line_parsing():
    from lab_etl_spark.sources.text_formats import parse_metadata_lines

    meta = parse_metadata_lines(
        [
            "#SAMPLE MASS /mg: ,3.99",
            "#REMARK: ,first",
            "#REMARK: ,second",
            "#OPERATOR: ,jdoe",
        ],
        ":",
        prefix="#",
    )
    assert meta["sample_mass"] == {"value": 3.99, "unit": "mg"}
    assert meta["remark"] == ["first", "second"]
    assert meta["operator"] == "jdoe"


# ---------------------------------------------------------------------------
# Spark loaders (golden pins from the reference's unit tests)
# ---------------------------------------------------------------------------

PROVENANCE = {"instrument_type", "source_file", "file_hash", "file_metadata"}


def test_load_mcc_golden(spark):
    from lab_etl_spark.meta import units_of
    from lab_etl_spark.sources import load_mcc

    df = load_mcc(spark, MCC_FILE)
    data_cols = [c for c in df.columns if c not in PROVENANCE]
    assert len(data_cols) == 8  # test_faa_mcc_parser.py:33-43
    assert df.count() == 2584  # test_faa_mcc_parser.py:44-45
    assert "time" in data_cols and "temperature" in data_cols
    units = units_of(df)
    assert units.get("time") == "s"
    row = df.first()
    assert row["instrument_type"] == "MCC"
    # exact BLAKE2b-512 the reference's own test pins for this fixture
    # (test_faa_mcc_parser.py:64-67) — byte-identical provenance hashing
    assert row["file_hash"] == (
        "894746aebd128d33e8f24b068795787762ef0ef2cb0edcceb8eeb75a059ba9da"
        "f989ffd14de6297aa32b9957f0c3a671f316003c1bc2fa8359318d173ff9d828"
    )
    import json as _json

    meta = _json.loads(row["file_metadata"])
    # metadata typing ladder + unit normalization, as the reference extracts
    # (test_faa_mcc_parser.py:51-63)
    assert meta["sample_mass"] == {"value": 4.64, "unit": "mg"}
    assert meta["combustor_temperature"] == {"value": 900, "unit": "°C"}
    assert meta["heating_rate"] == {"value": 0.5, "unit": "°C/s"}
    assert {"sample_id", "n2_flow_rate", "o2_flow_rate", "time_shift"} <= set(
        meta
    )


def test_load_sta_csv_golden(spark):
    from lab_etl_spark.sources import load_sta_csv

    df = load_sta_csv(spark, STA_FILE)
    data_cols = [c for c in df.columns if c not in PROVENANCE]
    assert len(data_cols) == 7  # test_netzsch_sta_parser.py:33-38
    assert df.count() == 1094
    assert dict(df.dtypes)["segment"] == "bigint"
    assert {"temperature", "time", "mass", "dsc", "dtg"} <= set(data_cols)


def test_load_hfm_spark(spark):
    from lab_etl_spark.sources import load_hfm

    df = load_hfm(spark, HFM_COND)
    assert df.count() == 6
    assert df.filter("upper_thermal_conductivity IS NULL").count() == 0


def test_scan_hfm_distributed(spark):
    from lab_etl_spark.sources import scan_hfm

    df = scan_hfm(spark, f"{FIX}/HFM/*.tst")
    rows = df.collect()
    assert len(rows) == 10  # 6 conductivity + 4 heat-capacity result rows
    modes = {r["run_mode"] for r in rows}
    assert modes == {"conductivity", "volumetric_heat_capacity"}


def test_scan_ngb_distributed(spark):
    from lab_etl_spark.sources import scan_ngb

    df = scan_ngb(spark, f"{FIX}/STA/*.ngb-ss3")
    assert df.select("source_file").distinct().count() == 4
    assert df.filter("temperature IS NOT NULL").count() > 1000


def test_load_cone_spark(spark):
    from lab_etl_spark.sources import load_cone

    df = load_cone(spark, CONE_FILE)
    assert df.count() > 100
    assert df.filter("time IS NULL").count() == 1  # baseline row only


def test_lake_partition_pruning(spark, tmp_path):
    # A mixed-instrument lake partitioned by instrument_type must prune at
    # the scan: filtering one family reads only that partition directory
    # (PartitionFilters in the plan; at 100 TB this is the difference
    # between scanning one instrument family and the whole lake).
    from lab_etl_spark.sources import load_mcc, load_sta_csv, write_parquet

    out = str(tmp_path / "lake")
    for df in (load_mcc(spark, MCC_FILE), load_sta_csv(spark, STA_FILE)):
        write_parquet(
            df.select(
                "time", "temperature", "instrument_type", "source_file"
            ),
            out,
        )
    lake = spark.read.parquet(out)
    one = lake.filter(lake.instrument_type == "MCC")
    plan = one._jdf.queryExecution().explainString(
        one._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "instrument_type" in pf, plan
    assert one.count() == 2584
    assert one.select("instrument_type").distinct().collect()[0][0] == "MCC"


def test_parquet_roundtrip_preserves_units(spark, tmp_path):
    from lab_etl_spark.meta import units_of
    from lab_etl_spark.sources import load_hfm, write_parquet

    df = load_hfm(spark, HFM_COND)
    out = str(tmp_path / "hfm_lake")
    write_parquet(df, out)
    back = spark.read.parquet(out)
    assert back.count() == 6
    assert units_of(back).get("upper_temperature") == "°C"


def test_write_csv_debug_roundtrip(spark, tmp_path):
    from lab_etl_spark.sources.sink import write_csv_debug

    df = spark.createDataFrame(
        [(1, 2.5), (2, 3.5)], "run_id bigint, value double"
    )
    out = str(tmp_path / "debug_csv")
    write_csv_debug(df, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 2
    assert set(back.columns) == {"run_id", "value"}
    # single_file=True must produce exactly one CSV part
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    assert len(parts) == 1


def test_load_ngb_empty_container_explicit_schema(spark, tmp_path):
    # A container with no decodable data streams must yield an explicit-
    # schema empty DataFrame, not crash createDataFrame schema inference.
    import zipfile

    from lab_etl_spark.sources.ngb import COLUMN_MAP, load_ngb

    p = tmp_path / "empty.ngb-ss3"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("Streams/placeholder", b"")
    df = load_ngb(spark, str(p))
    assert df.count() == 0
    for c in COLUMN_MAP.values():
        assert c in df.columns


def test_scan_mcc_long_matches_wide_loader(spark):
    from lab_etl_spark.sources.text_formats import load_mcc, scan_mcc

    long_df = scan_mcc(spark, f"{FIX}/MCC/*.txt")
    wide = load_mcc(spark, MCC_FILE)
    hrr_wide = sorted(r[0] for r in wide.select("hrr").collect())
    hrr_long = sorted(
        r[0]
        for r in long_df.where(
            "channel = 'hrr' AND source_file like 'Hemp%'"
        )
        .select("value")
        .collect()
    )
    assert hrr_wide == hrr_long and len(hrr_wide) == 2584
    # unit metadata rides as a column in the long form
    units = dict(
        (r.channel, r.unit)
        for r in long_df.select("channel", "unit").distinct().collect()
    )
    assert units["hrr"] == "W/g"
    assert units["temperature"] == "°C"


def test_scan_sta_csv_long_format(spark):
    from lab_etl_spark.sources.text_formats import scan_sta_csv

    long_df = scan_sta_csv(spark, f"{FIX}/STA/*.csv")
    rows = long_df.where("channel = 'temperature'").count()
    assert rows >= 1094  # at least the golden file's row count
    assert long_df.where("value IS NOT NULL").count() > 0


def test_webdataset_pairing_unicode_and_incomplete_samples(spark, tmp_path):
    # WebDataset convention: {key}.txt + {key}.json pair by basename inside
    # a shard; a sample missing either half is skipped, not an error; text
    # bytes round-trip utf-8 exactly (snowman + newline + tab).
    import io
    import tarfile

    from lab_etl_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    docs = spark.createDataFrame(
        [
            (1, "web", "en", 7, "hello\t☃\nworld"),
            (2, "web", "de", 3, "grüß"),
            (3, "book", "en", 5, "plain"),
        ],
        "doc_id bigint, source string, lang string, n_chars bigint,"
        " text string",
    )
    out = str(tmp_path / "wds")
    n_members = write_webdataset(docs, out, n_shards=2)
    assert n_members == 6
    # plant an incomplete sample (txt with no json) and a stray member
    with tarfile.open(str(tmp_path / "wds" / "shard-99999.tar"), "w") as tf:
        for name, data in (("9.txt", b"orphan"), ("README", b"ignore me")):
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    back = {r["doc_id"]: r for r in read_webdataset(spark, out).collect()}
    assert set(back) == {1, 2, 3}  # orphan key 9 skipped
    assert back[1]["text"] == "hello\t☃\nworld"
    assert back[2]["text"] == "grüß" and back[2]["lang"] == "de"


def test_webdataset_datasource_connector_matches_kernel_reader(
    spark, tmp_path
):
    # The first-class connector (spark.read.format("webdataset")) must
    # produce exactly the rows of the mapInPandas reader, with one input
    # partition per shard.
    from lab_etl_spark.sources.webdataset import (
        read_webdataset,
        register_webdataset_source,
        write_webdataset,
    )

    docs = spark.range(40).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 2 = 0 THEN 'web' ELSE 'book' END AS source",
        "'en' AS lang",
        "CAST(10 + id AS BIGINT) AS n_chars",
        "concat('text-', id, ' ☃') AS text",
    )
    out = str(tmp_path / "wds")
    write_webdataset(docs, out, n_shards=4)
    register_webdataset_source(spark)
    via_ds = spark.read.format("webdataset").load(out)
    assert via_ds.rdd.getNumPartitions() == 4  # one per shard
    a = sorted(map(tuple, via_ds.collect()))
    b = sorted(map(tuple, read_webdataset(spark, out).collect()))
    assert a == b and len(a) == 40


def test_webdataset_datasource_write_path_roundtrips(spark, tmp_path):
    from lab_etl_spark.sources.webdataset import register_webdataset_source

    register_webdataset_source(spark)
    docs = spark.range(20).selectExpr(
        "id AS doc_id",
        "'web' AS source",
        "'en' AS lang",
        "CAST(5 AS BIGINT) AS n_chars",
        "concat('doc-', id) AS text",
    )
    out = str(tmp_path / "wds_w")
    docs.repartition(3).write.format("webdataset").mode("append").save(out)
    back = spark.read.format("webdataset").load(out)
    assert back.count() == 20
    assert back.rdd.getNumPartitions() == 3
    assert sorted(r["text"] for r in back.collect()) == sorted(
        f"doc-{i}" for i in range(20)
    )
