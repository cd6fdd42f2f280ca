"""Reference-parity API facade (lab_etl_spark/api.py): the six
load_<instrument>_data names a lab-etl user already knows, extension
dispatch, and the __main__-equivalent etl_file parquet round-trip."""

from __future__ import annotations

import os

import pytest

FIX = "/root/reference/tests/test_files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="reference fixtures not present"
)


def test_named_loaders_match_direct_sources(spark):
    from lab_etl_spark import api

    pairs = [
        (api.load_mcc_data, f"{FIX}/MCC/Hemp_Sheet_MCC_30K_min_220112_R1.txt"),
        (api.load_hfm_data,
         f"{FIX}/HFM/Black_PMMA_HFM_Dry_conductivity_211115_R1.tst"),
        (api.load_ngb_data, f"{FIX}/STA/PT_Deck_Board_3_1.ngb-ss3"),
    ]
    for fn, path in pairs:
        df = fn(spark, path)
        assert df.count() > 0
        # provenance travels as ordinary columns (reference attaches file
        # metadata; SURVEY §1.5)
        assert any(c in df.columns for c in ("source_file", "file_path"))


def test_load_file_dispatches_by_extension(spark):
    from lab_etl_spark import api

    df = api.load_file(
        spark, f"{FIX}/HFM/Black_PMMA_HFM_Dry_conductivity_211115_R1.tst"
    )
    assert df.count() > 0
    with pytest.raises(ValueError, match="unrecognized"):
        api.load_file(spark, "/tmp/nope.unknown")


def test_etl_file_writes_parquet_roundtrip(spark, tmp_path):
    from lab_etl_spark import api

    src = f"{FIX}/MCC/Hemp_Sheet_MCC_30K_min_220112_R1.txt"
    out = api.etl_file(spark, src, out_dir=str(tmp_path))
    assert out.endswith(".parquet")
    back = spark.read.parquet(out)
    orig = api.load_mcc_data(spark, src)
    assert back.count() == orig.count()
    assert set(back.columns) == set(orig.columns)


def test_sql_over_lake_tables(spark, sf_dir):
    from lab_etl_spark import api

    out = api.sql(
        spark,
        sf_dir,
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders"
        " GROUP BY o_orderstatus ORDER BY o_orderstatus",
    ).collect()
    assert len(out) >= 2 and all(r.n > 0 for r in out)


def test_remaining_loaders_smoke(spark):
    from lab_etl_spark import api

    cases = [
        (api.load_sta_data,
         f"{FIX}/STA/DF_FILED_VAL_STA_N2_10K_240211_R1.csv"),
        (api.load_cone_data,
         f"{FIX}/Cone/Asphalt_Shingle_Cone_HF25_220415_R1.XLSM"),
        (api.load_ftir_data, f"{FIX}/FTIR/Upper_Fiber_Cement_Board_3.0"),
    ]
    for fn, path in cases:
        assert fn(spark, path).count() > 0, path
