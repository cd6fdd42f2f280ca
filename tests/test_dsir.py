"""Semantic pins for DSIR importance weighting (queries/text.py dsir_logw).

Oracle parity proves both engines compute the same numbers; these prove
the numbers POINT THE RIGHT WAY — a sign-flipped log-ratio would pass
every parity check (the oracle would replicate the flip).
"""

from __future__ import annotations


def test_target_like_documents_score_higher(spark):
    # Documents made of target-only vocabulary must outscore documents of
    # off-target vocabulary under a target model trained on exactly that
    # split; mixed docs land in between.
    from lab_etl_spark.queries.text import dsir_logw

    rows = []
    for i in range(20):
        rows.append((i, "en", "alpha beta gamma delta epsilon zeta"))
    for i in range(20, 40):
        rows.append((i, "de", "un deux trois quatre cinq six"))
    rows.append((100, "de", "alpha beta gamma delta epsilon zeta"))  # en-like
    rows.append((101, "en", "un deux trois quatre cinq six"))  # de-like
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    lw = {r.doc_id: r.logw for r in dsir_logw(docs).collect()}
    # en-vocab docs (whatever their label) must beat de-vocab docs
    assert lw[0] > lw[20]
    assert lw[100] > lw[101]
    # and the en-vocab score must be positive, de-vocab negative (the
    # smoothed LLR is symmetric around 0 for a balanced split)
    assert lw[100] > 0 > lw[101]


def test_real_corpus_selects_toward_target_on_average(spark, sf_dir):
    from pyspark.sql import functions as F

    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.queries.text import dsir_logw

    docs = load_table(spark, sf_dir, "documents")
    lw = dsir_logw(docs).join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.is_en: r.m
        for r in lw.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("logw").alias("m"))
        .collect()
    }
    assert means[True] > means[False]
