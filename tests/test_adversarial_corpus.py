"""Cross-engine text-query parity over an ADVERSARIAL corpus variant.

The driver-generated ``documents`` table is well-behaved (single spaces,
lowercase-ish, LF-only), so a Spark/DuckDB tokenization divergence on
tabs, CRLF, repeated spaces, or case would never surface in the standard
parity run (the round-2 ``q_contamination`` oracle whitespace bug was
caught by review, not by a test).  This suite rebuilds ``documents`` with
extra documents full of mixed whitespace/case/unicode and re-runs the
driver-identical compare for every registered text/dedup query that reads
only the documents table.
"""

from __future__ import annotations

import shutil

import pytest

from lab_etl_spark.queries import load_all

from .compare import TABLES, compare, duck_con

REGISTRY = load_all()

#: registered queries whose inputs are exactly {documents} and whose oracle
#: tokenization must agree with Spark on hostile whitespace/case
_TEXT_QUERIES = [
    "q_text_stats",
    "q_text_quality",
    "q_text_fingerprint",
    "q_text_tokens_bpe",
    "q_token_histogram",
    "q_lang_id_ngram",
    "q_text_repetition",
    "q_contamination",
    "q_pii_redact",
    "q_tfidf",
    "q_quality_filter",
    "q_frequent_ngrams",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_doc_chunking",
    "q_vocab_oov",
    # round-4 additions reading only {documents}
    "q_dedup_clusters",
    "q_curation_pipeline",
    "q_heavy_hitters_cms",
]

_NASTY_DOCS = [
    # tabs + CRLF + run-on spaces + uppercase: every tokenizer edge at once
    "The\tQuick  BROWN fox\r\njumps\r\nOVER\t\tthe LAZY  dog "
    "the quick brown fox jumps over the lazy dog",
    # leading/trailing whitespace + unicode letters + mixed case repeats
    "  Ünïcode Tokens\tand MORE unicode TOKENS\r\n"
    "ünïcode tokens and more UNICODE tokens  ",
    # a single very spacey doc: empty-ish splits must not diverge
    " \t \r\n two\t\twords \r\n ",
] + [
    # boilerplate flood: ten documents sharing one long hot prefix (every
    # 3-shingle of it appears 10x) with unique tails — stresses the
    # posting-list caps, LSH bucket fan-out, and cluster formation that a
    # well-behaved corpus never exercises
    "terms of service apply to all content on this page all rights "
    "reserved contact the webmaster for details "
    f"unique tail marker {i} closes document {i}"
    for i in range(10)
]


@pytest.fixture(scope="module")
def nasty_sf_dir(spark, sf_dir, tmp_path_factory):
    """sf0.001 clone whose documents table carries the adversarial docs."""
    out = tmp_path_factory.mktemp("nasty_sf")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{sf_dir}/{t}.parquet", out / f"{t}.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.count()
    extra = spark.createDataFrame(
        [
            (base + i, text, "en", "src_nasty", len(text))
            for i, text in enumerate(_NASTY_DOCS)
        ],
        docs.schema,
    )
    # single output file so DuckDB's view glob sees one parquet footer
    docs.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(
        str(out / "_docs_dir")
    )
    files = list((out / "_docs_dir").glob("*.parquet"))
    assert len(files) == 1
    shutil.move(str(files[0]), out / "documents.parquet")
    shutil.rmtree(out / "_docs_dir")
    return str(out)


@pytest.mark.parametrize("name", _TEXT_QUERIES)
def test_text_query_parity_on_adversarial_corpus(spark, nasty_sf_dir, name):
    q = REGISTRY[name]
    assert q.oracle is not None, name
    con = duck_con(nasty_sf_dir)
    try:
        compare(
            q.fn(spark, nasty_sf_dir),
            con.execute(q.oracle).fetchdf(),
            name,
        )
    finally:
        con.close()


def test_json_functions_permissive_on_malformed(spark, sf_dir, tmp_path):
    """Malformed props rows must contribute NULL, not fail the job, and the
    (json_valid-guarded) oracle must agree value-for-value."""
    from pyspark.sql import functions as F

    from lab_etl_spark.catalog import load_table

    dst = tmp_path / "badjson"
    dst.mkdir()
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        if t == "events":
            df = df.withColumn(
                "props",
                F.when(F.col("event_id") % 7 == 0, F.lit("{broken"))
                .when(F.col("event_id") % 11 == 0, F.lit(""))
                .otherwise(F.col("props")),
            )
        df.toPandas().to_parquet(str(dst / f"{t}.parquet"), index=False)
    q = REGISTRY["q_json_functions"]
    con = duck_con(str(dst))
    compare(q.fn(spark, str(dst)), con.execute(q.oracle).df(), "json_bad")


def test_text_queries_handle_null_text(spark, sf_dir, tmp_path):
    """Documents with NULL text must flow through (not crash, not diverge):
    both engines treat NULL rows identically across the tokenize/dedup/
    sketch/composed pipelines."""
    from pyspark.sql import functions as F

    from lab_etl_spark.catalog import load_table

    dst = tmp_path / "nulltext"
    dst.mkdir()
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 97 == 0, F.lit(None)).otherwise(
                    F.col("text")
                ),
            )
        df.toPandas().to_parquet(str(dst / f"{t}.parquet"), index=False)
    con = duck_con(str(dst))
    for name in [
        "q_text_stats",
        "q_quality_filter",
        "q_dedup_exact",
        "q_curation_pipeline",
        "q_heavy_hitters_cms",
    ]:
        q = REGISTRY[name]
        compare(q.fn(spark, str(dst)), con.execute(q.oracle).df(), name)


def test_event_queries_handle_null_values(spark, sf_dir, tmp_path):
    """Events with NULL value must flow through the window folds, range
    windows, regression sums, and merge algebra without divergence."""
    from pyspark.sql import functions as F

    from lab_etl_spark.catalog import load_table

    dst = tmp_path / "nullval"
    dst.mkdir()
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        if t == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 13 == 0, F.lit(None)).otherwise(
                    F.col("value")
                ),
            )
        df.toPandas().to_parquet(str(dst / f"{t}.parquet"), index=False)
    con = duck_con(str(dst))
    for name in [
        "q_ewma_batch",
        "q_rolling_1h",
        "q_linreg_trend",
        "q_incremental_agg",
        "q_stream_tumbling",
        "q_scd2_lookup",
    ]:
        q = REGISTRY[name]
        compare(q.fn(spark, str(dst)), con.execute(q.oracle).df(), name)


def test_regex_queries_handle_metacharacter_text(spark, sf_dir, tmp_path):
    """Documents full of regex metacharacters, backslashes, unicode emails,
    and out-of-range IPs must not diverge between Java regex (Spark) and
    RE2 (DuckDB) on the redaction/quality/tokenizer/contamination paths."""
    from pyspark.sql import functions as F  # noqa: F401

    from lab_etl_spark.catalog import load_table

    nasty = [
        r"contact a\b.c@ex-ample.co.uk or 10.0.0.1 via C:\path\to$file"
        r" (50%) [test]",
        "email: ΑΒΓ@δομή.gr and ip 999.999.999.999 plus a+b=c?d*e",
        "regex specials .*+?()[]{}|^$ and email x.y+tag@sub.domain.io at"
        " 192.168.1.255",
    ]
    dst = tmp_path / "regex"
    dst.mkdir()
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        if t == "documents":
            base = df.count()
            extra = spark.createDataFrame(
                [
                    (base + i, tx, "en", "src_rx", len(tx))
                    for i, tx in enumerate(nasty)
                ],
                df.schema,
            )
            df = df.unionByName(extra)
        df.toPandas().to_parquet(str(dst / f"{t}.parquet"), index=False)
    con = duck_con(str(dst))
    for name in [
        "q_pii_redact",
        "q_quality_filter",
        "q_text_tokens_bpe",
        "q_contamination",
    ]:
        q = REGISTRY[name]
        compare(q.fn(spark, str(dst)), con.execute(q.oracle).df(), name)


def test_anomaly_seasonal_constant_stratum_no_nan(spark, sf_dir, tmp_path):
    """A constant-value stratum whose variance identity s2/n - (s1/n)^2
    goes slightly NEGATIVE under fp cancellation must yield sigma = 0
    (excluded), not sigma = NaN: NaN passes both ``s_sigma > 0`` and
    ``abs(z) > 3`` in Spark (NaN compares true), emitting bogus anomaly
    rows, while DuckDB's sqrt(negative) throws — so pre-clamp the two
    engines didn't even fail the same way.  The planted value is chosen
    so the decimal-rounded Σv² undershoots (Σv/n)²; the premise is
    re-asserted here so a value that stops cancelling fails loudly."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F  # noqa: F401

    from lab_etl_spark.catalog import load_table

    v, n = 1064127.8931, 40
    dst = tmp_path / "const_stratum"
    dst.mkdir()
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        if t == "events":
            base = df.count()
            t0 = datetime(2024, 1, 1, 5, 10, 0)
            extra = spark.createDataFrame(
                [
                    (
                        base + i,
                        t0 + timedelta(seconds=i),
                        1,
                        "const_stratum",
                        v,
                        "{}",
                    )
                    for i in range(n)
                ],
                df.schema,
            )
            df = df.unionByName(extra)
        df.toPandas().to_parquet(str(dst / f"{t}.parquet"), index=False)

    # premise: the unclamped identity IS negative for the planted stratum
    # in Spark's decimal-sum arithmetic (same expression text the query
    # used before the GREATEST clamp)
    inner = spark.sql(
        f"""
        WITH sums AS (
          SELECT CAST(SUM(CAST((value) AS DECIMAL(30,6))) AS DOUBLE) AS s1,
                 CAST(SUM(CAST((value * value) AS DECIMAL(30,6))) AS DOUBLE)
                   AS s2,
                 COUNT(*) AS n
          FROM parquet.`{dst}/events.parquet`
          WHERE event_type = 'const_stratum'
        )
        SELECT s2 / n - (s1 / n) * (s1 / n) AS inner FROM sums
        """
    ).first()["inner"]
    assert inner < 0, f"planted stratum no longer cancels: inner={inner}"

    q = REGISTRY["q_anomaly_seasonal"]
    out = q.fn(spark, str(dst)).toPandas()
    assert not out["seasonal_z"].isna().any()
    assert (out["event_type"] != "const_stratum").all()
    # and the oracle no longer throws on sqrt(negative): full driver compare
    con = duck_con(str(dst))
    compare(q.fn(spark, str(dst)), con.execute(q.oracle).df(), q.name)


def test_acf_and_bootstrap_flat_series_no_nan(spark, sf_dir, tmp_path):
    """Round-10 self-review: the variance clamp belongs to a CLASS, not
    one call site.  A flat hourly series makes q_acf's n*sxx - sx*sx
    cancel negative (premise re-asserted below) — pre-clamp, Spark
    emitted NaN acf rows while DuckDB's sqrt(negative) killed the
    oracle.  q_bootstrap_ci shares the identity; with B=32 (power of
    two) the double arithmetic happens to cancel exactly to 0, so its
    clamp is defense-in-depth — the compare still pins both engines
    agreeing on the constant corpus."""
    from datetime import datetime, timedelta

    from lab_etl_spark.catalog import load_table

    v, hours = 2368736.0533, 40
    dst = tmp_path / "flat_series"
    dst.mkdir()
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        if t == "events":
            base = df.count()
            t0 = datetime(2024, 2, 1, 0, 30, 0)
            extra = spark.createDataFrame(
                [
                    (
                        base + i,
                        t0 + timedelta(hours=i),
                        2,
                        "flat_series",
                        v,
                        "{}",
                    )
                    for i in range(hours)
                ],
                df.schema,
            )
            df = df.unionByName(extra)
        df.toPandas().to_parquet(str(dst / f"{t}.parquet"), index=False)

    # premise: the UNCLAMPED variance factor n*sxx - sx*sx is negative
    # for the planted flat series.  Computed in pure Python mirroring the
    # engines' arithmetic step-for-step (each step is ONE IEEE double op
    # or an exact decimal sum, identical in Spark/DuckDB/CPython): the
    # hourly value is dec6(v) (one event per hour), and for each lag the
    # pair stats are n copies of that constant.
    from decimal import ROUND_HALF_UP, Decimal

    q6 = Decimal("0.000001")
    x = float(Decimal(repr(v)).quantize(q6, rounding=ROUND_HALF_UP))
    xq = Decimal(repr(x)).quantize(q6, rounding=ROUND_HALF_UP)
    xxq = Decimal(repr(x * x)).quantize(q6, rounding=ROUND_HALF_UP)
    inners = []
    for lag in (1, 2, 3):
        n = hours - lag
        sxx = float(xxq * n)
        sx = float(xq * n)
        inners.append(n * sxx - sx * sx)
    assert any(i < 0 for i in inners), (
        f"planted flat series no longer cancels ({inners}); pick a new "
        f"value"
    )

    con = duck_con(str(dst))
    for name in ["q_acf", "q_bootstrap_ci"]:
        q = REGISTRY[name]
        out = q.fn(spark, str(dst)).toPandas()
        for col in ("acf", "boot_sd"):
            if col in out.columns:
                import numpy as np

                vals = out[col].dropna()
                assert not np.isnan(vals).any(), f"{name}.{col} has NaN"
        compare(q.fn(spark, str(dst)), con.execute(q.oracle).df(), name)
