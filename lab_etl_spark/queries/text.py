"""Text-analysis queries over the ``documents`` table (SURVEY.md §2B):
token statistics, quality scoring, fingerprinting, token histogram.

All expressions are JVM-side builtins (split/regexp/aggregate) — no Python in
the row path, so whole-stage codegen covers the entire pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register
from .exact import davg, dsum

_STOPWORDS = ["the", "a", "of", "and", "to", "in"]
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "q_text_stats",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           {davg('n_chars')} AS avg_chars,
           {davg("len(string_split_regex(trim(text), ' +'))")} AS avg_tokens,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
    doc="Corpus stats per (lang, source): doc counts, exact-decimal char/token "
    "averages.",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_tokens", F.size(F.split(F.trim("text"), " +")))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(davg("n_chars")).alias("avg_chars"),
            F.expr(davg("n_tokens")).alias("avg_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "q_text_quality",
    oracle=f"""
    SELECT doc_id,
           len(string_split_regex(trim(text), ' +')) AS n_tokens,
           CAST(len(list_filter(string_split_regex(trim(text), ' +'),
                                w -> w IN ({_STOP_SQL}))) AS DOUBLE)
                 / len(string_split_regex(trim(text), ' +')) AS stopword_ratio,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split_regex(trim(text), ' +')) AS avg_word_len,
           CASE WHEN len(string_split_regex(trim(text), ' +')) BETWEEN 5 AND 1000
                 AND CAST(len(list_filter(string_split_regex(trim(text), ' +'),
                                          w -> w IN ({_STOP_SQL}))) AS DOUBLE)
                     / len(string_split_regex(trim(text), ' +')) > 0.05
                THEN 1 ELSE 0 END AS quality_pass
    FROM documents
    """,
    doc="Per-doc quality scoring: token count, stopword ratio, mean word "
    "length, and a pass/fail gate — the classic pretraining-corpus filter.",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), " +")
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    stop_ratio = n_stop.cast("double") / n_tokens
    awl = (
        F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tokens
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        # raw exact-integer quotients — no rounding (rational-ROUND trap,
        # see queries/exact.py)
        stop_ratio.alias("stopword_ratio"),
        awl.alias("avg_word_len"),
        F.when(n_tokens.between(5, 1000) & (stop_ratio > 0.05), 1)
        .otherwise(0)
        .alias("quality_pass"),
    )


@register(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS fp_md5,
           substring(md5(lower(trim(text))), 1, 8) AS fp_short
    FROM documents
    """,
    doc="Deterministic document fingerprint (md5 is byte-identical across "
    "engines); reference analogue: file_hash provenance (util.py:83-93).",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim("text")))
    return docs.select(
        "doc_id", fp.alias("fp_md5"), F.substring(fp, 1, 8).alias("fp_short")
    )


@register(
    "q_token_histogram",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    )
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    doc="Global top-20 token histogram: explode -> partial-agg combine -> "
    "top-k (integer counts, fully deterministic).",
)
def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.trim("text"), " +")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation — the
#: GPT-2-style split, minus unicode classes (portable regex subset that
#: behaves identically in Spark (Java regex) and DuckDB (RE2).
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "q_text_tokens_bpe",
    oracle=f"""
    SELECT doc_id,
           len(string_split_regex(trim(text), ' +')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS bpe_tokens,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS DOUBLE)
                 / len(string_split_regex(trim(text), ' +')) AS bpe_per_word
    FROM documents
    """,
    doc="Token counting two ways: whitespace words and a BPE-ish regex "
    "pre-tokenization (letter runs / digit runs / punctuation) — the "
    "standard cost estimator for LLM training corpora.",
)
def q_text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim("text"), " +"))
    bpe = F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (bpe.cast("double") / ws).alias("bpe_per_word"),
    )


#: 32-bit md5-based token hash — portable across Spark and DuckDB
_TOK_SPARK = "CAST(CONV(SUBSTRING(MD5(w), 1, 8), 16, 10) AS BIGINT)"
_TOK_DUCK = "CAST(('0x' || SUBSTRING(MD5(w), 1, 8)) AS BIGINT)"
_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime; classic Rabin-Karp modulus)


@register(
    "q_text_rolling_hash",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(string_split_regex(trim(lower(text)), ' +'),
                              w -> {_TOK_DUCK})),
             (acc, h) -> (acc * 31 + h) % {_MOD}) AS fingerprint
    FROM documents
    """,
    doc="Order-sensitive document fingerprint: Rabin-Karp rolling hash over "
    "the word sequence (left-to-right fold; md5 token hash keeps both "
    "engines bit-identical).  Unlike md5-of-text, locality is preserved "
    "under append (streaming-friendly).",
)
def q_text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(
            "aggregate(split(trim(lower(text)), ' +'), 0L,"
            f" (acc, w) -> (acc * 31 + {_TOK_SPARK}) % {_MOD})"
        ).alias("fingerprint"),
    )


@register(
    "q_lang_id_ngram",
    priority=1,
    oracle="""
    WITH tri AS (
      SELECT doc_id, lang, substring(text, i, 3) AS tri
      FROM documents,
           UNNEST(generate_series(1, greatest(length(text) - 2, 0))) AS t(i)
    ),
    tb AS (
      SELECT doc_id, lang,
             (CAST(unicode(substring(tri, 1, 1)) AS BIGINT) * 7919
              + CAST(unicode(substring(tri, 2, 1)) AS BIGINT) * 104729
              + CAST(unicode(substring(tri, 3, 1)) AS BIGINT) * 31) % 1024
               AS bucket
      FROM tri
    ),
    tri_counts AS (
      SELECT doc_id, lang, bucket, COUNT(*) AS c FROM tb GROUP BY 1, 2, 3
    ),
    profile AS (
      SELECT bucket, lang AS cand_lang, SUM(c) AS w
      FROM tri_counts GROUP BY 1, 2
    ),
    scored AS (
      SELECT t.doc_id, p.cand_lang,
             CAST(SUM(t.c * p.w) AS BIGINT) AS score
      FROM tri_counts t JOIN profile p USING (bucket)
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT doc_id, cand_lang, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cand_lang) AS rk
      FROM scored
    )
    SELECT doc_id, cand_lang AS predicted_lang, score FROM ranked WHERE rk = 1
    """,
    doc="Character-n-gram language-ID heuristic: score text against per-lang "
    "trigram profiles built from the corpus itself (portable prime-mixed "
    "code-point buckets — integer scores, so the DuckDB oracle reproduces "
    "the pipeline exactly), pick argmax lang with a deterministic tie-break.",
)
def q_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import fan_out

    # single-row-group insurance: the trigram explode below is ~300x the
    # source bytes and must not serialize into a one-task scan stage
    # (3.4 s -> 1.2 s at sf0.1; no-op on multi-split sources)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # Per-language character-trigram profile (top hashed trigram buckets),
    # then each doc votes for the language whose profile overlaps most.
    # length >= 3 guard matters: Spark's sequence(1, 0) is the DESCENDING
    # [1, 0] (not empty like DuckDB's generate_series), which would emit
    # bogus trigrams for 1-2 char docs.
    # Portable zero-cost bucket: prime-mixed code points of each trigram
    # (identical in DuckDB via unicode()), BIGINT to dodge 32-bit overflow
    # on CJK code points.  The text is split to a code-point array ONCE and
    # buckets index into it — substring(text, i, 3) per position re-scans
    # the UTF8 string from the start (variable-width encoding), turning a
    # 1000-char doc into ~10^6 byte reads; the array shape measured 2.0x
    # faster at sf0.1 with bit-identical tri_counts.  Caveat: split('')
    # yields UTF-16 code units, so astral-plane chars (emoji) would bucket
    # as surrogate halves where the oracle's unicode() sees one code point —
    # equal for all BMP text (the corpus is ASCII; guard if that changes).
    cp = docs.filter(F.length("text") >= 3).select(
        "doc_id",
        "lang",
        F.expr("transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))").alias(
            "_cp"
        ),
    )
    tri = cp.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(_cp) - 2),"
                " i -> pmod(element_at(_cp, i) * 7919"
                " + element_at(_cp, i + 1) * 104729"
                " + element_at(_cp, i + 2) * 31, 1024))"
            )
        ).alias("bucket"),
    )
    # Partial-aggregate to per-doc bucket counts FIRST: the profile build and
    # the scoring join then both run over |docs|·|distinct buckets| rows, not
    # one row per trigram occurrence — at corpus scale that's the difference
    # between joining ~10^9 and ~10^12 rows.  Scoring via Σ c·w is identical
    # to joining per occurrence (score = Σ_buckets count_doc(b) · w(lang, b)).
    # tri_counts feeds BOTH the profile build and the scoring join, so the
    # trigram explode runs twice.  Measured: recomputing the (codegen'd,
    # narrow) explode is cheaper here than materializing ~|docs|·1024
    # tri_count rows with localCheckpoint (tried: +15% total); revisit only
    # if the profile side grows another consumer.
    tri_counts = tri.groupBy("doc_id", "lang", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    profile = (
        tri_counts.groupBy("bucket", "lang")
        .agg(F.sum("c").alias("w"))
        .withColumnRenamed("lang", "cand_lang")
    )
    scored = (
        tri_counts.select("doc_id", "bucket", "c")
        .join(F.broadcast(profile), "bucket")
        .groupBy("doc_id", "cand_lang")
        .agg(F.sum(F.col("c") * F.col("w")).alias("score"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand_lang")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("cand_lang").alias("predicted_lang"), "score")
    )


# ---------------------------------------------------------------------------
# Training-data pipeline extensions: repetition signals, benchmark
# contamination, PII redaction
# ---------------------------------------------------------------------------


@register(
    "q_text_repetition",
    priority=1,
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents
    ),
    g AS (
      SELECT doc_id, ws, len(ws) AS n_words,
             list_transform(generate_series(1, len(ws) - 1),
                            i -> ws[i] || ' ' || ws[i + 1]) AS bigrams
      FROM t
    )
    SELECT doc_id, n_words,
           CAST(list_max(list_transform(list_distinct(ws),
                     d -> len(list_filter(ws, x -> x = d)))) AS DOUBLE)
                 / n_words AS top_word_frac,
           1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                 / len(bigrams) AS dup_bigram_frac
    FROM g
    WHERE n_words >= 2
    """,
    doc="Per-doc repetition signals (Gopher-style quality rules): most-"
    "frequent-word fraction and duplicate-bigram fraction, computed entirely "
    "inside whole-stage codegen (array transforms — no explode, no shuffle "
    "beyond the scan).  Docs dominated by a few repeated tokens or phrases "
    "are the classic low-quality pretraining material these gates remove.",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim("text"), " +")
    d = docs.select("doc_id", ws.alias("ws"), F.size(ws).alias("n_words"))
    d = d.filter(F.col("n_words") >= 2).withColumn(
        "bigrams",
        F.expr(
            "transform(sequence(1, size(ws) - 1),"
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
        ),
    )
    top_word = F.expr(
        "array_max(transform(array_distinct(ws),"
        " d -> size(filter(ws, x -> x = d))))"
    )
    return d.select(
        "doc_id",
        "n_words",
        (top_word.cast("double") / F.col("n_words")).alias(
            "top_word_frac"
        ),
        (
            # try_divide: a one-word doc has ZERO bigrams — ANSI would
            # throw; NULL frac matches the oracle's native /0 NULL
            F.lit(1.0)
            - F.try_divide(
                F.size(F.array_distinct("bigrams")).cast("double"),
                F.size("bigrams"),
            )
        ).alias("dup_bigram_frac"),
    )


@register(
    "q_contamination",
    priority=1,
    oracle="""
    WITH words AS (
      SELECT doc_id,
             string_split_regex(
               trim(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))),
               ' ') AS ws
      FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4]) AS sh
      FROM words, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)
    ),
    bench AS (
      SELECT DISTINCT sh FROM shingles WHERE doc_id % 97 = 0
    )
    SELECT s.doc_id, COUNT(DISTINCT s.sh) AS n_shared
    FROM shingles s JOIN bench b ON s.sh = b.sh
    WHERE s.doc_id % 97 <> 0
    GROUP BY s.doc_id
    """,
    doc="Benchmark-contamination scan: flags corpus documents sharing any "
    "5-gram with the held-out benchmark slice (doc_id % 97 = 0 stands in "
    "for the eval set).  The benchmark shingle set is orders of magnitude "
    "smaller than the corpus, so the join broadcasts it in practice and the "
    "corpus shingle stream is touched exactly once — the standard shape for "
    "decontaminating a 100 TB crawl against eval suites.",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, n=5).withColumnRenamed("shingle", "sh")
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0).select("sh").distinct()
    )
    return (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(bench, "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_shared"))
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "q_pii_redact",
    priority=1,
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@example.com from 10.0.' || (doc_id % 256) || '.7' AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{_IP_RE}')) AS n_ips,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                              '{_IP_RE}', '[IP]', 'g')) AS redacted_md5
    FROM aug
    """,
    doc="PII scrubbing pass: count and redact emails / IPv4 addresses via "
    "portable regexes (identical semantics in Java regex and RE2).  The "
    "synthetic corpus carries no PII, so the query deterministically plants "
    "one of each per document first — the redaction path itself is the "
    "operator under test, verified by md5 of the fully redacted text.  "
    "Pure per-row codegen: at 100 TB this is a map-only pass.",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    d = docs.select("doc_id", aug.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace("t", _EMAIL_RE, "[EMAIL]"), _IP_RE, "[IP]"
    )
    return d.select(
        "doc_id",
        F.regexp_count("t", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("t", F.lit(_IP_RE)).alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


@register(
    "q_tfidf",
    priority=1,
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tokens GROUP BY 1, 2
    ),
    dfreq AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6)
               AS score
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, token, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token) AS rk
      FROM scored
    )
    SELECT doc_id, token AS top_token, score FROM ranked WHERE rk = 1
    """,
    doc="TF-IDF keyword extraction: term frequency per (doc, token), "
    "document frequency from the same aggregate (no second corpus scan), "
    "idf = ln((N+1)/(df+1)), top-scoring token per doc with a deterministic "
    "tie-break.  The token vocabulary aggregate is the only data-sized "
    "shuffle; N is a one-row broadcast.  The standard keyword/relevance "
    "primitive for corpus curation.",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("token")
    )
    tf = tokens.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("token").alias("top_token"), "score")
    )


@register(
    "q_quality_filter",
    priority=1,
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), ' +') AS ws
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             CAST(len(array_to_string(ws, '')) AS DOUBLE) / len(ws) AS awl,
             CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               / greatest(len(text), 1) AS fa,
             list_max(list_transform(ws, x -> len(x))) AS max_tok
      FROM t
    ),
    g AS (
      SELECT doc_id, n_words, awl, fa,
             list_filter([
               CASE WHEN n_words < 5 THEN 'too_few_words' END,
               CASE WHEN awl < 2 OR awl > 12 THEN 'word_len' END,
               CASE WHEN fa < 0.5 THEN 'low_alpha' END,
               CASE WHEN max_tok > 25 THEN 'giant_token' END
             ], x -> x IS NOT NULL) AS fails
      FROM m
    )
    SELECT doc_id, n_words,
           awl AS avg_word_len,
           fa AS alpha_frac,
           CASE WHEN len(fails) = 0 THEN 1 ELSE 0 END AS keep,
           COALESCE(array_to_string(fails, ','), '') AS drop_reasons
    FROM g
    """,
    doc="Composite C4/Gopher-style quality gate: word count, mean word "
    "length, alphabetic fraction, and giant-token rules evaluated in one "
    "codegen pass, emitting keep/drop plus the comma-joined list of failed "
    "rules (the audit trail curation pipelines keep next to every drop "
    "decision).  Map-only — no shuffle at all: at 100 TB this runs at scan "
    "speed and partitions trivially.  Regex classes are shared-subset "
    "(Java regex == RE2 here); the word split reuses the corpus-wide "
    "' +' idiom so gates compose with the other text queries.",
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim("text"), " +")
    d = docs.select("doc_id", "text", ws.alias("ws")).select(
        "doc_id",
        F.size("ws").alias("n_words"),
        (
            F.length(F.concat_ws("", F.col("ws"))).cast("double")
            / F.size("ws")
        ).alias("awl"),
        (
            F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("double")
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("fa"),
        F.expr("array_max(transform(ws, x -> length(x)))").alias("max_tok"),
    )
    fails = F.expr(
        "filter(array("
        "CASE WHEN n_words < 5 THEN 'too_few_words' END, "
        "CASE WHEN awl < 2 OR awl > 12 THEN 'word_len' END, "
        "CASE WHEN fa < 0.5 THEN 'low_alpha' END, "
        "CASE WHEN max_tok > 25 THEN 'giant_token' END"
        "), x -> x IS NOT NULL)"
    )
    return d.withColumn("fails", fails).select(
        "doc_id",
        "n_words",
        F.col("awl").alias("avg_word_len"),
        F.col("fa").alias("alpha_frac"),
        F.when(F.size("fails") == 0, 1).otherwise(0).alias("keep"),
        F.concat_ws(",", "fails").alias("drop_reasons"),
    )


@register(
    "q_frequent_ngrams",
    priority=1,
    oracle="""
    WITH words AS (
      SELECT string_split_regex(trim(lower(regexp_replace(trim(text),
             '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    grams AS (
      SELECT ws[i] || ' ' || ws[i + 1] AS ngram
      FROM words, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
      WHERE len(ws) >= 2
    )
    SELECT ngram, COUNT(*) AS n
    FROM grams
    GROUP BY ngram
    ORDER BY n DESC, ngram
    LIMIT 25
    """,
    doc="Corpus heavy-hitters: top-25 word bigrams by raw frequency "
    "(vocabulary/boilerplate analysis — the corpus-level twin of the "
    "per-doc q_text_repetition gate).  One codegen explode feeds a "
    "hash aggregate with map-side partial combine (the bigram space is "
    "Zipfian, so partial aggregation collapses the hot head before the "
    "shuffle), and the top-25 is TakeOrderedAndProject — no global "
    "sort.  At 100 TB this is one scan + one agg shuffle of the "
    "distinct-bigram set, not the token stream.",
)
def q_frequent_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(
        F.expr("lower(regexp_replace(trim(text), '\\\\s+', ' '))"), " "
    )
    grams = F.expr(
        "transform(sequence(1, size(_w) - 1),"
        " i -> concat_ws(' ', slice(_w, i, 2)))"
    )
    return (
        docs.select(words.alias("_w"))
        .filter(F.size("_w") >= 2)
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(25)
    )


_CURATION_ORACLE = """
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), ' +') AS ws
  FROM documents
),
m AS (
  SELECT doc_id, text, len(ws) AS n_words,
         CAST(len(array_to_string(ws, '')) AS DOUBLE) / len(ws) AS awl,
         CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           / greatest(len(text), 1) AS fa,
         list_max(list_transform(ws, x -> len(x))) AS max_tok
  FROM t
),
kept AS (  -- stage 1: quality gate (q_quality_filter's keep rules)
  SELECT doc_id, text, n_words FROM m
  WHERE n_words >= 5 AND awl BETWEEN 2 AND 12
    AND fa >= 0.5 AND max_tok <= 25
),
deduped AS (  -- stage 2: exact dedup, deterministic keeper
  SELECT doc_id, n_words FROM (
    SELECT doc_id, n_words,
           MIN(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keeper
    FROM kept
  ) WHERE doc_id = keeper
),
packed AS (  -- stage 3: concat-and-chunk packing (q_seq_packing's shape)
  SELECT doc_id, doc_id % 32 AS shard, n_words,
         CAST(COALESCE(SUM(n_words) OVER (
                PARTITION BY doc_id % 32 ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) // 2048 AS seq_id
  FROM deduped
)
SELECT shard, seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_tokens
FROM packed
GROUP BY shard, seq_id
ORDER BY shard, seq_id
"""


@register(
    "q_curation_pipeline",
    oracle=_CURATION_ORACLE,
    doc="The end-to-end training-data curation pipeline as ONE lazy DAG: "
    "quality gate (map-only, q_quality_filter's rules) → exact dedup "
    "(min-doc_id keeper per content fingerprint, one hash shuffle) → "
    "concat-and-chunk sequence packing (one partitioned running sum) → "
    "per-sequence manifest. This is the composition story the individual "
    "queries exist for: Catalyst fuses the gate into the scan, the only "
    "DATA-SIZED shuffles are the dedup window and the packing window "
    "(the closing manifest aggregate and sort exchange |shards|x|seqs| "
    "rows, not corpus rows), and nothing materializes between stages — "
    "at 100 TB the whole pipeline is two corpus-sized exchanges, not "
    "four jobs with three intermediate copies.",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim("text"), " +")
    m = docs.select(
        "doc_id",
        "text",
        F.size(ws).alias("n_words"),
        (
            F.length(F.array_join(ws, "")).cast("double") / F.size(ws)
        ).alias("awl"),
        (
            F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast(
                "double"
            )
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("fa"),
        F.array_max(F.transform(ws, F.length)).alias("max_tok"),
    )
    kept = m.where(
        (F.col("n_words") >= 5)
        & F.col("awl").between(2, 12)
        & (F.col("fa") >= 0.5)
        & (F.col("max_tok") <= 25)
    )
    fp_w = W.partitionBy(F.md5(F.lower(F.trim("text"))))
    deduped = (
        kept.withColumn("keeper", F.min("doc_id").over(fp_w))
        .where(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "n_words")
    )
    shard = (F.col("doc_id") % 32).alias("shard")
    pack_w = (
        W.partitionBy(F.col("doc_id") % 32)
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = deduped.select(
        "doc_id",
        shard,
        "n_words",
        (
            F.coalesce(F.sum("n_words").over(pack_w), F.lit(0)).cast(
                "long"
            )
            / F.lit(2048)
        )
        .cast("long")
        .alias("seq_id"),
    )
    return (
        packed.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_tokens"),
        )
        .orderBy("shard", "seq_id")
    )


#: fixed retrieval query for the BM25 scorer — three corpus terms
_BM25_TERMS = ["spark", "join", "query"]
_BM25_K1 = "1.2"
_BM25_B = "0.75"


def _bm25_term(t: str) -> str:
    """One term's BM25 contribution; IDENTICAL SQL text on both engines so
    every double op runs in the same written order (ln/× /÷ are then
    bit-reproducible — same discipline as q_tfidf's idf)."""
    return (
        f"ln(1.0 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * (tf_{t} * ({_BM25_K1} + 1.0))"
        f" / (tf_{t} + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
    )


@register(
    "q_bm25",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS dl,
             {", ".join(f"COUNT(*) FILTER (token = '{t}') AS tf_{t}" for t in _BM25_TERMS)}
      FROM tokens GROUP BY doc_id
    ),
    g AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             {", ".join(f"COUNT(*) FILTER (tf_{t} > 0) AS df_{t}" for t in _BM25_TERMS)}
      FROM per_doc
    )
    SELECT doc_id,
           ROUND({" + ".join(f"({_bm25_term(t)})" for t in _BM25_TERMS)}, 6)
             AS bm25
    FROM per_doc CROSS JOIN g
    WHERE {" + ".join(f"tf_{t}" for t in _BM25_TERMS)} > 0
    """,
    doc=f"BM25 relevance scoring (k1={_BM25_K1}, b={_BM25_B}) of every "
    f"document against the fixed query {_BM25_TERMS} — the standard "
    "retrieval/quality ranking primitive for RAG corpus curation.  One "
    "doc-keyed aggregate computes doc length + per-term tf; corpus stats "
    "(N, avgdl, per-term df) reduce to ONE broadcast row, so scoring is a "
    "map-only pass at any corpus size.  The per-term contributions are "
    "summed in fixed written order and every double op appears in "
    "identical SQL text on both engines, making the score bit-stable "
    "without decimal detours.",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("token")
    )
    per_doc = tokens.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count_if(F.col("token") == t).alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    )
    g = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count_if(F.col(f"tf_{t}") > 0).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    score = " + ".join(f"({_bm25_term(t)})" for t in _BM25_TERMS)
    any_tf = " + ".join(f"tf_{t}" for t in _BM25_TERMS)
    return (
        per_doc.crossJoin(F.broadcast(g))
        .filter(F.expr(f"{any_tf} > 0"))
        .select("doc_id", F.round(F.expr(score), 6).alias("bm25"))
    )


@register(
    "q_cooccurrence_pmi",
    oracle="""
    WITH pres AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM pres),
    ct AS (SELECT token, COUNT(*) AS c FROM pres GROUP BY token),
    pairs AS (
      SELECT a.token AS tok_a, b.token AS tok_b, COUNT(*) AS n_both
      FROM pres a JOIN pres b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2
    )
    SELECT tok_a, tok_b, n_both,
           ROUND(ln((CAST(n_both AS DOUBLE) * n_docs)
                    / (CAST(ca.c AS DOUBLE) * cb.c)), 6) AS pmi
    FROM pairs
    JOIN ct ca ON ca.token = tok_a
    JOIN ct cb ON cb.token = tok_b
    CROSS JOIN n
    WHERE n_both >= 5
    """,
    doc="Pointwise mutual information over token co-occurrence (document-"
    "level presence): pmi = ln(N·c_ab / (c_a·c_b)) for pairs co-occurring "
    "in >= 5 docs — the collocation/phrase-mining primitive behind "
    "word2vec-era preprocessing and vocabulary induction.  Per-doc pair "
    "generation runs in whole-stage codegen over the sorted distinct-token "
    "array (no token self-join; O(v²) per doc with v bounded by doc "
    "length), one shuffle counts pairs, and the vocabulary-sized marginals "
    "join back via broadcast.",
)
def q_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id",
        F.expr(
            "array_sort(array_distinct(split(trim(text), ' +')))"
        ).alias("_t"),
    )
    pair_structs = F.expr(
        "flatten(transform(_t, (x, i) ->"
        " transform(slice(_t, i + 2, size(_t)),"
        " y -> struct(x AS tok_a, y AS tok_b))))"
    )
    pairs = (
        toks.select(F.explode(pair_structs).alias("_p"))
        .select("_p.tok_a", "_p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 5)
    )
    pres = toks.select("doc_id", F.explode("_t").alias("token"))
    ct = pres.groupBy("token").agg(
        F.count(F.lit(1)).alias("c")
    ).persist()  # vocab-sized, consumed by BOTH PMI margin sides
    # (multi-consumer rule)
    n = pres.agg(F.count_distinct("doc_id").alias("n_docs"))
    ca = ct.select(F.col("token").alias("tok_a"), F.col("c").alias("ca"))
    cb = ct.select(F.col("token").alias("tok_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(ca), "tok_a")
        .join(F.broadcast(cb), "tok_b")
        .crossJoin(F.broadcast(n))
        .select(
            "tok_a",
            "tok_b",
            "n_both",
            F.round(
                F.expr(
                    "ln((CAST(n_both AS DOUBLE) * n_docs)"
                    " / (CAST(ca AS DOUBLE) * cb))"
                ),
                6,
            ).alias("pmi"),
        )
    )


@register(
    "q_bigram_novelty",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             string_split(trim(lower(regexp_replace(trim(text), '\\s+', ' ',
                                                    'g'))), ' ') AS ws
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id, concat_ws(' ', ws[i], ws[i + 1]) AS bg
      FROM words, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
    ),
    freq AS (SELECT bg, COUNT(*) AS c FROM bigrams GROUP BY bg)
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(f.c AS DECIMAL(30,0))) AS DOUBLE)
                 / COUNT(*) AS mean_bigram_freq,
           MIN(f.c) AS min_bigram_freq,
           CAST(COUNT(*) FILTER (f.c <= 2) AS DOUBLE)
                 / COUNT(*) AS rare_rate
    FROM bigrams b JOIN freq f USING (bg)
    GROUP BY b.doc_id
    """,
    doc="Bigram-novelty quality scoring — the exact-arithmetic stand-in for "
    "KenLM perplexity filtering: per document, the corpus-wide frequency "
    "profile of its bigram stream (mean/min frequency and the share of "
    "bigrams seen <= 2 times corpus-wide).  Low mean + high rare_rate "
    "flags gibberish/OCR noise; implausibly high mean flags boilerplate — "
    "the two tails a perplexity gate cuts.  One bigram explode (codegen), "
    "one frequency shuffle reused by the join back, one doc-keyed agg; "
    "all counts integer and the two ratios deterministic single "
    "divisions, so the score needs no log-prob machinery to be engine-"
    "exact.",
)
def q_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import fan_out

    docs = load_table(spark, sf_dir, "documents")
    norm = "trim(lower(regexp_replace(trim(text), '\\\\s+', ' ')))"
    bigrams = (
        fan_out(docs)
        .select("doc_id", F.split(F.expr(norm), " ").alias("_w"))
        .filter(F.size("_w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_w) - 1),"
                    " i -> concat_ws(' ', _w[i - 1], _w[i]))"
                )
            ).alias("bg"),
        )
    )
    freq = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    return (
        bigrams.join(freq, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # raw exact-integer quotients — no rounding (rational-ROUND
            # trap, see queries/exact.py)
            (
                F.expr("CAST(SUM(CAST(c AS DECIMAL(30,0))) AS DOUBLE)")
                / F.count(F.lit(1))
            ).alias("mean_bigram_freq"),
            F.min("c").alias("min_bigram_freq"),
            (
                F.count_if(F.col("c") <= 2).cast("double")
                / F.count(F.lit(1))
            ).alias("rare_rate"),
        )
    )


@register(
    "q_unigram_logprob",
    priority=-1,
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    ),
    cnt AS (SELECT token, COUNT(*) AS c FROM tokens GROUP BY token),
    n AS (SELECT COUNT(*) AS n_tok FROM tokens),
    per_doc AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             {dsum('ln(c)', 6)} AS sum_lnc
      FROM tokens t JOIN cnt USING (token)
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens,
           ROUND(sum_lnc / n_tokens - ln(n_tok), 6) AS avg_logprob
    FROM per_doc CROSS JOIN n
    ORDER BY doc_id
    """,
    doc="Corpus-LM quality scoring: each document's mean unigram "
    "log-probability under the corpus's own unigram distribution — the "
    "cheapest member of the perplexity-filter family every LLM data "
    "pipeline runs (CCNet/Gopher gate on LM score; a unigram LM needs no "
    "training job, just the wordcount).  avg_logprob = mean ln(c_w) - "
    "ln(N): one vocabulary aggregate (the classic map-side-combined "
    "wordcount), one token-keyed join back, one per-doc aggregate; N is "
    "a 1-row broadcast.  ln terms are summed via exact-decimal "
    "accumulation and the readout expression text is shared verbatim by "
    "both engines, so scores are bit-identical.  Low (very negative) "
    "scores flag gibberish/rare-token docs; high scores flag boilerplate "
    "— both tails are curation drop candidates.",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("token")
    )
    cnt = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    n = tokens.agg(F.count(F.lit(1)).alias("n_tok"))
    per_doc = (
        tokens.join(cnt, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr(dsum("ln(c)", 6)).alias("sum_lnc"),
        )
    )
    return (
        per_doc.crossJoin(F.broadcast(n))
        .selectExpr(
            "doc_id",
            "n_tokens",
            "ROUND(sum_lnc / n_tokens - ln(n_tok), 6) AS avg_logprob",
        )
        .orderBy("doc_id")
    )


#: hashing-trick bucket / sign expressions, one per engine, same values
_FH_BUCKET_SPARK = (
    "CAST(CONV(SUBSTRING(MD5(CONCAT('fh:', token)), 1, 8), 16, 10)"
    " AS BIGINT) % 64"
)
_FH_BUCKET_DUCK = (
    "CAST(('0x' || SUBSTRING(MD5('fh:' || token), 1, 8)) AS BIGINT) % 64"
)
_FH_SIGN_SPARK = (
    "CASE WHEN CAST(CONV(SUBSTRING(MD5(CONCAT('fs:', token)), 1, 1), 16, 10)"
    " AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END"
)
_FH_SIGN_DUCK = (
    "CASE WHEN CAST(('0x' || SUBSTRING(MD5('fs:' || token), 1, 1))"
    " AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END"
)
_FH_CELL_H32_SPARK = (
    "CAST(CONV(SUBSTRING(MD5(CONCAT(CAST(doc_id AS STRING), ':',"
    " CAST(val AS STRING))), 1, 8), 16, 10) AS BIGINT)"
)
_FH_CELL_H32_DUCK = (
    "CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR) || ':' ||"
    " CAST(val AS VARCHAR)), 1, 8)) AS BIGINT)"
)


@register(
    "q_feature_hashing",
    priority=-1,
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             {_FH_BUCKET_DUCK} AS bucket,
             CAST(SUM({_FH_SIGN_DUCK}) AS BIGINT) AS val
      FROM tokens
      GROUP BY 1, 2
    )
    SELECT bucket,
           COUNT(*) AS n_cells,
           CAST(SUM(val) AS BIGINT) AS sum_val,
           CAST(SUM(val * val) AS BIGINT) AS sum_sq,
           bit_xor({_FH_CELL_H32_DUCK}) AS cell_checksum
    FROM feat
    GROUP BY bucket
    ORDER BY bucket
    """,
    doc="Hashing-trick feature encoding (Weinberger et al.): every token "
    "maps to one of 64 buckets by hash and contributes a md5-derived ±1 "
    "sign, so each document becomes a fixed-width signed-count vector "
    "with NO vocabulary table — the unbounded-vocab answer for feature "
    "pipelines at 100 TB (a vocab dictionary is a mutable shared state; "
    "a hash function ships with the job).  Entirely integer arithmetic — "
    "exact on any engine.  The check aggregates per-bucket corpus "
    "marginals PLUS an order-independent checksum over every "
    "(doc, bucket, value) cell, so parity proves each document's "
    "individual feature vector, not just column sums.  Plan: explode -> "
    "map-side-combined (doc, bucket) aggregate -> 64-row rollup.",
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("token")
    )
    feat = (
        tokens.selectExpr(
            "doc_id",
            f"{_FH_BUCKET_SPARK} AS bucket",
            f"{_FH_SIGN_SPARK} AS sign",
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").cast("bigint").alias("val"))
    )
    return (
        feat.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("val").cast("bigint").alias("sum_val"),
            F.sum(F.col("val") * F.col("val")).cast("bigint").alias("sum_sq"),
            F.expr(f"bit_xor({_FH_CELL_H32_SPARK})").alias("cell_checksum"),
        )
        .orderBy("bucket")
    )


from . import REGISTRY as _REGISTRY  # noqa: E402  (oracle text reuse below)


@register(
    "q_langid_confusion",
    priority=1,
    oracle=f"""
    SELECT d.lang AS true_lang, p.predicted_lang, COUNT(*) AS n_docs
    FROM ({_REGISTRY["q_lang_id_ngram"].oracle}) p
    JOIN documents d USING (doc_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Classifier-quality evaluation for the language-ID heuristic: the "
    "full confusion matrix of predicted vs labeled language (the "
    "evaluation sibling of q_lsh_recall — any heuristic gate deployed on "
    "a 100 TB corpus owes its users a measured confusion matrix on "
    "labeled data, not an anecdote).  Reuses q_lang_id_ngram's entire "
    "predictor verbatim on both engines (the oracle nests that query's "
    "oracle text), joins predictions back to the labels, and reduces to "
    "|langs|² integer counts — exact on any engine.  Docs shorter than "
    "3 chars are excluded identically on both sides (no trigrams).",
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = q_lang_id_ngram(spark, sf_dir).select("doc_id", "predicted_lang")
    truth = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    return (
        pred.join(truth, "doc_id")
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "predicted_lang")
    )


#: per-(source, token) KL contribution — IDENTICAL expression text on both
#: engines so the doubles match bit-for-bit: p*ln(p/q) algebraically
#: rearranged onto integer counts only (c_sw/n_s vs c_w/n_tot).
_KL_TERM = (
    "(CAST(c_sw AS DOUBLE) / n_s)"
    " * ln((CAST(c_sw AS DOUBLE) * n_tot) / (CAST(n_s AS DOUBLE) * c_w))"
)


@register(
    "q_kl_divergence",
    priority=-1,
    oracle=f"""
    WITH tokens AS (
      SELECT source, unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    ),
    sc AS (
      SELECT source, token, COUNT(*) AS c_sw
      FROM tokens GROUP BY source, token
    ),
    cw AS (SELECT token, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sc GROUP BY token),
    ns AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s FROM sc GROUP BY source),
    nt AS (SELECT CAST(SUM(c_sw) AS BIGINT) AS n_tot FROM sc)
    SELECT s.source, ns.n_s AS n_tokens,
           ROUND({dsum(_KL_TERM, 12)}, 6) AS kl_to_corpus
    FROM sc s
    JOIN cw USING (token)
    JOIN ns USING (source)
    CROSS JOIN nt
    GROUP BY s.source, ns.n_s
    ORDER BY s.source
    """,
    doc="Per-source distribution drift: KL(P_source || P_corpus) over the "
    "unigram token distributions — the domain-shift / source-weighting "
    "diagnostic LLM data pipelines run before fixing mixture weights "
    "(a high-KL source is out-of-distribution vs the blend; near-zero "
    "means redundant).  Everything reduces off ONE (source, token) count "
    "table: corpus counts, per-source totals, and the grand total are "
    "all re-aggregations of sc — the token-level scan is shuffled "
    "exactly once, map-side combined.  The per-term double p*ln(p/q) is "
    "computed from integer counts with the identical expression text on "
    "both engines and summed via exact-decimal accumulation, so the "
    "divergences are bit-identical.  The token join shuffles sc vs the "
    "vocabulary (both |vocab|-sized); source totals broadcast.",
)
def q_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "source", F.explode(F.split(F.trim("text"), " +")).alias("token")
    )
    # persisted: cw/ns/nt below are three re-aggregations of this one
    # vocab-sized table — without the persist each branch would replay the
    # token-level scan+shuffle (verified: 8 parquet scans in the static
    # plan; with persist the shuffle runs once and the branches read the
    # cached cells).  Lazy, so plan-sweep safe; released when refs die.
    sc = tokens.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("c_sw")
    ).persist()
    cw = sc.groupBy("token").agg(
        F.sum("c_sw").cast("bigint").alias("c_w")
    )
    ns = sc.groupBy("source").agg(
        F.sum("c_sw").cast("bigint").alias("n_s")
    )
    nt = sc.agg(F.sum("c_sw").cast("bigint").alias("n_tot"))
    return (
        sc.join(cw, "token")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nt))
        .groupBy("source", F.col("n_s").alias("n_tokens"))
        .agg(F.expr(f"ROUND({dsum(_KL_TERM, 12)}, 6)").alias("kl_to_corpus"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# BPE tokenizer TRAINING (merge learning) — two unrolled rounds
# ---------------------------------------------------------------------------

BPE_TRAIN_ROUNDS = 2


def _bpe_round_ctes(i: int) -> str:
    """One BPE merge-learning round as DuckDB CTEs — the oracle twin of the
    Spark stages in q_bpe_train (same pair weighting, same greedy leftmost
    non-overlapping merge via the gaps-and-islands parity trick)."""
    p = i - 1
    return f"""
pairs{i} AS (
  SELECT a.sym AS s1, b.sym AS s2, CAST(SUM(a.c) AS BIGINT) AS cnt
  FROM sym{p} a JOIN sym{p} b ON a.word = b.word AND b.pos = a.pos + 1
  GROUP BY a.sym, b.sym
),
top{i} AS (SELECT s1, s2, cnt FROM pairs{i}
           ORDER BY cnt DESC, s1, s2 LIMIT 1),
m{i} AS (
  SELECT a.word, a.pos
  FROM sym{p} a JOIN sym{p} b ON a.word = b.word AND b.pos = a.pos + 1
  CROSS JOIN top{i} t
  WHERE a.sym = t.s1 AND b.sym = t.s2
),
keep{i} AS (
  SELECT word, pos FROM (
    SELECT word, pos,
           pos - MIN(pos) OVER (PARTITION BY word, grp) AS off
    FROM (
      SELECT word, pos,
             pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
      FROM m{i}
    ) g
  ) h WHERE off % 2 = 0
),
sym{i} AS (
  SELECT word, c,
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         sym
  FROM (
    SELECT s.word, s.c, s.pos,
           CASE WHEN k.pos IS NOT NULL THEN s.sym || t.sym2
                ELSE s.sym END AS sym
    FROM sym{p} s
    CROSS JOIN (SELECT s2 AS sym2 FROM top{i}) t
    LEFT JOIN keep{i} k ON k.word = s.word AND k.pos = s.pos
    LEFT JOIN keep{i} k2 ON k2.word = s.word AND k2.pos = s.pos - 1
    WHERE k2.pos IS NULL
  ) z
)"""


def _bpe_train_oracle(rounds: int) -> str:
    sql = """WITH
wc AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT unnest(string_split_regex(trim(text), ' +')) AS word
    FROM documents
  ) GROUP BY word
),
sym0 AS (
  SELECT word, c, u.i AS pos, substr(word, u.i, 1) AS sym
  FROM wc, UNNEST(generate_series(1, len(word))) AS u(i)
)"""
    sql += "".join("," + _bpe_round_ctes(i) for i in range(1, rounds + 1))
    sql += "\nSELECT * FROM (\n" + "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, s1, s2, cnt FROM top{i}"
        for i in range(1, rounds + 1)
    ) + "\n) ORDER BY rank"
    return sql


@register(
    "q_bpe_train",
    priority=-1,
    oracle=_bpe_train_oracle(BPE_TRAIN_ROUNDS),
    doc="BPE tokenizer TRAINING as distributed relational algebra — the "
    "counterpart of q_text_tokens_bpe (which APPLIES merges): learn the "
    f"first {BPE_TRAIN_ROUNDS} merge rules from the corpus, value-checked "
    "against DuckDB replaying identical rounds.  The corpus collapses "
    "once into the (word, count) vocabulary (the only data-sized pass, "
    "the classic map-side-combined wordcount — all later state is "
    "VOCAB-sized, the property that makes 100 TB BPE training feasible); "
    "each round is (1) a weighted adjacent-pair count via lead() on the "
    "word window (positions are consecutive by construction, so "
    "adjacency is a window function, not a self-join — the oracle keeps "
    "the equivalent (word, pos+1) self-join form), (2) the argmax pair "
    "by ORDER BY cnt DESC LIMIT 1 "
    "(TakeOrderedAndProject — per-partition heaps, no global sort, then "
    "a 1-row broadcast), (3) greedy LEFTMOST non-overlapping merge: "
    "match positions form gaps-and-islands runs and only even offsets "
    "within a run merge (exactly Sennrich-BPE's scan semantics, e.g. "
    "'aaaa' -> [aa][aa]), (4) position reindex by a word-keyed window.  "
    "Every window and join is keyed by word, counts are integer-exact, "
    "ties break lexicographically — fully deterministic on any engine.  "
    "Production training runs ~30k rounds of this same per-round plan "
    "with the pair-count table incrementally maintained; the 2-round "
    "unroll pins the algebra.",
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            F.explode(F.split(F.trim("text"), " +")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # per-round state is persisted: the lead-extended frame feeds two
    # consumers per round (the pair count and the merge rewrite) and
    # round i+1's whole lineage hangs off round i — without persists the
    # static plan replays the corpus scan exponentially across rounds.
    # All persisted frames are VOCAB-sized; lazy, so the plan sweep
    # still sees a pure declarative plan, and the blocks die with the
    # query's references.
    #
    # Adjacency and the greedy-merge bookkeeping are WINDOW functions
    # over (word, pos), not self-joins (round 13, guide §2.4): positions
    # are consecutive 1..len by construction, so the (word, pos+1)
    # self-join is exactly lead(sym), the keep/absorb decisions are
    # lag/last chains, and every window shares the ONE word-keyed
    # exchange the persisted frame already has — the previous
    # formulation paid the adjacency join (two exchanges), a (word,
    # grp)-keyed window, and two (word, pos)-keyed left joins per round
    # for the same rows.
    sym = wc.select(
        "word",
        "c",
        F.expr("explode(sequence(1, length(word)))").alias("pos"),
    ).withColumn("sym", F.expr("substr(word, pos, 1)")).persist()

    learned = []
    wg = W.partitionBy("word").orderBy("pos")
    wcum = wg.rowsBetween(W.unboundedPreceding, 0)
    for i in range(1, BPE_TRAIN_ROUNDS + 1):
        adj = sym.withColumn("s2", F.lead("sym").over(wg)).persist()
        pairs = (
            adj.filter(F.col("s2").isNotNull())
            .groupBy(F.col("sym").alias("s1"), "s2")
            .agg(F.sum("c").cast("bigint").alias("cnt"))
        )
        top = pairs.orderBy(
            F.desc("cnt"), F.asc("s1"), F.asc("s2")
        ).limit(1)
        learned.append(top.select(F.lit(i).alias("rank"), "s1", "s2", "cnt"))

        # greedy leftmost non-overlapping merge, all on the word window:
        # a match run is a maximal consecutive stretch of is_m (positions
        # are consecutive, so lag(is_m) detects run starts); within a run
        # only even offsets from the run start merge ('aaaa' -> [aa][aa]);
        # a row whose PREDECESSOR merged is absorbed and dropped.
        flagged = (
            adj.crossJoin(
                F.broadcast(
                    top.select(
                        F.col("s1").alias("t1"), F.col("s2").alias("t2")
                    )
                )
            )
            .withColumn(
                "is_m",
                F.col("s2").isNotNull()
                & (F.col("sym") == F.col("t1"))
                & (F.col("s2") == F.col("t2")),
            )
            .withColumn(
                "rstart",
                F.when(
                    F.col("is_m") & ~F.lag("is_m", 1, False).over(wg),
                    F.col("pos"),
                ),
            )
            .withColumn("rs", F.last("rstart", ignorenulls=True).over(wcum))
            .withColumn(
                "keep",
                F.col("is_m") & ((F.col("pos") - F.col("rs")) % 2 == 0),
            )
        )
        merged = flagged.withColumn(
            "absorbed", F.lag("keep", 1, False).over(wg)
        ).filter(~F.col("absorbed")).select(
            "word",
            "c",
            "pos",
            F.when(F.col("keep"), F.concat("sym", "t2"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
        sym = merged.select(
            "word",
            "c",
            F.row_number().over(wg).alias("pos"),
            "sym",
        ).persist()

    out = learned[0]
    for t in learned[1:]:
        out = out.unionAll(t)
    return out.orderBy("rank")


# -- q_importance_resampling -------------------------------------------------

IR_B = 64  #: hashed-feature buckets (the DSIR hashed n-gram space)
IR_K = 20  #: documents selected

_IR_BUCKET_SPARK = (
    "CAST(CONV(SUBSTRING(MD5(CONCAT('ir:', token)), 1, 8), 16, 10)"
    f" AS BIGINT) % {IR_B}"
)
_IR_BUCKET_DUCK = (
    "CAST(('0x' || SUBSTRING(MD5('ir:' || token), 1, 8)) AS BIGINT)"
    f" % {IR_B}"
)
#: 52-bit md5 uniform in (0,1) for the Gumbel perturbation (the
#: q_weighted_sample lattice trick — salt 'irs:', +0.5 shift kills u=0).
_IR_U_SPARK = (
    "(CAST(CONV(SUBSTRING(MD5(CONCAT('irs:', CAST(doc_id AS STRING))), 1,"
    " 13), 16, 10) AS DOUBLE) + 0.5) / 4503599627370496"
)
_IR_U_DUCK = (
    "(CAST(CAST(('0x' || SUBSTRING(MD5('irs:' || CAST(doc_id AS VARCHAR)),"
    " 1, 13)) AS BIGINT) AS DOUBLE) + 0.5) / 4503599627370496"
)


def dsir_logw(docs: DataFrame, target: str = "lang = 'en'") -> DataFrame:
    """Per-document DSIR log-importance over hashed token features.

    ``docs`` needs (doc_id, lang, text); ``target`` is a SQL predicate
    selecting the target-distribution documents.  Returns (doc_id, logw)
    where ``logw`` = sum over the document's hash buckets of
    count * [ln p_target(bucket) - ln p_raw(bucket)] with Laplace
    smoothing — positive for documents that look like the target model,
    negative otherwise.  The corpus collapses to a 64-row broadcast
    ratio table; the per-document sum folds in fixed bucket order so the
    double is bit-identical on any engine or partitioning.
    """
    tb = docs.selectExpr(
        "doc_id", "lang",
        "explode(split(trim(text), ' +')) AS token",
    ).selectExpr(
        "doc_id", f"CASE WHEN {target} THEN 1 ELSE 0 END AS is_t",
        f"{_IR_BUCKET_SPARK} AS bucket",
    )
    totals = tb.agg(
        F.count(F.lit(1)).alias("r_total"),
        F.sum("is_t").cast("bigint").alias("t_total"),
    )
    rc = tb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rcnt"),
        F.sum("is_t").cast("bigint").alias("tcnt"),
    )
    lr = rc.crossJoin(F.broadcast(totals)).selectExpr(
        "bucket",
        f"LN(CAST(tcnt + 1 AS DOUBLE) / CAST(t_total + {IR_B} AS DOUBLE))"
        f" - LN(CAST(rcnt + 1 AS DOUBLE)"
        f" / CAST(r_total + {IR_B} AS DOUBLE)) AS lr",
    )
    dbc = tb.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    contrib = dbc.join(F.broadcast(lr), "bucket").selectExpr(
        "doc_id", "bucket", "CAST(n AS DOUBLE) * lr AS c"
    )
    return contrib.groupBy("doc_id").agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(bucket, c)))"
            ", s -> s.c), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("logw")
    )


@register(
    "q_importance_resampling",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), ' +')) AS token
      FROM documents
    ),
    tb AS (
      SELECT doc_id, lang, {_IR_BUCKET_DUCK} AS bucket FROM tokens
    ),
    totals AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS r_total,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS t_total
      FROM tb
    ),
    rc AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS rcnt,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS tcnt
      FROM tb GROUP BY bucket
    ),
    lr AS (
      SELECT bucket,
             LN(CAST(tcnt + 1 AS DOUBLE) / CAST(t_total + {IR_B} AS DOUBLE))
             - LN(CAST(rcnt + 1 AS DOUBLE)
                  / CAST(r_total + {IR_B} AS DOUBLE)) AS lr
      FROM rc CROSS JOIN totals
    ),
    dbc AS (
      SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM tb GROUP BY doc_id, bucket
    ),
    contrib AS (
      SELECT d.doc_id, d.bucket, CAST(d.n AS DOUBLE) * l.lr AS c
      FROM dbc d JOIN lr l USING (bucket)
    ),
    lw AS (
      SELECT doc_id,
             list_reduce(array_agg(c ORDER BY bucket), (p, q) -> p + q)
               AS logw
      FROM contrib GROUP BY doc_id
    ),
    keyed AS (
      SELECT doc_id, logw, logw - LN(-LN({_IR_U_DUCK})) AS sel_key
      FROM lw
    ),
    ranked AS (
      SELECT doc_id, logw, sel_key,
             ROW_NUMBER() OVER (ORDER BY sel_key DESC, doc_id) AS rk
      FROM keyed
    )
    SELECT r.rk, r.doc_id, d.lang, ROUND(r.logw, 6) AS logw,
           ROUND(r.sel_key, 6) AS sel_key
    FROM ranked r JOIN documents d USING (doc_id)
    WHERE r.rk <= {IR_K}
    ORDER BY r.rk
    """,
    doc="Data selection via importance resampling (the DSIR recipe, Xie et "
    "al. 2023): hashed token features (64 md5 buckets — no vocabulary "
    "state), per-bucket log-likelihood ratio of a Laplace-smoothed target "
    "unigram model (lang='en' docs) vs the raw corpus model, per-document "
    "importance = bucket-count-weighted sum of ratios, and Gumbel-top-k "
    "selection (logw - LN(-LN(u)), u a portable md5 uniform) — exact "
    "weighted sampling without replacement, reproducible on any engine or "
    "cluster size.  Determinism: integer bucket counts, single IEEE "
    "divisions of identical integers under correctly-rounded LN, and the "
    "per-document sum folds in fixed bucket order (aggregate <-> "
    "list_reduce) so every double is bit-identical; the LN-derived "
    "output columns (logw, sel_key) ship ROUNDed to 6 — compound "
    "transcendentals are irrational, so the round is boundary-safe and "
    "absorbs cross-libm 1-ulp drift — while ordering/top-k always use "
    "the raw keys.  Scale shape: two map-side-combined token aggregations "
    "collapse the corpus to a 64-row broadcast ratio table, the "
    "per-document fold is map-side, and selection is a top-k heap "
    "(TakeOrderedAndProject) — no global sort, no driver state.",
)
def q_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    lw = dsir_logw(docs)
    keyed = lw.selectExpr(
        "doc_id", "logw", f"logw - LN(-LN({_IR_U_SPARK})) AS sel_key"
    )
    top = keyed.orderBy(F.desc("sel_key"), "doc_id").limit(IR_K)
    # post-limit window: only ever sees the IR_K selected rows
    w = W.orderBy(F.desc("sel_key"), "doc_id")
    ranked = top.withColumn("rk", F.row_number().over(w))
    # the IR_K-row selection broadcasts into the corpus-sized docs table,
    # never the reverse
    return (
        docs.select("doc_id", "lang")
        .join(F.broadcast(ranked), "doc_id")
        .select(
            "rk", "doc_id", "lang",
            # irrational readouts (sums/compositions of LN) — ROUND is
            # boundary-safe and absorbs the 1-ulp cross-libm LN drift
            # observed on the double-LN Gumbel key; ORDER/top-k always
            # use the raw keys (distinct docs are never within an ulp)
            F.round("logw", 6).alias("logw"),
            F.round("sel_key", 6).alias("sel_key"),
        )
        .orderBy("rk")
    )


# q_rrf_fusion (queries/similarity.py) nests q_bm25's oracle, which only
# exists once this module has registered — wire it here.
from .similarity import _wire_rrf_oracle  # noqa: E402

_wire_rrf_oracle()
