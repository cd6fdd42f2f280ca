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
from .exact import davg

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
           ROUND(CAST(len(list_filter(string_split_regex(trim(text), ' +'),
                                      w -> w IN ({_STOP_SQL}))) AS DOUBLE)
                 / len(string_split_regex(trim(text), ' +')), 6) AS stopword_ratio,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split_regex(trim(text), ' +')), 6) AS avg_word_len,
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
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(awl, 6).alias("avg_word_len"),
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
           ROUND(CAST(len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS DOUBLE)
                 / len(string_split_regex(trim(text), ' +')), 6)
             AS bpe_per_word
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
        F.round(bpe.cast("double") / ws, 6).alias("bpe_per_word"),
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
    oracle=None,  # heuristic scoring is engine-specific → rows-only
    doc="Character-n-gram language-ID heuristic: score text against per-lang "
    "trigram profiles built from the corpus itself (xxhash64 buckets), pick "
    "argmax lang.",
)
def q_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Per-language character-trigram profile (top hashed trigram buckets),
    # then each doc votes for the language whose profile overlaps most.
    tri = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 2, 0)),"
                " i -> substring(text, i, 3))"
            )
        ).alias("tri"),
    ).withColumn("bucket", F.pmod(F.xxhash64("tri"), F.lit(1024)))
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
