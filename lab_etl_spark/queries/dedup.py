"""Deduplication operators over the ``documents`` table (SURVEY.md §2B).

Exact dedup: portable fingerprint (md5 of normalized text) + hash groupBy —
one shuffle on the fingerprint, scales linearly.

Near dedup, two strategies:
  * ``q_dedup_ngram_jaccard`` — exact 3-gram-shingle Jaccard via a shingle
    self-join.  Fully oracle-checkable; the inverted-index join bounds work to
    pairs that share ≥1 shingle (not the full n² cross product).
  * ``q_dedup_minhash_lsh`` — MinHash + banded LSH (operators/dedup.py), the
    100 TB-scale path: candidate generation cost is O(docs × bands), not
    O(pairs).  Hash family is engine-specific → rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup import (
    connected_components,
    minhash_lsh_candidates,
    shingle_jaccard_pairs,
)
from . import register

# Normalization both engines apply before fingerprinting: trim + collapse
# whitespace + lowercase.
_NORM_SPARK = "lower(regexp_replace(trim(text), '\\\\s+', ' '))"
_NORM_DUCK = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"


@register(
    "q_dedup_exact",
    oracle=f"""
    SELECT md5({_NORM_DUCK}) AS fingerprint,
           MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup via md5-of-normalized-text fingerprint; keeper = min id. "
    "Reference analogue: provenance file-hash dedup (util.py:83-93).",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.expr(f"md5({_NORM_SPARK})").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split_regex(trim({_NORM_DUCK}), ' ') AS ws
      FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', ws[i], ws[i + 1], ws[i + 2]) AS shingle
      FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
    """,
    doc="Near-dup pairs by exact 3-gram-shingle Jaccard >= 0.5 via inverted-"
    "index self-join (only docs sharing a shingle are compared).",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return shingle_jaccard_pairs(docs, n=3, threshold=0.5)


@register(
    "q_dedup_minhash_lsh",
    oracle=None,  # xxhash64-based MinHash family is Spark-specific
    doc="MinHash(16 perms) + 4-band LSH candidate pairs with exact-Jaccard "
    "verify; the candidate-generation shuffle is O(docs*bands).",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        docs, n=3, num_hashes=16, bands=4, threshold=0.5
    )


_PAIRS_CTES = f"""
    words AS (
      SELECT doc_id, string_split_regex(trim({_NORM_DUCK}), ' ') AS ws
      FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', ws[i], ws[i + 1], ws[i + 2]) AS shingle
      FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
    rawpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM rawpairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
    )
"""


@register(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    {_PAIRS_CTES},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    walk(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT w.a, e.b FROM walk w JOIN edges e ON w.b = e.a
    ),
    reach AS (
      SELECT a, b FROM walk
      UNION SELECT doc_id, doc_id FROM documents
    )
    SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
    """,
    doc="Near-dup cluster assignment: connected components over the exact-"
    "Jaccard pair graph (threshold 0.5) by iterative min-label propagation "
    "(operators/dedup.py connected_components); every document gets a "
    "cluster id = smallest doc_id in its component (singletons = self). "
    "The DuckDB oracle derives the same labeling via recursive reachability.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_jaccard_pairs(docs, n=3, threshold=0.5)
    return connected_components(
        docs.select("doc_id"),
        pairs.select("doc_a", "doc_b"),
        id_col="doc_id",
        src="doc_a",
        dst="doc_b",
    ).withColumnRenamed("component", "cluster_id")


def _simhash_oracle() -> str:
    from ..operators.simhash import BITS, simhash_sql_duck

    sig = simhash_sql_duck(_NORM_DUCK)
    width = BITS // 4
    return f"""
    WITH sig AS (
      SELECT doc_id, {sig} AS simhash FROM documents
    ),
    buckets AS (
      SELECT doc_id, simhash, b.band,
             (simhash // POWER(2, b.band * {width})::BIGINT) % {1 << width} AS bkey
      FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             x.simhash AS sig_a, y.simhash AS sig_b
      FROM buckets x JOIN buckets y
        ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sig_a, sig_b)) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= 3
    """


@register(
    "q_dedup_simhash",
    oracle=_simhash_oracle(),
    doc="SimHash(32-bit, md5-token-hash) near-dup pairs at Hamming<=3 via "
    "4-band LSH candidates — by pigeonhole any pair within distance 3 "
    "shares an exact band, so recall is total; value-exact vs the oracle "
    "because the token hash is md5 in both engines.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.simhash import simhash_near_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, max_hamming=3, bands=4)


_DOT_D = (
    "list_reduce(list_transform(generate_series(1, len({a})),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (p, q) -> p + q)"
)
_SQN_D = (
    "list_reduce(list_transform({v},"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q)"
)


@register(
    "q_dedup_embedding",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_DOT_D.format(a='a.embedding', b='b.embedding')}
                 / (SQRT({_SQN_D.format(v='a.embedding')})
                    * SQRT({_SQN_D.format(v='b.embedding')})), 6) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_DOT_D.format(a='a.embedding', b='b.embedding')}
          / (SQRT({_SQN_D.format(v='a.embedding')})
             * SQRT({_SQN_D.format(v='b.embedding')})) >= 0.9
    """,
    doc="Embedding-cosine near-duplicate pairs (cosine >= 0.9) within "
    "coarse blocks (label = quantizer cell): pair generation shuffles on "
    "the block key, Σ|block|² pairs instead of n².",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_near_pairs

    em = load_table(spark, sf_dir, "embeddings")
    return embedding_near_pairs(em, threshold=0.9)
