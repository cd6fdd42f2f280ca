"""Similarity-search queries over the ``embeddings`` table (SURVEY.md §2B)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.similarity import cosine_topk, cosine_topk_blocked, ivf_topk
from . import register

# DuckDB mirrors of the Spark-side sequential folds (list_reduce is
# left-to-right, matching Spark's `aggregate`).
_DOT_DUCK = (
    "list_reduce(list_transform(generate_series(1, len({a})),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (p, q) -> p + q)"
)
_SQNORM_DUCK = (
    "list_reduce(list_transform({v},"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q)"
)


@register(
    "q_similarity_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             ROUND({_DOT_DUCK.format(a='q.embedding', b='e.embedding')}
                   / (SQRT({_SQNORM_DUCK.format(v='q.embedding')})
                      * SQRT({_SQNORM_DUCK.format(v='e.embedding')})), 6) AS cosine
      FROM q, embeddings e
      WHERE e.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
    doc="Brute-force exact cosine top-5 for 8 query vectors: broadcast "
    "queries, single corpus scan, ranked-window reduce.",
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(em.filter(F.col("vec_id") < 8), em, k=5)


@register(
    "q_similarity_blocked",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 16),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             ROUND({_DOT_DUCK.format(a='q.embedding', b='e.embedding')}
                   / (SQRT({_SQNORM_DUCK.format(v='q.embedding')})
                      * SQRT({_SQNORM_DUCK.format(v='e.embedding')})), 6) AS cosine
      FROM q JOIN embeddings e
        ON e.label = q.label AND e.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
    doc="IVF-style blocked ANN: score only same-label (coarse cell) pairs — "
    "the bounded-shuffle scale path for similarity search.",
)
def q_similarity_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_blocked(em.filter(F.col("vec_id") < 16), em, k=3)


@register(
    "q_similarity_ivf",
    oracle=None,  # learned quantizer cells are engine-specific → rows-only;
    # exactness at n_probe == n_clusters is pinned by tests/test_similarity_ivf.py
    doc="True IVF ANN: distributed k-means coarse quantizer (seeded by "
    "xxhash64 top-k, one Lloyd step), nprobe nearest cells scored per "
    "query — scored pairs shrink by ~n_probe/n_clusters vs brute force.",
)
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        em.filter(F.col("vec_id") < 8), em, k=5, n_clusters=8, n_probe=3
    )
