"""Similarity search over embedding columns (array<float>).

Scale design:
  * ``cosine_topk`` — brute-force exact top-k.  The query side is small and
    broadcast; the corpus side is scanned once, scored with JVM-side
    higher-order functions (no Python), and reduced per-query with a ranked
    window.  At cluster scale this is a single corpus scan, no corpus shuffle
    except the final per-query top-k (tiny after the rank filter).
  * ``cosine_topk_blocked`` — IVF-style coarse blocking: only score pairs in
    the same block (here the ``label`` column stands in for a learned coarse
    quantizer cell).  Cuts scored pairs by ~|blocks|×, the standard ANN
    recall/cost trade.

All folds are sequential left-to-right (`aggregate`), so doubles are
bit-identical to the DuckDB oracle's `list_reduce`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# Sequential double fold: dot(a, b) and ||v||².
DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
SQNORM = (
    "aggregate({v}, CAST(0.0 AS DOUBLE),"
    " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
)


def _scored(queries: DataFrame, corpus: DataFrame, join_cond) -> DataFrame:
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    e = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("e_emb"),
        F.col("label").alias("e_label"),
    )
    cos = F.expr(
        f"{DOT.format(a='q_emb', b='e_emb')}"
        f" / (SQRT({SQNORM.format(v='q_emb')}) * SQRT({SQNORM.format(v='e_emb')}))"
    )
    return (
        F.broadcast(q)
        .join(e, join_cond(q, e))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """Exact brute-force cosine top-k (query side broadcast)."""
    scored = _scored(
        queries,
        corpus,
        lambda q, e: F.col("query_id") != F.col("neighbor_id"),
    )
    return _topk(scored, k)


def cosine_topk_blocked(
    queries: DataFrame, corpus: DataFrame, k: int = 3
) -> DataFrame:
    """Coarse-blocked (IVF-style) cosine top-k: score same-block pairs only."""
    scored = _scored(
        queries,
        corpus,
        lambda q, e: (F.col("q_label") == F.col("e_label"))
        & (F.col("query_id") != F.col("neighbor_id")),
    )
    return _topk(scored, k)


def embedding_near_pairs(
    embeddings: DataFrame,
    threshold: float = 0.98,
    block_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    Pairs are generated only within a coarse block (label here; a quantizer
    cell at scale), so the self-join shuffles on the block key and the pair
    count is Σ|block|² instead of n² — the same bounded-shuffle shape as the
    MinHash band join.
    """
    a = embeddings.select(
        F.col(block_col).alias("blk"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = embeddings.select(
        F.col(block_col).alias("blk"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
    )
    cos = F.expr(
        f"{DOT.format(a='emb_a', b='emb_b')}"
        f" / (SQRT({SQNORM.format(v='emb_a')}) * SQRT({SQNORM.format(v='emb_b')}))"
    )
    return (
        a.join(b, ["blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
