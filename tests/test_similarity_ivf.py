"""IVF ANN correctness pins.

The exactness property is the important one: with n_probe == n_clusters the
IVF search degenerates to exhaustive search, so its output must equal the
brute-force oracle-checked ``cosine_topk`` bit-for-bit.  Partial probing is
then only allowed to *lose* neighbors, never invent or mis-rank them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lab_etl_spark.catalog import load_table
from lab_etl_spark.operators.similarity import cosine_topk, ivf_topk


def _rows(df):
    return sorted(
        (r.query_id, r.rk, r.neighbor_id, r.cosine) for r in df.collect()
    )


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 8)
    exact = _rows(cosine_topk(q, em, k=5))
    full = _rows(ivf_topk(q, em, k=5, n_clusters=8, n_probe=8))
    assert full == exact


def test_ivf_partial_probe_subset_and_ranked(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 8)
    exact_all = {
        (r.query_id, r.neighbor_id, r.cosine)
        for r in cosine_topk(q, em, k=em.count()).collect()
    }
    part = ivf_topk(q, em, k=5, n_clusters=8, n_probe=3).collect()
    assert len(part) > 0
    by_query: dict[int, list] = {}
    for r in part:
        # every returned pair carries the true cosine (scores are never
        # approximated — only the candidate set is)
        assert (r.query_id, r.neighbor_id, r.cosine) in exact_all
        by_query.setdefault(r.query_id, []).append(r)
    for rows in by_query.values():
        rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert len(rows) <= 5


def test_ivf_lsh_full_probe_equals_brute_force(spark, sf_dir):
    # The portable hyperplane-LSH quantizer (q_similarity_ivf's cell
    # assignment) must also degenerate to exhaustive search when every
    # occupied cell is probed.
    from lab_etl_spark.operators.similarity import ivf_topk_lsh

    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 8)
    exact = _rows(cosine_topk(q, em, k=5))
    full = _rows(ivf_topk_lsh(q, em, k=5, nbits=6, n_probe=64))
    assert full == exact


def test_ivf_lsh_partial_probe_scores_are_true_cosines(spark, sf_dir):
    from lab_etl_spark.operators.similarity import ivf_topk_lsh

    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 8)
    exact_all = {
        (r.query_id, r.neighbor_id, r.cosine)
        for r in cosine_topk(q, em, k=em.count()).collect()
    }
    part = ivf_topk_lsh(q, em, k=5, nbits=6, n_probe=3).collect()
    assert len(part) > 0
    for r in part:
        assert (r.query_id, r.neighbor_id, r.cosine) in exact_all
