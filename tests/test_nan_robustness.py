"""Zero-norm / NaN / Inf embedding robustness for the similarity family.

The hazard (empirically pinned by test_nan_orders_above_threshold): Spark
and DuckDB both evaluate ``NaN >= t`` as TRUE and order NaN above every
real number.  A zero-norm embedding — an empty document, a failed encoder
batch, a padding row; all routine in a 100 TB corpus — makes cosine
0/0 = NaN, so without a guard it

  * "near-duplicates" every block-mate in embedding_near_pairs /
    semdedup (real documents silently dropped), and
  * outranks every true neighbor in the cosine top-k family.

operators/similarity.is_finite guards every inclusion/drop decision; these
tests plant zero-norm, NaN-component, and Inf-component vectors among
clean ones and assert (a) garbage never matches, and (b) the clean-only
results are unchanged by the garbage rows' presence.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lab_etl_spark.operators.similarity import (
    cosine_topk,
    embedding_near_pairs,
    ivf_topk_lsh,
    semdedup_dropped,
)

# Clean vectors: ids 0-3 form two near-duplicate pairs (0,1) and (2,3)
# inside one block; garbage ids 90 (zero-norm), 91 (NaN component),
# 92 (+Inf component) sit in the SAME block so they meet every clean
# vector in the pair join.
CLEAN = [
    (0, [1.0, 0.0, 0.0], "blk"),
    (1, [0.999, 0.01, 0.0], "blk"),
    (2, [0.0, 1.0, 0.0], "blk"),
    (3, [0.01, 0.999, 0.0], "blk"),
]
GARBAGE = [
    (90, [0.0, 0.0, 0.0], "blk"),
    (91, [float("nan"), 1.0, 0.0], "blk"),
    (92, [float("inf"), 1.0, 0.0], "blk"),
]
SCHEMA = "vec_id BIGINT, embedding ARRAY<DOUBLE>, label STRING"


def _emb(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_nan_orders_above_threshold(spark):
    # the premise the guard exists for — if an engine upgrade ever makes
    # these false, is_finite becomes dead weight and should be revisited
    row = spark.sql(
        "SELECT double('nan') >= 0.9 AS ge, double('nan') > 1e300 AS gt"
    ).first()
    assert row.ge is True and row.gt is True


def test_near_pairs_ignore_garbage_vectors(spark):
    clean = embedding_near_pairs(_emb(spark, CLEAN), threshold=0.9)
    dirty = embedding_near_pairs(_emb(spark, CLEAN + GARBAGE), threshold=0.9)
    got = {(r.id_a, r.id_b) for r in dirty.collect()}
    assert got == {(0, 1), (2, 3)}
    # clean results bit-identical with garbage present
    assert sorted(map(tuple, clean.collect())) == sorted(
        map(tuple, dirty.collect())
    )


def test_near_pairs_garbage_only_block_is_empty(spark):
    out = embedding_near_pairs(_emb(spark, GARBAGE), threshold=0.0)
    assert out.count() == 0


def test_topk_excludes_garbage_neighbors(spark):
    corpus = _emb(spark, CLEAN + GARBAGE)
    queries = _emb(spark, CLEAN).filter(F.col("vec_id") == 0)
    out = cosine_topk(queries, corpus, k=10).collect()
    ids = [r.neighbor_id for r in out]
    assert set(ids).isdisjoint({90, 91, 92})
    assert ids[0] == 1  # the true near-duplicate still ranks first
    assert all(math.isfinite(r.cosine) for r in out)


def test_topk_garbage_query_returns_no_rows(spark):
    corpus = _emb(spark, CLEAN)
    for qid in (90, 91, 92):
        q = _emb(spark, GARBAGE).filter(F.col("vec_id") == qid)
        assert cosine_topk(q, corpus, k=3).count() == 0


def test_ivf_lsh_excludes_garbage(spark):
    corpus = _emb(spark, CLEAN + GARBAGE)
    queries = _emb(spark, CLEAN).filter(F.col("vec_id") < 2)
    out = ivf_topk_lsh(queries, corpus, k=10, nbits=2, n_probe=4).collect()
    assert {r.neighbor_id for r in out}.isdisjoint({90, 91, 92})
    assert all(math.isfinite(r.cosine) for r in out)


def test_ivf_assign_never_seeds_garbage(spark):
    from lab_etl_spark.operators.similarity import ivf_assign

    # n_clusters > clean-row count forces every row into the seed set if
    # admitted — garbage must not appear among seeds or assignments
    indexed, centroids = ivf_assign(
        _emb(spark, CLEAN + GARBAGE), n_clusters=7, n_iter=1
    )
    assert {r.vec_id for r in indexed.collect()} == {0, 1, 2, 3}
    cents = centroids.collect()
    assert len(cents) == 4
    assert all(
        all(math.isfinite(x) for x in r.c_emb) for r in cents
    )


def test_kmeans_cells_admits_only_finite_vectors(spark):
    from lab_etl_spark.operators.similarity import kmeans_cells

    # NaN components diverge across engines inside the DECIMAL-exact
    # centroid means (Spark ANSI CAST(NaN AS DECIMAL) -> NULL silently
    # drops the term; DuckDB throws), so garbage must never reach the
    # Lloyd update — the oracles gate their pts CTE identically
    sig = kmeans_cells(
        _emb(spark, CLEAN + GARBAGE).select("vec_id", "embedding"), k=2
    )
    try:
        ids = {r.vec_id for r in sig.collect()}
    finally:
        sig.unpersist()
    assert ids == {0, 1, 2, 3}


def test_semdedup_never_drops_for_garbage(spark):
    # eps=0.0: every finite same-cell cosine >= 0 pair drops the larger id,
    # so any garbage-vector pair admitted by a broken guard would surface
    emb = _emb(spark, CLEAN + GARBAGE).select("vec_id", "embedding")
    sig, dropped = semdedup_dropped(emb, nbits=2, eps=0.999)
    try:
        dropped_ids = {r.vec_id for r in dropped.collect()}
    finally:
        sig.unpersist()
    # garbage ids must never be dropped (their cosine is undefined), and
    # must never cause a clean id to drop: with eps=0.999 only the planted
    # near-dup pairs can fire, and only if they share an LSH cell
    assert dropped_ids.isdisjoint({90, 91, 92})
    assert dropped_ids <= {1, 3}


def test_quality_census_counts_garbage(spark):
    from lab_etl_spark.operators.similarity import embedding_quality_census

    out = embedding_quality_census(_emb(spark, CLEAN + GARBAGE)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_vecs, r.n_admitted, r.n_zero_norm, r.n_nonfinite) == (
        7,
        4,
        1,
        2,
    )
    assert r.min_norm > 0 and r.max_norm >= r.min_norm


def test_oracle_parity_on_dirty_input(spark):
    """Cross-engine proof: the guarded q_dedup_embedding oracle agrees with
    the guarded Spark operator ON DIRTY INPUT, not just on the clean
    driver lake — both engines exclude undefined cosines identically."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from lab_etl_spark.queries import load_all

    oracle = load_all()["q_dedup_embedding"].oracle
    rows = CLEAN + GARBAGE
    pdf = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
            "label": [r[2] for r in rows],
        }
    )
    con = duckdb.connect()
    con.register("embeddings", pdf)
    duck = {
        (int(a), int(b), round(float(c), 6))
        for a, b, c in con.execute(oracle).fetchall()
    }
    spark_out = {
        (r.id_a, r.id_b, round(r.cosine, 6))
        for r in embedding_near_pairs(
            _emb(spark, rows), threshold=0.35
        ).collect()
    }
    assert duck == spark_out and len(duck) >= 2
