"""Semantic pins for the round-7 adds on planted corpora — oracle parity
proves cross-engine agreement; these prove the SEMANTICS are right (a
beam that visited plausible-but-wrong nodes, or k-means cells that
ignored geometry, would replicate faithfully into the oracle and pass
every parity check).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def _planted(n_clusters=6, per=8, dim=16):
    """Deterministic clustered corpus: cluster c's members point along
    axis c with a GEOMETRIC jitter ladder on a second axis (1.5^j), so
    each vector's nearest neighbor is a cluster-mate at a STRICT margin
    (linear spacing makes j-1 and j+1 equidistant — a float-ulp coin
    flip) and clusters are mutually near-orthogonal."""
    rows = []
    for c in range(n_clusters):
        for j in range(per):
            v = [0.0] * dim
            v[c] = 1.0
            v[(c + 1) % dim] = 0.01 * 1.5**j
            rows.append((c * per + j, v))
    return rows


def test_graph_ann_finds_the_planted_nearest_neighbor(spark):
    # Every query's top-k must match the brute-force raw-cosine ranking
    # exactly on this easy corpus: the navigable graph routes into the
    # right cluster and the beam covers it.
    import math

    from lab_etl_spark.operators.similarity import graph_ann_topk

    rows = _planted()
    qids = [0, 9, 17, 33, 47]
    emb = _emb(spark, rows)
    queries = emb.filter(F.col("vec_id").isin(qids))
    got = {
        (r.query_id, r.rk): r.neighbor_id
        for r in graph_ann_topk(
            emb, queries, n_hubs=8, m=4, beam=8, hops=3, k=3
        ).collect()
    }

    vecs = dict(rows)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    exact = {}
    for qid in qids:
        ranked = sorted(
            ((i, cos(vecs[qid], v)) for i, v in vecs.items() if i != qid),
            key=lambda t: (-t[1], t[0]),
        )
        for rk, (nid, _c) in enumerate(ranked[:3], 1):
            exact[(qid, rk)] = nid

    assert got == exact


def test_graph_ann_beam_reaches_outside_the_entry_cells(spark):
    # Navigability: with hubs that are NOT the query's cluster-mates, the
    # hub layer still routes each query toward its own cluster (entry =
    # best hubs by cosine), and the beam must return same-cluster
    # neighbors — the whole point of the two-layer structure vs flat LSH.
    from lab_etl_spark.operators.similarity import graph_ann_topk

    emb = _emb(spark, _planted())
    queries = emb.filter(F.col("vec_id") < 2)  # cluster 0 members
    got = graph_ann_topk(
        emb, queries, n_hubs=8, m=4, beam=8, hops=3, k=3
    ).collect()
    assert got, "beam returned nothing"
    for r in got:
        assert 0 <= r.neighbor_id < 8, (
            f"query {r.query_id} got a wrong-cluster neighbor "
            f"{r.neighbor_id} at rank {r.rk}"
        )


def test_graph_ann_hops_zero_scores_the_entry_beam(spark):
    # hops=0 must rank the two entry hubs per query (the pre-hop-fusion
    # API behavior), not raise — the round-13 loop rewrite left the
    # readout dereferencing the final hop's beam, which doesn't exist
    # with zero hops (ADVICE round 13).
    import math

    from lab_etl_spark.operators.similarity import graph_ann_topk

    rows = _planted()
    emb = _emb(spark, rows)
    queries = emb.filter(F.col("vec_id") == 9)
    got = graph_ann_topk(
        emb, queries, n_hubs=8, m=4, beam=8, hops=0, k=3
    ).collect()
    assert got, "hops=0 returned nothing"
    # Results must be drawn from the entry beam: the query's top-2 hubs
    # by cosine (minus the query itself), ranked by (cosine desc, id).
    vecs = dict(rows)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in b))
        )

    for r in got:
        assert r.neighbor_id != r.query_id
        assert abs(cos(vecs[9], vecs[r.neighbor_id]) - r.cosine) < 1e-5


def test_kmeans_cells_invariants(spark):
    # The operator's CONTRACT (not cluster recovery — one Lloyd pass from
    # hash seeds cannot guarantee that; 3 of 4 seeds once landed in one
    # planted cluster): identical vectors always share a cell (argmin of
    # identical inputs is identical — the invariant the dedup prune rides
    # on), every vector is assigned exactly once, at most k cells exist,
    # and the whole assignment is deterministic across invocations.
    from lab_etl_spark.operators.similarity import kmeans_cells

    n_clusters, per, dim, k = 4, 6, 8, 4
    rows = []
    for j in range(per):
        for c in range(n_clusters):
            v = [0.0] * dim
            v[c] = 1.0
            v[(c + 1) % dim] = 0.001 * (j + 1)
            rows.append((j * n_clusters + c, v))  # round-robin ids
    # planted exact duplicates of three existing vectors, far-apart ids
    dup_of = {100: 0, 101: 13, 102: 22}
    rows += [(i, rows[src][1]) for i, src in dup_of.items()]

    def assign():
        sig = kmeans_cells(_emb(spark, rows), k=k, updates=1)
        try:
            return {
                r.vec_id: r.cell
                for r in sig.select("vec_id", "cell").collect()
            }
        finally:
            sig.unpersist()

    got = assign()
    assert len(got) == len(rows), "a vector was dropped or duplicated"
    assert len(set(got.values())) <= k
    for dup, src in dup_of.items():
        assert got[dup] == got[src], (
            f"identical vectors {dup} and {src} landed in different cells"
        )
    assert assign() == got, "cell assignment is not deterministic"


def test_semdedup_kmeans_drops_only_true_near_dups(spark):
    # End to end on a planted corpus: identical vectors drop down to the
    # smallest id, near-orthogonal vectors all survive — the LSH
    # variant's pins (tests/test_semdedup.py), replayed on k-means cells.
    from lab_etl_spark.operators.similarity import (
        _semdedup_prune,
        kmeans_cells,
    )

    v = [1.0, 0.0, 0.5, 0.0]
    w = [0.0, 1.0, 0.0, 0.5]
    sig = kmeans_cells(
        _emb(spark, [(7, v), (3, v), (11, v), (2, w), (5, w)]), k=2
    )
    try:
        dropped = sorted(
            r.vec_id for r in _semdedup_prune(sig, eps=0.9).collect()
        )
    finally:
        sig.unpersist()
    assert dropped == [5, 7, 11]
