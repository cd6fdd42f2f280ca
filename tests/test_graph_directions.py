"""Direction pins for the iterative graph family on PLANTED graphs with
analytically known answers (round-7 verdict item 5).

The oracle parity harness replays the same rounds in DuckDB, so a
sign/direction bug — rank flowing dst→src, peeling the HIGH-degree
vertices, breaking label ties toward the LARGEST id — would replay
identically and stay green.  These pins assert the intended direction
directly, the way tests/test_graph_ann.py pins navigability (which
caught the unreachable-cell bug the parity check could not see).
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (frame builders)


def _edges(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_pagerank_rank_flows_source_to_destination(spark):
    # Ring with a hub: r1->r2->...->r5->r1, every ring vertex ALSO points
    # at the hub, and the hub points back at r1 only.  (Every vertex has
    # in- and out-edges — the operator's contract: vertices that never
    # appear as a dst drop out of the rank table, which is fine for the
    # bidirectional graphs the registered queries build but must be
    # avoided in a planted pin.)  Rank must pile up at the hub (five
    # pours in, one out), r1 must beat the other ring vertices (it alone
    # receives the hub's mass), and a reversed contribution direction
    # inverts both.
    from lab_etl_spark.operators.graph import pagerank

    ring = [f"r{i}" for i in range(1, 6)]
    rows = (
        [(ring[i], ring[(i + 1) % 5]) for i in range(5)]
        + [(r, "h") for r in ring]
        + [("h", "r1")]
    )
    pr = {
        r.id: r.pr
        for r in pagerank(
            _edges(spark, rows, "src string, dst string"), iters=4
        ).collect()
    }
    assert set(pr) == set(ring) | {"h"}, pr
    # h collects half of every ring vertex's mass (~0.31); r1 collects
    # h's ENTIRE mass plus half of r5's (~0.33): those two dominate, and
    # rank decays around the ring with distance from r1.  Reversing the
    # contribution direction flattens all of this.
    assert min(pr["h"], pr["r1"]) > 1.5 * max(pr[r] for r in ring[1:]), pr
    assert pr["r2"] > pr["r3"] > pr["r4"], pr
    # with every vertex both a source and a destination, synchronous
    # PageRank conserves total mass exactly (sum_t = (1-d) + d*sum_{t-1},
    # fixed point 1): a damping-formula bug breaks this immediately
    assert abs(sum(pr.values()) - 1.0) < 1e-9, sum(pr.values())


def test_kcore_peels_low_degree_tail_keeps_clique(spark):
    # 4-clique {1,2,3,4} with a pendant path 4-5-6-7.  The 2-core is
    # exactly the clique: 7 peels first (deg 1), then 6, then 5, and the
    # clique survives with internal degree 3.  Peeling in the wrong
    # direction (dropping HIGH-degree vertices) or computing degree on
    # the original rather than the induced subgraph keeps tail vertices.
    from lab_etl_spark.operators.graph import kcore

    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    tail = [(4, 5), (5, 6), (6, 7)]
    out = {
        r.v: r.deg
        for r in kcore(
            _edges(spark, clique + tail, "p1 int, p2 int"), k=2, rounds=4
        ).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}, out


def test_label_propagation_converges_to_component_minimum(spark):
    # Two disjoint triangles.  With the deterministic smallest-label
    # tie-break, each triangle converges to its MINIMUM id within 3
    # synchronous rounds ({1,2,3} -> 1, {10,11,12} -> 10); labels never
    # cross components.  A tie-break toward the largest label converges
    # to 3 / 12 instead, and a neighbor-direction bug stalls convergence.
    from lab_etl_spark.operators.graph import label_propagation

    tri_a = [(1, 2), (1, 3), (2, 3)]
    tri_b = [(10, 11), (10, 12), (11, 12)]
    out = {
        r.v: r.label
        for r in label_propagation(
            _edges(spark, tri_a + tri_b, "p1 int, p2 int"), rounds=3
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}, out


def test_kcore_empty_when_k_exceeds_connectivity(spark):
    # a path graph has no 2-core at all: everything peels.
    from lab_etl_spark.operators.graph import kcore

    path = [(1, 2), (2, 3), (3, 4)]
    assert (
        kcore(_edges(spark, path, "p1 int, p2 int"), k=2, rounds=4).count()
        == 0
    )
