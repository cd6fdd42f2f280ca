"""Semantic pins for the SemDeDup prune rule (operators/similarity.py
semdedup_dropped) on planted corpora — the oracle parity check proves
cross-engine agreement; these prove the SEMANTICS are the intended ones.
"""

from __future__ import annotations


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_identical_vectors_keep_exactly_the_smallest_id(spark):
    from lab_etl_spark.operators.similarity import semdedup_dropped

    v = [1.0, 0.0, 0.0, 0.5]
    sig, dropped = semdedup_dropped(
        _emb(spark, [(7, v), (3, v), (11, v)]), nbits=4, eps=0.9
    )
    try:
        assert sorted(r.vec_id for r in dropped.collect()) == [7, 11]
    finally:
        sig.unpersist()


def test_orthogonal_vectors_never_drop(spark):
    from lab_etl_spark.operators.similarity import semdedup_dropped

    rows = [(i, [1.0 if d == i else 0.0 for d in range(4)]) for i in range(4)]
    sig, dropped = semdedup_dropped(_emb(spark, rows), nbits=4, eps=0.35)
    try:
        assert dropped.count() == 0
    finally:
        sig.unpersist()


def test_drop_rule_is_per_cell_not_global(spark):
    # Two identical vectors that land in DIFFERENT LSH cells must both
    # survive: the prune is cluster-scoped by design (the 100 TB bound is
    # sum(|cell|^2)), so cross-cell near-dups are out of scope for one
    # pass — exactly the SemDeDup trade.
    from pyspark.sql import functions as F

    from lab_etl_spark.operators.similarity import semdedup_dropped

    rows = [(i, [float(i + 1), float((i * 7) % 5), 1.0, -float(i)])
            for i in range(12)]
    sig, dropped = semdedup_dropped(_emb(spark, rows), nbits=4, eps=0.999999)
    try:
        cells = {r.vec_id: r.cell for r in sig.select("vec_id", "cell").collect()}
        # eps just under 1.0: only (near-)identical pairs may drop, and
        # every dropped vector must share a cell with a smaller-id vector
        for r in dropped.collect():
            assert any(
                cells[o] == r.cell and o < r.vec_id for o in cells
            ), r
    finally:
        sig.unpersist()


def test_cell_cap_sub_blocks_bound_pair_work_and_keep_per_subblock(spark):
    # 10 identical vectors in one LSH cell with cell_cap=3: the census
    # splits the cell into ceil(10/3)=4 md5 sub-blocks, the prune keeps
    # the smallest id PER SUB-BLOCK (the cap's recall trade), and no
    # comparison crosses sub-blocks — pair work <= n*cap by construction.
    from pyspark.sql import functions as F

    from lab_etl_spark.operators.similarity import semdedup_dropped

    v = [0.3, 1.0, -0.2, 0.7]
    sig, dropped = semdedup_dropped(
        _emb(spark, [(i, v) for i in range(10)]), nbits=4, eps=0.9,
        cell_cap=3,
    )
    try:
        subs = {r.vec_id: r.sub for r in sig.select("vec_id", "sub").collect()}
        assert set(subs.values()) <= {0, 1, 2, 3}, subs
        keep_per_sub = {}
        for vid, s in subs.items():
            keep_per_sub[s] = min(keep_per_sub.get(s, vid), vid)
        expect_dropped = sorted(set(subs) - set(keep_per_sub.values()))
        assert sorted(r.vec_id for r in dropped.collect()) == expect_dropped
        # block sizes respect the expected-cap shape: every sub-block of a
        # split cell is strictly smaller than the whole cell
        sizes = (
            sig.groupBy("cell", "sub").agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        assert all(r.c < 10 for r in sizes), sizes
    finally:
        sig.unpersist()


def test_cell_cap_noop_when_cells_are_small(spark):
    # cap larger than every cell: sub is all-zero and the drop set is
    # IDENTICAL to the uncapped prune — the cap only engages at scale.
    from lab_etl_spark.operators.similarity import semdedup_dropped

    rows = [(i, [1.0, float(i % 3), -0.5, 0.25]) for i in range(12)]
    sig_u, drop_u = semdedup_dropped(_emb(spark, rows), nbits=4, eps=0.8)
    sig_c, drop_c = semdedup_dropped(
        _emb(spark, rows), nbits=4, eps=0.8, cell_cap=100
    )
    try:
        assert set(r.sub for r in sig_c.select("sub").collect()) == {0}
        assert sorted(r.vec_id for r in drop_u.collect()) == sorted(
            r.vec_id for r in drop_c.collect()
        )
    finally:
        sig_u.unpersist()
        sig_c.unpersist()
