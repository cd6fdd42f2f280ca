#!/usr/bin/env python3
"""Generate an sf1 lake (~10x sf0.1) at testdata_sf1/ by replicating the
driver's sf0.1 tables with disjoint key spaces — the third scale point the
growth pins need (sf0.01 -> sf0.1 -> sf1 turns 2-point linear fits into
3-point evidence; round-6 verdict "What's missing" #3).

Replication rules (replica r of R, stride = max(key)+1 per key family):
  * every primary/foreign key is offset by r*stride CONSISTENTLY across
    tables, so joins, funnels, and graph structure replicate intact;
  * document TEXT is re-vocabularied per replica (every word suffixed
    `_r{r}`): replicas must be shingle-disjoint, otherwise 10 verbatim
    copies of each doc would weld every near-dup cluster 10x larger and
    the pair stage would grow quadratically BY CONSTRUCTION — real
    corpora add new text, not carbon copies;
  * embedding vectors are rolled by r positions (cyclic shift preserves
    norms and the intra-replica cosine structure while making
    cross-replica cosines incoherent) — same rationale as the text rule;
  * events keep their time range (scaling = more users in the same
    window, the realistic direction for the windowed/sessionized ops);
  * nation/region are fixed dimensions and copy through unchanged.

Output layout matches the driver's exactly (one parquet FILE per table),
so load_table, duck_con, bench.py (SPARK_GRAFT_SF_DIR=testdata_sf1), and
simulate_window (SPARK_GRAFT_SIM_SF_DIR=...) all work unmodified.

Usage: python tools/gen_sf1.py [replicas=10] [src=/root/testdata/sf0.1]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

#: key columns offset per table: {table: {column: key_family}} — the same
#: family shares one stride everywhere it appears, keeping joins intact.
KEYED = {
    "customer": {"c_custkey": "custkey", "c_nationkey": None},
    "supplier": {"s_suppkey": "suppkey", "s_nationkey": None},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    # label is the coarse-quantizer cell id: a replica's rolled vectors
    # are directionally incoherent with the originals, so a real
    # quantizer would assign them to NEW cells — offsetting the label
    # per replica models that (cell count grows with the data, cell
    # SIZE stays bounded, which is the Σ|block|² design assumption the
    # sf1 growth pins measure).
    "embeddings": {"vec_id": "vec_id", "label": "label"},
}
COPY_THROUGH = ["region", "nation"]


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = os.path.join(ROOT, "testdata_sf1")
    os.makedirs(dst, exist_ok=True)

    from pyspark.sql import functions as F

    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.session import get_spark

    spark = get_spark("gen_sf1")

    # one stride per key family = global max + 1 across every table the
    # family appears in (suppkey in both supplier and lineitem, etc.)
    strides: dict[str, int] = {}
    for table, cols in KEYED.items():
        df = load_table(spark, src, table)
        for col, family in cols.items():
            if family is None:
                continue
            mx = df.agg(F.max(col)).collect()[0][0]
            strides[family] = max(strides.get(family, 0), int(mx) + 1)
    print(f"# strides: {strides}", file=sys.stderr)

    def publish(df, table: str) -> None:
        tmp = os.path.join(dst, f"_tmp_{table}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, os.path.join(dst, f"{table}.parquet"))
        shutil.rmtree(tmp)

    for table in COPY_THROUGH:
        publish(load_table(spark, src, table), table)
        print(f"# {table}: copied", file=sys.stderr)

    for table, cols in KEYED.items():
        base = load_table(spark, src, table)
        parts = []
        for r in range(replicas):
            rep = base
            for col, family in cols.items():
                if family is None:
                    continue
                rep = rep.withColumn(
                    col, F.col(col) + F.lit(r * strides[family])
                )
            if table == "part" and r > 0:
                # replica-distinct part NAMES + BRANDS (round-7 verdict
                # item 4): replicating them verbatim welded 10 identical
                # catalog copies into every entity cluster (~100x true
                # pair mass), so the ER/fuzzy sf1 replay measured the
                # weld, not the blocking.  A real 10x catalog has NEW
                # names and brands.  The name suffix is SHORT and
                # constant-length ('_r3'): block separation comes from
                # the replica-distinct brand (the ER block key), and a
                # longer bucket-separating suffix was measured to inflate
                # the O(len^2) Levenshtein DP ~2.6x on late replicas —
                # a fixture artifact in the other direction.
                rep = rep.withColumn(
                    "p_name", F.expr(f"concat(p_name, '_r{r}')")
                ).withColumn(
                    # brands are the ER/fuzzy BLOCK key: with them copied
                    # verbatim, every (brand, bucket) block holds all 10
                    # replicas and blocking work grows 100x by fixture
                    # construction.  A real 10x catalog carries NEW
                    # brands; queries filtering a literal brand then
                    # match only the original subset — the honest
                    # behavior for a selective filter on grown data.
                    "p_brand", F.expr(f"concat(p_brand, '_r{r}')")
                )
            if table == "customer" and r > 0:
                # same rule for customer names (CDC/merge readouts carry
                # them; verbatim copies would weld any name-keyed logic)
                rep = rep.withColumn(
                    "c_name", F.expr(f"concat(c_name, '_r{r}')")
                )
            if table == "documents" and r > 0:
                # disjoint vocabulary per replica (see module doc);
                # n_chars follows the rewritten text so the stored
                # length stays truthful
                rep = rep.withColumn(
                    "text",
                    F.expr(
                        "array_join(transform(split(text, ' '),"
                        f" x -> concat(x, '_r{r}')), ' ')"
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if table == "embeddings" and r > 0:
                # cyclic roll by r: norm-preserving, cross-replica
                # cosines incoherent
                rep = rep.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {r + 1},"
                        f" size(embedding) - {r}),"
                        f" slice(embedding, 1, {r}))"
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        publish(out, table)
        n = spark.read.parquet(os.path.join(dst, f"{table}.parquet")).count()
        print(f"# {table}: {n} rows", file=sys.stderr)

    spark.stop()
    print(f"sf1 lake written to {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
