#!/usr/bin/env python3
"""Measure candidate-generation WORK (not just verified output) for the
blocked dedup/similarity family at three real-lake scale points —
sf0.01 (500 docs) → sf0.1 (5,000) → sf1 (50,000, tools/gen_sf1.py) — the
3-point evidence the round-6 verdict asked for ("What's missing" #3).

Work metric per blocking scheme = Σ over blocks of C(|block|, 2): the
exact number of pair comparisons the candidate self-join performs.  A
scheme is scale-safe iff this tracks the corpus linearly; measuring the
verified OUTPUT alone can hide a quadratic candidate stage behind a
selective verify filter.

Prints a markdown table (for PERFORMANCE.md) plus the raw dict; the
pinned bands live in tests/test_scale_growth_sf1.py.

Usage: python tools/measure_sf1_growth.py [sf_dirs...]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT_DIRS = [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    os.path.join(ROOT, "testdata_sf1"),
]

PAIRWORK = "CAST(SUM(c * (c - 1) / 2) AS BIGINT)"


def measure(spark, sf_dir: str) -> dict[str, int]:
    from pyspark.sql import functions as F

    from lab_etl_spark.catalog import load_table
    from lab_etl_spark.operators.dedup import (
        _shingle_postings,
        minhash_band_buckets,
        minhash_lsh_candidates,
        setsim_prefix_pairs,
        setsim_prefix_postings,
        shingle_jaccard_pairs,
        word_shingles,
    )
    from lab_etl_spark.operators.similarity import (
        embedding_near_pairs,
        lsh_bucket_spark,
        semdedup_dropped,
    )
    from lab_etl_spark.operators.simhash import (
        simhash_band_buckets,
        simhash_near_pairs,
    )
    from lab_etl_spark.queries.dedup import MAX_SHINGLE_FREQ, SD_EPS, SD_NBITS

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    def pairwork(blocks, *keys) -> int:
        counted = blocks.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
        return counted.agg(F.expr(PAIRWORK).alias("w")).collect()[0][0] or 0

    out: dict[str, int] = {
        "docs": docs.count(),
        "vecs": emb.count(),
        # blocking-stage work: Σ C(|block|, 2)
        "minhash_work": pairwork(
            minhash_band_buckets(docs, n=3, num_hashes=16, bands=4),
            "band", "bkey",
        ),
        "simhash_work": pairwork(
            simhash_band_buckets(docs, bands=4), "band", "bkey"
        ),
        "jaccard_work": pairwork(
            _shingle_postings(word_shingles(docs, 3), MAX_SHINGLE_FREQ)
            .select(F.explode("_ds").alias("doc_id"), "shingle"),
            "shingle",
        ),
        "setsim_work": pairwork(
            setsim_prefix_postings(docs, n=3, t_num=4, t_den=5), "shingle"
        ),
        "embedding_work": pairwork(emb, "label"),
        "semdedup_work": pairwork(
            emb.selectExpr(f"{lsh_bucket_spark(SD_NBITS)} AS cell"), "cell"
        ),
        # verified output (what the driver oracles check)
        "minhash_pairs": minhash_lsh_candidates(
            docs, n=3, num_hashes=16, bands=4, threshold=0.5
        ).count(),
        "simhash_pairs": simhash_near_pairs(
            docs, max_hamming=3, bands=4
        ).count(),
        "jaccard_pairs": shingle_jaccard_pairs(
            docs, n=3, threshold=0.5, max_shingle_freq=MAX_SHINGLE_FREQ
        ).count(),
        "setsim_pairs": setsim_prefix_pairs(
            docs, n=3, t_num=4, t_den=5
        ).count(),
        "embedding_pairs": embedding_near_pairs(emb, threshold=0.35).count(),
    }
    sig, dropped = semdedup_dropped(emb, nbits=SD_NBITS, eps=SD_EPS)
    out["semdedup_dropped"] = dropped.count()
    sig.unpersist()

    # the k ∝ corpus rule q_semdedup_kmeans applies (SDK_CELL_TARGET)
    from lab_etl_spark.operators.similarity import kmeans_cells
    from lab_etl_spark.queries.dedup import SDK_CELL_TARGET

    ksig = kmeans_cells(
        emb, k=max(2, out["vecs"] // SDK_CELL_TARGET), updates=1
    )
    out["kmeans_cell_work"] = pairwork(ksig, "cell")
    ksig.unpersist()
    return out


def main() -> int:
    sf_dirs = sys.argv[1:] or DEFAULT_DIRS
    from lab_etl_spark.session import get_spark

    spark = get_spark("measure_sf1_growth")
    results = {}
    for d in sf_dirs:
        if not os.path.isdir(d):
            print(f"# skip {d} (missing; run tools/gen_sf1.py)",
                  file=sys.stderr)
            continue
        results[d] = measure(spark, d)
        print(f"# {d}: {results[d]}", file=sys.stderr)
    spark.stop()

    metrics = sorted({k for r in results.values() for k in r})
    dirs = list(results)
    print("| metric | " + " | ".join(os.path.basename(d) for d in dirs)
          + " | growth (per step) |")
    print("|---|" + "---|" * (len(dirs) + 1))
    for m in metrics:
        vals = [results[d].get(m, 0) for d in dirs]
        steps = [
            f"{b / a:.2f}x" if a else "inf"
            for a, b in zip(vals, vals[1:])
        ]
        print(f"| {m} | " + " | ".join(f"{v:,}" for v in vals)
              + " | " + " -> ".join(steps) + " |")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
