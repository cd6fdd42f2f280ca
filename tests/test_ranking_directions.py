"""Semantic direction pins for ranking queries: oracle parity replicates a
flipped formula faithfully, so planted corpora assert the scores point the
right way (more-relevant ranks higher)."""

from __future__ import annotations

import pandas as pd

from lab_etl_spark.queries import load_all

REGISTRY = load_all()


def test_bm25_ranks_term_dense_docs_higher(spark, tmp_path):
    # doc 1: all three query terms, repeatedly, in a short doc (max tf,
    # min length penalty).  doc 2: one term occurrence buried in filler.
    # 48 filler docs set the idf base.  BM25 must score 1 > 2 > 0; both
    # an inverted idf (ln of a sub-1 ratio) and a swapped length
    # normalization would flip or sink these.
    rows = [
        (1, "spark join query spark join query", "en", "src0", 34),
        (2, "spark " + " ".join(f"filler{i}" for i in range(40)),
         "en", "src0", 300),
    ]
    for d in range(3, 51):
        rows.append((d, " ".join(f"pad{d}w{k}" for k in range(10)),
                     "en", "src1", 80))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)

    out = {
        r.doc_id: r.bm25
        for r in REGISTRY["q_bm25"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2}, "only term-bearing docs are scored"
    assert out[1] > out[2] > 0, out
