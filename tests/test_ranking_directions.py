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


def _docs(tmp_path, rows):
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    return str(tmp_path)


def test_unigram_logprob_scores_gibberish_lower(spark, tmp_path):
    # 40 docs of shared common vocabulary + one doc of hapax tokens: the
    # corpus-LM score must put the gibberish doc strictly below every
    # common-vocab doc (an inverted ln or a flipped subtraction would
    # rank it highest).
    common = "alpha beta gamma delta epsilon"
    rows = [(d, common, "en", "src0", 30) for d in range(40)]
    rows.append((99, "zxqj wvkp mbtr ylgh fdns", "en", "src0", 25))
    sf = _docs(tmp_path, rows)
    out = {r.doc_id: r.avg_logprob
           for r in REGISTRY["q_unigram_logprob"].fn(spark, sf).collect()}
    assert out[99] < min(v for k, v in out.items() if k != 99), out


def test_kl_divergence_flags_the_drifted_source(spark, tmp_path):
    # src_on shares the corpus-majority vocabulary; src_off uses disjoint
    # tokens.  KL(P_source || P_corpus) must rank the off-distribution
    # source strictly higher (zero/negative or inverted KL would not).
    rows = [(d, "one two three four five", "en", "src_on", 25)
            for d in range(30)]
    rows += [(100 + d, "qqq www eee rrr ttt", "en", "src_off", 20)
             for d in range(3)]
    sf = _docs(tmp_path, rows)
    out = {r.source: r.kl_to_corpus
           for r in REGISTRY["q_kl_divergence"].fn(spark, sf).collect()}
    assert out["src_off"] > out["src_on"] >= 0, out


def test_quality_filter_drops_junk_keeps_prose(spark, tmp_path):
    # One clean English paragraph vs one symbol-soup doc: the Gopher-style
    # gates must keep the former and drop the latter with at least one
    # named failed rule.
    clean = ("the quick brown fox jumps over the lazy dog and then "
             "walks slowly home across the quiet green field tonight")
    junk = "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) {{{{ }}}}"
    sf = _docs(tmp_path, [(1, clean, "en", "src0", len(clean)),
                          (2, junk, "en", "src0", len(junk))])
    out = {r.doc_id: r for r in
           REGISTRY["q_quality_filter"].fn(spark, sf).collect()}
    assert out[1].keep and not out[2].keep, out
    assert out[2].drop_reasons, "drop must carry its audit trail"


def test_contamination_flags_only_the_overlapping_doc(spark, tmp_path):
    # doc 0 (doc_id % 97 == 0) is the held-out benchmark slice; doc 5
    # repeats its text verbatim (full 5-gram overlap), doc 7 is disjoint.
    # The scan must flag doc 5 and stay silent on doc 7 — an off-by-one
    # in the shingle window or an inverted benchmark filter would be
    # replicated by the oracle and pass parity.
    bench_text = "held out benchmark question about gravity and light"
    rows = [(0, bench_text, "en", "src0", len(bench_text)),
            (5, bench_text, "en", "src1", len(bench_text)),
            (7, "completely different words in this training document here",
             "en", "src1", 57)]
    sf = _docs(tmp_path, rows)
    out = {r.doc_id: r.n_shared
           for r in REGISTRY["q_contamination"].fn(spark, sf).collect()}
    assert 5 in out and out[5] >= 1, out
    assert 7 not in out and 0 not in out, out


def test_pii_regexes_actually_match(spark, tmp_path):
    # The augmentation plants exactly one email and one IP per document;
    # a dead regex (matching nothing) would redact nothing yet still pass
    # oracle parity, since both engines would replicate it.  Counts must
    # be exactly 1/1 on PII-free base text.
    sf = _docs(tmp_path, [(d, "plain text with no addresses at all",
                           "en", "src0", 36) for d in range(5)])
    for r in REGISTRY["q_pii_redact"].fn(spark, sf).collect():
        assert r.n_emails == 1 and r.n_ips == 1, r


def test_lang_id_follows_the_trigram_profile(spark, tmp_path):
    # 20 en-labeled docs share one character system, 20 de-labeled docs
    # another; a 41st doc labeled 'de' but written in the en system must
    # be PREDICTED 'en' — content, not label, drives the vote.
    en = "the quick brown fox jumps over the lazy dog again today"
    de = "zwölf große Boxkämpfer jagen Viktor quer über den Sylter"
    rows = [(i, en + f" v{i}", "en", "src0", 60) for i in range(20)]
    rows += [(100 + i, de + f" n{i}", "de", "src0", 60) for i in range(20)]
    rows.append((999, en + " v999", "de", "src0", 60))  # mislabeled
    sf = _docs(tmp_path, rows)
    out = {r.doc_id: r.predicted_lang
           for r in REGISTRY["q_lang_id_ngram"].fn(spark, sf).collect()}
    assert out[999] == "en", out[999]
    assert out[0] == "en" and out[100] == "de", (out[0], out[100])
