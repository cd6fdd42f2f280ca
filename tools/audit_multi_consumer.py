#!/usr/bin/env python3
"""Static audit: flag registry functions where one DataFrame feeds 2+
downstream consumers without a persist()/localCheckpoint().

Catalyst does not dedupe common subtrees, so a frame referenced by two
consumers RE-RUNS its whole subtree once per consumer — the tax round 7
paid twice before fixing it by hand (q_approx_percentile's sketch
aggregate ran 3x, 1.74 s -> 0.94 s after a group-sized persist;
q_graph_ann rebuilt its edge table once per unrolled hop, 7.8 s ->
3.0 s).  This is the codified rule (round-7 verdict item 6): any local
variable inside a ``@register``-ed query function that is (a) assigned a
DataFrame-producing expression, (b) NOT a leaf scan, and (c) consumed by
two or more later expressions, must be persisted/localCheckpointed or
appear in the reviewed allowlist below with a reason.

Heuristics (per function version of a variable — ``df = df.filter(...)``
rebinds start a fresh count, so linear pipelines don't flag):

  * DataFrame-producing = the RHS source contains a producer token
    (load_table / spark.read / .select / .join / .groupBy / ...).
  * Leaf scan = the RHS is ONLY a load_table()/spark.read chain with
    nothing but column-pruning/filter steps — re-scanning a pruned
    parquet scan is the cheap, normal case at any scale.
  * Persisted = the RHS or any later statement calls .persist() /
    .localCheckpoint() / .cache() on the variable.

Exit 1 with a report when an unlisted violation exists; exit 0 clean —
wired into tests/test_static_audits.py next to the decimal-literal,
rational-ROUND, and compound-LN gates.
"""

from __future__ import annotations

import ast
import glob
import os
import sys
from dataclasses import dataclass

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERY_GLOB = os.path.join(ROOT, "lab_etl_spark", "queries", "*.py")

#: substrings that mark an expression as DataFrame-producing
PRODUCERS = (
    "load_table(", "spark.read", "spark.sql(", "spark.range(",
    "spark.createDataFrame(", ".select(", ".selectExpr(", ".filter(",
    ".where(", ".join(", ".crossJoin(", ".groupBy(", ".agg(",
    ".withColumn(", ".withColumnRenamed(", ".union(", ".unionByName(",
    ".orderBy(", ".sort(", ".limit(", ".distinct(", ".dropDuplicates(",
    ".drop(", ".alias(", ".sample(", ".repartition(", ".coalesce(",
    ".unpivot(", ".melt(", ".exceptAll(", ".intersectAll(", ".subtract(",
    ".mapInPandas(", ".applyInPandas(", ".transform(", ".pivot(",
    ".toDF(", ".fillna(", ".na.",
)
#: a flag only fires when the frame's subtree contains a SHUFFLE- or
#: expansion-producing step — re-running a pruned scan + narrow
#: projections per consumer is the cheap, normal case Catalyst handles
#: well (column pruning + pushdown make each rescan minimal); re-running
#: an aggregation/join/window per consumer is the measured 2-3x tax
#: (q_approx_percentile's 3x sketch pass, q_graph_ann's per-hop edge
#: rebuild — round-7 PERFORMANCE.md).
EXPENSIVE = (
    ".join(", ".crossJoin(", ".groupBy(", ".agg(", ".distinct(",
    ".dropDuplicates(", ".union(", ".unionByName(", ".exceptAll(",
    ".intersectAll(", ".subtract(", ".over(", "explode(", "posexplode(",
    ".pivot(", ".unpivot(", ".melt(", ".repartition(",
    ".mapInPandas(", ".applyInPandas(",
)
#: RHS prefixes that are column/window EXPRESSIONS or stdlib calls
#: (os.path.join matches the ".join(" producer token), not DataFrames
NON_FRAME_PREFIXES = ("F.", "W.", "Window", "(F.", "[F.", "os.", "json.")
PERSISTERS = (".persist(", ".localCheckpoint(", ".cache(")

#: reviewed allowlist: (file, function, variable) -> reason the double
#: evaluation is acceptable.  The recurring shape: a NARROW token/shingle
#: explode (no shuffle upstream) whose consumers prune it differently —
#: each rescan is a codegen'd map pass over the pruned parquet scan,
#: cheaper at scale than materializing the full exploded stream
#: (q_lang_id_ngram measured the persist variant +15% total; the same
#: economics apply to every entry here).
ALLOW: dict[tuple[str, str, str], str] = {
    ("advanced.py", "q_vocab_oov", "words"):
        "narrow word explode; vocab build and OOV probe each rescan the "
        "pruned text column in one map pass — cheaper than caching the "
        "token stream",
    ("dedup.py", "q_dedup_passages", "blocks"):
        "narrow passage-fingerprint explode; freq agg and join-back each "
        "recompute it map-side",
    ("text.py", "q_bigram_novelty", "bigrams"):
        "narrow bigram explode; corpus freq and per-doc score rescan "
        "map-side",
    ("text.py", "q_cooccurrence_pmi", "pres"):
        "narrow token explode; the margin agg and the 1-row doc count "
        "prune it to different columns",
    ("text.py", "q_lang_id_ngram", "tri_counts"):
        "measured: persisting cost +15% total (see in-function comment); "
        "recomputing the codegen'd trigram explode is cheaper than "
        "materializing |docs|*1024 rows",
    ("text.py", "q_unigram_logprob", "tokens"):
        "narrow token explode; vocab count, 1-row total, and score join "
        "each rescan map-side",
    ("similarity.py", "q_pq_adc", "sub"):
        "broadcast crossJoin expansion is map-only; two of three "
        "consumers are vec_id<K-pruned slices whose rescan reads almost "
        "nothing after pushdown",
    # ---- measured round-8: persist REGRESSED these (data-sized frames;
    # Spark's ReusedExchange already dedupes identical exchange subtrees
    # within one plan, so the persist only added a columnar
    # materialization on top).  Isolated min-of-3 at sf0.1:
    ("sketches.py", "q_market_basket", "pp"):
        "measured 1.8s -> 2.6s persisted; the distinct's exchange is "
        "reused by all three consumers (ReusedExchange)",
    ("sketches.py", "q_kmv_intersect", "dv"):
        "measured 1.1s -> 1.6s persisted; same ReusedExchange shape",
    ("scale.py", "q_negative_sampling", "positives"):
        "measured 1.2s -> 1.6s persisted; interaction-set-sized, "
        "exchange reuse covers the spine + anti-join consumers",
    ("dedup.py", "q_dedup_containment", "sizes"):
        "measured 1.5s -> 2.1s persisted; both pair sides reuse the "
        "posting exchange",
    ("text.py", "q_tfidf", "tf"):
        "measured 0.8s -> 1.1s persisted; (doc, token)-sized, the df "
        "margin and score join reuse the tf exchange",
    ("advanced.py", "q_pagerank", "pairs"):
        "measured 2.3s -> 2.9s persisted; both direction projections "
        "reuse the distinct's exchange",
    ("timeseries.py", "q_attribution_markov", "seq"):
        "events-sized window output consumed twice inside ONE eager "
        "localCheckpoint job (base_t); caching would double-materialize",
    # ---- A/B-measured round-8 (isolated min-of-3 at sf0.1, persisted vs
    # not): these four consumers share IDENTICAL subplans below the
    # aggregate's exchange, so ReusedExchange already shares the corpus
    # scan at any scale and the persist only added its fixed
    # InMemoryRelation overhead:
    ("timeseries.py", "q_seasonal_decompose", "hourly"):
        "measured 0.85s persisted vs 0.76s not; both consumers reuse the "
        "hourly agg's exchange",
    ("timeseries.py", "q_dtw_distance", "daily"):
        "measured 0.81s persisted vs 0.69s not; same exchange-reuse shape",
    ("text.py", "q_bm25", "per_doc"):
        "measured 0.46s persisted vs 0.40s not; corpus stats and score "
        "readout reuse the per-doc agg's exchange",
    ("advanced.py", "q_source_mix_weights", "per"):
        "measured 0.33s persisted vs 0.23s not; 1-row total and weight "
        "readout reuse the per-source agg's exchange",
    # ---- A/B-measured round-9 (interleaved min-of-4 cold at sf0.1):
    ("scale.py", "q_approx_percentile", "agg"):
        "measured 1.12s not persisted vs 1.20s persisted (r8's "
        "three-consumer persisted shape: 1.41s); |groups|-row join of "
        "two group-sized aggregates — the cold materialization barrier "
        "costs more than the downstream re-read",
}


@dataclass
class Flag:
    file: str
    func: str
    var: str
    line: int
    uses: int


def _src(seg: str | None) -> str:
    return seg or ""


def audit_file(path: str) -> list[Flag]:
    src = open(path).read()
    tree = ast.parse(src)
    flags: list[Flag] = []
    fname = os.path.basename(path)

    for fn in [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)]:
        is_query = any(
            (isinstance(d, ast.Call) and _src(ast.get_source_segment(src, d)).startswith("register("))
            or _src(ast.get_source_segment(src, d)).startswith("register(")
            for d in fn.decorator_list
        )
        if not (is_query or fn.name.startswith("q_")):
            continue
        body_src = _src(ast.get_source_segment(src, fn))
        assigns: dict[str, dict[int, str]] = {}
        uses: dict[tuple[str, int], int] = {}
        #: var -> (assign line, rhs src) of its CURRENT version
        active: dict[str, tuple[int, str]] = {}

        def count_loads(node: ast.AST, skip: set[str] = frozenset()):
            # CAP at one use per statement/expression: x.join(y, x.c == y.c)
            # loads x twice but evaluates the frame once (the second load is
            # a column reference) — only distinct STATEMENTS are consumers.
            seen: set[str] = set()
            for nm in ast.walk(node):
                if (
                    isinstance(nm, ast.Name)
                    and isinstance(nm.ctx, ast.Load)
                    and nm.id in active
                    and nm.id not in skip
                    and nm.id not in seen
                ):
                    seen.add(nm.id)
                    key = (nm.id, active[nm.id][0])
                    uses[key] = uses.get(key, 0) + 1

        def walk_block(stmts):
            for stmt in stmts:
                if isinstance(stmt, ast.Assign):
                    rhs = _src(ast.get_source_segment(src, stmt.value))
                    targets = [
                        t.id for t in stmt.targets if isinstance(t, ast.Name)
                    ]
                    # a linear rebind (x = x.filter(...)) is not a fan-out
                    # use of the previous version
                    count_loads(stmt.value, skip=set(targets))
                    for t in targets:
                        if (
                            any(p in rhs for p in PRODUCERS)
                            and not rhs.lstrip().startswith(NON_FRAME_PREFIXES)
                            # a list/tuple/dict OF frames is consumed
                            # element-wise, each element once
                            and not isinstance(
                                stmt.value, (ast.List, ast.Tuple, ast.Dict)
                            )
                        ):
                            active[t] = (stmt.lineno, rhs)
                            assigns.setdefault(t, {})[stmt.lineno] = rhs
                        else:
                            active.pop(t, None)
                elif isinstance(stmt, (ast.For, ast.While)):
                    count_loads(
                        stmt.iter if isinstance(stmt, ast.For) else stmt.test
                    )
                    # loop bodies run repeatedly: a single in-loop use of a
                    # frame built BEFORE the loop is a multi-consume, so
                    # double it; frames assigned inside the same iteration
                    # are fresh each pass and keep their literal count
                    outer = {
                        (v, ln) for v, (ln, _r) in active.items()
                        if ln < stmt.lineno
                    }
                    before = dict(uses)
                    walk_block(stmt.body)
                    for k, n in uses.items():
                        if n > before.get(k, 0) and k in outer:
                            uses[k] = n + (n - before.get(k, 0))
                    walk_block(stmt.orelse)
                elif isinstance(stmt, ast.If):
                    count_loads(stmt.test)
                    walk_block(stmt.body)
                    walk_block(stmt.orelse)
                elif isinstance(stmt, (ast.With, ast.Try)):
                    for item in getattr(stmt, "items", []):
                        count_loads(item.context_expr)
                    walk_block(stmt.body)
                    for h in getattr(stmt, "handlers", []):
                        walk_block(h.body)
                    walk_block(getattr(stmt, "finalbody", []))
                elif isinstance(stmt, ast.FunctionDef):
                    walk_block(stmt.body)  # closures consume outer frames
                else:
                    count_loads(stmt)

        walk_block(fn.body)

        for (var, line), n in uses.items():
            if n < 2:
                continue
            rhs = assigns.get(var, {}).get(line, "")
            # only shuffle/expansion subtrees pay the re-run tax
            if not any(e in rhs for e in EXPENSIVE):
                continue
            if _is_persisted(var, rhs, body_src):
                continue
            if (fname, fn.name, var) in ALLOW:
                continue
            flags.append(Flag(fname, fn.name, var, line, n))
    return flags


def _is_persisted(var: str, rhs: str, body_src: str) -> bool:
    if any(p in rhs for p in PERSISTERS):
        return True
    # word-boundary match: a bare substring test would let `sig` ride on
    # `base_sig.persist(` and silently pass an unpersisted frame
    import re

    pat = re.compile(
        rf"(?<![\w.]){re.escape(var)}\.(persist|localCheckpoint|cache)\("
    )
    # the F.persist(var)-style form needs the same word boundary: a bare
    # f"persist({var}" substring would let var='sig' ride on
    # 'persist(sig_full)' and hide an unpersisted frame
    return bool(pat.search(body_src)) or bool(
        re.search(rf"persist\({re.escape(var)}\b", body_src)
    )


def main() -> int:
    flags: list[Flag] = []
    for path in sorted(glob.glob(QUERY_GLOB)):
        flags.extend(audit_file(path))
    if not flags:
        print("multi-consumer audit clean: every fan-out frame is "
              "persisted, leaf-cheap, or allowlisted")
        return 0
    print(f"{len(flags)} unpersisted multi-consumer frame(s):")
    for f in sorted(flags, key=lambda f: (f.file, f.func, f.line)):
        print(f"  {f.file}:{f.line} {f.func}(): '{f.var}' consumed "
              f"{f.uses}x — persist it, or allowlist with a reason")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
