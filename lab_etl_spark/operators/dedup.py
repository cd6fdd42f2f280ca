"""Distributed text-dedup operators: shingling, exact Jaccard via inverted
index, and MinHash + banded LSH for the 100 TB path.

Design notes for scale:
  * Shingling is embarrassingly parallel (per-row `transform` over the word
    array — stays in whole-stage codegen, no Python).
  * Exact Jaccard joins on the *shingle* (inverted index), so only documents
    sharing at least one shingle meet — never the n² cross product.  Hot
    shingles are the skew risk; AQE skew-join splitting handles moderate skew,
    and `max_shingle_freq` drops stop-shingles (a standard trick: a shingle
    shared by thousands of docs carries ~no Jaccard signal but dominates the
    join fan-out).
  * MinHash+LSH replaces the pair join with an O(docs × bands) bucket
    shuffle; exact Jaccard then verifies only the candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# trim + collapse internal whitespace + lowercase; identical regex semantics
# exist in DuckDB for the oracle side (see queries/dedup.py).
NORMALIZE_SQL = "lower(regexp_replace(trim(text), '\\\\s+', ' '))"


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per document.

    Docs shorter than ``n`` words produce no shingles (matches the oracle's
    empty generate_series).
    """
    norm = f"lower(regexp_replace(trim({text_col}), '\\\\s+', ' '))"
    words = F.split(F.expr(norm), " ")
    shingles = F.expr(
        f"transform(sequence(1, size(_w) - {n - 1}),"
        f" i -> concat_ws(' ', slice(_w, i, {n})))"
    )
    return (
        docs.select("doc_id", words.alias("_w"))
        .filter(F.size("_w") >= n)
        .select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def shingle_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs (doc_a < doc_b, jaccard >= threshold).

    Columns: doc_a, doc_b, jaccard (rounded to 6 for cross-engine hashing).
    """
    sh = word_shingles(docs, n)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
        sh = (
            sh.join(freq.filter(F.col("_f") <= max_shingle_freq), "shingle", "left_semi")
        )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    ``vertices``: one row per node (column ``id_col``); ``edges``: undirected
    pairs (``src``, ``dst``).  Returns (``id_col``, ``component``) where
    ``component`` is the smallest node id in the node's component — the
    canonical deterministic labeling, so results are engine-comparable
    (DuckDB oracle: recursive-CTE reachability + MIN).

    Scale design: each round is one join + hash-aggregate shuffled on the
    node id; rounds needed = graph diameter (near-dup clusters are shallow —
    single digits).  ``localCheckpoint`` truncates lineage each round so the
    plan doesn't grow with iterations (the classic iterative-Spark failure
    mode), and the convergence probe reads a 1-row count, not the data.
    For graphs with whale components, swap the propagation step for
    large-star/small-star; the loop shell stays the same.
    """
    sym = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .unionAll(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
        .distinct()
        .localCheckpoint()
    )
    # Only edge-touched vertices can ever change label; iterate over that
    # subgraph only (in a real corpus non-duplicate docs dominate, so this
    # shrinks every round's join from |corpus| to |dup-graph| rows) and
    # union the untouched vertices back as self-labeled singletons at the
    # end.  Round zero is folded into initialization: label = min(self,
    # neighbors) directly — for the dominant 2-node-cluster case that is
    # already the fixpoint, so the loop only runs confirmation rounds.
    labels = (
        sym.groupBy("_s")
        .agg(F.least(F.min("_d"), F.first("_s")).alias("component"))
        .select(F.col("_s").alias("_id"), "component")
        .localCheckpoint()
    )
    changed = 1
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym._d == labels._id)
            .groupBy("_s")
            .agg(F.min("component").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels._id == nbr_min._s, "left")
            .select(
                "_id",
                F.least(
                    "component", F.coalesce("_nbr_min", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "_old"), "_id")
            .filter(F.col("component") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # A silent wrong answer is worse than a loud one: a component with
        # diameter > max_iter would otherwise emit split clusters.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (diameter exceeds the round budget)"
        )
    all_labeled = vertices.select(F.col(id_col).alias("_id")).join(
        labels, "_id", "left"
    )
    return all_labeled.select(
        F.col("_id").alias(id_col),
        F.coalesce("component", "_id").alias("component"),
    )


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "a",
    dst: str = "b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond" —
    public algorithm).

    Same contract as :func:`connected_components` (component = min node id),
    but converges in O(log n) rounds *regardless of graph diameter* — the
    whale-component regime where min-label propagation needs
    diameter-many rounds.  Each round is two join+aggregate passes over the
    edge set; edges only ever rewire toward smaller ids, so the edge count
    never grows beyond the symmetrized input.

      * large-star: every node u links each strictly-larger neighbor to
        m = min(N(u) ∪ {u});
      * small-star: orient edges toward the smaller endpoint, then link
        each ≤-neighbor (and u itself) to the minimum.

    Convergence = edge-set fixpoint, detected with an order-independent
    (count, xor-of-hashes) fingerprint — one tiny aggregate per round, no
    driver-side edge materialization.
    """

    def dedup(df: DataFrame) -> DataFrame:
        return df.filter(F.col("_u") != F.col("_v")).distinct()

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionAll(e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v")))
        m = sym.groupBy("_u").agg(
            F.least(F.min("_v"), F.first("_u")).alias("_m")
        )
        return dedup(
            sym.join(m, "_u")
            .filter(F.col("_v") > F.col("_u"))
            .select(F.col("_v").alias("_u"), F.col("_m").alias("_v"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        oriented = e.select(
            F.greatest("_u", "_v").alias("_u"), F.least("_u", "_v").alias("_v")
        )
        m = oriented.groupBy("_u").agg(F.min("_v").alias("_m"))
        children = oriented.join(m, "_u").select(
            F.col("_v").alias("_u"), F.col("_m").alias("_v")
        )
        centers = m.select(F.col("_u"), F.col("_m").alias("_v"))
        return dedup(children.unionAll(centers))

    def fingerprint(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(_u, _v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    cur = dedup(
        edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    ).localCheckpoint()
    prev_fp = None
    for _ in range(max_iter):
        cur = small_star(large_star(cur)).localCheckpoint()
        fp = fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # At fixpoint every edge is (node, component-min); roots appear only on
    # the right side.  groupBy guards against any residual multi-parent row.
    labels = cur.groupBy("_u").agg(F.min("_v").alias("component"))
    return (
        vertices.select(F.col(id_col).alias("_u"))
        .join(labels, "_u", "left")
        .select(
            F.col("_u").alias(id_col),
            F.coalesce("component", "_u").alias("component"),
        )
    )


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """(doc_id, h0..h{k-1}) MinHash signature via seeded xxhash64.

    One hash-aggregate over the shingle stream computes all k permutations
    (k min() aggs), so signature cost is a single shuffle on doc_id.
    """
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified with exact Jaccard.

    Pipeline: shingle → signature (1 shuffle) → band buckets (1 shuffle) →
    bucket self-join (candidates only) → exact-Jaccard verify restricted to
    candidates.  Columns: doc_a, doc_b, jaccard.
    """
    rows_per_band = num_hashes // bands
    sh = word_shingles(docs, n)
    sig = minhash_signatures(sh, num_hashes)

    # One posexplode pass emits every band key (a bands-way union would
    # recompute the signature aggregation once per branch).
    band_keys = F.array(
        *[
            F.xxhash64(
                *[
                    F.col(f"h{b * rows_per_band + k}")
                    for k in range(rows_per_band)
                ]
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select(
        "doc_id", F.posexplode(band_keys).alias("band", "bkey")
    )

    x = buckets.alias("x")
    y = buckets.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )

    # Exact verify on candidates only: semi-join the shingle stream down to
    # candidate docs, then compute true Jaccard for candidate pairs.
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionAll(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_c = sh.join(cand_docs, "doc_id", "left_semi")
    sizes = sh_c.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    a = sh_c.alias("a")
    b2 = sh_c.alias("b")
    common = (
        a.join(
            b2,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(cand, ["doc_a", "doc_b"], "left_semi")
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
