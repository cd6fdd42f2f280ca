"""Similarity-search queries over the ``embeddings`` table (SURVEY.md §2B)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.similarity import (
    _finite_norm,
    cosine_topk,
    cosine_topk_blocked,
    embedding_quality_census,
    ivf_topk_lsh,
    spread_for_compute,
)
from . import register
from .exact import davg

# DuckDB mirrors of the Spark-side sequential folds (list_reduce is
# left-to-right, matching Spark's `aggregate`).
_DOT_DUCK = (
    "list_reduce(list_transform(generate_series(1, len({a})),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (p, q) -> p + q)"
)
_SQNORM_DUCK = (
    "list_reduce(list_transform({v},"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q)"
)
#: DuckDB admission predicate over a computed norm column — the oracle twin
#: of operators/similarity._finite_norm.  Centralized (like _SQNORM_DUCK)
#: so the rule can't drift between the oracle's census sites when the
#: Spark-side admission test next changes.
_ADMIT_DUCK = "{n} IS NOT NULL AND isfinite({n}) AND {n} > 0"


@register(
    "q_similarity_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             ROUND({_DOT_DUCK.format(a='q.embedding', b='e.embedding')}
                   / (SQRT({_SQNORM_DUCK.format(v='q.embedding')})
                      * SQRT({_SQNORM_DUCK.format(v='e.embedding')})), 6) AS cosine
      FROM q, embeddings e
      WHERE e.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored WHERE isfinite(cosine)
    ) WHERE rk <= 5
    """,
    doc="Brute-force exact cosine top-5 for 8 query vectors: broadcast "
    "queries, single corpus scan, ranked-window reduce.",
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(em.filter(F.col("vec_id") < 8), em, k=5)


@register(
    "q_similarity_blocked",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 16),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             ROUND({_DOT_DUCK.format(a='q.embedding', b='e.embedding')}
                   / (SQRT({_SQNORM_DUCK.format(v='q.embedding')})
                      * SQRT({_SQNORM_DUCK.format(v='e.embedding')})), 6) AS cosine
      FROM q JOIN embeddings e
        ON e.label = q.label AND e.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored WHERE isfinite(cosine)
    ) WHERE rk <= 3
    """,
    doc="IVF-style blocked ANN: score only same-label (coarse cell) pairs — "
    "the bounded-shuffle scale path for similarity search.",
)
def q_similarity_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_blocked(em.filter(F.col("vec_id") < 16), em, k=3)


def _ivf_lsh_oracle(nbits: int = 6, n_probe: int = 3, k: int = 5) -> str:
    from ..operators.similarity import lsh_bucket_duck

    cell = lsh_bucket_duck(nbits)
    return f"""
    WITH ec AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT vec_id, embedding, {cell} AS cell,
               sqrt(list_reduce(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 (p, q) -> p + q)) AS nrm
        FROM embeddings
      ) WHERE isfinite(nrm) AND nrm > 0
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS q_emb, cell AS q_cell
      FROM ec WHERE vec_id < 8
    ),
    cells AS (SELECT DISTINCT cell FROM ec),
    probes AS (
      SELECT query_id, q_emb, cell FROM (
        SELECT q.query_id, q.q_emb, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY bit_count(xor(q.q_cell, c.cell)), c.cell) AS crk
        FROM q, cells c
      ) WHERE crk <= {n_probe}
    ),
    scored AS (
      SELECT p.query_id, e.vec_id AS neighbor_id,
             ROUND({_DOT_DUCK.format(a='p.q_emb', b='e.embedding')}
                   / (SQRT({_SQNORM_DUCK.format(v='p.q_emb')})
                      * SQRT({_SQNORM_DUCK.format(v='e.embedding')})), 6)
               AS cosine
      FROM probes p JOIN ec e
        ON e.cell = p.cell AND e.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored WHERE isfinite(cosine)
    ) WHERE rk <= {k}
    """


@register(
    "q_similarity_ivf",
    oracle=_ivf_lsh_oracle(),
    doc="IVF ANN with a training-free portable coarse quantizer: "
    "hyperplane-LSH cells (6 sign bits, integer prime-mixed planes — the "
    "same family as q_embedding_lsh) partition the corpus; each query "
    "probes the n_probe=3 occupied cells nearest by Hamming distance to "
    "its own signature and brute-forces only inside them.  Deterministic "
    "and engine-reproducible, so unlike the learned k-means variant "
    "(operators/similarity.ivf_topk, exactness pinned by "
    "tests/test_similarity_ivf.py) this is full-value-checked against the "
    "DuckDB oracle.  Scored pairs ~ |Q| * n_probe/2^nbits * |corpus|; the "
    "cell list and probe table stay broadcast-small at any corpus size.",
)
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return ivf_topk_lsh(
        em.filter(F.col("vec_id") < 8), em, k=5, nbits=6, n_probe=3
    )


@register(
    "q_embedding_lsh",
    priority=1,
    oracle="""
    WITH sig AS (
      SELECT vec_id,
             list_reduce(list_transform(generate_series(1, 16), h ->
               CASE WHEN list_reduce(list_transform(
                        generate_series(1, len(embedding)),
                        d -> CAST(embedding[d] AS DOUBLE)
                             * CAST(((h * 7919 + d * 104729) % 2003) - 1001
                                    AS DOUBLE)),
                      (p, q) -> p + q) > 0
                    THEN CAST(pow(2, h - 1) AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END),
               (p, q) -> p + q) AS bucket
      FROM embeddings
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST((COUNT(*) * (COUNT(*) - 1)) // 2 AS BIGINT) AS n_cand_pairs,
           MIN(vec_id) AS min_vec_id
    FROM sig GROUP BY bucket
    """,
    doc="Random-hyperplane LSH bucketing (cosine SimHash for vectors): "
    "16 sign bits per vector from integer prime-mixed hyperplane weights "
    "(portable — no RNG, both engines rebuild the exact same planes "
    "inline), packed into a bucket id, then per-bucket candidate stats.  "
    "The training-free blocking pass for embedding near-dup at 100 TB: "
    "one scan computing 16x64 fused multiply-adds per row in codegen, one "
    "shuffle on bucket — candidate verification then touches only "
    "same-bucket pairs (sum n_i^2), never the n^2 cross join.  Unlike IVF "
    "it needs no k-means fit, so it composes with streaming ingest.  "
    "Sequential fold (aggregate <-> list_reduce) keeps the double dot "
    "product bit-identical cross-engine, so even near-zero margins hash "
    "to the same side.",
)
def q_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    bits = (
        "transform(sequence(1, 16), h -> CASE WHEN "
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
        "transform(sequence(1, size(embedding)), "
        "d -> CAST(pmod(h * 7919 + d * 104729, 2003) - 1001 AS DOUBLE)), "
        "(a, b) -> a * b), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) > 0 "
        "THEN shiftleft(CAST(1 AS BIGINT), h - 1) ELSE CAST(0 AS BIGINT) "
        "END)"
    )
    sig = em.select(
        "vec_id",
        F.expr(
            f"aggregate({bits}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("bucket"),
    )
    n = F.count(F.lit(1))
    return sig.groupBy("bucket").agg(
        n.alias("n_vecs"),
        F.expr("CAST((COUNT(1) * (COUNT(1) - 1)) DIV 2 AS BIGINT)").alias(
            "n_cand_pairs"
        ),
        F.min("vec_id").alias("min_vec_id"),
    )


@register(
    "q_embedding_stats",
    priority=1,
    oracle=f"""
    WITH e AS (
      SELECT UNNEST(list_transform(generate_series(1, len(embedding)),
                    i -> struct_pack(dim := i - 1,
                                     val := CAST(embedding[i] AS DOUBLE))))
               AS s
      FROM embeddings
    )
    SELECT s.dim AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           {davg('s.val')} AS avg_val,
           ROUND(MIN(s.val), 6) AS min_val,
           ROUND(MAX(s.val), 6) AS max_val
    FROM e
    GROUP BY s.dim
    """,
    doc="Vector-column profiling: per-dimension count/mean/min/max over the "
    "embedding table (posexplode -> one hash aggregation on the dimension "
    "index; decimal-exact mean for cross-engine parity).  The sanity check "
    "run before any ANN indexing job — dead or exploding dimensions show "
    "up here, not after a cluster-day of index building.",
)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    ex = em.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "val"
        )
    )
    return ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(davg("val")).alias("avg_val"),
        F.round(F.min("val"), 6).alias("min_val"),
        F.round(F.max("val"), 6).alias("max_val"),
    )


@register(
    "q_embedding_quality",
    priority=1,
    oracle=f"""
    WITH n AS (
      SELECT label,
             SQRT({_SQNORM_DUCK.format(v='embedding')}) AS nrm
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN {_ADMIT_DUCK.format(n='nrm')}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
           CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_norm,
           CAST(SUM(CASE WHEN nrm IS NULL OR NOT isfinite(nrm)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
           ROUND(MIN(CASE WHEN {_ADMIT_DUCK.format(n='nrm')}
                          THEN nrm END), 6) AS min_norm,
           ROUND(MAX(CASE WHEN {_ADMIT_DUCK.format(n='nrm')}
                          THEN nrm END), 6) AS max_norm
    FROM n GROUP BY label
    """,
    doc="Embedding admission census per coarse block: how many vectors the "
    "similarity/dedup family would ADMIT (finite norm > 0, the exact "
    "per-side test operators/similarity._finite_norm applies) vs zero-norm "
    "(empty docs, padding rows) and NaN/Inf/NULL casualties, plus the "
    "admitted norm range.  The pre-flight a production pipeline runs "
    "before spending a cluster-day on dedup or ANN indexing — one corpus "
    "map pass, one hash aggregation, |labels|-row readout.  Norm folds are "
    "sequential (aggregate <-> list_reduce) and SQRT is IEEE "
    "correctly-rounded, so both engines census identically; dirty-input "
    "behavior is pinned by tests/test_nan_robustness.py.",
)
def q_embedding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return embedding_quality_census(em, by="label")


@register(
    "q_embedding_quantize",
    oracle="""
    WITH scaled AS (
      SELECT vec_id, label, embedding,
             list_reduce(list_transform(embedding,
                         v -> abs(CAST(v AS DOUBLE))),
                         (p, c) -> greatest(p, c)) AS sc
      FROM embeddings
    )
    SELECT vec_id, label,
           ROUND(sc, 6) AS scale,
           ROUND(list_reduce(list_transform(embedding, v ->
                   (CAST(v AS DOUBLE)
                    - FLOOR(CAST(v AS DOUBLE) / sc * 127.0 + 0.5)
                      * sc / 127.0)
                   * (CAST(v AS DOUBLE)
                      - FLOOR(CAST(v AS DOUBLE) / sc * 127.0 + 0.5)
                        * sc / 127.0)),
                 (p, c) -> p + c) / len(embedding), 9) AS mse
    FROM scaled
    WHERE sc > 0
    """,
    doc="INT8 embedding quantization audit — the vector-store compression "
    "step of every retrieval pipeline: per-vector symmetric scale "
    "(max |x|), code = floor(x/scale·127 + 0.5) (explicit half-up floor, "
    "identical in both engines — ROUND's tie behavior is not), and the "
    "reconstruction MSE of decode(code) against the original, computed "
    "as a sequential left-to-right fold so both engines produce the "
    "same double bit-for-bit.  Map-only: no shuffle at any corpus size; "
    "4x storage reduction quantified per vector instead of assumed.",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    term = (
        "(CAST(v AS DOUBLE)"
        " - FLOOR(CAST(v AS DOUBLE) / sc * 127.0 + 0.5) * sc / 127.0)"
    )
    return (
        em.withColumn(
            "sc",
            F.expr(
                "aggregate(embedding, CAST(0.0 AS DOUBLE),"
                " (p, v) -> greatest(p, abs(CAST(v AS DOUBLE))))"
            ),
        )
        .filter(F.col("sc") > 0)
        .select(
            "vec_id",
            "label",
            F.round("sc", 6).alias("scale"),
            F.round(
                F.expr(
                    f"aggregate(embedding, CAST(0.0 AS DOUBLE),"
                    f" (p, v) -> p + {term} * {term})"
                )
                / F.size("embedding"),
                9,
            ).alias("mse"),
        )
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection
# ---------------------------------------------------------------------------

RP_DIMS = 8
RP_EMB_DIM = 64  # embeddings.embedding length in the driver corpus


def _rp_signs(j: int) -> list[float]:
    """±1 Achlioptas row j, derived ONCE at plan-build time from the same
    md5 the runtime would use (hashlib.md5 == Spark MD5 == DuckDB MD5), so
    the matrix ships as 64 literal doubles per output dim instead of
    re-hashing per element per row — the sign table is (i, j)-only, and
    keeping hashes out of the row path cut the sf0.1 bench ~3x."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()[0], 16) % 2
        == 0
        else -1.0
        for i in range(1, RP_EMB_DIM + 1)
    ]


def _rp_proj_spark(j: int) -> str:
    """Sequential left-to-right fold: out_j = sum_i emb[i] * sign(i, j)."""
    arr = ", ".join(f"{s}D" for s in _rp_signs(j))
    return (
        f"aggregate(zip_with(embedding, array({arr}),"
        " (x, s) -> CAST(x AS DOUBLE) * s),"
        " CAST(0 AS DOUBLE), (p, q) -> p + q)"
    )


def _rp_proj_duck(j: int) -> str:
    arr = ", ".join(str(s) for s in _rp_signs(j))
    return (
        f"list_reduce(list_transform(generate_series(1, {RP_EMB_DIM}),"
        f" i -> CAST(embedding[i] AS DOUBLE) * ([{arr}])[i]),"
        " (p, q) -> p + q)"
    )


_RP_READOUT = (
    f"ROUND((sq_proj / {RP_DIMS}.0) / sq_orig, 6) AS norm_ratio"
)

#: Spark twin of _SQNORM_DUCK — the same sequential left-to-right fold
_SQNORM_SPARK = (
    "aggregate(transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " CAST(0 AS DOUBLE), (p, q) -> p + q)"
)


@register(
    "q_random_projection",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id,
             {_SQNORM_DUCK.format(v='embedding')} AS sq_orig,
             {" + ".join(
                 f"POW({_rp_proj_duck(j)}, 2)" for j in range(RP_DIMS)
             )} AS sq_proj,
             ROUND({_rp_proj_duck(0)}, 6) AS p0,
             ROUND({_rp_proj_duck(1)}, 6) AS p1
      FROM embeddings
    )
    SELECT vec_id, p0, p1, {_RP_READOUT}
    FROM proj ORDER BY vec_id
    """,
    doc=f"Johnson-Lindenstrauss sketching: every 64-dim embedding is "
    f"projected to {RP_DIMS} dims through a ±1 Achlioptas matrix derived "
    "from md5 (no trained projection — the hash IS the matrix, derived "
    "once at plan build and inlined as literals, the same trick that "
    "makes the hyperplane-LSH quantizer training-free).  Map-only per "
    "row: each output dim is one "
    "sequential fold over the vector (Spark aggregate ↔ DuckDB "
    "list_reduce, both left-to-right, so doubles match bit-for-bit); "
    "norm_ratio = |Px|²/(J·|x|²) exposes the JL distortion that a "
    "downstream ANN index would inherit.  At 100 TB this is the "
    "standard first move to shrink petabyte embedding stores before "
    "clustering/dedup, and it needs zero shuffles.",
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    proj = em.selectExpr(
        "vec_id",
        f"{_SQNORM_SPARK.format(v='embedding')} AS sq_orig",
        " + ".join(f"POW({_rp_proj_spark(j)}, 2)" for j in range(RP_DIMS))
        + " AS sq_proj",
        f"ROUND({_rp_proj_spark(0)}, 6) AS p0",
        f"ROUND({_rp_proj_spark(1)}, 6) AS p1",
    )
    return proj.selectExpr(
        "vec_id", "p0", "p1", _RP_READOUT
    ).orderBy("vec_id")


# -- q_kmeans_lloyd ----------------------------------------------------------

KM_K = 4  #: clusters, seeded from vec_id 0..K-1 (deterministic)
KM_DIM = 64  #: embedding dimensionality (fixed across the corpus)

#: squared-L2 fold — Spark form lives in operators/similarity.py
#: KM_DIST_FOLD (sequential aggregate over zip_with, left-to-right from
#: 0.0; IEEE 0.0 + x == x, so it matches DuckDB's init-less list_reduce
#: bit-for-bit).  The DuckDB twin:
_KM_DIST_DUCK = (
    f"list_reduce(list_transform(generate_series(1, {KM_DIM}),"
    " i -> (p.v[i] - c.c[i]) * (p.v[i] - c.c[i])), (acc, t) -> acc + t)"
)
#: exact per-dimension mean: decimal-exact sum (order-independent) and ONE
#: deterministic double division — identical text both engines.
_KM_MEAN = "CAST(SUM(CAST((x) AS DECIMAL(30,12))) AS DOUBLE) / COUNT(x)"
_KM_WCSS = "ROUND(CAST(SUM(CAST((dist) AS DECIMAL(30,12))) AS DOUBLE), 6)"


@register(
    "q_kmeans_lloyd",
    oracle=f"""
WITH pts AS (
      SELECT vec_id, v FROM (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_reduce(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 (p, q) -> p + q)) AS nrm
        FROM embeddings
      ) WHERE isfinite(nrm) AND nrm > 0
    ),
    c0 AS (SELECT vec_id AS cid, v AS c FROM pts WHERE vec_id < {KM_K}),
    s1 AS (
      SELECT p.vec_id, p.v, c.cid, {_KM_DIST_DUCK} AS dist
      FROM pts p CROSS JOIN c0 c
    ),
    a1 AS (
      SELECT vec_id, v, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cid) AS rn
        FROM s1
      ) WHERE rn = 1
    ),
    dims AS (
      SELECT cid, i AS pos, v[i] AS x
      FROM a1, generate_series(1, {KM_DIM}) g(i)
    ),
    cm AS (SELECT cid, pos, {_KM_MEAN} AS m FROM dims GROUP BY cid, pos),
    c1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM cm GROUP BY cid),
    s2 AS (
      SELECT p.vec_id, c.cid, {_KM_DIST_DUCK} AS dist
      FROM pts p CROSS JOIN c1 c
    ),
    a2 AS (
      SELECT vec_id, cid, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cid) AS rn
        FROM s2
      ) WHERE rn = 1
    )
    SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_points,
           {_KM_WCSS} AS wcss
    FROM a2 GROUP BY cid ORDER BY cid
    """,
    doc="Distributed k-means, two unrolled Lloyd iterations, value-checked "
    "end-to-end (clustering is usually waved through as 'approximate'; "
    "here every intermediate is deterministic so DuckDB replays the "
    "IDENTICAL algorithm and the final assignment counts and WCSS match "
    "bit-for-bit).  Design: centroids collapse to a one-row BROADCAST "
    "array — assignment is a map-only fold per point (sequential "
    "aggregate<->list_reduce, bit-identical), never a shuffle of the "
    "points; argmin via array_min whose struct ordering IS the oracle's "
    "(dist, cid) row_number tie-break; the centroid update "
    "is a posexplode to (cid, dim) cells with EXACT-decimal per-dim "
    "means (order-independent under hash aggregation, one deterministic "
    "double division), rebuilt into arrays by sorted collect.  Per "
    "iteration: one map-only scoring pass + one |K*dim| aggregate — the "
    "canonical 100 TB k-means schedule (points never move, centroids "
    "do).  Empty clusters drop out (standard Lloyd); seeding is the "
    "first K vec_ids, so the whole run is reproducible.",
)
def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread_for_compute(
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("v")
        )
        # admission gate, mirrored by the oracle's gated pts CTE: a
        # NaN/Inf component diverges across engines inside the
        # DECIMAL-exact centroid means (Spark ANSI CAST(NaN AS DECIMAL)
        # -> NULL; DuckDB throws)
        .withColumn("_nrm", F.expr(f"SQRT({_SQNORM_SPARK.format(v='v')})"))
        .filter(_finite_norm(F.col("_nrm")))
        .drop("_nrm")
    ).persist()  # points are scanned once per Lloyd pass + seeding; caching
    # the point set is the canonical k-means schedule (Spark ML does the
    # same) — MEMORY_AND_DISK spill covers the 100 TB case
    c0 = emb.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )

    def assign(cents: DataFrame) -> DataFrame:
        # argmin as a map-only fold over a broadcast one-row centroid
        # array: array_min's struct ordering IS the (dist, cid)
        # tie-break, same winner bit-for-bit as the oracle's row_number
        # formulation — but the points are never multiplied x K nor
        # shuffled through a vec_id window (the kmeans_cells shape,
        # operators/similarity.py round-9)
        from ..operators.similarity import KM_DIST_FOLD

        carr = cents.agg(F.expr("collect_list(struct(cid, c))").alias("cs"))
        dist_s = KM_DIST_FOLD.format(c="s.c")
        return (
            emb.crossJoin(F.broadcast(carr))
            .withColumn(
                "_best",
                F.expr(
                    f"array_min(transform(cs,"
                    f" s -> struct({dist_s} AS dist, s.cid AS cid)))"
                ),
            )
            # empty seed set (no vec_id < K): cs is an empty array,
            # array_min -> NULL; dropping those rows preserves the old
            # crossJoin-with-zero-centroid-rows result (empty), which is
            # also what the oracle's row_number formulation yields
            .filter(F.col("_best").isNotNull())
            .select(
                "vec_id",
                "v",
                F.col("_best.cid").alias("cid"),
                F.col("_best.dist").alias("dist"),
            )
        )

    a1 = assign(c0)
    dims = a1.select(
        "cid", F.posexplode("v").alias("pos0", "x")
    ).select("cid", (F.col("pos0") + 1).alias("pos"), "x")
    cm = dims.groupBy("cid", "pos").agg(F.expr(_KM_MEAN).alias("m"))
    c1 = cm.groupBy("cid").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
        ).alias("c")
    )
    a2 = assign(c1)
    return (
        a2.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.expr(_KM_WCSS).alias("wcss"),
        )
        .orderBy("cluster_id")
    )


# -- q_rrf_fusion ------------------------------------------------------------

RRF_K = 60  #: the standard reciprocal-rank-fusion damping constant
RRF_TOPN = 100  #: per-ranker candidate list length fused


@register(
    "q_rrf_fusion",
    oracle=None,  # composed below once text.py's BM25 oracle is loaded
    doc="Hybrid-retrieval reciprocal-rank fusion — the capstone that "
    "COMPOSES two existing rankers: the BM25 lexical scorer (q_bm25, "
    "fixed query terms) and the exact cosine semantic ranker "
    "(operators/similarity.py cosine_topk, query = embedding 0, doc_id "
    "keyed by vec_id), fused as sum of 1/(60 + rank) — the standard "
    "RAG hybrid-search primitive.  Scale shape: each ranker reduces to "
    f"its top-{RRF_TOPN} list FIRST (BM25 via TakeOrderedAndProject "
    "per-partition heaps; cosine via the query-keyed ranked window), so "
    "ranking and fusion happen on two CONSTANT-SIZE lists — the corpus "
    "is scanned once per ranker and never globally sorted (fusing full "
    "rankings is the textbook mistake; production fuses top-K lists).  "
    "Determinism: both scores are bit-stable cross-engine (shared "
    "fold/readout text), ranks tie-break on doc_id, and the RRF sum is "
    "two exact double divisions added in fixed written order.",
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from .text import q_bm25

    lex_top = (
        q_bm25(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RRF_TOPN)
    )
    # rank within the constant-size top list (RRF_TOPN rows by
    # construction — see _SINGLE_PARTITION_OK)
    lex = lex_top.withColumn(
        "lex_rank",
        F.row_number().over(W.orderBy(F.desc("bm25"), F.asc("doc_id"))),
    ).select("doc_id", "lex_rank")

    em = load_table(spark, sf_dir, "embeddings")
    sem = (
        cosine_topk(em.filter(F.col("vec_id") == 0), em, k=RRF_TOPN)
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("rk").alias("sem_rank"),
        )
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .selectExpr(
            "doc_id",
            "lex_rank",
            "sem_rank",
            # CAST(1.0 AS DOUBLE): a bare 1.0 literal is DECIMAL(2,1) in
            # Spark SQL, which makes the division decimal and the rrf column
            # DECIMAL(9,6) — the DuckDB oracle returns DOUBLE, so the driver
            # value-hash would mismatch on identical values.
            # raw sum of two IEEE divisions — no ROUND: 1/(60+a)+1/(60+b)
            # is a rational whose reduced denominator can take the exact
            # 2^7*5^j half-boundary form (e.g. ranks 68 and 65 give
            # 253/16000 = 15812.5 microunits), the rational-ROUND trap
            f"COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + lex_rank), 0.0)"
            f" + COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + sem_rank), 0.0)"
            " AS rrf",
        )
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(20)


def _wire_rrf_oracle() -> None:
    from . import REGISTRY

    bm25_oracle = REGISTRY["q_bm25"].oracle
    cos = (
        _DOT_DUCK.format(a="q.embedding", b="e.embedding")
        + " / (SQRT("
        + _SQNORM_DUCK.format(v="q.embedding")
        + ") * SQRT("
        + _SQNORM_DUCK.format(v="e.embedding")
        + "))"
    )
    REGISTRY["q_rrf_fusion"].oracle = f"""
    WITH lex_top AS (
      SELECT doc_id, bm25 FROM ({bm25_oracle})
      ORDER BY bm25 DESC, doc_id LIMIT {RRF_TOPN}
    ),
    lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id)
               AS lex_rank
      FROM lex_top
    ),
    q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id AS doc_id, ROUND({cos}, 6) AS cosine
      FROM q, embeddings e WHERE e.vec_id <> 0
    ),
    sem AS (
      SELECT doc_id, rk AS sem_rank FROM (
        SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rk
        FROM scored WHERE isfinite(cosine)
      ) WHERE rk <= {RRF_TOPN}
    )
    SELECT doc_id, lex_rank, sem_rank,
           COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + lex_rank), 0.0)
                 + COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + sem_rank), 0.0)
             AS rrf
    FROM lex FULL OUTER JOIN sem USING (doc_id)
    ORDER BY rrf DESC, doc_id LIMIT 20
    """


# called from queries/text.py once q_bm25 is registered (text.py loads
# after this module in load_all's import order)


# -- q_pq_adc ----------------------------------------------------------------

PQ_M = 4        #: subspaces (64-dim vectors -> 4 x 16-dim subvectors)
PQ_SUB = 16     #: dims per subspace
PQ_K = 8        #: codewords per subspace, seeded from vec_id 0..K-1
PQ_TOPK = 10

#: squared L2 between a point subvector and a codeword — sequential fold,
#: bit-identical across engines (aggregate <-> list_reduce precedent).
_PQ_DIST_SPARK = (
    "aggregate(zip_with(sv, c, (x, y) -> (x - y) * (x - y)),"
    " CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
)
_PQ_DIST_DUCK = (
    f"list_reduce(list_transform(generate_series(1, {PQ_SUB}),"
    " i -> ({s}.sv[i] - {c}.c[i]) * ({s}.sv[i] - {c}.c[i])),"
    " (acc, t) -> acc + t)"
)
#: ADC readout: 4 per-subspace LUT distances summed exactly, one rounding.
_PQ_ADC = "ROUND(CAST(SUM(CAST((qdist) AS DECIMAL(30,12))) AS DOUBLE), 6)"


@register(
    "q_pq_adc",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id, v FROM (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_reduce(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 (p, q) -> p + q)) AS nrm
        FROM embeddings
      ) WHERE isfinite(nrm) AND nrm > 0
    ),
    sub AS (
      SELECT vec_id, g.m,
             list_transform(generate_series(1, {PQ_SUB}),
                            i -> v[g.m * {PQ_SUB} + i]) AS sv
      FROM pts, generate_series(0, {PQ_M - 1}) g(m)
    ),
    cb AS (SELECT m, vec_id AS cid, sv AS c FROM sub WHERE vec_id < {PQ_K}),
    enc AS (
      SELECT vec_id, m, cid FROM (
        SELECT s.vec_id, s.m, cb.cid,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.m
                 ORDER BY {_PQ_DIST_DUCK.format(s='s', c='cb')}, cb.cid
               ) AS rn
        FROM sub s JOIN cb ON s.m = cb.m
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT cb.m, cb.cid,
             {_PQ_DIST_DUCK.format(s='q', c='cb')} AS qdist
      FROM (SELECT m, sv FROM sub WHERE vec_id = 0) q
      JOIN cb ON q.m = cb.m
    )
    SELECT vec_id AS neighbor_id, adc, rk FROM (
      SELECT e.vec_id, {_PQ_ADC} AS adc,
             row_number() OVER (
               ORDER BY {_PQ_ADC}, e.vec_id
             ) AS rk
      FROM enc e JOIN lut ON e.m = lut.m AND e.cid = lut.cid
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id
    ) WHERE rk <= {PQ_TOPK}
    """,
    doc="Product-quantization ANN (the IVF/LSH family's third leg, and "
    "the memory-bound regime's standard answer): vectors split into "
    f"{PQ_M} x {PQ_SUB}-dim subvectors, each encoded as the nearest of "
    f"{PQ_K} data-seeded codewords (argmin with cid tie-break), and the "
    "query answered by ASYMMETRIC DISTANCE — a per-subspace "
    "query-to-codeword lookup table summed over each point's code.  "
    "Deterministic end-to-end (seeded codebooks, sequential-fold "
    "distances, exact-decimal ADC sum), so DuckDB replays the identical "
    "algorithm and values match bit-for-bit.  Scale shape: the codebook "
    f"({PQ_M}x{PQ_K} rows) and the {PQ_M * PQ_K}-entry LUT are "
    "broadcasts; encoding is a subvector explode + broadcast join + "
    "(vec_id, m)-keyed argmin window — codes are 100x smaller than the "
    "vectors, the point of PQ at 100 TB; the ADC readout is one "
    "vec_id-keyed sum and a TakeOrdered top-k.  Codebook TRAINING "
    "composes with q_kmeans_lloyd's broadcast-Lloyd schedule (elided "
    "here: seeds stand in for trained centroids to keep the oracle "
    "one-page).",
)
def q_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    pts = spread_for_compute(
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("v")
        )
        # admission gate, mirrored by the oracle's gated pts CTE (same
        # cross-engine NaN-in-DECIMAL rationale as q_kmeans_lloyd)
        .withColumn("_nrm", F.expr(f"SQRT({_SQNORM_SPARK.format(v='v')})"))
        .filter(_finite_norm(F.col("_nrm")))
        .drop("_nrm")
    )
    # subvector fan-out as explode(sequence) rather than a crossJoin with
    # a broadcast M-row range (round 13): identical (vec_id, m, sv) rows,
    # but the x M expansion runs inside whole-stage codegen instead of a
    # non-codegen BroadcastNestedLoopJoin (guide §4.1 — builtin
    # expressions over join machinery when no join is semantically
    # present).
    sub = pts.select(
        "vec_id",
        F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("m"),
        "v",
    ).select(
        "vec_id",
        "m",
        F.expr(f"slice(v, m * {PQ_SUB} + 1, {PQ_SUB})").alias("sv"),
    )
    cb = (
        sub.filter(F.col("vec_id") < PQ_K)
        .select("m", F.col("vec_id").alias("cid"), F.col("sv").alias("c"))
    )
    # encode = per-(vec_id, m) argmin over the K codewords: the codebook
    # collapses to M broadcast rows each holding its codeword array, and
    # array_min's struct ordering IS the (dist, cid) tie-break — same
    # winner bit-for-bit as the oracle's row_number formulation, without
    # multiplying the subvector stream x K and shuffling it through a
    # window (the kmeans_cells round-9 pattern)
    cba = cb.groupBy("m").agg(
        F.expr("collect_list(struct(cid, c))").alias("cs")
    )
    _pq_dist_s = (
        "aggregate(zip_with(sv, s.c, (x, y) -> (x - y) * (x - y)),"
        " CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    enc = (
        sub.join(F.broadcast(cba), "m")
        .withColumn(
            "_best",
            F.expr(
                f"array_min(transform(cs,"
                f" s -> struct({_pq_dist_s} AS dist, s.cid AS cid)))"
            ),
        )
        .filter(F.col("_best").isNotNull())
        .select("vec_id", "m", F.col("_best.cid").alias("cid"))
    )
    lut = (
        sub.filter(F.col("vec_id") == 0)
        .join(F.broadcast(cb), "m")
        .select("m", "cid", F.expr(_PQ_DIST_SPARK).alias("qdist"))
    )
    adc = (
        enc.filter(F.col("vec_id") != 0)
        .join(F.broadcast(lut), ["m", "cid"])
        .groupBy("vec_id")
        .agg(F.expr(_PQ_ADC).alias("adc"))
    )
    # top-k FIRST via TakeOrderedAndProject (scale-safe: per-partition
    # heaps, never a global sort), THEN rank the constant-size result —
    # see _SINGLE_PARTITION_OK (the q_rrf_fusion pattern)
    top = adc.orderBy("adc", "vec_id").limit(PQ_TOPK)
    w_rk = W.orderBy("adc", "vec_id")
    return top.withColumn("rk", F.row_number().over(w_rk)).select(
        F.col("vec_id").alias("neighbor_id"), "adc", "rk"
    )


# -- q_graph_ann ---------------------------------------------------------------

GA_CELL_TARGET = 125  #: target vectors per hub cell: n_hubs = max(4, n/125).
#: Hub count TRACKS THE CORPUS in both engine texts — the same rule as
#: q_semdedup_kmeans's k, for the same reason: a fixed hub count makes
#: the layer-0 edge build's pair work n²/hubs (masked at small sf by the
#: WindowGroupLimit top-k pushdown, catastrophic at 1000x).  The hub
#: table stays a broadcastable (n/250)-row frame far beyond this lake.
GA_M = 4  #: layer-0 edges per node (within nearest-hub cell, symmetrized)
GA_BEAM = 8  #: beam width per hop
GA_HOPS = 3  #: unrolled beam-search steps
GA_K = 5  #: neighbors returned per query
GA_QUERIES = 4  #: query vectors (vec_id < GA_QUERIES)


def _graph_ann_oracle() -> str:
    def dot(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, len({a})),"
            f" i -> {a}[i] * {b}[i]), (p, q) -> p + q)"
        )

    hop_ctes = []
    prev = "beam0"
    for h in range(1, GA_HOPS + 1):
        hop_ctes.append(f"""
    exp{h} AS (
      SELECT query_id, vec_id FROM {prev}
      UNION
      SELECT b.query_id, e.dst FROM {prev} b JOIN edges e ON b.vec_id = e.src
    ),
    beam{h} AS (
      SELECT query_id, vec_id FROM (
        SELECT x.query_id, x.vec_id,
               ROW_NUMBER() OVER (PARTITION BY x.query_id
                 ORDER BY ({dot('q.qv', 'c.v')} / (q.qnrm * c.nrm)) DESC,
                          x.vec_id) AS rn
        FROM exp{h} x
        JOIN cells c ON c.vec_id = x.vec_id
        JOIN q ON q.query_id = x.query_id
      ) WHERE rn <= {GA_BEAM}
    )""")
        prev = f"beam{h}"
    hops_sql = ",".join(hop_ctes)

    return f"""
    WITH nb AS (
      SELECT vec_id, v, nrm FROM (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_reduce(
                 list_transform(list_transform(embedding,
                   x -> CAST(x AS DOUBLE)), x -> x * x),
                 (p, q) -> p + q)) AS nrm
        FROM embeddings
      ) WHERE isfinite(nrm) AND nrm > 0
    ),
    hubs AS (
      SELECT vec_id AS hub_id, v AS hv, nrm AS hnrm FROM (
        SELECT vec_id, v, nrm,
               ROW_NUMBER() OVER (
                 ORDER BY md5('hub:' || CAST(vec_id AS VARCHAR)), vec_id
               ) AS hrn
        FROM nb
      ) WHERE hrn <= GREATEST(4, (SELECT COUNT(*) // {GA_CELL_TARGET}
                                  FROM nb))
    ),
    cells AS (
      SELECT vec_id, v, nrm, hub_id AS cell FROM (
        SELECT n.vec_id, n.v, n.nrm, h.hub_id,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY ({dot('n.v', 'h.hv')} / (n.nrm * h.hnrm)) DESC,
                          h.hub_id) AS rn
        FROM nb n CROSS JOIN hubs h
      ) WHERE rn = 1
    ),
    knn AS (
      SELECT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY ({dot('a.v', 'b.v')} / (a.nrm * b.nrm)) DESC,
                          b.vec_id) AS rn
        FROM cells a JOIN cells b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
      ) WHERE rn <= {GA_M}
    ),
    edges AS (
      SELECT src, dst FROM knn
      UNION SELECT dst, src FROM knn
      UNION SELECT cell AS src, vec_id AS dst FROM cells WHERE cell <> vec_id
    ),
    q AS (
      SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nb
      WHERE vec_id < {GA_QUERIES}
    ),
    beam0 AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, h.hub_id AS vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY ({dot('q.qv', 'h.hv')} / (q.qnrm * h.hnrm)) DESC,
                          h.hub_id) AS rn
        FROM q CROSS JOIN hubs h
      ) WHERE rn <= 2
    ),{hops_sql}
    SELECT query_id, neighbor_id, cosine, rk FROM (
      SELECT x.query_id, x.vec_id AS neighbor_id,
             ROUND({dot('q.qv', 'c.v')} / (q.qnrm * c.nrm), 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY x.query_id
               ORDER BY ({dot('q.qv', 'c.v')} / (q.qnrm * c.nrm)) DESC,
                        x.vec_id) AS rk
      FROM {prev} x
      JOIN cells c ON c.vec_id = x.vec_id
      JOIN q ON q.query_id = x.query_id
      WHERE x.vec_id <> x.query_id
    ) WHERE rk <= {GA_K}
    """


@register(
    "q_graph_ann",
    oracle=_graph_ann_oracle(),
    doc="HNSW-style graph ANN — the last missing ANN family member next to "
    "exhaustive / blocked / IVF / PQ: a deterministic two-layer navigable "
    "graph (operators/similarity.py graph_ann_topk) searched with a "
    f"fixed {GA_HOPS}-hop beam.  Upper layer = max(4, n//"
    f"{GA_CELL_TARGET}) hash-uniform hub nodes (smallest "
    "md5('hub:'||vec_id) — HNSW's sparse top layers as a deterministic "
    "sample; the count tracks the corpus in BOTH engine texts, the "
    "q_semdedup_kmeans rule, so cells stay ~250 vectors and the edge "
    "build never goes n²/hubs); layer 0 = each vector's top-"
    f"{GA_M} cosine neighbors within its nearest-hub cell, symmetrized, "
    "PLUS hub->member descent edges so every cell is reachable from its "
    "hub (HNSW's layer descent made explicit; without it a cell holding "
    "no entry hub is unreachable — caught by the planted-corpus pin in "
    "tests/test_graph_ann.py, which also asserts exact agreement with "
    "the exhaustive ranker on a clustered corpus).  Pair work stays "
    "sum(|cell|^2) like the other blocked joins; search scores the tiny "
    "hub layer exactly for 2 entry points, then each hop expands the "
    f"beam along edges and keeps the top {GA_BEAM} by (cosine DESC, "
    "vec_id).  Scale shape: hub scoring and query vectors are "
    "broadcasts, graph build shuffles on the cell key, each beam step "
    "shuffles O(queries*(beam*m + |entry cell|)) rows — the corpus is "
    "never globally joined.  Raw-cosine ranking with id tie-breaks makes the "
    "whole traversal engine-deterministic; the DuckDB oracle replays "
    "build + search end-to-end, so WHICH nodes the beam visits is "
    "value-checked, not just how many.",
)
def q_graph_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import graph_ann_topk

    em = load_table(spark, sf_dir, "embeddings")
    # eager 1-row count: hub cardinality must track the corpus (see
    # GA_CELL_TARGET); the hub selection stays a TakeOrderedAndProject.
    # Counted on the ADMITTED corpus (finite norm > 0) — graph_ann_topk
    # gates its base the same way and the oracle counts FROM its gated
    # nb CTE, so all three agree on dirty input too.
    n_hubs = max(
        4,
        em.filter(
            _finite_norm(
                F.expr(f"SQRT({_SQNORM_SPARK.format(v='embedding')})")
            )
        ).count()
        // GA_CELL_TARGET,
    )
    return graph_ann_topk(
        em,
        em.filter(F.col("vec_id") < GA_QUERIES),
        n_hubs=n_hubs,
        m=GA_M,
        beam=GA_BEAM,
        hops=GA_HOPS,
        k=GA_K,
    )
