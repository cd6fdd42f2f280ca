"""Exact-arithmetic helpers shared by the Spark queries and their DuckDB
oracle SQL so both engines produce bit-identical doubles.

Floating-point SUM/AVG is order-dependent; hash-based aggregation gives each
engine (and each run) a different accumulation order.  The fix is to
accumulate in DECIMAL — exact integer arithmetic, order-independent — and
cast the final value back to DOUBLE (a single deterministic IEEE rounding).
Each addend is a deterministic per-row double cast to DECIMAL(38-p, p); the
cast rounds identically in both engines for non-boundary values.

Array folds (dot products, norms) instead rely on *sequential* left-to-right
evaluation, which Spark's ``aggregate`` and DuckDB's ``list_reduce`` both
guarantee, so plain double accumulation is already deterministic there.

THE RATIONAL-ROUND TRAP (round-6 lesson, first hit by q_seasonal_decompose
at sf0.1): never ROUND — and never cast back to DECIMAL — a double that is
a small-denominator rational (a mean ``sum/count``, a ratio ``n/total``, a
replicate mean).  Such rationals land EXACTLY on the half boundary of the
target scale with probability ~1/denominator (e.g. k/30 microunits is a
half-boundary whenever k ≡ 15 mod 30), and at the boundary Spark (exact
BigDecimal HALF_UP on the binary value) and DuckDB (scaled-double pipeline)
round in different directions.  Irrational-valued expressions (ln, sqrt,
cosines) are safe to ROUND — they sit on a boundary with probability ~0.

Rules:
  * ratio/mean OUTPUT columns: emit the RAW quotient — a single IEEE
    division of bit-identical operands is itself bit-identical; ROUND
    only ADDS risk.
  * RE-AGGREGATING per-group means (two-level decompositions, bootstrap
    replicates): quantize to integer microunits first —
    ``CAST(FLOOR(m * CAST(1000000 AS DOUBLE)) AS BIGINT)`` (one
    deterministic multiply + floor, boundary-free), sum exactly as
    BIGINT, and divide once at readout.  Do NOT dsum/davg an
    already-divided double: the DECIMAL cast rounds it.
  * COMPOUND transcendentals (LN of an LN result, or LN of any
    arbitrary double that is not a ratio of exact integers): the two
    engines' libm may disagree by 1 ulp (first observed on
    q_importance_resampling's Gumbel key ``LN(-LN(u))``), so the raw
    double is NOT cross-engine-stable.  Emit such outputs ROUNDed
    (they are irrational — boundary probability ~0) and keep raw
    values only for ordering, where a 1-ulp drift cannot flip ranks
    of distinct rows.  Single LN/SQRT over a ratio of bit-identical
    integers remains raw-safe (q_weighted_sample precedent).
"""

from __future__ import annotations


def dsum(expr: str, scale: int = 4) -> str:
    """Exact SUM of a double expression, returned as DOUBLE.

    Same SQL text is valid in Spark SQL and DuckDB.

    Non-finite inputs: Spark's double→DECIMAL cast yields NULL for
    NaN/Infinity, so on the ENGINE side a non-finite row is skipped (the
    permissive contract a 100 TB job needs — pinned by
    tests/test_functions.py::test_dsum_tolerates_non_finite).  DuckDB's
    cast raises instead, so the ORACLE text requires finite inputs — which
    the driver corpus guarantees; guard with isnan/isinf CASE if reusing
    these oracles on wild data.
    """
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"


def davg(expr: str, scale: int = 6) -> str:
    """Exact-sum AVG of a double expression, returned as DOUBLE."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
