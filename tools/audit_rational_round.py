#!/usr/bin/env python3
"""Static audit for the cross-engine rational-ROUND trap.

Flags every ``ROUND(`` / ``F.round(`` whose argument contains a division
UNLESS the argument also contains an irrationalizing function (SQRT, LN,
LOG, EXP, POWER, ...) or the site is in the reviewed allowlist below.

Rationale (queries/exact.py module docstring, round-6 lesson): a double
that is a small-denominator RATIONAL — a mean ``sum/count``, a ratio
``n/total`` — lands exactly on the half boundary of the ROUND scale with
probability ~1/denominator, where Spark's exact-BigDecimal HALF_UP and
DuckDB's scaled-double pipelines disagree.  Such outputs must be emitted
as the raw quotient (bit-identical IEEE division) or re-aggregated in
integer microunits.  Irrational-valued arguments are safe to ROUND.

Exit 1 on any unreviewed site; add a site to ALLOW only after working the
boundary arithmetic (see the justifications below).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "lab_etl_spark"

#: substrings that make a ROUND argument irrational-valued (boundary
#: probability ~0) or already exact at the target scale
IRRATIONALIZERS = (
    "SQRT", "sqrt", "LN(", "ln(", "LOG", "log", "EXP(", "exp(",
    "POWER", "pow(", "PI(", "sigma", "cosine", "RADIANS",
)

#: reviewed sites: (path suffix, marker substring in the ROUND argument,
#: one-line justification)
ALLOW: list[tuple[str, str, str]] = [
    ("queries/analytics.py", "revenue", "market-share ratio: denominator is a "
     "corpus-sized decimal sum (~1e9 at sf0.1) — boundary P ~ 1/denominator"),
    ("queries/analytics.py", "/ 7.0", "k/700 microunits reduce to 10000k/7: "
     "either integer or fraction j/7, never exactly 1/2 — boundary-free"),
    ("queries/analytics.py", "sxi", "gini: denominator n*sx is a corpus-sized "
     "product — boundary P negligible"),
    ("queries/scale.py", "quantile_cont", "quartiles of 2-decimal values: "
     "k/400 microunits = 2500k, always integer — boundary-free"),
    ("multimodal/columns.py", "n_common", "rows-only query (no oracle): "
     "cross-engine rounding divergence cannot manifest"),
    ("queries/analytics.py", "100.0", "promo share: numerator and "
     "denominator are corpus-sized decimal sums — boundary P negligible"),
    ("queries/similarity.py", "sc *", "int8 quantize: scale sc = max/127 of "
     "float32 data — denominator carries float32 mantissa bits, boundary "
     "needs 2^7*5^j reduced form, unreachable"),
    ("queries/similarity.py", "aggregate(embedding", "mean squared error "
     "over float32 folds: irrational-valued sums"),
    ("queries/similarity.py", "sq_orig", "projection energy ratio: "
     "denominator is a float32-derived fold sum — boundary unreachable"),
    ("queries/sketches.py", "theta", "KMV estimate: theta is an md5-derived "
     "binary rational with 2^52 denominator — boundary needs 2^7*5^j "
     "reduced form, unreachable"),
    ("queries/sketches.py", "n_both", "same KMV theta analysis"),
    ("queries/sketches.py", "n_exact", "HLL relative error: estimate "
     "denominator carries large powers of 2 from register reciprocal "
     "sums — cannot reduce to 2^7*5^j"),
    ("queries/sketches.py", "exact_p", "histogram-midpoint relative error: "
     "denominator is a 2-decimal data value scaled by data-sized counts; "
     "reviewed, sf0.1-green"),
    ("queries/timeseries.py", "epoch_us", "linear interpolation: time-gap "
     "denominators on the fixed grids never take the 2^7*5^j form; "
     "reviewed, sf0.1-green"),
    ("queries/timeseries.py", "prev_revenue", "growth ratio: denominator "
     "is a corpus-sized revenue sum — boundary P negligible"),
    ("queries/timeseries.py", "effect", "markov removal effect: "
     "denominators are products of chain-count ratios — astronomically "
     "large, boundary unreachable"),
    ("queries/similarity.py", "q.qnrm", "graph-ANN readout cosine: the "
     "denominator is a product of sqrt norms (irrational; the sqrt lives "
     "in the nb CTE, out of the heuristic's sight) — boundary unreachable"),
]


def _extract_balanced(text: str, start: int) -> str:
    """Return the balanced parenthesized argument starting at text[start]
    (which must be '(')."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    return text[start + 1 :]


def audit_file(path: Path) -> list[tuple[int, str]]:
    text = path.read_text()
    hits = []
    for m in re.finditer(r"(?:ROUND|F\.round)\s*\(", text):
        arg = _extract_balanced(text, m.end() - 1)
        if "/" not in arg:
            continue
        if any(s in arg for s in IRRATIONALIZERS):
            continue
        rel = str(path.relative_to(ROOT.parent))
        if any(
            rel.endswith(suf) and marker in arg for suf, marker, _ in ALLOW
        ):
            continue
        line = text.count("\n", 0, m.start()) + 1
        hits.append((line, " ".join(arg.split())[:100]))
    return hits


def main() -> int:
    bad = 0
    for path in sorted(ROOT.rglob("*.py")):
        for line, arg in audit_file(path):
            rel = path.relative_to(ROOT.parent)
            print(f"{rel}:{line}: ROUND over a division: {arg}")
            bad += 1
    if bad:
        print(
            f"\n{bad} unreviewed ROUND-over-division site(s).  Emit the raw "
            "quotient, use integer microunits, or add a justified ALLOW "
            "entry (see queries/exact.py docstring)."
        )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
