#!/usr/bin/env python3
"""Static audit for the cross-engine compound-transcendental (LN-1ulp) trap.

Flags every ``LN( / LOG( / EXP(`` whose balanced argument itself contains
another transcendental (``LN/LOG/EXP/SQRT/POW``) unless the site is in the
reviewed allowlist below.

Rationale (queries/exact.py module docstring, round-6 lesson, first hit by
q_importance_resampling's Gumbel key ``LN(-LN(u))``): Spark's JVM libm and
DuckDB's libm may disagree by 1 ulp when a transcendental is applied to an
ARBITRARY double — e.g. the output of another transcendental — rather than
to a ratio of bit-identical exact integers (the raw-safe precedent class,
q_weighted_sample).  A compound transcendental therefore must not ship as a
raw output column: ROUND it (irrational ⇒ boundary probability ~0) and keep
the raw value only for ordering, where a 1-ulp drift cannot flip ranks of
distinct rows.

Exit 1 on any unreviewed site; add a site to ALLOW only after confirming
its raw value never reaches a driver-compared output column unrounded.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "lab_etl_spark"

_OUTER = re.compile(r"(?:\bLN|\bln|\bLOG|\blog|\bEXP|\bexp)\s*\(")
_INNER = ("LN(", "ln(", "LOG(", "log(", "EXP(", "exp(", "SQRT(", "sqrt(",
          "POW", "pow(")

#: reviewed sites: (path suffix, marker substring in the argument,
#: one-line justification)
ALLOW: list[tuple[str, str, str]] = [
    ("queries/text.py", "-LN(", "Gumbel key LN(-LN(u)): output columns "
     "logw/sel_key are ROUNDed to 6 in BOTH engine texts; the raw key is "
     "used only for top-k ordering (distinct docs never within an ulp)"),
    ("queries/exact.py", "-LN(", "module docstring stating this very rule "
     "— prose, not an expression"),
]


def _extract_balanced(text: str, start: int) -> str:
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
    for m in _OUTER.finditer(text):
        arg = _extract_balanced(text, m.end() - 1)
        if not any(s in arg for s in _INNER):
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
            print(f"{rel}:{line}: compound transcendental: {arg}")
            bad += 1
    if bad:
        print(
            f"\n{bad} unreviewed compound-transcendental site(s).  ROUND "
            "the output (ordering may stay raw) or add a justified ALLOW "
            "entry (see queries/exact.py docstring)."
        )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
