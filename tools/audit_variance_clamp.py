#!/usr/bin/env python3
"""Static audit for the SQRT-of-cancelled-variance hazard (round 10).

The class (found three times before this gate existed —
q_anomaly_seasonal in the round-9 advice, q_bootstrap_ci/q_acf in the
round-10 self-review): a variance identity like ``s2/n - (s1/n)^2`` or
``n*sxx - sx*sx`` is mathematically >= 0 but can cancel slightly
NEGATIVE in doubles on a (near-)constant group.  Under ``SQRT`` the two
engines then fail DIFFERENTLY — Spark yields NaN, which passes both
``> 0`` gates and ``abs(..) > 3`` comparisons (NaN compares true) and
emits garbage rows, while DuckDB's ``sqrt(negative)`` throws and kills
the oracle.  The fix is ``SQRT(GREATEST(<identity>, 0))`` in BOTH
engine texts.

Rule enforced here: in every string literal of ``lab_etl_spark/``
(engine expressions AND oracle SQL — the clamp must be twinned), a
``SQRT(...)`` whose argument contains a top-level binary MINUS must
wrap the subtraction in ``GREATEST(..., 0)``.  Minus signs inside a
GREATEST(...) span are fine; lambda arrows (``->``) are not minuses;
square-norm folds (sums of x*x) contain no minus and never match.

Exit 0 with no output = clean.  Exit 1 and file:line per hit otherwise.
"""

from __future__ import annotations

import ast
import glob
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCAN = os.path.join(ROOT, "lab_etl_spark", "**", "*.py")

#: (file basename, snippet) pairs exempted with a written justification.
ALLOW: set[tuple[str, str]] = {
    # prose in a sketch doc string ("rank error ~ sqrt(p(1-p)/K)"), not
    # an engine expression — 1-p is algebra in documentation
    ("sketches.py", "p(1-p)/K"),
}


def _sqrt_args(text: str) -> list[str]:
    """Balanced-paren arguments of every SQRT( occurrence (any case)."""
    out = []
    for m in re.finditer(r"\bsqrt\s*\(", text, flags=re.IGNORECASE):
        depth, start = 1, m.end()
        i = start
        while i < len(text) and depth:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        if depth == 0:
            out.append(text[start : i - 1])
    return out


def _strip_greatest_spans(arg: str) -> str:
    """Remove every GREATEST(...) span (balanced) — minuses inside the
    clamp are the FIX, not the hazard."""
    while True:
        m = re.search(r"\bGREATEST\s*\(", arg, flags=re.IGNORECASE)
        if not m:
            return arg
        depth, i = 1, m.end()
        while i < len(arg) and depth:
            if arg[i] == "(":
                depth += 1
            elif arg[i] == ")":
                depth -= 1
            i += 1
        arg = arg[: m.start()] + arg[i:]


def _has_binary_minus(arg: str) -> bool:
    # drop lambda arrows first: '->' is not a subtraction
    s = _strip_greatest_spans(arg).replace("->", "  ")
    # subtracting a bare INTEGER literal (Bessel's n - 1 and friends) is
    # not the cancellation class: the identity that cancels subtracts two
    # near-equal COMPUTED quantities, never a constant
    s = re.sub(r"([\w)\]])\s*-\s*\d+(?![\w.])", r"\1", s)
    # binary minus: '-' preceded (ignoring spaces) by an identifier char,
    # ')' or digit — leading unary minus / negative literals don't count
    return re.search(r"[\w)\]]\s*-\s*[\w($]", s) is not None


def audit() -> list[tuple[str, int, str]]:
    hits = []
    for path in sorted(glob.glob(SCAN, recursive=True)):
        rel = os.path.relpath(path, ROOT)
        tree = ast.parse(open(path).read(), filename=path)
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Constant)
                and isinstance(node.value, str)
            ):
                continue
            for arg in _sqrt_args(node.value):
                if not _has_binary_minus(arg):
                    continue
                snip = re.sub(r"\s+", " ", arg.strip())[:60]
                if (os.path.basename(path), snip) in ALLOW:
                    continue
                hits.append((rel, node.lineno, snip))
    return hits


def main() -> int:
    hits = audit()
    for rel, line, snip in hits:
        print(
            f"{rel}:{line}: SQRT over an unclamped subtraction — wrap the "
            f"identity in GREATEST(.., 0) in BOTH engine texts: {snip!r}"
        )
    return 1 if hits else 0


if __name__ == "__main__":
    sys.exit(main())
