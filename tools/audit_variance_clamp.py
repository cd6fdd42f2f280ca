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
    """Replace every GREATEST(...) span (balanced) with a PLACEHOLDER
    identifier — minuses inside the clamp are the FIX, not the hazard,
    but the span must keep its operand ROLE: deleting it outright would
    turn ``GREATEST(a, b) - c`` / ``x - GREATEST(y, 0)`` (misplaced
    clamps that do NOT cover the subtraction) into unary-looking forms
    the minus detector misses."""
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
        arg = arg[: m.start()] + "GSPAN" + arg[i:]


def _has_binary_minus(arg: str) -> bool:
    # drop lambda arrows first: '->' is not a subtraction
    s = _strip_greatest_spans(arg).replace("->", "  ")
    # subtracting a bare INTEGER literal at the END of a term (Bessel's
    # n - 1 and friends, i.e. followed by ')' ',' or end-of-text) is not
    # the cancellation class; a constant COEFFICIENT ('ssq - 2 * m * s',
    # the expanded sum((x-m)^2)) very much is, so the literal must not
    # be erased when something follows it
    s = re.sub(r"([\w)\]])\s*-\s*\d+(?![\w.])(?=\s*(?:[),]|$))", r"\1", s)
    # binary minus: '-' preceded (ignoring spaces) by an identifier char,
    # ')' or digit — leading unary minus / negative literals don't count
    return re.search(r"[\w)\]]\s*-\s*[\w($]", s) is not None


def _string_templates(tree: ast.AST):
    """Yield (lineno, text) for every string in the module: bare
    constants, and f-strings REASSEMBLED into one template with each
    interpolation replaced by a placeholder identifier — an f-string's
    fragments have unbalanced parens, so scanning them standalone finds
    no SQRT argument at all (the blind spot that hid q_corr_matrix; the
    same technique as audit_ansi_division's JoinedStr handling)."""
    fstr_parts = {
        id(part)
        for n in ast.walk(tree)
        if isinstance(n, ast.JoinedStr)
        for part in n.values
    }
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Constant)
            and isinstance(node.value, str)
            and id(node) not in fstr_parts
        ):
            yield node.lineno, node.value
        elif isinstance(node, ast.JoinedStr):
            parts = []
            for part in node.values:
                if isinstance(part, ast.Constant) and isinstance(
                    part.value, str
                ):
                    parts.append(part.value)
                else:
                    parts.append("FVAL")  # placeholder keeps parens sane
            yield node.lineno, "".join(parts)


def audit() -> list[tuple[str, int, str]]:
    hits = []
    for path in sorted(glob.glob(SCAN, recursive=True)):
        rel = os.path.relpath(path, ROOT)
        tree = ast.parse(open(path).read(), filename=path)
        for lineno, text in _string_templates(tree):
            for arg in _sqrt_args(text):
                if not _has_binary_minus(arg):
                    continue
                snip = re.sub(r"\s+", " ", arg.strip())[:60]
                if (os.path.basename(path), snip) in ALLOW:
                    continue
                hits.append((rel, lineno, snip))
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
