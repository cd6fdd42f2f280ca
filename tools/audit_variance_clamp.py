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
        # the placeholder ends in ')' so a following binary minus keeps a
        # close-paren LHS and is never mistaken for a Bessel identifier
        arg = arg[: m.start()] + "GSPAN()" + arg[i:]


def _has_binary_minus(arg: str) -> bool:
    # drop lambda arrows first: '->' is not a subtraction
    s = _strip_greatest_spans(arg).replace("->", "  ")
    # the ONLY exempted subtraction: a BARE identifier minus an integer
    # literal at the end of a term ('(n - 1)' Bessel denominators).  The
    # identifier must open its own term ('(', ',', whitespace, or start)
    # — an LHS ending in ')' (GREATEST(a, b) - 1), a ratio ('x/y - 1',
    # catastrophic cancellation when x≈y), or a product ('s*n - 1') all
    # keep their minus and get flagged; so does a constant COEFFICIENT
    # ('ssq - 2 * m * s', the expanded sum((x-m)^2)), because something
    # follows the literal
    s = re.sub(
        r"(^|[(\s,])(\w+)\s*-\s*\d+(?![\w.])(?=\s*(?:[),]|$))",
        r"\1\2",
        s,
    )
    # binary minus: '-' preceded (ignoring spaces) by an identifier char,
    # ')' or digit — leading unary minus / negative literals don't count
    return re.search(r"[\w)\]]\s*-\s*[\w($]", s) is not None


def _module_str_consts(tree: ast.AST) -> dict[str, str]:
    """NAME -> value for module-level string-constant assignments, so an
    interpolation of a module constant is scanned with its real text."""
    out: dict[str, str] = {}
    for node in getattr(tree, "body", []):
        tgt = None
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            tgt = node.targets[0]
        elif isinstance(node, ast.AnnAssign):
            tgt = node.target
        if (
            isinstance(tgt, ast.Name)
            and isinstance(getattr(node, "value", None), ast.Constant)
            and isinstance(node.value.value, str)
        ):
            out[tgt.id] = node.value.value
    return out


def _string_templates(tree: ast.AST):
    """Yield (lineno, text) for every string in the module: bare
    constants, and f-strings REASSEMBLED into one template — an
    f-string's fragments have unbalanced parens, so scanning them
    standalone finds no SQRT argument at all (the blind spot that hid
    q_corr_matrix; the same technique as audit_ansi_division's JoinedStr
    handling).  An interpolation that references a module-level string
    constant (bare NAME or NAME.format(...)) is inlined with the
    constant's text so e.g. f"SQRT({IDENT})" is scanned with IDENT's
    real body; anything else becomes a placeholder identifier."""
    consts = _module_str_consts(tree)
    fstr_parts = {
        id(part)
        for n in ast.walk(tree)
        if isinstance(n, ast.JoinedStr)
        for part in n.values
    }

    def _inline(v: ast.AST) -> str:
        if isinstance(v, ast.Name) and v.id in consts:
            return consts[v.id]
        if (  # NAME.format(...) — the SQNORM.format(v=..) idiom
            isinstance(v, ast.Call)
            and isinstance(v.func, ast.Attribute)
            and v.func.attr == "format"
            and isinstance(v.func.value, ast.Name)
            and v.func.value.id in consts
        ):
            return consts[v.func.value.id]
        return "FVAL"  # placeholder keeps parens sane

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
                elif isinstance(part, ast.FormattedValue):
                    parts.append(_inline(part.value))
                else:
                    parts.append("FVAL")
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
