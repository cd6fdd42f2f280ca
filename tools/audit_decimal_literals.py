#!/usr/bin/env python3
"""Static audit for the Spark-SQL decimal-literal trap (round-5 verdict #7).

In Spark SQL a bare ``N.M`` literal is DECIMAL(p,s), so arithmetic like
``1.0 / (60 + rank)`` is decimal arithmetic and the output column is
DecimalType — pandas ``Decimal`` objects at the driver, vs the DuckDB
oracle's float64 (DuckDB has the same literal typing but ``fetchdf``
renders DECIMAL as float64).  This broke ``q_rrf_fusion`` in round 5.

This script AST-parses every ``lab_etl_spark`` module, collects the string
arguments of ``selectExpr(...)`` / ``expr(...)`` / ``F.expr(...)`` calls
(the Spark-side SQL surfaces), and flags bare decimal literals that take
part in arithmetic without a protecting ``CAST(... AS DOUBLE)`` / ``D``
suffix / ``E`` exponent.  The authoritative gate is the runtime schema
audit (``tests/test_spark_types.py``); this is the fast grep that points
at the offending source line.

Exit 0 with no output = clean.  Exit 1 and file:line hits otherwise.
"""

from __future__ import annotations

import ast
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SQL_CALLS = {"selectExpr", "expr"}

# a bare decimal literal adjacent to an arithmetic operator, e.g.
# "1.0 / x", "x * 0.5", "2.5 + y" — but not "1.0D", "1.5E-3", or one
# already wrapped as CAST(1.0 AS DOUBLE) (checked separately).
_ARITH_DEC = re.compile(
    r"""(?<![\w.])            # not part of an identifier / longer number
        \d+\.\d+              # bare N.M
        (?![\dDdEe])          # no D suffix / exponent / more digits
        \s*[-+*/]             # followed by arithmetic
      | [-+*/]\s*             # ... or preceded by arithmetic
        \d+\.\d+
        (?![\dDdEe])
    """,
    re.VERBOSE,
)
_CAST_WRAPPED = re.compile(
    r"CAST\s*\(\s*-?\d+\.\d+\s+AS\s+(DOUBLE|FLOAT)\s*\)", re.IGNORECASE
)


def _strings_in_call(call: ast.Call) -> list[tuple[int, str]]:
    out = []
    for arg in list(call.args) + [kw.value for kw in call.keywords]:
        for node in ast.walk(arg):
            if isinstance(node, ast.Constant) and isinstance(node.value, str):
                out.append((node.lineno, node.value))
            elif isinstance(node, ast.JoinedStr):
                for part in node.values:
                    if isinstance(part, ast.Constant) and isinstance(
                        part.value, str
                    ):
                        out.append((part.lineno, part.value))
    return out


def audit(root: pathlib.Path) -> list[str]:
    hits = []
    for path in sorted(root.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            fn = node.func
            name = (
                fn.id
                if isinstance(fn, ast.Name)
                else fn.attr
                if isinstance(fn, ast.Attribute)
                else None
            )
            if name not in SQL_CALLS:
                continue
            for lineno, s in _strings_in_call(node):
                # strip the protected forms, then look for leftovers
                stripped = _CAST_WRAPPED.sub("", s)
                if _ARITH_DEC.search(stripped):
                    hits.append(
                        f"{path.relative_to(ROOT)}:{lineno}: bare decimal "
                        f"literal in arithmetic inside {name}(): {s!r}"
                    )
    return hits


if __name__ == "__main__":
    hits = audit(ROOT / "lab_etl_spark")
    for h in hits:
        print(h)
    sys.exit(1 if hits else 0)
