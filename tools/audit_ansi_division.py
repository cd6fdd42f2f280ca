#!/usr/bin/env python3
"""Static audit for ANSI-mode division hazards (round-9 session 2).

This session's Spark 4 config runs ANSI SQL mode, where a double/int
division by an EXACTLY-ZERO divisor THROWS and kills the whole job — a
zero-norm embedding crashed every cosine query until the try_divide
hardening (see PERFORMANCE.md "dirty-vector hardening").  This audit
makes that class of regression impossible to reintroduce silently: every
Spark-side division must be one of

  * ``try_divide`` (NULL on zero, identical doubles otherwise — matches
    DuckDB's native ``/`` semantics, so oracles stay in lockstep);
  * a STRUCTURALLY-SAFE denominator (numeric literal; ``COUNT(*)`` /
    ``COUNT(1)`` — an emitted group has >= 1 row.  ``COUNT(col)`` is NOT
    auto-safe: only when the numerator aggregates the SAME column does a
    zero count force a NULL numerator that short-circuits Divide, so
    those sites carry allowlist entries instead);
  * an ALLOWLISTED site carrying a written justification for why the
    denominator cannot be zero on any input (not just the test lake).

Surfaces scanned (AST, lab_etl_spark/ only — oracle SQL strings run on
DuckDB where /0 yields NULL and are exempt):

  * Python ``/`` BinOps where either operand mentions the DataFrame API
    (``F.``/``col(`` heuristic) — Column divisions;
  * string arguments of ``selectExpr``/``expr``/``F.expr``/``sql`` calls,
    including module-level constants referenced by NAME in those calls
    (and ``NAME.format(...)``), i.e. the *_SPARK readout strings.

Exit 0 with no output = clean.  Exit 1 and file:line per hit otherwise.
Allowlist key: (relative path, normalized denominator snippet).
"""

from __future__ import annotations

import ast
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SQL_CALL_NAMES = {"selectExpr", "expr", "sql"}

#: (relpath, normalized denominator) -> why it cannot be zero on ANY
#: input (not just the test lake).  "Normalized" = whitespace collapsed.
#: Categories: COUNT-alias (an emitted group has >= 1 row), SET-SIZE
#: (sizes of sets that exist because they are non-empty), SPLIT-SIZE
#: (split(trim(s), ' +') yields [''] for empty text, so size >= 1),
#: POSITIVE-SUM (sum of structurally-positive values), CASE-GUARD (the
#: division sits in a lazily-evaluated CASE/when branch whose condition
#: excludes zero), POST-FILTER (a preceding Filter operator excludes
#: zero-denominator rows; Project never reorders above its Filter),
#: +SMOOTH (denominator is x + positive constant), FORMAT-CONST (a {x}
#: placeholder always filled with a non-zero compile-time constant).
ALLOWLIST: dict[tuple[str, str], str] = {
    ("lab_etl_spark/sources/sink.py", 'F.col("tot")'):
        "POSITIVE-SUM: tot = SUM(cnt) over the file's (partition, file) "
        "groups, each cnt a COUNT(*) of >= 1 rows (a group exists only "
        "because rows do), so tot >= 1 for every joined row",
    ("lab_etl_spark/multimodal/columns.py", "union"):
        "SET-SIZE: n_a/n_b are fingerprint-set sizes from grouped rows "
        "(a doc with no fingerprints has no row), so the union >= 1",
    ("lab_etl_spark/operators/dedup.py",
     'F.col("n_a") + F.col("n_b") - F.col("n_common")'):
        "SET-SIZE: Jaccard union >= max(n_a, n_b) >= 1 (sig rows exist "
        "only for docs with >= 1 shingle)",
    ("lab_etl_spark/queries/dedup.py",
     'F.col("n_a") + F.col("n_b") - F.col("n_common")'):
        "SET-SIZE: same Jaccard union bound as operators/dedup.py",
    ("lab_etl_spark/queries/dedup.py", 'F.col("n_a")'):
        "SET-SIZE: per-doc shingle count >= 1 by sig construction",
    ("lab_etl_spark/queries/dedup.py", 'F.col("n_b")'):
        "SET-SIZE: per-doc shingle count >= 1 by sig construction",
    ("lab_etl_spark/queries/dedup.py", 'F.sum("n_words")'):
        "POSITIVE-SUM: each passage row carries n_words >= 1",
    ("lab_etl_spark/operators/similarity.py", "COUNT(x)"):
        "SAME-COLUMN: KM_MEAN divides SUM(CAST((x) AS DECIMAL)) by "
        "COUNT(x) — a zero count forces a NULL numerator, which Divide "
        "short-circuits before the ANSI zero check",
    ("lab_etl_spark/queries/similarity.py", "COUNT(x)"):
        "SAME-COLUMN: _KM_MEAN, identical SUM(x)/COUNT(x) shape",
    ("lab_etl_spark/queries/relational.py",
     'F.count("value").over(frame)'):
        "SAME-COLUMN: the numerator is SUM of a cast of the same "
        "'value' column over the same frame — zero count forces a NULL "
        "numerator",
    ("lab_etl_spark/operators/graph.py", 'F.col("n")'):
        "COUNT-alias: vertex count; an empty graph emits no rows at all",
    ("lab_etl_spark/operators/graph.py", "d"):
        "SET-SIZE: out-degree of a src that appears in the edge list, "
        ">= 1 by construction",
    ("lab_etl_spark/operators/interpolation.py",
     '( us(next_ts) - us(prev_ts) ).cast("double")'):
        "CASE-GUARD: frac is referenced only in the otherwise() branch "
        "of when(prev_ts == next_ts, ...) - equal stamps never divide",
    ("lab_etl_spark/operators/similarity.py", "{cap}"):
        "FORMAT-CONST: cell_cap, a positive int constant (SD_CELL_CAP)",
    ("lab_etl_spark/queries/advanced.py", 'F.expr(dsum("l_quantity"))'):
        "POSITIVE-SUM: TPC-H l_quantity >= 1 per line item",
    ("lab_etl_spark/queries/advanced.py", 'F.col("total_rev")'):
        "POSITIVE-SUM: global revenue over positive extendedprice; zero "
        "rows -> the scalar subquery join emits nothing",
    ("lab_etl_spark/queries/advanced.py", 'F.col("total_docs")'):
        "COUNT-alias: corpus doc count >= 1 when any group row exists",
    ("lab_etl_spark/queries/advanced.py", 'F.col("n_sources")'):
        "COUNT-alias: distinct source count >= 1",
    ("lab_etl_spark/queries/advanced.py", "actual"):
        "POSITIVE-SUM: n_docs/total_docs with n_docs >= 1 per emitted "
        "group, so actual > 0",
    ("lab_etl_spark/queries/advanced.py", "CAST({s} AS DOUBLE)"):
        "FORMAT-CONST: CHUNK_STRIDE, a positive int constant",
    ("lab_etl_spark/queries/analytics.py", "F.expr(total)"):
        "POSITIVE-SUM: sum of extendedprice*(1-discount) with price > 0 "
        "and discount <= 0.10 in TPC-H",
    ("lab_etl_spark/queries/analytics.py",
     'F.expr( "CAST(SUM(CAST(revenue AS DECIMAL(30,6)))"'
     ' " OVER (PARTITION BY o_year) AS DOUBLE)" )'):
        "POSITIVE-SUM: windowed sum of positive revenue over a partition "
        "that contains the current row",
    ("lab_etl_spark/queries/analytics.py", "(n * sx)"):
        "POSITIVE-SUM: n = COUNT(*) >= 1; sx = sum of positive customer "
        "spend",
    ("lab_etl_spark/queries/analytics.py", "n"):
        "COUNT-alias: n = COUNT(*) >= 1 per emitted segment",
    ("lab_etl_spark/queries/relational.py", "width"):
        "FORMAT-CONST: local literal width = 5.0",
    ("lab_etl_spark/queries/scale.py", 'F.col("sigma")'):
        "POST-FILTER: rows reach the division only after the "
        "abs(value-mu) > 3*sigma filter, which is unsatisfiable when "
        "sigma = 0 (all values equal mu)",
    ("lab_etl_spark/queries/scale.py", "n"):
        "COUNT-alias: n = COUNT(*) >= 1 (the linreg intercept / n term)",
    ("lab_etl_spark/queries/scale.py", "(n - 1)"):
        "FORMAT-CONST: n = BOOT_B bootstrap replicates, a compile-time "
        "constant >= 2 (one row per replicate id is always generated)",
    ("lab_etl_spark/queries/scale.py", "(CAST(n_x AS DOUBLE) * n_y)"):
        "COUNT-alias: marginal counts >= 1 for any emitted pair",
    ("lab_etl_spark/queries/similarity.py", 'F.size("embedding")'):
        "POST-FILTER: the preceding filter(sc > 0) excludes empty "
        "embeddings (their scale fold is exactly 0.0)",
    ("lab_etl_spark/queries/similarity.py", "({RRF_K} + lex_rank)"):
        "+SMOOTH: RRF_K = 60 and row_number() >= 1",
    ("lab_etl_spark/queries/similarity.py", "({RRF_K} + sem_rank)"):
        "+SMOOTH: RRF_K = 60 and row_number() >= 1",
    ("lab_etl_spark/queries/sketches.py", 'F.col("n_m")'):
        "COUNT-alias: per-sketch entry count >= 1 for any emitted pair",
    ("lab_etl_spark/queries/sketches.py", 'F.col("ca")'):
        "COUNT-alias: per-item basket count >= 1 for any emitted rule",
    ("lab_etl_spark/queries/sketches.py", 'F.col("cb")'):
        "COUNT-alias: per-item basket count >= 1 for any emitted rule",
    ("lab_etl_spark/queries/sketches.py",
     'F.col("ca").cast("double") * F.col("cb")'):
        "COUNT-alias: product of two counts >= 1",
    ("lab_etl_spark/queries/sketches.py", "CAST(total AS DOUBLE)"):
        "POSITIVE-SUM: HLL register sum of 2^-reg terms, always > 0 "
        "over 256 registers",
    ("lab_etl_spark/queries/sketches.py", "CAST(zeros AS DOUBLE)"):
        "CASE-GUARD: the linear-counting branch requires zeros > 0 in "
        "the same CASE condition",
    ("lab_etl_spark/queries/sketches.py", "n_exact"):
        "COUNT-alias: exact distinct count >= 1 per emitted type",
    ("lab_etl_spark/queries/sketches.py", "exact_p"):
        "CASE-GUARD: guarded by CASE WHEN exact_p = 0 in the same "
        "expression (lazy branch)",
    ("lab_etl_spark/queries/text.py", "n_tokens"):
        "SPLIT-SIZE: size(split(trim(text), ' +')) >= 1 ([''] for empty)",
    ("lab_etl_spark/queries/text.py", 'F.col("n_words")'):
        "SPLIT-SIZE: same split idiom, >= 1",
    ("lab_etl_spark/queries/text.py", 'F.col("df") + 1.0'):
        "+SMOOTH: document frequency plus one",
    ("lab_etl_spark/queries/text.py", 'F.size("ws")'):
        "SPLIT-SIZE: same split idiom, >= 1",
    ("lab_etl_spark/queries/text.py", "F.size(ws)"):
        "SPLIT-SIZE: same split idiom, >= 1",
    ("lab_etl_spark/queries/text.py",
     'F.greatest(F.length("text"), F.lit(1))'):
        "+SMOOTH: greatest(x, 1) >= 1 by definition",
    ("lab_etl_spark/queries/text.py", "(CAST(ca AS DOUBLE) * cb)"):
        "COUNT-alias: co-occurrence marginals >= 1 for any emitted pair",
    ("lab_etl_spark/queries/text.py", "n_s"):
        "COUNT-alias: per-source token total >= 1 for any emitted row",
    ("lab_etl_spark/queries/text.py", "(CAST(n_s AS DOUBLE) * c_w)"):
        "COUNT-alias: product of token counts >= 1",
    ("lab_etl_spark/queries/text.py", "CAST(t_total + {IR_B} AS DOUBLE)"):
        "+SMOOTH: IR_B is a positive smoothing constant",
    ("lab_etl_spark/queries/text.py", "CAST(r_total + {IR_B} AS DOUBLE)"):
        "+SMOOTH: IR_B is a positive smoothing constant",
    ("lab_etl_spark/queries/timeseries.py", "i"):
        "CASE-GUARD/bounds: candidate split index ranges "
        "CPT_MIN_SEG..n-CPT_MIN_SEG (WHERE-bounded), so i >= 5",
    ("lab_etl_spark/queries/timeseries.py", "(n - i)"):
        "CASE-GUARD/bounds: same bound, n - i >= CPT_MIN_SEG = 5",
    ("lab_etl_spark/queries/timeseries.py", "n"):
        "COUNT-alias: n = COUNT(*) >= 30 behind the seasonal n >= 30 "
        "filter; the sigma fold itself divides by a group count >= 1",
    ("lab_etl_spark/queries/timeseries.py", 'F.col("prev_revenue")'):
        "POST-FILTER: the pct_change projection follows the "
        "prev_revenue > 0 filter (separate operators; the in-filter "
        "division itself uses try_divide)",
    ("lab_etl_spark/queries/timeseries.py", 'F.col("row_total")'):
        "POSITIVE-SUM: sum of per-row counts >= 1 for any emitted row",
    ("lab_etl_spark/queries/timeseries.py",
     'F.sum("cnt").over(W.partitionBy("chain", "from_state"))'):
        "POSITIVE-SUM: windowed sum over a partition containing the "
        "current row's cnt >= 1",
    ("lab_etl_spark/queries/timeseries.py", "p_base"):
        "CASE-GUARD: CASE WHEN p_base = 0.0 THEN 0.0 ELSE ... END",
    ("lab_etl_spark/queries/timeseries.py", "s"):
        "CASE-GUARD: CASE WHEN s = 0.0 THEN 0.0 ELSE ... END",
}


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip())


def _sql_denominator(text: str, idx: int) -> str:
    """Extract the denominator expression after text[idx] == '/': scan
    forward tracking paren depth, stop at a top-level comma/operator or
    a closing paren that unbalances."""
    i, depth, out = idx + 1, 0, []
    stop_kw = re.compile(
        r"\b(AS|END|OVER|FROM|WHERE|GROUP|ORDER|THEN|ELSE|WHEN)\b\s*$",
        re.IGNORECASE,
    )
    while i < len(text):
        ch = text[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        elif depth == 0 and ch in "+-,<>=" and out and "".join(out).strip():
            break
        elif depth == 0 and ch in "*":
            break
        out.append(ch)
        if depth == 0:
            m = stop_kw.search("".join(out))
            if m:
                out = list("".join(out)[: m.start()])
                break
        i += 1
    return _norm("".join(out))


_SAFE_SQL_DEN = re.compile(
    r"""^(
        \d+(\.\d+)?[DdLl]?                  # numeric literal
      | CAST\s*\(\s*-?\d+(\.\d+)?\s+AS\s+\w+\s*\)   # cast literal
      | COUNT\s*\(\s*(\*|1\s*\))            # COUNT(*) / COUNT(1) only:
                                            # COUNT(col) with a DIFFERENT
                                            # column than the numerator can
                                            # be a non-null 0 divisor
      | \(\s*COUNT\s*\(\s*(\*|1\s*\))
    )""",
    re.VERBOSE | re.IGNORECASE,
)


def _sql_hits(rel: str, lineno: int, text: str) -> list[tuple[str, int, str]]:
    hits = []
    for m in re.finditer(r"(?<!/)/(?!/)", text):
        # skip '//' (DuckDB int div never reaches here; defensive) and
        # the '/' inside 'try_divide' argument lists is fine by design —
        # only a BARE division operator is a hazard
        den = _sql_denominator(text, m.start())
        if not den:
            continue
        if _SAFE_SQL_DEN.match(den):
            continue
        # an expression made ONLY of numeric literals and arithmetic is a
        # compile-time constant — never zero unless written as zero
        if re.fullmatch(r"[\d\s.+*/()Ee-]+", den) and re.search(r"[1-9]", den):
            continue
        if ALLOWLIST.get((rel, den)):
            continue
        hits.append((rel, lineno, den))
    return hits


def _mentions_columns(seg: str) -> bool:
    return "F." in seg or "col(" in seg or "colRegex(" in seg


class _Auditor(ast.NodeVisitor):
    def __init__(
        self,
        rel: str,
        src: str,
        consts: dict[str, str],
        num_consts: dict[str, float],
    ):
        self.rel = rel
        self.src = src
        self.consts = consts  # module-level str constants by name
        self.num_consts = num_consts  # module-level numeric constants
        self.hits: list[tuple[str, int, str]] = []

    # ---- Python Column division ----
    def visit_BinOp(self, node: ast.BinOp) -> None:
        if isinstance(node.op, ast.Div):
            left = ast.get_source_segment(self.src, node.left) or ""
            right = ast.get_source_segment(self.src, node.right) or ""
            if _mentions_columns(left) or _mentions_columns(right):
                den = _norm(right)
                # F.lit(c): literal; F.count(...): an emitted group has
                # >= 1 row, and a zero non-null count forces a NULL
                # numerator, which Spark's Divide short-circuits before
                # the ANSI zero check
                safe = (
                    isinstance(node.right, ast.Constant)
                    # F.count(F.lit(..)) counts rows (>= 1 per emitted
                    # group); F.count(col) of a DIFFERENT column than the
                    # numerator can be a non-null 0 divisor -> allowlist
                    or re.match(r"^F\.lit\(|^F\.count\(\s*F\.lit\(", den)
                    # a module-level numeric constant is a compile-time
                    # non-zero denominator (zero would be written 0)
                    or (
                        isinstance(node.right, ast.Name)
                        and self.num_consts.get(node.right.id, 0) != 0
                    )
                )
                if not safe and not ALLOWLIST.get((self.rel, den)):
                    self.hits.append((self.rel, node.lineno, den))
        self.generic_visit(node)

    # ---- SQL-text surfaces ----
    def visit_Call(self, node: ast.Call) -> None:
        name = ""
        if isinstance(node.func, ast.Attribute):
            name = node.func.attr
        elif isinstance(node.func, ast.Name):
            name = node.func.id
        if name in SQL_CALL_NAMES:
            for arg in node.args:
                self._scan_sql_arg(arg)
        self.generic_visit(node)

    def _scan_sql_arg(self, arg: ast.AST) -> None:
        # constants INSIDE an f-string are handled by the JoinedStr
        # reconstruction below — scanning them standalone would produce
        # truncated denominators at interpolation boundaries
        fstr_parts = {
            id(part)
            for n in ast.walk(arg)
            if isinstance(n, ast.JoinedStr)
            for part in n.values
        }
        for n in ast.walk(arg):
            if (
                isinstance(n, ast.Constant)
                and isinstance(n.value, str)
                and id(n) not in fstr_parts
            ):
                self.hits.extend(_sql_hits(self.rel, n.lineno, n.value))
            elif isinstance(n, ast.Name) and n.id in self.consts:
                self.hits.extend(
                    _sql_hits(self.rel, n.lineno, self.consts[n.id])
                )
            elif isinstance(n, ast.JoinedStr):
                # reconstruct the template with {name} placeholders so a
                # division spanning an interpolation keeps a stable,
                # allowlistable denominator key; referenced module string
                # constants are scanned inline
                parts: list[str] = []
                for part in n.values:
                    if isinstance(part, ast.Constant) and isinstance(
                        part.value, str
                    ):
                        parts.append(part.value)
                    elif isinstance(part, ast.FormattedValue):
                        v = part.value
                        if isinstance(v, ast.Name) and v.id in self.consts:
                            parts.append(self.consts[v.id])
                        else:
                            seg = (
                                ast.get_source_segment(self.src, v) or "?"
                            )
                            parts.append("{" + _norm(seg) + "}")
                self.hits.extend(
                    _sql_hits(self.rel, n.lineno, "".join(parts))
                )


def _module_num_consts(tree: ast.Module) -> dict[str, float]:
    out: dict[str, float] = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if (
                isinstance(t, ast.Name)
                and isinstance(node.value, ast.Constant)
                and isinstance(node.value.value, (int, float))
            ):
                out[t.id] = float(node.value.value)
    return out


def _module_consts(tree: ast.Module) -> dict[str, str]:
    """Module-level string constants, skipping DuckDB-side names — the
    oracle mirrors (``*_DUCK``, ``*_D``) run where /0 is already NULL."""
    out: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if isinstance(t, ast.Name) and isinstance(node.value, ast.Constant):
                if isinstance(node.value.value, str):
                    if t.id.endswith(("_DUCK", "_D")) or "DUCK" in t.id:
                        continue
                    out[t.id] = node.value.value
    return out


def audit(root: pathlib.Path) -> list[tuple[str, int, str]]:
    hits: list[tuple[str, int, str]] = []
    for path in sorted(root.rglob("*.py")):
        rel = str(path.relative_to(ROOT))
        src = path.read_text()
        tree = ast.parse(src)
        a = _Auditor(rel, src, _module_consts(tree), _module_num_consts(tree))
        a.visit(tree)
        hits.extend(a.hits)
    # dedupe (the same constant can be referenced from several calls)
    seen, out = set(), []
    for h in hits:
        key = (h[0], h[2])
        if key not in seen:
            seen.add(key)
            out.append(h)
    return out


def main() -> int:
    hits = audit(ROOT / "lab_etl_spark")
    for rel, lineno, den in hits:
        print(f"{rel}:{lineno}: unguarded Spark-side division by `{den}`")
    return 1 if hits else 0


if __name__ == "__main__":
    raise SystemExit(main())
