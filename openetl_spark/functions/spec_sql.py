"""ANSI-SQL renderer for the declarative QuerySpec — the eleventh
dialect renderer, targeting DuckDB/ANSI engines.

Two jobs:

1. Escape hatch / interop: show (or ship to a SQL backend) the exact
   SQL equivalent of a declarative analytic query — the analytic
   counterpart of the reference's per-adapter query builders
   (`/root/reference/adapters/postgresql/src/index.ts:147-190`).
2. Test leverage: the randomized QuerySpec fuzzer compiles each random
   spec BOTH ways — ``compile_query`` on Spark and ``render_query``
   on DuckDB — and hash-compares the results, so the declarative
   layer's semantics are pinned engine-to-engine, not just
   hand-example-by-hand-example.

Rendering mirrors `functions/filters.py` leaf-for-leaf (SQL three-
valued logic matches Spark's Column semantics for every operator:
``!=``/``NOT LIKE``/``NOT IN`` all exclude NULLs on both engines).
Values are rendered as SQL literals with ``''`` escaping — the same
convention the reference uses (`adapters/postgresql/src/index.ts:206-221`);
this renderer is for trusted specs, not untrusted user input.
"""

from __future__ import annotations

from typing import Any

from openetl_spark.spec import Filter, FilterGroup, QuerySpec


def lit(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _like_escape(v: str) -> str:
    """Escape a value for interpolation INSIDE a single-quoted LIKE
    pattern: wildcard escaping for %/_/\\ plus '' doubling for the
    string literal itself (skipping the quote let a value containing
    ' break the statement — review finding r08)."""
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace("%", "\\%")
        .replace("_", "\\_")
        .replace("'", "''")
    )


def render_filter(f) -> str:
    if isinstance(f, FilterGroup):
        if not f.filters:
            return "TRUE"
        joiner = f" {f.op} "
        return "(" + joiner.join(render_filter(x) for x in f.filters) + ")"
    c, op, v = f.field, f.operator, f.value
    if op in ("=", "!=", ">", ">=", "<", "<="):
        sqlop = "<>" if op == "!=" else op
        return f"{c} {sqlop} {lit(v)}"
    if op == "contains":
        return f"{c} LIKE '%{_like_escape(v)}%' ESCAPE '\\'"
    if op == "not_contains":
        return f"{c} NOT LIKE '%{_like_escape(v)}%' ESCAPE '\\'"
    if op == "in":
        return f"{c} IN ({', '.join(lit(x) for x in v)})"
    if op == "not_in":
        return f"{c} NOT IN ({', '.join(lit(x) for x in v)})"
    if op == "between":
        return f"{c} BETWEEN {lit(v[0])} AND {lit(v[1])}"
    if op == "not_between":
        return f"{c} NOT BETWEEN {lit(v[0])} AND {lit(v[1])}"
    if op == "is_null":
        return f"{c} IS NULL"
    if op == "is_not_null":
        return f"{c} IS NOT NULL"
    if op == "like":
        return f"{c} LIKE {lit(v)}"
    if op == "starts_with":
        return f"{c} LIKE '{_like_escape(v)}%' ESCAPE '\\'"
    if op == "ends_with":
        return f"{c} LIKE '%{_like_escape(v)}' ESCAPE '\\'"
    if op == "rlike":
        return f"regexp_matches({c}, {lit(v)})"
    raise ValueError(f"unknown filter operator {op!r}")


def _render_filters(filters) -> str:
    return " AND ".join(render_filter(f) for f in filters)


def render_query(spec: "QuerySpec | SetOp | dict") -> str:
    """QuerySpec → one ANSI SELECT (windows render as a wrapping CTE so
    the HAVING stage can filter on window outputs, mirroring
    compile_query's stage order). SetOps render as parenthesized
    UNION/INTERSECT/EXCEPT chains; derived tables (a nested QuerySpec
    as ``table`` or a join target) render as aliased subqueries with
    USING joins (matching Spark's column-merging join-on-list
    semantics)."""
    from openetl_spark.spec import SetOp, spec_from_dict

    spec = spec_from_dict(spec)
    if isinstance(spec, SetOp):
        kw = {"union_all": " UNION ALL ", "union": " UNION ",
              "intersect": " INTERSECT ", "except": " EXCEPT "}[spec.op]
        sql = kw.join(f"({render_query(i)})" for i in spec.inputs)
        if spec.sort or spec.limit is not None:
            sql = f"SELECT * FROM ({sql})"
            if spec.sort:
                sql += " ORDER BY " + ", ".join(
                    f"{s.field} {s.type.upper()}" for s in spec.sort
                )
            if spec.limit is not None:
                sql += f" LIMIT {spec.limit}"
        return sql

    def _rel(t, fallback: str):
        if isinstance(t, (QuerySpec, SetOp)):
            name = getattr(t, "alias", None) or fallback
            return f"({render_query(t)}) AS {name}", name
        return t, t

    base_sql, _base_name = _rel(spec.table, "t0")
    frm = [base_sql]
    for k, j in enumerate(spec.joins):
        jsql, _jname = _rel(j.table, f"t{k + 1}")
        on = list(j.on)
        kws = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
               "full": "FULL JOIN", "full_outer": "FULL JOIN",
               # Spark accepts these spellings in compile_query; render
               # them rather than raising a bare KeyError
               "left_outer": "LEFT JOIN", "leftouter": "LEFT JOIN",
               "right_outer": "RIGHT JOIN", "rightouter": "RIGHT JOIN",
               "fullouter": "FULL JOIN", "outer": "FULL JOIN",
               "semi": "SEMI JOIN", "left_semi": "SEMI JOIN",
               "leftsemi": "SEMI JOIN", "anti": "ANTI JOIN",
               "left_anti": "ANTI JOIN", "leftanti": "ANTI JOIN",
               "cross": "CROSS JOIN"}
        if j.how not in kws:
            raise ValueError(f"unsupported join type for SQL rendering: {j.how!r}")
        kw = kws[j.how]
        if j.how == "cross":
            frm.append(f"CROSS JOIN {jsql}")
            continue
        if on and isinstance(on[0], (list, tuple)):
            cond = " AND ".join(f"{l} = {r}" for l, r in on)
            frm.append(f"{kw} {jsql} ON {cond}")
        else:
            # column-name-list joins render USING for EVERY table kind:
            # it merges the key columns exactly like Spark's
            # join(on=[cols]) does (a qualified ON keeps both copies,
            # diverging from the compiled plan's output schema)
            frm.append(f"{kw} {jsql} USING ({', '.join(on)})")
    body = "FROM " + " ".join(frm)
    if spec.filters:
        body += " WHERE " + _render_filters(spec.filters)
    derived = [f"{expr} AS {alias}" for alias, expr in spec.derived.items()]
    cols = "*" if not derived else "*, " + ", ".join(derived)
    sql = f"SELECT {cols} {body}"

    if spec.aggregates:
        # derived columns are visible to group_by/aggregates through the
        # subquery, mirroring compile_query's derived-before-agg order
        terms = list(spec.group_by)
        for a in spec.aggregates:
            if a.fn == "count" and a.expr is None:
                e = "count(*)"
            elif a.fn == "count_distinct":
                e = f"count(DISTINCT {a.expr})"
            else:
                e = f"{a.fn}({a.expr})"
            if a.fn in ("count", "count_distinct"):
                e = f"CAST({e} AS BIGINT)"
            if a.round_dp is not None:
                e = f"round({e}, {a.round_dp})"
            terms.append(f"{e} AS {a.alias}")
        sql = f"SELECT {', '.join(terms)} FROM ({sql})"
        if spec.group_by:
            sql += " GROUP BY " + ", ".join(spec.group_by)

    if spec.windows:
        wterms = []
        for w in spec.windows:
            over = []
            if w.partition_by:
                over.append("PARTITION BY " + ", ".join(w.partition_by))
            if w.order_by:
                over.append(
                    "ORDER BY "
                    + ", ".join(f"{s.field} {s.type.upper()}" for s in w.order_by)
                )
            if getattr(w, "frame", None) is not None and w.fn not in (
                "row_number", "rank", "dense_rank", "lag", "lead"
            ):
                def _bound(b, side):
                    if b == "unbounded":
                        return f"UNBOUNDED {'PRECEDING' if side == 'lo' else 'FOLLOWING'}"
                    b = int(b)
                    if b == 0:
                        return "CURRENT ROW"
                    return f"{-b} PRECEDING" if b < 0 else f"{b} FOLLOWING"

                lo, hi = w.frame
                over.append(
                    f"ROWS BETWEEN {_bound(lo, 'lo')} AND {_bound(hi, 'hi')}"
                )
            ov = " ".join(over)
            if w.fn in ("row_number", "rank", "dense_rank"):
                e = f"{w.fn}()"
            elif w.fn in ("lag", "lead"):
                e = f"{w.fn}({w.expr}, {w.offset})"
            else:
                e = f"{w.fn}({w.expr})"
            wterms.append(f"{e} OVER ({ov}) AS {w.alias}")
        sql = f"SELECT *, {', '.join(wterms)} FROM ({sql})"

    if spec.having:
        sql = f"SELECT * FROM ({sql}) WHERE " + _render_filters(spec.having)
    if spec.select:
        kw = "SELECT DISTINCT" if spec.distinct else "SELECT"
        sql = f"{kw} {', '.join(spec.select)} FROM ({sql})"
    elif spec.distinct:
        sql = f"SELECT DISTINCT * FROM ({sql})"
    if spec.sort:
        sql += " ORDER BY " + ", ".join(
            f"{s.field} {s.type.upper()}" for s in spec.sort
        )
    if spec.limit is not None:
        sql += f" LIMIT {spec.limit}"
    return sql
