"""Filter-dialect renderers for pushdown targets the engine can't run
in-container (no MongoDB connector jar / no Google Ads network): the
canonical filter vocabulary rendered into each backend's query language,
unit-tested as pure functions.

Reference behaviors mirrored:

* MongoDB find-filters (`/root/reference/adapters/mongodb/src/index.ts:99-152`):
  ``$gt/$gte/$lt/$lte/$ne`` operator docs, equality as a bare value.
  The reference merges same-field filters with Object.assign so a later
  filter OVERWRITES an earlier one — a documented bug (SURVEY.md §7
  watch-list #6); this renderer AND-combines them with ``$and`` like
  every SQL adapter does.
* GAQL (`/root/reference/adapters/google-ads/src/index.ts:191-234`):
  ``SELECT fields FROM resource WHERE cond AND ... ORDER BY ...
  LIMIT n`` with string values single-quoted.

GAQL remains a renderer only (no network/creds in scope). The Mongo
rendering is executed end-to-end by ``sources/mongo.py`` against any
pymongo-compatible collection (in-container: the fake transport in
``tests/fake_mongo.py``); negated operators render with explicit null
exclusion (``$nin [v, None]``) so the rendered predicate is row-for-row
equal to the engine's SQL semantics — Mongo's bare ``$ne`` matches
null/missing docs, SQL ``!=`` does not.
"""

from __future__ import annotations

from typing import Any, Sequence

from openetl_spark.spec import Filter, FilterGroup, FilterLike, Sort

_MONGO_OPS = {
    ">": "$gt",
    ">=": "$gte",
    "<": "$lt",
    "<=": "$lte",
    "in": "$in",
}


def mongo_find_filter(filters: Sequence[FilterLike]) -> dict:
    """Canonical filters → MongoDB find() filter document."""
    clauses = [_mongo_one(f) for f in filters]
    if not clauses:
        return {}
    if len(clauses) == 1:
        return clauses[0]
    # $and, NOT Object.assign: two filters on the same field must both
    # apply (the reference silently drops the earlier one)
    return {"$and": clauses}


def _mongo_one(flt: FilterLike) -> dict:
    if isinstance(flt, FilterGroup):
        inner = [_mongo_one(f) for f in flt.filters]
        return {"$and" if flt.op == "AND" else "$or": inner}
    f, op, v = flt.field, flt.operator, flt.value
    if op == "=":
        return {f: v}
    # Negated operators need SQL null semantics, not Mongo's: $ne/$nin/
    # $not match null-or-missing docs, while SQL `f != v` is false when
    # f is null. Adding None to a $nin list (None matches missing too)
    # makes the rendered predicate row-for-row equal to the engine's —
    # which is what lets limit pushdown stay correct through this dialect.
    if op == "!=":
        return {f: {"$nin": [v, None]}}
    if op == "not_in":
        return {f: {"$nin": list(v) + [None]}}
    if op in _MONGO_OPS:
        return {f: {_MONGO_OPS[op]: list(v) if op == "in" else v}}
    if op == "between":
        return {f: {"$gte": v[0], "$lte": v[1]}}
    if op == "not_between":
        return {"$or": [{f: {"$lt": v[0]}}, {f: {"$gt": v[1]}}]}
    if op == "is_null":
        return {f: None}
    if op == "is_not_null":
        return {f: {"$ne": None}}
    if op == "contains":
        return {f: {"$regex": _regex_escape(v)}}
    if op == "not_contains":
        return {f: {"$not": {"$regex": _regex_escape(v)}, "$ne": None}}
    raise ValueError(f"operator {op!r} has no MongoDB rendering")


def _regex_escape(s: str) -> str:
    import re

    return re.escape(str(s))


def _gaql_value(v: Any) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return str(v)
    return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"


def gaql_query(
    resource: str,
    fields: Sequence[str],
    filters: Sequence[FilterLike] = (),
    sort: Sequence[Sort] = (),
    limit: int | None = None,
) -> str:
    """Canonical spec → GAQL string (Google Ads Query Language)."""
    parts = [f"SELECT {', '.join(fields)} FROM {resource}"]
    conds = [_gaql_cond(f) for f in filters]
    if conds:
        parts.append("WHERE " + " AND ".join(conds))
    if sort:
        parts.append(
            "ORDER BY " + ", ".join(f"{s.field} {'ASC' if s.type == 'asc' else 'DESC'}" for s in sort)
        )
    if limit is not None:
        parts.append(f"LIMIT {int(limit)}")
    return " ".join(parts)


def _gaql_cond(flt: FilterLike) -> str:
    if isinstance(flt, FilterGroup):
        raise ValueError("GAQL has no OR/grouping support — apply groups in Spark")
    f, op, v = flt.field, flt.operator, flt.value
    if op in ("=", "!=", ">", ">=", "<", "<="):
        return f"{f} {op} {_gaql_value(v)}"
    if op == "in":
        return f"{f} IN ({', '.join(_gaql_value(x) for x in v)})"
    if op == "not_in":
        return f"{f} NOT IN ({', '.join(_gaql_value(x) for x in v)})"
    if op == "between":
        return f"{f} >= {_gaql_value(v[0])} AND {f} <= {_gaql_value(v[1])}"
    if op == "contains":
        return f"{f} LIKE {_gaql_value('%' + str(v) + '%')}"
    if op == "is_null":
        return f"{f} IS NULL"
    if op == "is_not_null":
        return f"{f} IS NOT NULL"
    raise ValueError(f"operator {op!r} has no GAQL rendering")
