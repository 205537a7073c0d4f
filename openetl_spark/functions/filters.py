"""Canonical filter vocabulary → Spark Column predicates.

The reference translates ``{field, operator, value}`` lists into each
backend's dialect (SQL WHERE: `/root/reference/adapters/postgresql/src/index.ts:165-169`;
Mongo `$gt/...`: `adapters/mongodb/src/index.ts:112-127`; HubSpot
filterGroups: `adapters/hubspot/src/index.ts:390-398`). Here the single
translation target is a Catalyst ``Column`` — Spark then pushes it down
to the scan (parquet row-group skipping / JDBC WHERE) automatically, so
one implementation serves every source.

The reference AND-joins a flat list; we additionally accept nested
AND/OR ``FilterGroup`` trees (declared-but-disabled in the reference,
SURVEY.md §2A.1).
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

from openetl_spark.spec import Filter, FilterGroup, FilterLike


def compile_filter(flt: FilterLike) -> Column:
    if isinstance(flt, FilterGroup):
        if not flt.filters:
            return F.lit(True)
        cols = [compile_filter(f) for f in flt.filters]
        if flt.op == "AND":
            return reduce(lambda a, b: a & b, cols)
        if flt.op == "OR":
            return reduce(lambda a, b: a | b, cols)
        raise ValueError(f"unknown group op {flt.op!r}")
    return _compile_leaf(flt)


def _compile_leaf(flt: Filter) -> Column:
    c = F.col(flt.field)
    op, v = flt.operator, flt.value
    if op == "=":
        return c == F.lit(v)
    if op == "!=":
        return c != F.lit(v)
    if op == ">":
        return c > F.lit(v)
    if op == ">=":
        return c >= F.lit(v)
    if op == "<":
        return c < F.lit(v)
    if op == "<=":
        return c <= F.lit(v)
    if op == "contains":
        return c.contains(v)
    if op == "not_contains":
        return ~c.contains(v)
    if op == "in":
        return c.isin(list(v))
    if op == "not_in":
        return ~c.isin(list(v))
    if op == "between":
        lo, hi = v
        return c.between(lo, hi)
    if op == "not_between":
        lo, hi = v
        return ~c.between(lo, hi)
    if op == "is_null":
        return c.isNull()
    if op == "is_not_null":
        return c.isNotNull()
    if op == "like":
        return c.like(v)
    if op == "rlike":
        return c.rlike(v)
    if op == "starts_with":
        return c.startswith(v)
    if op == "ends_with":
        return c.endswith(v)
    raise ValueError(f"unknown filter operator {op!r}")


def compile_filters(filters: Iterable[FilterLike]) -> Column | None:
    """AND-join a flat filter list (the reference's only combination mode)."""
    filters = list(filters)
    if not filters:
        return None
    return reduce(lambda a, b: a & b, (compile_filter(f) for f in filters))
