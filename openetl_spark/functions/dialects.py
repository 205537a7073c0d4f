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


# ---------------------------------------------------------------------
# SaaS wire dialects (VERDICT r03 #7/#8). Each renderer takes the
# ABSTRACT request parts emitted by sources.services.build_request
# (filters as {field, op, value} dicts, sorts as {field, dir}) and
# produces the exact native payload the reference adapter puts on the
# wire, so a production transport needs no dialect knowledge of its
# own. Pure functions; exact-payload unit tests in
# tests/test_dialects.py mirror the reference's request shapes.
# ---------------------------------------------------------------------

_HUBSPOT_OPS = {
    "=": "EQ", "!=": "NEQ", ">": "GT", ">=": "GTE", "<": "LT", "<=": "LTE",
    "contains": "CONTAINS_TOKEN", "not_contains": "NOT_CONTAINS_TOKEN",
    "in": "IN", "not_in": "NOT_IN", "between": "BETWEEN",
    "not_between": "NOT_BETWEEN", "is_null": "IS_NULL",
    "is_not_null": "NOT_NULL",
}


def hubspot_search_body(
    fields: Sequence[str],
    filters: Sequence[dict],
    sorts: Sequence[dict],
    limit: int | None = None,
    after: Any = None,
) -> dict:
    """HubSpot CRM search POST body — filterGroups/sorts/properties
    (reference `adapters/hubspot/src/index.ts:357-388`; operator map
    `:390-398`). Unknown operators pass through verbatim like the
    reference's `operatorMap[operator] || operator`."""
    body: dict = {}
    if limit:
        body["limit"] = limit
    if after:
        body["after"] = str(after)
    if fields:
        body["properties"] = list(fields)
    if filters:
        body["filterGroups"] = [
            {
                "filters": [
                    {
                        "propertyName": f["field"],
                        "operator": _HUBSPOT_OPS.get(f["op"], f["op"]),
                        "value": f["value"],
                    }
                    for f in filters
                ]
            }
        ]
    if sorts:
        body["sorts"] = [
            {
                "propertyName": s["field"],
                "direction": "ASCENDING" if s["dir"] == "asc" else "DESCENDING",
            }
            for s in sorts
        ]
    return body


_ZOHO_OPS = {
    "=": "equals", "!=": "not_equals", ">": "greater_than",
    ">=": "greater_equal", "<": "less_than", "<=": "less_equal",
    "contains": "contains", "not_contains": "not_contains",
    "in": "in", "not_in": "not_in",
}


def zoho_query_params(
    fields: Sequence[str],
    filters: Sequence[dict],
    sorts: Sequence[dict],
    limit: int | None = None,
    offset: int | None = None,
) -> dict:
    """Zoho CRM query params — `(field:op:value)` criteria joined with
    ' and ', comma-joined fields, single sort key, per_page/page
    windowing (reference `adapters/zoho/src/index.ts:348-379` and the
    download pager `:382-398`)."""
    params: dict = {}
    if fields:
        params["fields"] = ",".join(fields)
    if filters:
        params["criteria"] = " and ".join(
            f"({f['field']}:{_ZOHO_OPS.get(f['op'], f['op'])}:{f['value']})"
            for f in filters
        )
    if sorts:
        params["sort_by"] = sorts[0]["field"]
        params["sort_order"] = sorts[0]["dir"]
    if limit is not None:
        params["per_page"] = limit
        params["page"] = (int(offset) // int(limit) + 1) if offset else 1
    return params


def stripe_query_params(
    endpoint_path: str,
    filters: Sequence[dict],
    limit: int | None = None,
    offset: Any = None,
) -> dict:
    """Stripe params — search endpoints (path ends '/search') render a
    `query` string (`field:value`, `-field:value` for !=, strings
    double-quoted, joined with ' AND '); list endpoints pass filters as
    flat params. Search pages with `page`, lists with `starting_after`;
    a search endpoint with no rendered query degrades to list
    pagination (reference `adapters/stripe/src/index.ts:240-331`; its
    `replace(/"/g, '\\"')` is a no-op — the TS literal '\\"' is just a
    quote — so embedded quotes pass through verbatim here too)."""
    is_search = endpoint_path.endswith("/search")
    params: dict = {}
    if is_search:
        terms = []
        for f in filters:
            v = f["value"]
            rendered = f'"{v}"' if isinstance(v, str) else v
            if f["op"] == "!=":
                terms.append(f"-{f['field']}:{rendered}")
            else:
                op = ":" if f["op"] == "=" else f["op"]
                terms.append(f"{f['field']}{op}{rendered}")
        if terms:
            params["query"] = " AND ".join(terms)
        else:
            is_search = False
    else:
        for f in filters:
            params[f["field"]] = f["value"]
    if limit:
        params["limit"] = limit
    if offset:
        params["page" if is_search else "starting_after"] = offset
    return params


XERO_PARAM_FILTERS = ("includeArchived", "searchTerm")


def xero_wire(
    filters: Sequence[dict],
    limit: int | None = None,
    offset: int | None = None,
) -> dict:
    """Xero params + headers — `includeArchived`/`searchTerm` equality
    filters route to query params, `Modified After` equality to the
    `If-Modified-Since` header, everything else into the `where`
    string (`field{op}'value'` joined with ' AND '); page/pageSize
    windowing. Reference `adapters/xero/src/index.ts:294-333`; string
    offsets are rejected like the reference's guard."""
    params: dict = {}
    headers: dict = {}
    where = []
    for f in filters:
        if f["field"] in XERO_PARAM_FILTERS:
            if f["op"] == "=":
                params[f["field"]] = f["value"]
        elif f["field"] == "Modified After":
            if f["op"] == "=":
                headers["If-Modified-Since"] = f["value"]
        else:
            where.append(f"{f['field']}{f['op']}'{f['value']}'")
    if where:
        params["where"] = " AND ".join(where)
    if limit is not None:
        if isinstance(offset, str):
            raise ValueError(
                "Download endpoints of the Xero dialect don't accept a "
                "string as offset"
            )
        params["page"] = int(offset or 0) // int(limit) + 1
        params["pageSize"] = limit
    return {"params": params, "headers": headers}


GMAIL_PARAM_FILTERS = ("labelIds", "includeSpamTrash")


def gmail_query_params(
    endpoint_id: str,
    filters: Sequence[dict],
    limit: int | None = None,
    offset: Any = None,
) -> dict:
    """Gmail params — `get-message` passes equality filters as params;
    `list-messages` routes `labelIds`/`includeSpamTrash` equalities to
    params and renders everything else into the `q` search string
    (`field:value`, `-field:value` for any non-equality), space-joined.
    list-* endpoints page with maxResults/pageToken (pageToken omitted
    for offset 0/'0'). Reference `adapters/gmail/src/index.ts:170-236`.
    Filter groups are rejected upstream by the descriptor's operator
    mask, mirroring the adapter's explicit throw."""
    params: dict = {}
    if endpoint_id == "get-message":
        for f in filters:
            if f["op"] == "=":
                params[f["field"]] = f["value"]
    elif endpoint_id == "list-messages":
        q_terms = []
        for f in filters:
            if f["field"] in GMAIL_PARAM_FILTERS and f["op"] == "=":
                params[f["field"]] = f["value"]
            else:
                neg = "" if f["op"] == "=" else "-"
                q_terms.append(f"{neg}{f['field']}:{f['value']}")
        if q_terms:
            params["q"] = " ".join(q_terms)
    if endpoint_id in ("list-threads", "list-messages") and limit is not None:
        params["maxResults"] = limit
        if offset not in (None, 0, "0"):
            params["pageToken"] = str(offset)
    return params
