"""Importable mock transport for the Python-DataSource REST tests —
referenced by dotted path in reader options and imported on executor
workers (which is exactly the production pattern for a real HTTP
client: no closures cross the wire, only strings)."""

from __future__ import annotations

N_ROWS = 237


def rows():
    return [{"id": i, "name": f"Item{i}", "score": float(i % 10)} for i in range(N_ROWS)]


def serve(request: dict, page_options: dict) -> dict:
    data = rows()
    # honor pushed-down comparison filters (the mock "database")
    for f in request.get("filters", []):
        op, field, v = f["op"], f["field"], f["value"]
        cmp = {
            "=": lambda x: x == v,
            ">": lambda x: x > v,
            ">=": lambda x: x >= v,
            "<": lambda x: x < v,
            "<=": lambda x: x <= v,
        }[op]
        data = [r for r in data if cmp(r[field])]
    off = int(page_options["offset"] or 0)
    limit = page_options["limit"]
    page = data[off : off + limit]
    nxt = off + limit if off + limit < len(data) else None
    return {"data": page, "next_cursor": nxt}


def serve_ignoring_filters(request: dict, page_options: dict) -> dict:
    """A non-compliant transport that drops request['filters'] — used to
    prove pushdown is never a correctness dependency."""
    return serve({**request, "filters": []}, page_options)


CALLS: list = []  # best-effort call log (driver-side runs only)
