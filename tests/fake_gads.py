"""In-process fake of the Google Ads ``googleAds:search`` surface —
parses the GAQL this engine's renderer emits (SELECT/FROM/WHERE/ORDER
BY/LIMIT) and evaluates it over nested result docs, the GAQL analogue
of ``tests/fake_mongo.py``. Lets the google-ads adapter run a real
round-trip (auth headers, token refresh on 401, dotted-path result
filtering) without network or credentials.

The evaluator covers exactly the operator set ``functions/dialects.py``
renders: ``= != > >= < <= IN NOT IN LIKE IS NULL IS NOT NULL`` plus the
BETWEEN expansion (two AND-ed comparisons). Conditions are AND-joined,
as GAQL requires.
"""

from __future__ import annotations

import re
from typing import Any

from openetl_spark.sources.rest import AuthError


def _path_get(doc: Any, dotted: str):
    cur = doc
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def _parse_value(tok: str):
    tok = tok.strip()
    if tok.upper() == "TRUE":
        return True
    if tok.upper() == "FALSE":
        return False
    if tok.startswith("'") and tok.endswith("'"):
        return tok[1:-1].replace("\\'", "'").replace("\\\\", "\\")
    try:
        return int(tok)
    except ValueError:
        return float(tok)


def _split_top(s: str, sep: str) -> list[str]:
    """Split on a separator outside single quotes."""
    out, depth_q, cur, i = [], False, "", 0
    up, n = s.upper(), len(sep)
    while i < len(s):
        c = s[i]
        if c == "'" and (i == 0 or s[i - 1] != "\\"):
            depth_q = not depth_q
        if not depth_q and up[i : i + n] == sep.upper():
            out.append(cur)
            cur = ""
            i += n
            continue
        cur += c
        i += 1
    out.append(cur)
    return out


def _cond_match(doc: dict, cond: str) -> bool:
    cond = cond.strip()
    m = re.match(r"^([\w.]+)\s+IS\s+NOT\s+NULL$", cond, re.I)
    if m:
        return _path_get(doc, m.group(1)) is not None
    m = re.match(r"^([\w.]+)\s+IS\s+NULL$", cond, re.I)
    if m:
        return _path_get(doc, m.group(1)) is None
    m = re.match(r"^([\w.]+)\s+(NOT\s+IN|IN)\s*\((.*)\)$", cond, re.I | re.S)
    if m:
        field, op, body = m.group(1), m.group(2).upper(), m.group(3)
        vals = [_parse_value(v) for v in _split_top(body, ",")]
        val = _path_get(doc, field)
        hit = val in vals
        return (not hit) if op.startswith("NOT") else hit
    m = re.match(r"^([\w.]+)\s+LIKE\s+(.+)$", cond, re.I | re.S)
    if m:
        val = _path_get(doc, m.group(1))
        pat = str(_parse_value(m.group(2)))
        if val is None:
            return False
        rx = "^" + re.escape(pat).replace("%", ".*").replace("_", ".") + "$"
        return re.match(rx, str(val), re.S) is not None
    m = re.match(r"^([\w.]+)\s*(!=|>=|<=|=|>|<)\s*(.+)$", cond, re.S)
    if m:
        val = _path_get(doc, m.group(1))
        op, arg = m.group(2), _parse_value(m.group(3))
        if val is None:
            return False  # SQL null semantics: comparisons never match
        return {
            "=": val == arg,
            "!=": val != arg,
            ">": val > arg,
            ">=": val >= arg,
            "<": val < arg,
            "<=": val <= arg,
        }[op]
    raise ValueError(f"fake gads: unparseable condition {cond!r}")


class FakeGoogleAds:
    """Callable transport: ``fake(query, headers) -> {"results": [...]}``.

    ``tables`` maps resource name → list of nested docs. ``valid_tokens``
    is the set of Bearer tokens accepted; anything else raises
    AuthError(401) — exercising the adapter's refresh-and-retry path.
    """

    def __init__(self, tables: dict[str, list[dict]], valid_tokens: set[str] | None = None):
        self.tables = tables
        self.valid_tokens = valid_tokens
        self.calls: list[tuple[str, dict]] = []

    def __call__(self, query: str, headers: dict) -> dict:
        self.calls.append((query, dict(headers)))
        if not headers.get("developer-token"):
            raise AuthError(401)
        if self.valid_tokens is not None:
            token = str(headers.get("Authorization", "")).removeprefix("Bearer ")
            if token not in self.valid_tokens:
                raise AuthError(401)

        m = re.match(
            r"^\s*SELECT\s+(.*?)\s+FROM\s+([\w.]+)"
            r"(?:\s+WHERE\s+(.*?))?"
            r"(?:\s+ORDER\s+BY\s+(.*?))?"
            r"(?:\s+LIMIT\s+(\d+))?\s*$",
            query,
            re.I | re.S,
        )
        if not m:
            raise ValueError(f"fake gads: unparseable GAQL {query!r}")
        _fields, table, where, order, limit = m.groups()
        docs = list(self.tables.get(table, []))
        if where:
            conds = [c for c in _split_top(where, " AND ") if c.strip()]
            docs = [d for d in docs if all(_cond_match(d, c) for c in conds)]
        if order:
            for part in reversed([p.strip() for p in order.split(",")]):
                toks = part.split()
                field = toks[0]
                desc = len(toks) > 1 and toks[1].upper() == "DESC"
                docs = sorted(
                    docs,
                    key=lambda d: (_path_get(d, field) is None, _path_get(d, field)),
                    reverse=desc,
                )
        if limit:
            docs = docs[: int(limit)]
        # Like the real API: each result row carries ONLY the SELECTed
        # attributes (re-nested) — an adapter that filters client-side on
        # a non-selected path would see nulls, which is exactly the bug
        # the source's over-SELECT guards against.
        fields = [f.strip() for f in _split_top(_fields, ",")]
        out = []
        for d in docs:
            item: dict = {}
            for f in fields:
                v = _path_get(d, f)
                if v is None:
                    continue
                parts = f.split(".")
                o = item
                for p in parts[:-1]:
                    o = o.setdefault(p, {})
                o[parts[-1]] = v
            out.append(item)
        return {"results": out}
