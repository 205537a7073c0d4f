"""In-process fake of the pymongo Collection surface — executes find
filter documents / sort / projection / skip / limit / insert_many on
plain dicts, mirroring what `tests/mock_http.py` does for REST. Lets the
Mongo adapter run a real round-trip without a mongod or driver jar.

Semantics follow MongoDB's documented query behavior (the parts the
rendered dialect uses): bare equality, $gt/$gte/$lt/$lte/$ne, $in/$nin,
$and/$or, $regex/$not-$regex, `{f: None}` matches missing-or-null while
`{f: {$ne: None}}` matches present-and-not-null, and comparisons on a
missing field never match.
"""

from __future__ import annotations

import re
from typing import Any


_MISSING = object()


def _cmp_match(val: Any, op: str, arg: Any) -> bool:
    if op == "$ne":
        if arg is None:
            return val is not _MISSING and val is not None
        return val is _MISSING or val != arg
    if op == "$in":
        # a None in the $in list matches missing fields (Mongo: null
        # matches null-or-missing)
        if val is _MISSING:
            return None in arg
        return val in arg
    if op == "$nin":
        if val is _MISSING:
            return None not in arg
        return val not in arg
    if op == "$regex":
        return val is not _MISSING and val is not None and re.search(arg, str(val)) is not None
    if op == "$not":
        return not _op_doc_match(val, arg)
    if val is _MISSING or val is None:
        return False  # ordered comparisons never match missing/null
    try:
        return {
            "$gt": val > arg,
            "$gte": val >= arg,
            "$lt": val < arg,
            "$lte": val <= arg,
        }[op]
    except KeyError:
        raise ValueError(f"fake mongo: unsupported operator {op!r}")


def _op_doc_match(val: Any, opdoc: dict) -> bool:
    return all(_cmp_match(val, op, arg) for op, arg in opdoc.items())


def match(doc: dict, flt: dict) -> bool:
    for key, cond in flt.items():
        if key == "$and":
            if not all(match(doc, c) for c in cond):
                return False
        elif key == "$or":
            if not any(match(doc, c) for c in cond):
                return False
        else:
            val = doc.get(key, _MISSING)
            if isinstance(cond, dict):
                if not _op_doc_match(val, cond):
                    return False
            elif cond is None:
                if val is not _MISSING and val is not None:
                    return False  # {f: None} matches missing-or-null
            else:
                if val is _MISSING or val != cond:
                    return False
    return True


class FakeCursor:
    def __init__(self, docs: list[dict]):
        self._docs = docs
        self._sort: list[tuple[str, int]] | None = None
        self._skip = 0
        self._limit: int | None = None

    def sort(self, spec):
        self._sort = list(spec.items()) if isinstance(spec, dict) else list(spec)
        return self

    def skip(self, n: int):
        self._skip = max(0, int(n))
        return self

    def limit(self, n: int):
        self._limit = int(n)
        return self

    def _materialize(self) -> list[dict]:
        docs = self._docs
        if self._sort:
            # mongo sorts null/missing first ascending; stable multi-key
            # via reversed single-key passes
            for field, direction in reversed(self._sort):
                docs = sorted(
                    docs,
                    key=lambda d: (d.get(field) is not None, d.get(field)),
                    reverse=direction < 0,
                )
        docs = docs[self._skip :]
        if self._limit is not None:
            docs = docs[: self._limit]
        return docs

    def __iter__(self):
        return iter(self._materialize())


class FakeObjectId:
    """Opaque stand-in for bson.ObjectId: not Spark-schema-inferable, so
    any adapter that leaks _id into createDataFrame fails loudly in
    tests, exactly as with real pymongo."""

    _ctr = 0

    def __init__(self):
        FakeObjectId._ctr += 1
        self.val = FakeObjectId._ctr

    def __repr__(self):
        return f"FakeObjectId({self.val})"


class FakeCollection:
    def __init__(self, docs: list[dict] | None = None):
        # Real mongo assigns an ObjectId _id to every stored document.
        self.docs: list[dict] = [
            {"_id": FakeObjectId(), **d} if "_id" not in d else dict(d)
            for d in (docs or [])
        ]
        self.find_calls: list[tuple[dict, dict | None]] = []

    def find(self, flt: dict | None = None, projection: dict | None = None) -> FakeCursor:
        flt = flt or {}
        self.find_calls.append((flt, projection))
        hits = [d for d in self.docs if match(d, flt)]
        if projection:
            keep = {k for k, v in projection.items() if v}
            if keep:  # inclusion projection (may also exclude _id)
                hits = [
                    {k: v for k, v in d.items() if k in keep or (k == "_id" and "_id" not in projection)}
                    for d in hits
                ]
            else:  # exclusion-only projection: all fields except listed
                drop = set(projection)
                hits = [{k: v for k, v in d.items() if k not in drop} for d in hits]
        else:
            hits = [dict(d) for d in hits]
        return FakeCursor(hits)

    def insert_many(self, docs: list[dict]):
        self.docs.extend(
            {"_id": FakeObjectId(), **d} if "_id" not in d else dict(d)
            for d in docs
        )
        return type("R", (), {"inserted_count": len(docs)})()
