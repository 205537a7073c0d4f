"""MongoDB source/sink over an injected pymongo-compatible client —
the runtime-transport counterpart of the ``mongo_find_filter`` renderer
(`functions/dialects.py`).

Reference behaviors mirrored (`/root/reference/adapters/mongodb/src/
index.ts:99-260`):

* ``table_query`` download: ``collection.find(filter)`` with projection
  (fields → ``{f: 1}``), sort (``field → 1/-1``), limit/skip
  (`index.ts:222-229`);
* ``custom_query`` download: ``config['custom_query']`` JSON parsed as
  the raw find-filter document (`index.ts:100-106`);
* ``collection_insert`` upload: ``insert_many`` (`index.ts:241-259`);
  download on that endpoint is an error, upload on any other is too;
* negative page offset clamped to 0 (`index.ts:211-213`).

Deliberate divergences (documented in SURVEY.md §7 watch-list #6):

* same-field filters are ``$and``-combined, not ``Object.assign``-merged
  (the reference silently drops the earlier filter);
* operators with no Mongo rendering (like/rlike/...) become Spark-side
  residuals instead of the reference's silent equality mistranslation
  (`index.ts:124: default: return {field: value}`).

Transport injection: ``config['collection']`` is any object with the
pymongo ``Collection`` surface (``find(filter, projection)`` returning a
cursor with ``sort/skip/limit``, ``insert_many``) — a real
``pymongo.MongoClient()[db][table]`` in production, an in-process fake
in tests (no mongo jar/driver ships in this container). Alternatively
``config['collection_factory'] = "pkg.mod:fn"`` resolves the collection
by dotted path; for the sink this moves inserts executor-side
(``foreachPartition``), the scale path for big loads.

Pushdown safety follows the engine-wide contract: the compiler re-applies
filters/sort/limit on the returned DataFrame (idempotent), so pushdown
here is a row-reduction optimization, never a correctness dependency.
The find-limit is pushed only when EVERY filter rendered into the find
document; a Spark-side offset widens the pushed limit window.
"""

from __future__ import annotations

import importlib
import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from openetl_spark.functions.dialects import mongo_find_filter
from openetl_spark.spec import Connector


def _resolve_collection(connector: Connector):
    cfg = connector.config
    if "collection" in cfg:
        return cfg["collection"]
    ref = cfg.get("collection_factory")
    if ref is None:
        raise ValueError(
            "mongodb adapter needs config['collection'] (pymongo-compatible "
            "object) or config['collection_factory'] ('pkg.mod:fn')"
        )
    mod, _, attr = ref.partition(":")
    return getattr(importlib.import_module(mod), attr)()


def render_find(connector: Connector) -> tuple[dict, bool]:
    """Connector filters → find document. Returns (filter_doc,
    fully_rendered); non-renderable operators stay Spark-side residuals."""
    if connector.endpoint_id == "custom_query":
        raw = connector.config.get("custom_query")
        if raw is None:
            raise ValueError("custom_query endpoint requires config['custom_query']")
        try:
            # fully_rendered only when there are no connector filters:
            # the compiler re-applies connector.filters AFTER ingest, so
            # pushing cursor.limit() under an un-rendered filter would
            # truncate before filtering (first-N-fetched bug).
            return json.loads(raw), not connector.filters
        except json.JSONDecodeError as e:  # reference: index.ts:104
            raise ValueError(f"Invalid custom query JSON: {e}") from e
    rendered, residual = [], []
    for f in connector.filters:
        try:
            doc = mongo_find_filter([f])
        except ValueError:
            residual.append(f)
        else:
            rendered.append(doc)
    if not rendered:
        return {}, not residual
    if len(rendered) == 1:
        return rendered[0], not residual
    return {"$and": rendered}, not residual


def filter_fields(filters) -> list[str]:
    """Field names referenced by a filter list (FilterGroup-aware) —
    shared by the mongo/service over-projection paths (r05: the
    services wire renderer previously carried its own copy of this
    walk)."""
    out: list[str] = []

    def walk(f) -> None:
        if hasattr(f, "filters"):  # FilterGroup
            for inner in f.filters:
                walk(inner)
        else:
            out.append(f.field)

    for f in filters:
        walk(f)
    return out


def _referenced_fields(connector: Connector) -> list[str]:
    """Fields the compiler's post-ingest filter/sort will touch."""
    return [*filter_fields(connector.filters), *(s.field for s in connector.sort)]


class MongoSource:
    """``adapter_id='mongodb'``. ``endpoint_id`` ∈ {table_query,
    custom_query}; the collection itself comes from the injected client
    (config['table'] names it when using a factory over a db handle)."""

    def read(self, spark: SparkSession, connector: Connector) -> DataFrame:
        if connector.endpoint_id == "collection_insert":
            # reference: index.ts:207-209
            raise ValueError("collection_insert endpoint only supports upload")
        col = _resolve_collection(connector)
        find_doc, fully_rendered = render_find(connector)

        # Over-project: the compiler re-applies filters and the sort on
        # the returned DataFrame, so their columns must survive the
        # pushed projection; the compiler's own select then prunes to
        # connector.fields.
        proj_fields = list(connector.fields)
        if proj_fields:
            for extra in _referenced_fields(connector):
                if extra not in proj_fields:
                    proj_fields.append(extra)
        projection: dict[str, int] = {f: 1 for f in proj_fields}
        if "_id" not in proj_fields:
            # A real pymongo collection returns ObjectId _id in every doc
            # unless excluded — it breaks createDataFrame schema inference
            # and ships dead bytes otherwise.
            projection["_id"] = 0
        cursor = col.find(find_doc, projection)
        if connector.sort:
            cursor = cursor.sort(
                [(s.field, 1 if s.type == "asc" else -1) for s in connector.sort]
            )
        if connector.limit is not None and fully_rendered:
            # Mongo applies filter+sort before the limit, so the pushed
            # limit IS the true top-N; widen by the Spark-side offset
            offset = max(0, int(connector.offset or 0))  # clamp: index.ts:211
            cursor = cursor.limit(int(connector.limit) + offset)
        rows = list(cursor)
        schema = connector.config.get("schema")
        if not rows and schema is None:
            from pyspark.sql import types as T

            # Synthesize a schema from the projected fields so the
            # compiler's re-applied filters/sort/select still resolve —
            # an ordinary empty find must yield 0 rows, not
            # UNRESOLVED_COLUMN. Untyped (string) is fine: no rows means
            # no casts ever evaluate.
            return spark.createDataFrame(
                [],
                T.StructType(
                    [T.StructField(f, T.StringType()) for f in proj_fields]
                ),
            )
        return spark.createDataFrame(rows, schema=schema)


class MongoSink:
    """``insert_many`` load. With an in-process ``collection`` object the
    insert runs driver-side in ``batch_size`` chunks (the reference
    uploads its whole array single-process, index.ts:241-259); with a
    ``collection_factory`` dotted path it runs ``foreachPartition`` on
    executors — pickle-free and parallel, the 100 TB path."""

    def write(self, df: DataFrame, connector: Connector) -> None:
        if connector.endpoint_id != "collection_insert":
            # reference: index.ts:243-245
            raise ValueError("Upload only supported for collection_insert endpoint")
        cfg = connector.config
        batch_size = int(cfg.get("batch_size", 1000))
        factory = cfg.get("collection_factory")
        if factory and "collection" not in cfg:
            def insert_partition(rows) -> None:
                mod, _, attr = factory.partition(":")
                col = getattr(importlib.import_module(mod), attr)()
                batch: list[dict[str, Any]] = []
                for r in rows:
                    batch.append(r.asDict(recursive=True))
                    if len(batch) >= batch_size:
                        col.insert_many(batch)
                        batch = []
                if batch:
                    col.insert_many(batch)

            df.foreachPartition(insert_partition)
            return
        col = _resolve_collection(connector)
        batch = []
        for r in df.toLocalIterator():
            batch.append(r.asDict(recursive=True))
            if len(batch) >= batch_size:
                col.insert_many(batch)
                batch = []
        if batch:
            col.insert_many(batch)
