"""REST endpoints as a first-class Spark data source (Python Data
Source API, Spark 4) — ``spark.read.format("openetl_rest")``.

This is the scale-path complement to the driver-side paginator in
``rest.py`` (SURVEY.md §7 step 4): offset-paginated endpoints are
*partitionable*, so page ranges fan out to executors as
``InputPartition``s and every executor pulls its own pages in parallel
— the distributed replacement for the reference's strictly serial page
loop (`/root/reference/src/index.ts:224-282`). Cursor endpoints remain
a single partition by construction (a cursor chain cannot be split;
SURVEY §7 watch-list #2).

Catalyst integration:

* ``pushFilters`` (Spark 4.1): Spark hands the compiled predicates to
  the source; comparison filters on top-level fields translate into the
  request (the engine-side analogue of each reference adapter's
  WHERE/search-payload builder) AND are all yielded back as residuals,
  so Spark re-checks them post-scan — pushdown is a row-reduction
  optimization, never a correctness dependency on the transport.
* options are plain strings, so the transport is referenced by dotted
  path (``module:callable``) and imported on executors — pickle-free
  and cluster-safe.

Options:
  transport    "pkg.mod:fn" → fn(request: dict, page_options: dict) -> page dict
  schema_ddl   result schema, e.g. "id long, name string"
  pagination   offset | cursor            (default offset)
  items_per_page, max_items_per_page, total_count (offset mode; enables
               partition fan-out: ceil(total/items) pages split over
               num_partitions)
  num_partitions  executor fan-out for offset mode (default 4)
  base_url, path  forwarded to the transport in the request dict
"""

from __future__ import annotations

import importlib
import json
import math
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_PUSHABLE = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


def _resolve(ref: str):
    mod, _, attr = ref.partition(":")
    return getattr(importlib.import_module(mod), attr)


@dataclass
class PageRange(InputPartition):
    start_offset: int
    end_offset: int  # exclusive; -1 = open-ended (single partition)


class RestReader(DataSourceReader):
    def __init__(self, options: dict[str, str], schema: StructType):
        self.options = options
        self.result_schema = schema
        self.pushed: list[dict] = []

    def pushFilters(self, filters):
        for f in filters:
            op = _PUSHABLE.get(type(f))
            # attribute is a tuple path; REST fields are top-level only
            if op is not None and len(f.attribute) == 1:
                self.pushed.append(
                    {"field": f.attribute[0], "op": op, "value": f.value}
                )
            # yield EVERY filter back as a residual, even when pushed:
            # re-evaluation is cheap and idempotent, and correctness no
            # longer depends on the user transport honoring
            # request['filters'] — a transport that ignores them now
            # returns extra rows that Spark filters out, instead of
            # silently presenting unfiltered rows as filtered
            yield f

    def _page_size(self) -> int:
        size = int(self.options.get("items_per_page", "100"))
        cap = self.options.get("max_items_per_page")
        return min(size, int(cap)) if cap else size

    def partitions(self):
        if self.options.get("pagination", "offset") == "cursor":
            return [PageRange(0, -1)]
        total = self.options.get("total_count")
        if total is None:
            return [PageRange(0, -1)]  # unknown length → serial scan
        total = int(total)
        n_parts = max(1, int(self.options.get("num_partitions", "4")))
        page = self._page_size()
        pages = max(1, math.ceil(total / page))
        per_part = max(1, math.ceil(pages / n_parts))
        out = []
        for p in range(0, pages, per_part):
            out.append(PageRange(p * page, min((p + per_part) * page, total)))
        return out

    def read(self, partition: PageRange):
        transport = _resolve(self.options["transport"])
        page = self._page_size()
        request = {
            "url": self.options.get("base_url", "") + self.options.get("path", ""),
            "filters": self.pushed,
            "fields": [f.name for f in self.result_schema.fields],
        }
        names = [f.name for f in self.result_schema.fields]
        pagination = self.options.get("pagination", "offset")

        if pagination == "cursor":
            cursor = None
            while True:
                res = transport(request, {"limit": page, "offset": cursor})
                for row in res.get("data", []):
                    yield tuple(row.get(n) for n in names)
                cursor = res.get("next_cursor")
                if not cursor:  # any falsy token ('' / 0 / None) ends
                    break       # the stream, matching the reference's
                    # `while (cursor)` loop — `is None` alone looped
                    # forever on APIs returning next_cursor: ''
            return

        offset = partition.start_offset
        while partition.end_offset < 0 or offset < partition.end_offset:
            limit = page
            if partition.end_offset >= 0:
                limit = min(page, partition.end_offset - offset)
            res = transport(request, {"limit": limit, "offset": offset})
            data = res.get("data", [])
            for row in data:
                yield tuple(row.get(n) for n in names)
            if len(data) < limit:
                break  # short page = end of data
            offset += len(data)


class RestStreamReader(SimpleDataSourceStreamReader):
    """C20 for REST: an endpoint as an unbounded stream. The offset dict
    tracks the pagination cursor; each micro-batch pulls up to
    ``max_pages_per_trigger`` pages of NEW rows past the committed
    offset. Exactly-once within Spark: offsets are checkpointed and
    ``readBetweenOffsets`` replays a committed range
    deterministically (requires the endpoint to be append-only and
    offset-stable, the same contract incremental REST syncs assume)."""

    def __init__(self, options: dict[str, str], schema: StructType):
        self.options = options
        self.names = [f.name for f in schema.fields]
        self.page = int(options.get("items_per_page", "100"))
        cap = options.get("max_items_per_page")
        if cap:
            self.page = min(self.page, int(cap))
        self.max_pages = int(options.get("max_pages_per_trigger", "1"))

    def _transport(self):
        return _resolve(self.options["transport"])

    def _request(self) -> dict:
        return {
            "url": self.options.get("base_url", "") + self.options.get("path", ""),
            "filters": [],
            "fields": self.names,
        }

    def initialOffset(self) -> dict:
        return {"offset": int(self.options.get("initial_offset", "0"))}

    def _fetch_range(self, start: int, max_pages: int | None):
        transport = self._transport()
        rows, offset, pages = [], start, 0
        while max_pages is None or pages < max_pages:
            res = transport(self._request(), {"limit": self.page, "offset": offset})
            data = res.get("data", [])
            rows.extend(tuple(r.get(n) for n in self.names) for r in data)
            offset += len(data)
            pages += 1
            if len(data) < self.page:
                break
        return rows, offset

    def read(self, start: dict):
        rows, end = self._fetch_range(int(start["offset"]), self.max_pages)
        return iter(rows), {"offset": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, hi = int(start["offset"]), int(end["offset"])
        transport = self._transport()
        rows, offset = [], lo
        while offset < hi:
            res = transport(
                self._request(), {"limit": min(self.page, hi - offset), "offset": offset}
            )
            data = res.get("data", [])
            if not data:
                break
            rows.extend(tuple(r.get(n) for n in self.names) for r in data)
            offset += len(data)
        return iter(rows)


class RestDataSource(DataSource):
    """``spark.read.format("openetl_rest").options(...)``; register with
    ``spark.dataSource.register(RestDataSource)``. Also streamable:
    ``spark.readStream.format("openetl_rest")`` polls the endpoint for
    new rows per micro-batch."""

    @classmethod
    def name(cls) -> str:
        return "openetl_rest"

    def schema(self):
        return self.options["schema_ddl"]

    def reader(self, schema: StructType) -> RestReader:
        return RestReader(dict(self.options), schema)

    def simpleStreamReader(self, schema: StructType) -> RestStreamReader:
        return RestStreamReader(dict(self.options), schema)


def register(spark) -> None:
    # pushFilters requires the (runtime-settable) python pushdown flag.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(RestDataSource)
