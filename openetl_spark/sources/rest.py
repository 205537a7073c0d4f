"""Generic paginated REST source — the reference's core extract loop
re-expressed as a driver-side ingest edge.

Reference behavior reproduced (SURVEY.md §2 A1-A5, A22-A24, A27):

* offset pagination — next offset = prev + items_per_page; stop on a
  short/empty page (`/root/reference/src/index.ts:230,280,296-305`);
* cursor pagination — next token from the page result; stop when the
  token is absent (`src/index.ts:226-228,279`); inherently serial, so it
  stays a driver-side loop (SURVEY.md §7 watch-list #2 — don't fake
  parallelism);
* per-page cap ``max_items_per_page`` clamping (`src/index.ts:145-161`);
* retry with fixed interval (`src/index.ts:36-90`);
* rate limiting: min inter-request interval = 1/rps (`src/index.ts:234-242`);
* deadline-as-truncation: on expiry return rows fetched so far with an
  explicit ``partial`` flag instead of silently truncating
  (`src/index.ts:57-61,256-262`; SURVEY.md §4 divergence note);
* total row limit with overshoot trim (`src/index.ts:284-286`);
* 401 → ``auth.refresh()`` then retry once; 429 → honor retry-after
  (`/root/reference/adapters/hubspot/src/index.ts:485-521`).

Transport is injected (``config['fetch_page']``) so services (HubSpot,
Stripe, ...) are pure descriptors and tests need no network. Pages are
accumulated driver-side then handed to ``spark.createDataFrame`` — the
correct architecture: a cursor API is a serial bounded stream, and all
*analytics* on the result happen distributed, after ingest.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openetl_spark.spec import Connector

# fetch_page(page_options) -> {"data": [...], "next_cursor": str|None,
#                              "status": int|None, "retry_after": float|None}
FetchPage = Callable[[dict], dict]


@dataclass
class PageResult:
    rows: list[Any]
    partial: bool  # deadline hit — explicit, never silent


class AuthError(Exception):
    def __init__(self, status: int, retry_after: float | None = None):
        super().__init__(f"http {status}")
        self.status = status
        self.retry_after = retry_after


class _DeadlineExceeded(Exception):
    """Internal: a retry backoff would outlive the ingest deadline."""


def paged_fetch(
    fetch_page: FetchPage,
    *,
    pagination: str = "offset",  # "offset" | "cursor" | "none"
    items_per_page: int = 100,
    max_items_per_page: int | None = None,
    initial_offset: int | str | None = None,
    total_limit: int | None = None,
    deadline_s: float | None = None,
    requests_per_second: float | None = None,
    max_retries: int = 0,
    retry_interval_s: float = 1.0,
    refresh_auth: Callable[[], None] | None = None,
    on_page: Callable[[int, int], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
    sink: Callable[[list], None] | None = None,
) -> PageResult:
    """Serial page-pull driver (≈ reference ``getDataSerially``).

    With ``sink`` set, each page's rows are handed off as they arrive
    and NOT retained — ``PageResult.rows`` comes back empty and driver
    memory is bounded by one page (the reference accumulates the whole
    extract on the heap, its documented 1M-row ceiling; VERDICT r02 #8).
    """
    if max_items_per_page is not None:
        items_per_page = min(items_per_page, max_items_per_page)
    # Edge guards (the reference's Mongo suite sweeps these: zero page
    # size, negative offset — SURVEY.md §5): a 0/negative page size
    # would never satisfy the short-page stop condition (infinite loop).
    items_per_page = max(1, int(items_per_page))

    rows: list[Any] = []
    n_kept = 0
    offset: int | str | None = initial_offset if initial_offset is not None else (
        0 if pagination == "offset" else None
    )
    if pagination == "offset" and isinstance(offset, int) and offset < 0:
        offset = 0
    start = clock()
    min_interval = (1.0 / requests_per_second) if requests_per_second else 0.0
    last_fetch_at: float | None = None
    page_no = 0

    def keep(data: list) -> None:
        nonlocal n_kept
        if total_limit is not None:
            data = data[: total_limit - n_kept]
        n_kept += len(data)
        if sink is not None:
            if data:
                sink(data)
        else:
            rows.extend(data)

    while True:
        if deadline_s is not None and clock() - start > deadline_s:
            return PageResult(rows=rows, partial=True)

        if min_interval and last_fetch_at is not None:
            wait = min_interval - (clock() - last_fetch_at)
            if wait > 0:
                sleep(wait)

        opts = {"limit": items_per_page, "offset": offset}
        try:
            page = _fetch_with_retry(
                fetch_page, opts, max_retries, retry_interval_s, refresh_auth,
                sleep,
                time_left=(
                    (lambda: start + deadline_s - clock())
                    if deadline_s is not None
                    else None
                ),
            )
        except _DeadlineExceeded:
            # a retry backoff (possibly a server-dictated retry-after)
            # would outlive the deadline: truncate now, same explicit
            # partial contract as the top-of-loop deadline check
            return PageResult(rows=rows, partial=True)
        last_fetch_at = clock()
        data = page.get("data") or []
        keep(data)
        page_no += 1
        if on_page:
            on_page(page_no, len(data))

        if total_limit is not None and n_kept >= total_limit:
            return PageResult(rows=rows, partial=False)

        if pagination == "cursor":
            nxt = page.get("next_cursor")
            # falsy token (None, '', 0) = no next page, matching the
            # reference's `while (cursor)` stop — an API that returns
            # next_cursor: '' on the last page must not loop forever
            if not nxt:
                break
            offset = nxt
        elif pagination == "offset":
            if len(data) < items_per_page:
                break  # short page = last page
            offset = int(offset or 0) + items_per_page
        else:  # "none": single fetch
            break

    return PageResult(rows=rows, partial=False)


class JsonlStagingWriter:
    """Write-through staging for huge extracts: buffers at most
    ``batch_rows`` rows, flushing each batch as one JSONL file under
    ``staging_dir``. Spark then reads the directory with its distributed
    JSON reader — each staged file is a scan split, so ingest
    parallelism comes from the layout, not from a giant driver list.
    JSONL (not parquet) because per-chunk schema inference can drift
    between chunks; Spark's JSON reader unifies the schema in its own
    pass over all files.

    Every staged row carries ``_ingest_seq`` (the driver's arrival
    counter): Spark's multi-file JSON scan orders splits for
    scheduling, NOT by file number, so without an explicit sequence a
    Spark-side ``offset``/``limit`` over staged data would skip an
    arbitrary window instead of the first-k-fetched rows the reference
    semantics require (review finding r08). The compiler orders by the
    sequence exactly when those semantics demand it and drops the
    column from user-visible output."""

    def __init__(self, staging_dir: str, batch_rows: int = 10_000):
        import glob
        import os

        os.makedirs(staging_dir, exist_ok=True)
        # A reused staging dir must start empty: a previous LARGER run's
        # leftover part files would silently join the new result (this
        # writer overwrites only the file numbers it reaches).
        for stale in glob.glob(os.path.join(staging_dir, "part-*.jsonl")):
            os.remove(stale)
        self.dir = staging_dir
        self.batch_rows = max(1, int(batch_rows))
        self.buf: list = []
        self.n_files = 0
        self.n_rows = 0
        self.n_seq = 0
        self.peak_buffered = 0

    def __call__(self, rows: list) -> None:
        self.buf.extend(rows)
        self.n_rows += len(rows)
        self.peak_buffered = max(self.peak_buffered, len(self.buf))
        while len(self.buf) >= self.batch_rows:
            self._flush(self.buf[: self.batch_rows])
            self.buf = self.buf[self.batch_rows :]

    def _flush(self, chunk: list) -> None:
        import json
        import os

        path = os.path.join(self.dir, f"part-{self.n_files:05d}.jsonl")
        base = self.n_seq
        with open(path, "w") as fh:
            for i, r in enumerate(chunk):
                fh.write(json.dumps({**r, "_ingest_seq": base + i}, default=str))
                fh.write("\n")
        self.n_seq += len(chunk)
        self.n_files += 1

    def close(self) -> None:
        if self.buf:
            self._flush(self.buf)
            self.buf = []


def _fetch_with_retry(
    fetch_page: FetchPage,
    opts: dict,
    max_retries: int,
    retry_interval_s: float,
    refresh_auth: Callable[[], None] | None,
    sleep: Callable[[float], None],
    time_left: Callable[[], float] | None = None,
) -> dict:
    def backoff(duration: float) -> None:
        # never sleep past the ingest deadline (deadline-as-truncation:
        # a 429 retry-after of an hour must not block a 30 s deadline)
        if time_left is not None and duration >= time_left():
            raise _DeadlineExceeded()
        sleep(duration)

    attempt = 0
    refreshed = False
    while True:
        try:
            return fetch_page(opts)
        except AuthError as e:
            if e.status == 401 and refresh_auth is not None and not refreshed:
                refresh_auth()
                refreshed = True
                continue
            if e.status == 429:
                # exhaustion check BEFORE honoring retry-after: with no
                # retries left, sleeping (possibly for a server-dictated
                # hour) and then raising anyway would just block the driver
                attempt += 1
                if attempt > max_retries:
                    raise
                backoff(e.retry_after if e.retry_after is not None else retry_interval_s)
                continue
            raise
        except Exception:
            attempt += 1
            if attempt > max_retries:
                raise
            backoff(retry_interval_s)


class RestSource:
    """Connector.config keys: fetch_page (required), pagination,
    items_per_page, max_items_per_page, schema, requests_per_second,
    max_retries, retry_interval_s, refresh_auth. Connector.timeout is
    the ingest deadline; Connector.limit the total-row cap."""

    def read(self, spark: SparkSession, connector: Connector) -> DataFrame:
        cfg = connector.config
        # limit pushdown is only safe when nothing reorders or drops rows
        # AFTER ingest: the compiler applies filter/orderBy/offset before
        # the limit, so stopping the fetch at `limit` rows would return
        # the first-N-fetched, not the true result (the reference's
        # backend applies WHERE/ORDER BY before the limit trim,
        # src/index.ts:284-286). This generic source pushes neither
        # filters nor sorts into the transport, so any of them forces a
        # full fetch; a Spark-side offset widens the fetch window.
        safe_limit = None
        if connector.limit is not None and not connector.sort and not connector.filters:
            safe_limit = int(connector.limit) + int(connector.offset or 0)
        # Memory posture (VERDICT r02 #8): with config['staging_dir'],
        # pages spill to JSONL as they arrive — peak driver memory is
        # one staging batch, not the whole extract (the reference's
        # all-on-heap model is its hard 1M-row ceiling).
        staging = cfg.get("staging_dir")
        writer = (
            JsonlStagingWriter(staging, int(cfg.get("staging_batch_rows", 10_000)))
            if staging
            else None
        )
        result = paged_fetch(
            cfg["fetch_page"],
            pagination=cfg.get("pagination", "offset"),
            items_per_page=int(cfg.get("items_per_page", 100)),
            max_items_per_page=cfg.get("max_items_per_page"),
            initial_offset=cfg.get("initial_offset"),
            total_limit=safe_limit,
            deadline_s=connector.timeout,
            requests_per_second=cfg.get("requests_per_second"),
            max_retries=int(cfg.get("max_retries", 0)),
            retry_interval_s=float(cfg.get("retry_interval_s", 1.0)),
            refresh_auth=cfg.get("refresh_auth"),
            sink=writer,
        )
        if writer is not None:
            writer.close()
            if writer.n_rows == 0:
                df = _rows_to_df(spark, [], cfg.get("schema"))
            else:
                reader = spark.read
                if cfg.get("schema") is not None:
                    reader = reader.schema(_schema_with_seq(cfg["schema"]))
                df = reader.json(writer.dir)
        else:
            df = _rows_to_df(spark, result.rows, cfg.get("schema"))
        if result.partial:
            # Explicit partial-result marker (divergence from the
            # reference's silent truncation) — visible to the pipeline.
            df = df.withColumn("_ingest_partial", F.lit(True))
        return df


def _schema_with_seq(schema):
    """A user-supplied staging read schema must also read the writer's
    ``_ingest_seq`` column or the compiler loses arrival order."""
    from pyspark.sql import types as T

    if isinstance(schema, str):
        return f"{schema}, _ingest_seq bigint"
    return T.StructType(
        list(schema.fields) + [T.StructField("_ingest_seq", T.LongType())]
    )


def _rows_to_df(spark: SparkSession, rows: list, schema) -> DataFrame:
    """Empty-safe DataFrame construction: a zero-row sync is a normal
    state for incremental ingests, but createDataFrame([]) cannot infer
    a schema. With no schema configured and no rows, return a zero-
    column empty frame instead of crashing."""
    if not rows and schema is None:
        from pyspark.sql import types as T

        return spark.createDataFrame([], T.StructType([]))
    return spark.createDataFrame(rows, schema=schema)
