"""In-process DB-API source/sink — the jar-less execution path for the
reference's PostgreSQL/MySQL adapter semantics (r06, VERDICT #5).

The reference adapters hand-build ``SELECT fields FROM "schema"."table"
WHERE f op v ORDER BY ... LIMIT n OFFSET m`` per page
(`/root/reference/adapters/postgresql/src/index.ts:147-190`; MySQL uses
backticks and ``LIMIT offset, count``,
`/root/reference/adapters/mysql/src/index.ts:132-167`) and multi-row
``INSERT INTO ... VALUES (...), (...)`` batches with per-type value
serialization (`adapters/postgresql/src/index.ts:198-223`), then run
them over a live connection — their integration suites sweep
filter/sort/pagination edge cases against dockerized databases
(`adapters/postgresql/tests/integration.test.ts:14-34`).

The container ships no JDBC driver jar, so ``sources/jdbc.py`` could
only ever be option-building-tested. This module executes the SAME
query semantics against any PEP 249 connection (sqlite3 and DuckDB are
in-container; psycopg2/mysqlclient work identically where installed),
behind the standard Source/Sink protocol:

* ``render_select`` — the engine's analog of buildSelectQuery, with
  per-dialect identifier quoting and LIMIT/OFFSET syntax. WHERE
  rendering reuses ``functions/spec_sql.render_filter`` (one source of
  truth with the QuerySpec renderer and the Spark Column semantics).
  Divergence from the reference, on purpose: filter values render as
  TYPED literals (numbers bare), where the reference single-quotes
  everything — even numbers — and leans on server-side implicit
  coercion (`adapters/postgresql/src/index.ts:167`); sqlite/DuckDB
  don't coerce that way, and typed literals are what the engine's
  Column filters mean.
* ``DbApiSource`` — executes the rendered SELECT (or the raw
  custom-SQL escape hatch ≈ B1/B2) on the connection; with
  ``items_per_page`` set it runs the reference's serial offset-paged
  loop (A1/A2) — real LIMIT/OFFSET pages against a live backend.
* ``DbApiSink`` — batched multi-row INSERTs with the reference's value
  serialization (numbers bare, None → NULL, everything else quoted
  with ``''`` escaping).

Scale note: a DB-API connection is a DRIVER-LOCAL resource, so ingest
is driver-side and bounded exactly like REST ingest (this is the
reference's own execution model — one Node process, serial pages).
When a JDBC jar IS present, ``sources/jdbc.py`` remains the scale
path: executor-parallel partitioned reads, pushdown via Catalyst.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession

from openetl_spark.functions.spec_sql import render_filter
from openetl_spark.spec import Connector

_QUOTE = {"postgresql": '"', "sqlite": '"', "duckdb": '"', "mysql": "`"}


def _ident(name: str, dialect: str) -> str:
    q = _QUOTE[dialect]
    return f"{q}{name.replace(q, q + q)}{q}"


def _qualified(connector: Connector, dialect: str) -> str:
    schema = connector.config.get("schema_name")
    table = _ident(connector.endpoint_id, dialect)
    return f"{_ident(schema, dialect)}.{table}" if schema else table


def render_select(
    connector: Connector,
    dialect: str = "postgresql",
    limit: int | None = None,
    offset: int | None = None,
) -> str:
    """The reference buildSelectQuery shape for one page window.
    ``limit``/``offset`` are the page-loop arguments (reference
    ``download({limit, offset})``); pass None to omit the clause."""
    if dialect not in _QUOTE:
        raise ValueError(f"unknown dialect {dialect!r}; known: {sorted(_QUOTE)}")
    cols = (
        ", ".join(_ident(f, dialect) for f in connector.fields)
        if connector.fields
        else "*"
    )
    sql = f"SELECT {cols} FROM {_qualified(connector, dialect)}"
    if connector.filters:
        sql += " WHERE " + " AND ".join(
            _render_quoted_filter(f, dialect) for f in connector.filters
        )
    if connector.sort:
        sql += " ORDER BY " + ", ".join(
            f"{_ident(s.field, dialect)} {'ASC' if s.type == 'asc' else 'DESC'}"
            for s in connector.sort
        )
    if limit is not None:
        if dialect == "mysql" and offset:
            # adapters/mysql/src/index.ts:162-164 — LIMIT offset, count
            sql += f" LIMIT {int(offset)}, {int(limit)}"
        else:
            sql += f" LIMIT {int(limit)}"
            if offset:
                sql += f" OFFSET {int(offset)}"
    return sql


def _render_quoted_filter(f, dialect: str):
    """render_filter with dialect identifier quoting on the field name
    (FilterGroups recurse)."""
    from openetl_spark.spec import FilterGroup

    if isinstance(f, FilterGroup):
        if not f.filters:
            return "TRUE"
        joiner = f" {f.op} "
        return (
            "("
            + joiner.join(_render_quoted_filter(x, dialect) for x in f.filters)
            + ")"
        )
    quoted = type(f)(_ident(f.field, dialect), f.operator, f.value)
    return render_filter(quoted)


def render_insert(
    table_sql: str,
    fields: Sequence[str],
    rows: Sequence[dict],
    dialect: str = "postgresql",
) -> str:
    """Multi-row INSERT with the reference's serialization
    (`adapters/postgresql/src/index.ts:198-223`): numbers bare,
    None/absent → NULL, everything else stringified and single-quoted
    with ``''`` escaping."""

    def val(v: Any) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            # JS String(true) → 'true' lands quoted in the reference;
            # typed TRUE/FALSE would break sqlite, so mirror the quoting
            return "'true'" if v else "'false'"
        if isinstance(v, (int, float)):
            return repr(v)
        return "'" + str(v).replace("'", "''") + "'"

    cols = ", ".join(_ident(f, dialect) for f in fields)
    tuples = ", ".join(
        "(" + ", ".join(val(r.get(f)) for f in fields) + ")" for r in rows
    )
    return f"INSERT INTO {table_sql} ({cols}) VALUES {tuples}"


def _fetch_all(cur, page_size: int = 10_000) -> tuple[list[str], list[dict]]:
    cols = [d[0] for d in cur.description]
    out: list[dict] = []
    while True:
        batch = cur.fetchmany(page_size)
        if not batch:
            return cols, out
        out.extend(dict(zip(cols, row)) for row in batch)


class DbApiSource:
    """config: ``connection_factory`` () -> PEP 249 connection (required),
    ``dialect`` (default postgresql), ``query`` (custom-SQL escape hatch,
    ≈ reference custom_query endpoint), ``items_per_page`` (enable the
    serial offset-paged loop), ``schema`` (explicit Spark schema)."""

    def residual_filters(self, connector: Connector) -> list:
        # the rendered SELECT executes the ENTIRE filter spec on the
        # database — nothing left for the compiler to re-apply. (The
        # custom-SQL escape hatch bypasses the spec: the reference
        # ignores connector.filters there too, index.ts:139-145.)
        return []

    def read(self, spark: SparkSession, connector: Connector) -> DataFrame:
        cfg = connector.config
        factory: Callable[[], Any] = cfg["connection_factory"]
        dialect = cfg.get("dialect", "postgresql")
        con = factory()
        try:
            cur = con.cursor()
            rows: list[dict] = []
            if connector.endpoint_id == "custom_query" or "query" in cfg:
                cur.execute(cfg["query"])
                _, rows = _fetch_all(cur)
            elif cfg.get("items_per_page"):
                # the reference's serial page loop (src/index.ts:224-282):
                # LIMIT page OFFSET n·page until a short/empty page or the
                # total limit; the compiler still owns the user-visible
                # offset/limit, so fetch covers offset + limit rows
                page = int(cfg["items_per_page"])
                want = (
                    int(connector.limit) + int(connector.offset or 0)
                    if connector.limit is not None
                    else None
                )
                off = 0
                while True:
                    cur.execute(
                        render_select(connector, dialect, limit=page, offset=off)
                    )
                    _, got = _fetch_all(cur)
                    rows.extend(got)
                    off += page
                    if len(got) < page or (want is not None and len(rows) >= want):
                        break
            else:
                want = (
                    int(connector.limit) + int(connector.offset or 0)
                    if connector.limit is not None
                    else None
                )
                cur.execute(render_select(connector, dialect, limit=want))
                _, rows = _fetch_all(cur)
        finally:
            con.close()
        from openetl_spark.sources.rest import _rows_to_df

        return _rows_to_df(spark, rows, cfg.get("schema"))


class DbApiSink:
    """Batched multi-row INSERT upload — ``items_per_batch`` chunks the
    reference way (`src/index.ts:480-524`; batch size from the target's
    pagination there, an explicit option here)."""

    def write(self, df: DataFrame, connector: Connector) -> None:
        cfg = connector.config
        factory: Callable[[], Any] = cfg["connection_factory"]
        dialect = cfg.get("dialect", "postgresql")
        batch_size = int(cfg.get("items_per_batch", 1000))
        fields = list(connector.fields) or df.columns
        table_sql = _qualified(connector, dialect)
        con = factory()
        try:
            cur = con.cursor()
            batch: list[dict] = []
            # driver-side serial upload — the DB-API connection lives on
            # the driver; toLocalIterator streams partitions without
            # materializing the whole frame
            for row in df.toLocalIterator():
                batch.append(row.asDict())
                if len(batch) >= batch_size:
                    cur.execute(render_insert(table_sql, fields, batch, dialect))
                    batch = []
            if batch:
                cur.execute(render_insert(table_sql, fields, batch, dialect))
            con.commit()
        finally:
            con.close()
