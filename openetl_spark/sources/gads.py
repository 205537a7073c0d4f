"""Google Ads source over an injected transport — the GAQL runtime
counterpart of ``sources/mongo.py``'s pymongo-fake pattern (closes the
SURVEY §2B B3 transport gap: the renderer in ``functions/dialects.py``
now executes end-to-end).

Reference behaviors mirrored (`/root/reference/adapters/google-ads/src/
index.ts`):

* GAQL built from the connector spec for ``table_query``
  (``index.ts:191-234``): SELECT fields FROM config['table'] WHERE ...
  ORDER BY ... LIMIT; ``custom_query`` passes ``config['custom_query']``
  through verbatim (no LIMIT appended, ``index.ts:192-194``);
* ``table_query`` REQUIRES a non-empty field list
  (``index.ts:203-205``: "At least one field name must be informed");
* ``customerId``/``developerToken`` required (``index.ts:241-247``);
* request = POST ``customers/{cid}/googleAds:search`` with
  ``Authorization: Bearer`` + ``developer-token`` (+ optional
  ``login-customer-id``) headers (``index.ts:163-189``);
* expired/missing access token → refresh BEFORE the call
  (``index.ts:168-170``); a 401 response → one refresh + retry
  (``index.ts:311-324``);
* results filtered to the requested fields by dotted-path get and
  re-nested (``index.ts:74-118, 269-287``) — here the re-nested objects
  become nested STRUCT columns, so ``campaign.id`` keeps working as a
  field reference in Spark filters/projections;
* non-array ``results`` → empty data (``index.ts:264-267``).

Deliberate divergences (engine-wide pushdown contract, SURVEY §7):

* only filters with a GAQL rendering are pushed; FilterGroups and
  regex-ish operators run Spark-side as residuals. The reference
  renders EVERY filter as ``field op 'value'`` — string-quoting numbers
  and mistranslating operators it can't express (``index.ts:215-219``);
* LIMIT is pushed only when every filter rendered (widened by the
  Spark-side offset) — same first-N-fetched guard as the Mongo source.

Transport injection: ``config['transport']`` is any
``fn(query: str, headers: dict) -> {"results": [...]}`` — a thin
HTTP POST in production, the in-process GAQL-evaluating fake in tests
(no network/creds in this container). ``config['transport_factory']``
resolves a dotted ``pkg.mod:fn`` path instead. Auth refresh uses
``config['token_refresher'] = fn(credentials) -> (access_token,
expires_in_s)`` standing in for the oauth2.googleapis.com POST
(``index.ts:146-152``).
"""

from __future__ import annotations

import importlib
from datetime import datetime, timedelta, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from openetl_spark.functions.dialects import _gaql_cond, gaql_query
from openetl_spark.sources.mongo import _referenced_fields
from openetl_spark.sources.rest import AuthError
from openetl_spark.spec import Connector, FilterGroup


def _resolve_transport(connector: Connector):
    cfg = connector.config
    if "transport" in cfg:
        return cfg["transport"]
    ref = cfg.get("transport_factory")
    if ref is None:
        raise ValueError(
            "google-ads adapter needs config['transport'] "
            "(fn(query, headers) -> response dict) or "
            "config['transport_factory'] ('pkg.mod:fn')"
        )
    mod, _, attr = ref.partition(":")
    return getattr(importlib.import_module(mod), attr)()


def render_gaql(connector: Connector) -> tuple[str, bool]:
    """Connector → (GAQL string, fully_rendered). Filters without a GAQL
    rendering stay Spark-side; the limit is pushed only when every
    filter rendered (compiler re-applies filters AFTER ingest)."""
    if connector.endpoint_id == "custom_query":
        raw = connector.config.get("custom_query")
        if raw is None:
            raise ValueError("custom_query endpoint requires config['custom_query']")
        return raw, not connector.filters
    table = connector.config.get("table")
    if not table:
        # reference: index.ts:196-198
        raise ValueError("Table required for table-based endpoints")
    if not connector.fields:
        # reference: index.ts:203-205
        raise ValueError("At least one field name must be informed")
    pushable, residual = [], []
    for f in connector.filters:
        if isinstance(f, FilterGroup):
            residual.append(f)
            continue
        try:
            _gaql_cond(f)
        except ValueError:
            residual.append(f)
        else:
            pushable.append(f)
    fully = not residual
    limit = None
    if connector.limit is not None and fully:
        # GAQL applies WHERE/ORDER BY before LIMIT, so the pushed limit
        # is the true top-N; widen by the Spark-side offset.
        limit = int(connector.limit) + max(0, int(connector.offset or 0))
    # Over-SELECT filter/sort paths: the real API returns only selected
    # attributes, and the compiler re-applies filters/sort post-ingest —
    # without their values every re-applied predicate would see NULLs.
    select = list(connector.fields)
    for extra in _referenced_fields(connector):
        if extra not in select:
            select.append(extra)
    return gaql_query(table, select, pushable, connector.sort, limit), fully


def _path_get(doc: Any, dotted: str):
    cur = doc
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def _nest(flat: dict[str, Any]) -> dict:
    out: dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(".")
        o = out
        for p in parts[:-1]:
            o = o.setdefault(p, {})
        o[parts[-1]] = val
    return out


def _leaf_type(values: list) -> T.DataType:
    for v in values:
        if isinstance(v, bool):
            return T.BooleanType()
        if isinstance(v, int):
            return T.LongType()
        if isinstance(v, float):
            return T.DoubleType()
        if v is not None:
            return T.StringType()
    return T.StringType()


def _build_schema(fields: list[str], rows: list[dict]) -> T.StructType:
    """Nested StructType over the dotted field paths, leaf types sampled
    from the data (string when never observed) — deterministic schema so
    an empty or ragged sync can't crash inference (the reference has no
    schema at all; axios hands it raw JSON)."""
    tree: dict = {}
    for f in fields:
        parts = f.split(".")
        o = tree
        for p in parts[:-1]:
            o = o.setdefault(p, {})
        o[parts[-1]] = _leaf_type([_path_get(r, f) for r in rows])

    def to_struct(node: dict) -> T.StructType:
        out = []
        for name, sub in node.items():
            dt = to_struct(sub) if isinstance(sub, dict) else sub
            out.append(T.StructField(name, dt))
        return T.StructType(out)

    return to_struct(tree)


class GoogleAdsSource:
    """``adapter_id='google-ads'``. ``endpoint_id`` ∈ {table_query,
    custom_query}. For custom_query (arbitrary GAQL), pass
    ``config['fields']`` to name the dotted result paths (the reference
    relies on ``connector.fields`` there too, returning raw results when
    empty — raw passthrough needs ``config['schema']``)."""

    def read(self, spark: SparkSession, connector: Connector) -> DataFrame:
        cfg = connector.config
        if not cfg.get("customerId"):
            raise ValueError("customerId required")  # index.ts:241-243
        if not cfg.get("developerToken"):
            raise ValueError("developerToken required")  # index.ts:245-247
        transport = _resolve_transport(connector)
        query, _fully = render_gaql(connector)

        auth = cfg.get("auth") or {}
        if auth.get("type") not in (None, "oauth2"):
            # reference: index.ts:164-166
            raise ValueError("Google Ads adapter requires OAuth2 authentication")
        creds = auth.get("credentials", {})

        def headers() -> dict:
            h = {
                "Authorization": f"Bearer {creds.get('access_token')}",
                "Content-Type": "application/json",
                "developer-token": cfg["developerToken"],
                **cfg.get("headers", {}),
            }
            if cfg.get("loginCustomerId"):
                h["login-customer-id"] = cfg["loginCustomerId"]
            return h

        def refresh() -> None:
            refresher = cfg.get("token_refresher")
            if refresher is None:
                raise ValueError(
                    "OAuth token refresh needed but no config['token_refresher']"
                )
            if not creds.get("refresh_token"):
                # reference: index.ts:140-142
                raise ValueError(
                    "Refresh token missing; obtain initial tokens manually "
                    "and update vault"
                )
            token, expires_in = refresher(creds)
            creds["access_token"] = token
            auth["expires_at"] = (
                datetime.now(timezone.utc) + timedelta(seconds=expires_in)
            ).isoformat()

        # expired/missing token → refresh BEFORE the call (index.ts:168-170)
        expires_at = auth.get("expires_at")
        expired = False
        if expires_at:
            exp = datetime.fromisoformat(expires_at)
            if exp.tzinfo is None:
                exp = exp.replace(tzinfo=timezone.utc)
            expired = exp < datetime.now(timezone.utc)
        if auth and (not creds.get("access_token") or expired):
            refresh()

        try:
            resp = transport(query, headers())
        except AuthError as e:
            if e.status != 401:
                raise
            refresh()  # index.ts:311-324: one refresh + one retry
            resp = transport(query, headers())

        results = resp.get("results")
        if not isinstance(results, list):
            results = []  # index.ts:264-267

        proj_fields = list(connector.fields) or list(cfg.get("fields", []))
        if proj_fields:
            # Over-project: the compiler re-applies filters/sort on the
            # returned DataFrame, so their paths must survive; the
            # compiler's own select then prunes to connector.fields.
            for extra in _referenced_fields(connector):
                if extra not in proj_fields:
                    proj_fields.append(extra)
        if not proj_fields:
            schema = cfg.get("schema")
            if schema is None:
                raise ValueError(
                    "raw custom_query passthrough needs config['schema'] "
                    "or a field list"
                )
            return spark.createDataFrame(results, schema=schema)
        rows = [
            _nest({f: _path_get(item, f) for f in proj_fields})
            for item in results
            if item is not None
        ]
        schema = cfg.get("schema") or _build_schema(proj_fields, results)
        return spark.createDataFrame(rows, schema=schema)
