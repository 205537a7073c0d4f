"""Per-service REST descriptors: the reference's 14 SaaS adapters as
*data*, not code.

Each reference adapter hand-implements the same four concerns —
endpoint catalog, auth kind, pagination kind, filter-operator dialect
(survey: SURVEY.md §2A.1 and the endpoint tables, e.g.
`/root/reference/adapters/hubspot/src/index.ts:35-236`). Here one
generic engine (``rest.paged_fetch`` + ``ServiceSource``) consumes
declarative ``ServiceDescriptor``s; adding a service is adding a
descriptor, not an adapter.

The descriptor captures, per service:

* pagination: 'offset' | 'cursor' | 'none' + per-page cap
  (maxItemsPerPage table, BASELINE.md)
* auth: 'api_key' | 'oauth2' | 'basic' — OAuth2 services get 401 →
  refresh-and-retry via the transport-agnostic hook
* operator mask: which canonical filter operators the service accepts
  (HubSpot is the full set; Stripe search only =/!=; S3 only prefix=);
  unsupported operators DEGRADE gracefully — they are dropped from the
  pushdown request and re-applied as Spark filters post-ingest (the
  reference instead errors or silently mistranslates)
* sort capability (Zoho: first key only — SURVEY §7 watch-list #7)

``build_request`` renders the connector spec into an abstract request
dict (params/body shape) that the injected transport executes; tests
exercise the translation tables without any network.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openetl_spark.functions.filters import compile_filters
from openetl_spark.sources.rest import paged_fetch
from openetl_spark.spec import Connector, Filter, FilterGroup

FULL_OPERATORS = frozenset(
    {"=", "!=", ">", ">=", "<", "<=", "contains", "not_contains",
     "in", "not_in", "between", "not_between", "is_null", "is_not_null"}
)
COMPARISON_OPERATORS = frozenset({"=", "!=", ">", ">=", "<", "<="})


@dataclass
class ServiceDescriptor:
    service_id: str
    base_url: str
    auth_kind: str = "api_key"  # api_key | oauth2 | basic
    pagination: str = "offset"  # offset | cursor | none
    max_items_per_page: int = 100
    operators: frozenset = FULL_OPERATORS
    max_sort_keys: int | None = None  # None = unlimited; Zoho = 1
    endpoints: dict[str, dict] = field(default_factory=dict)


# Descriptors for the services the reference supports, with the
# pagination/cap/operator facts from SURVEY.md §2A.1 and BASELINE.md.
SERVICES: dict[str, ServiceDescriptor] = {
    d.service_id: d
    for d in [
        ServiceDescriptor(
            "hubspot", "https://api.hubapi.com", "oauth2", "cursor", 100,
            FULL_OPERATORS,
            endpoints={
                "contacts": {"path": "/crm/v3/objects/contacts/search",
                             "default_fields": ["firstname", "lastname", "email"]},
                "companies": {"path": "/crm/v3/objects/companies/search"},
                "deals": {"path": "/crm/v3/objects/deals/search"},
            },
        ),
        ServiceDescriptor(
            "stripe", "https://api.stripe.com/v1", "api_key", "cursor", 100,
            frozenset({"=", "!="}),
            endpoints={"customers": {"path": "/customers"},
                       "charges": {"path": "/charges"},
                       "invoices": {"path": "/invoices"}},
        ),
        ServiceDescriptor(
            "zoho", "https://www.zohoapis.com/crm/v2", "oauth2", "offset", 200,
            frozenset({"=", "!=", ">", ">=", "<", "<=", "contains", "not_contains", "in", "not_in"}),
            max_sort_keys=1,
            endpoints={"Leads": {"path": "/Leads"}, "Contacts": {"path": "/Contacts"}},
        ),
        ServiceDescriptor(
            "xero", "https://api.xero.com/api.xro/2.0", "oauth2", "offset", 100,
            COMPARISON_OPERATORS,
            endpoints={"Invoices": {"path": "/Invoices"}, "Contacts": {"path": "/Contacts"}},
        ),
        ServiceDescriptor(
            "gmail", "https://gmail.googleapis.com/gmail/v1", "oauth2", "cursor", 500,
            frozenset({"=", "!="}),
            endpoints={"messages": {"path": "/users/me/messages"}},
        ),
        ServiceDescriptor(
            "github", "https://api.github.com", "api_key", "offset", 100,
            frozenset({"="}),
            endpoints={"repos": {"path": "/user/repos"}, "issues": {"path": "/issues"}},
        ),
        ServiceDescriptor(
            "twitter", "https://api.twitter.com/2", "api_key", "cursor", 100,
            frozenset({"="}),
            endpoints={"tweets_search": {"path": "/tweets/search/recent"}},
        ),
        ServiceDescriptor(
            "chartmogul", "https://api.chartmogul.com/v1", "basic", "cursor", 200,
            frozenset({"="}),
            endpoints={"customers": {"path": "/customers"}},
        ),
        ServiceDescriptor(
            "s3", "s3://", "api_key", "cursor", 1000,
            frozenset({"="}),
            endpoints={"list-objects": {"path": "ListObjectsV2"},
                       "download-object": {"path": "GetObject"}},
        ),
        ServiceDescriptor(
            "google-ads", "https://googleads.googleapis.com", "oauth2", "cursor", 10000,
            COMPARISON_OPERATORS,
            endpoints={"campaigns": {"path": "/googleAds:search"}},
        ),
    ]
}


def split_filters(connector: Connector, desc: ServiceDescriptor):
    """Partition filters into pushdown-able (service accepts the
    operator) and residual (re-applied in Spark post-ingest). Filter
    groups (OR trees) never push down — no reference dialect has them."""
    push, residual = [], []
    for f in connector.filters:
        if isinstance(f, FilterGroup):
            residual.append(f)
        elif isinstance(f, Filter) and f.operator in desc.operators:
            push.append(f)
        else:
            residual.append(f)
    return push, residual


def build_request(connector: Connector, desc: ServiceDescriptor) -> dict:
    """Render the connector spec into an abstract request the transport
    executes — the engine-side equivalent of each adapter's query
    builder (e.g. HubSpot getSearchBody,
    `/root/reference/adapters/hubspot/src/index.ts:357-388`)."""
    ep = desc.endpoints.get(connector.endpoint_id)
    if ep is None:
        raise KeyError(
            f"{desc.service_id} has no endpoint {connector.endpoint_id!r}; "
            f"known: {sorted(desc.endpoints)}"
        )
    push, _ = split_filters(connector, desc)
    sorts = list(connector.sort)
    if desc.max_sort_keys is not None:
        sorts = sorts[: desc.max_sort_keys]  # degrade: Spark re-sorts
    fields = list(connector.fields) or list(ep.get("default_fields", []))
    return {
        "url": desc.base_url + ep["path"],
        "fields": fields,
        "filters": [{"field": f.field, "op": f.operator, "value": f.value} for f in push],
        "sorts": [{"field": s.field, "dir": s.type} for s in sorts],
        "page_size": min(desc.max_items_per_page, 100 if connector.limit is None else connector.limit),
    }


class ServiceSource:
    """Generic REST source bound to a descriptor. The transport is a
    callable ``transport(request, page_options) -> page dict`` injected
    via connector.config['transport'] (real HTTP in production, mocks
    in tests — the reference needed live creds for this layer).

    Layering: this source does INGEST + service-side pushdown only.
    Residual filters, the full sort, projection, and the row limit are
    applied by ``plans/compiler.compile_connector`` on top of the
    returned DataFrame — one owner for the degrade semantics. The
    service-side ``total_limit`` optimization is applied only when the
    WHOLE filter spec pushed down; with any residual filter the fetch
    must not truncate early (rows matching the residual could be
    dropped before Spark ever saw them)."""

    def __init__(self, descriptor: ServiceDescriptor):
        self.desc = descriptor

    def read(self, spark: SparkSession, connector: Connector) -> DataFrame:
        cfg = connector.config
        request = build_request(connector, self.desc)
        transport = cfg["transport"]

        def fetch_page(page_options: dict) -> dict:
            return transport(request, page_options)

        _, residual = split_filters(connector, self.desc)
        # limit pushdown is safe only when the service saw the WHOLE
        # query shape: no residual filters (rows matching them could be
        # dropped before Spark saw them) AND the full sort key list
        # pushed down (a degraded sort — e.g. Zoho's 1-key cap — means
        # the server's partial order picks the first N, which is not the
        # true top-N under the full key list Spark re-sorts by).
        sort_fully_pushed = (
            self.desc.max_sort_keys is None
            or len(connector.sort) <= self.desc.max_sort_keys
        )
        safe_limit = None
        if connector.limit is not None and not residual and sort_fully_pushed:
            # compiler applies connector.offset Spark-side after ingest,
            # so the fetch window must cover offset + limit rows
            safe_limit = int(connector.limit) + int(connector.offset or 0)

        result = paged_fetch(
            fetch_page,
            pagination=self.desc.pagination,
            items_per_page=request["page_size"],
            max_items_per_page=self.desc.max_items_per_page,
            total_limit=safe_limit,
            deadline_s=connector.timeout,
            requests_per_second=cfg.get("requests_per_second"),
            max_retries=int(cfg.get("max_retries", 0)),
            retry_interval_s=float(cfg.get("retry_interval_s", 1.0)),
            refresh_auth=cfg.get("refresh_auth"),
        )
        from openetl_spark.sources.rest import _rows_to_df

        df = _rows_to_df(spark, result.rows, cfg.get("schema"))
        if result.partial:
            # same explicit partial-extract contract as RestSource
            df = df.withColumn("_ingest_partial", F.lit(True))
        if not connector.fields and request["fields"]:
            # endpoint default_fields (A7): the compiler only projects
            # EXPLICIT connector.fields, so the default applies here
            present = [f for f in request["fields"] if f in df.columns]
            if present:
                if result.partial and "_ingest_partial" not in present:
                    present.append("_ingest_partial")  # keep marker visible
                df = df.select(*present)
        return df


def register_all() -> None:
    from openetl_spark.registry import register_source_default

    for sid, desc in SERVICES.items():
        register_source_default(sid, ServiceSource(desc))
