"""Service-descriptor tests: the per-service translation layer
(endpoint catalog, operator masks, pagination kinds, graceful
degradation) with mock transports — the engine-side mirror of the
reference's adapter unit tests (SURVEY.md §5 layer 3)."""

import pytest

from openetl_spark.pipeline import Orchestrator, Pipeline
from openetl_spark.sources.services import SERVICES, ServiceSource, build_request, split_filters
from openetl_spark.spec import Connector, Filter, FilterGroup, Sort


def contacts_transport(rows):
    """Cursor-paginated mock: serves `rows` in pages, echoing requests."""
    log = []

    def transport(request, page_options):
        log.append((dict(request), dict(page_options)))
        off = int(page_options["offset"] or 0)
        limit = page_options["limit"]
        page = rows[off : off + limit]
        nxt = off + limit if off + limit < len(rows) else None
        return {"data": page, "next_cursor": nxt}

    transport.log = log
    return transport


ROWS = [{"firstname": f"F{i}", "lastname": f"L{i}", "email": f"e{i}@x.com", "age": i} for i in range(25)]


def test_descriptor_catalog_covers_reference_adapters():
    # the reference ships 14 adapters; postgres/mysql/mongodb map to
    # jdbc/connector sources, the REST family to descriptors
    assert {"hubspot", "stripe", "zoho", "xero", "gmail", "github",
            "twitter", "chartmogul", "s3", "google-ads"} <= set(SERVICES)


def test_build_request_pushes_supported_filters():
    c = Connector(
        adapter_id="hubspot",
        endpoint_id="contacts",
        fields=["firstname", "email"],
        filters=[Filter("age", ">", 21), Filter("email", "contains", "@x.com")],
        sort=[Sort("firstname", "asc")],
    )
    req = build_request(c, SERVICES["hubspot"])
    assert req["url"].endswith("/crm/v3/objects/contacts/search")
    assert {f["op"] for f in req["filters"]} == {">", "contains"}
    assert req["sorts"] == [{"field": "firstname", "dir": "asc"}]


def test_operator_mask_degrades_to_residual():
    # Stripe search accepts only = and != — range filter stays residual
    c = Connector(
        adapter_id="stripe",
        endpoint_id="customers",
        filters=[Filter("email", "=", "a@x.com"), Filter("age", ">", 21)],
    )
    push, residual = split_filters(c, SERVICES["stripe"])
    assert [f.operator for f in push] == ["="]
    assert [f.operator for f in residual] == [">"]


def test_filter_groups_never_push_down():
    c = Connector(
        adapter_id="hubspot",
        endpoint_id="contacts",
        filters=[FilterGroup("OR", [Filter("age", ">", 1), Filter("age", "<", 99)])],
    )
    push, residual = split_filters(c, SERVICES["hubspot"])
    assert not push and len(residual) == 1


def test_unknown_endpoint_raises():
    c = Connector(adapter_id="hubspot", endpoint_id="nope")
    with pytest.raises(KeyError, match="no endpoint"):
        build_request(c, SERVICES["hubspot"])


def test_end_to_end_service_read_with_residual_filter(spark):
    t = contacts_transport(ROWS)
    c = Connector(
        adapter_id="stripe",
        endpoint_id="customers",
        config={"transport": t},
        # '>' is residual for stripe → applied by Spark post-ingest
        filters=[Filter("age", ">", 20)],
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="svc", source=c))
    ages = sorted(r["age"] for r in res.df.select("age").collect())
    assert ages == [21, 22, 23, 24]
    # cursor pagination: ceil(25/100)=1 page at default size
    assert len(t.log) >= 1


def test_zoho_single_sort_key_degradation(spark):
    t = contacts_transport(ROWS)
    c = Connector(
        adapter_id="zoho",
        endpoint_id="Leads",
        config={"transport": t},
        sort=[Sort("age", "desc"), Sort("email", "asc")],
        fields=["email", "age"],
    )
    req = build_request(c, SERVICES["zoho"])
    assert len(req["sorts"]) == 1  # only the first key pushes down
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="zoho", source=c))
    ages = [r["age"] for r in res.df.collect()]
    assert ages == sorted(ages, reverse=True)  # Spark re-applied full sort


def test_degraded_sort_disables_limit_pushdown(spark):
    """ADVICE r01 (services.py): when sorts are truncated to
    max_sort_keys (Zoho: 1), the server's partial order cannot pick the
    true top-N — the fetch must run to exhaustion and Spark's full sort
    + limit produce the answer."""
    t = contacts_transport(ROWS)
    c = Connector(
        adapter_id="zoho",
        endpoint_id="Leads",
        config={"transport": t},
        sort=[Sort("age", "desc"), Sort("email", "asc")],
        fields=["email", "age"],
        limit=3,
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="zoho_topn", source=c))
    # mock transport ignores sorts entirely (worst case): true top-3 by
    # age desc is ages 24, 23, 22 — only reachable via a full fetch
    assert [r["age"] for r in res.df.collect()] == [24, 23, 22]
    fetched = sum(len_ for _, po in t.log for len_ in [po["limit"]])
    assert fetched >= len(ROWS)  # fetch was NOT truncated at limit


def test_page_size_clamped_to_service_cap(spark):
    t = contacts_transport(ROWS)
    c = Connector(
        adapter_id="hubspot",
        endpoint_id="contacts",
        config={"transport": t},
        limit=500,
    )
    Orchestrator(spark=spark).run_pipeline(Pipeline(id="cap", source=c))
    # hubspot cap = 100
    assert all(po["limit"] <= 100 for _, po in t.log)


def test_default_fields_from_endpoint(spark):
    t = contacts_transport(ROWS)
    c = Connector(adapter_id="hubspot", endpoint_id="contacts", config={"transport": t})
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="defaults", source=c))
    assert set(res.df.columns) == {"firstname", "lastname", "email"}
