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


def test_abstract_mode_reapplies_pushed_filters(spark):
    """r06 (ADVICE): an injected abstract-mode transport that IGNORES
    request['filters'] must not leak rows the service was supposed to
    filter — the compiler re-applies ALL filters as defense in depth.
    '=' pushes down for stripe, and the mock here ignores it."""
    t = contacts_transport(ROWS)  # serves every row, filters untouched
    c = Connector(
        adapter_id="stripe",
        endpoint_id="customers",
        config={"transport": t},
        filters=[Filter("email", "=", "e7@x.com")],
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="svc", source=c))
    assert [r["email"] for r in res.df.select("email").collect()] == ["e7@x.com"]


def test_abstract_mode_overprojects_pushed_filter_columns():
    """Pushed-filter columns must survive an explicit fields projection
    in abstract mode so the defensive re-apply always analyzes."""
    c = Connector(
        adapter_id="stripe",
        endpoint_id="customers",
        fields=["firstname"],
        filters=[Filter("email", "=", "e7@x.com")],
    )
    req = build_request(c, SERVICES["stripe"])
    assert "email" in req["fields"]
    # wire mode keeps the reference-parity payload: no widening
    c_wire = Connector(
        adapter_id="stripe",
        endpoint_id="customers",
        fields=["firstname"],
        filters=[Filter("email", "=", "e7@x.com")],
        config={"wire": True},
    )
    req_wire = build_request(c_wire, SERVICES["stripe"])
    assert "email" not in req_wire["fields"]


def test_zoho_single_sort_key_degradation(spark):
    t = contacts_transport(ROWS)
    c = Connector(
        adapter_id="zoho",
        endpoint_id="leads",
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
        endpoint_id="leads",
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


# ------------------------------------------------ reference parity (r03)

# Active endpoint catalogs transcribed from the reference adapters
# (VERDICT r02 #7): id → (has_default_fields, is_upload). Counts and ids
# must match the reference's uncommented endpoint lists exactly.
REFERENCE_CATALOG = {
    "hubspot": {  # adapters/hubspot/src/index.ts:35-157
        "contacts": (6, False), "create-contact": (0, True),
        "companies": (5, False), "create-company": (0, True),
        "deals": (7, False), "create-deal": (0, True),
        "tickets": (9, False), "create-ticket": (0, True),
        "products": (6, False), "create-product": (0, True),
    },
    "stripe": {  # adapters/stripe/src/index.ts:30-160
        "charges": (11, False), "customers": (11, False),
        "create-customer": (0, True), "invoices": (9, False),
        "create-invoice": (0, True), "products": (8, False),
        "create-product": (0, True),
    },
    "zoho": {  # adapters/zoho/src/index.ts:58-188
        "leads": (8, False), "create-lead": (0, True),
        "contacts": (7, False), "create-contact": (0, True),
        "deals": (7, False), "create-deal": (0, True),
        "campaigns": (11, False), "create-campaign": (0, True),
    },
    "xero": {  # adapters/xero/src/index.ts:36-116
        "contacts": (0, False), "create-contact": (0, True),
        "items": (0, False), "create-item": (0, True),
        "invoices": (0, False), "create-invoice": (0, True),
        "accounts": (0, False), "create-account": (0, True),
    },
    "gmail": {  # adapters/gmail/src/index.ts:34-90
        "list-threads": (0, False), "list-messages": (0, False),
        "get-message": (0, False), "send-message": (0, True),
        "list-labels": (0, False),
    },
    "github": {  # adapters/github/src/index.ts:22-100
        "repo_issues": (0, False), "create_repository": (0, True),
        "create_issue": (0, True), "user_repos": (0, False),
        "user_public_repos": (0, False), "repo_commits": (0, False),
        "user_profile": (0, False), "user_info": (0, False),
        "user_emails": (0, False),
    },
    "twitter": {  # adapters/twitter/src/index.ts:50-80
        "tweets_search": (0, False), "user_lookup": (0, False),
        "tweet_post": (0, True),
    },
    "chartmogul": {  # adapters/chartmogul/src/index.ts:41-137
        "sources": (0, False), "create-source": (0, True),
        "customers": (0, False), "create-customer": (0, True),
        "plans": (0, False), "create-plan": (0, True),
        "subscriptions": (0, False), "invoices": (0, False),
        "create-invoice": (0, True),
    },
    "s3": {  # adapters/s3/src/index.ts:31-60
        "list-objects": (0, False), "download-object": (0, False),
        "upload-object": (0, True),
    },
}


@pytest.mark.parametrize("service", sorted(REFERENCE_CATALOG))
def test_endpoint_catalog_parity_with_reference(service):
    """VERDICT r02 #7: descriptor endpoint ids, default-field counts,
    and upload/download direction match the reference adapter's active
    endpoint list one-for-one."""
    desc = SERVICES[service]
    ref = REFERENCE_CATALOG[service]
    assert set(desc.endpoints) == set(ref), (
        f"{service}: {sorted(set(desc.endpoints) ^ set(ref))}")
    for eid, (n_defaults, is_upload) in ref.items():
        ep = desc.endpoints[eid]
        assert len(ep.get("default_fields", [])) == n_defaults, (service, eid)
        assert ("upload" in ep["actions"]) == is_upload, (service, eid)
        if is_upload:
            assert "download" not in ep["actions"], (service, eid)


def test_hubspot_contact_default_fields_match_reference():
    # adapters/hubspot/src/index.ts:44-51
    assert SERVICES["hubspot"].endpoints["contacts"]["default_fields"] == [
        "hs_object_id", "email", "firstname", "lastname",
        "createdate", "lastmodifieddate",
    ]


def test_download_on_upload_endpoint_raises(spark):
    c = Connector(adapter_id="hubspot", endpoint_id="create-contact",
                  config={"transport": lambda *a: {"data": []}})
    with pytest.raises(ValueError, match="only supports upload"):
        ServiceSource(SERVICES["hubspot"]).read(spark, c)


def _file_capturing_transport(outdir):
    """Picklable upload transport. foreachPartition runs in separate
    Python worker processes (test modules aren't importable there, so a
    module-level class would fail to unpickle); a closure is serialized
    by value, and batches land as JSON files in a shared tmpdir."""
    outdir = str(outdir)

    def transport(request, rows):
        import json as _json
        import os as _os
        import uuid as _uuid

        path = _os.path.join(outdir, f"{_uuid.uuid4().hex}.json")
        with open(path, "w") as fh:
            _json.dump({"url": request["url"], "method": request["method"],
                        "rows": list(rows)}, fh)

    def captured():
        import glob
        import json as _json

        return [_json.load(open(p)) for p in glob.glob(f"{outdir}/*.json")]

    transport.captured = captured
    return transport


def test_upload_endpoint_e2e_batched(spark, tmp_path):
    """load → hubspot create-contact through ServiceSink/RestSink: rows
    arrive at the transport in items_per_batch chunks with the
    reference's endpoint URL and method."""
    transport = _file_capturing_transport(tmp_path)
    rows = [{"email": f"u{i}@x.com", "firstname": f"F{i}"} for i in range(25)]
    Orchestrator(spark=spark).run_pipeline(Pipeline(
        id="up", data=rows,
        target=Connector(
            adapter_id="hubspot", endpoint_id="create-contact",
            config={"transport": transport, "items_per_batch": 10}),
    ))
    got = transport.captured()
    sent = [r for call in got for r in call["rows"]]
    assert got, "no batches captured"
    assert len(sent) == 25
    assert all(c["url"] == "https://api.hubapi.com/crm/v3/objects/contacts/batch/create"
               and c["method"] == "POST" for c in got)
    assert all(len(c["rows"]) <= 10 for c in got)
    assert {r["email"] for r in sent} == {r["email"] for r in rows}


def test_upload_on_download_endpoint_raises(spark):
    from openetl_spark.sources.services import ServiceSink

    df = spark.createDataFrame([{"a": 1}])
    c = Connector(adapter_id="hubspot", endpoint_id="contacts",
                  config={"transport": lambda *a: None})
    with pytest.raises(ValueError, match="Upload only supported"):
        ServiceSink(SERVICES["hubspot"]).write(df, c)


def test_github_path_template_substitution():
    c = Connector(adapter_id="github", endpoint_id="repo_issues",
                  config={"owner": "octo", "repo": "hello"})
    req = build_request(c, SERVICES["github"])
    assert req["url"] == "https://api.github.com/repos/octo/hello/issues"
    with pytest.raises(KeyError, match="config\\['owner'\\]"):
        build_request(Connector(adapter_id="github", endpoint_id="repo_issues"),
                      SERVICES["github"])


def test_service_source_staged_ingest(spark, tmp_path):
    """ServiceSource honors the same staging_dir contract as RestSource:
    pages spill to JSONL, values round-trip, driver never holds the
    whole extract."""
    rows = [{"hs_object_id": i, "email": f"e{i}@x.com", "firstname": f"F{i}",
             "lastname": f"L{i}", "createdate": "2024-01-01",
             "lastmodifieddate": "2024-01-02"} for i in range(5000)]
    t = contacts_transport(rows)
    c = Connector(
        adapter_id="hubspot", endpoint_id="contacts",
        config={"transport": t, "staging_dir": str(tmp_path / "svc"),
                "staging_batch_rows": 1000},
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="stg", source=c))
    df = res.df
    assert df.count() == 5000
    import glob

    assert len(glob.glob(str(tmp_path / "svc" / "*.jsonl"))) == 5
    # default-field projection still applies on the staged read
    assert set(df.columns) == {"hs_object_id", "email", "firstname",
                               "lastname", "createdate", "lastmodifieddate"}


# ---------------------------------------------------------------------
# Native wire-dialect mode (VERDICT r03 #7/#8)
# ---------------------------------------------------------------------

def test_wire_mode_hubspot_exact_search_bodies_per_page(spark):
    """With config['wire']=True the transport receives the NATIVE
    HubSpot payload — the exact POST body getSearchBody builds
    (adapters/hubspot/src/index.ts:357-388) — freshly rendered per page
    with the cursor folded in."""
    rows = [{"firstname": f"F{i}", "email": f"e{i}@x.com"} for i in range(150)]
    seen = []

    def transport(wire, page_options):
        seen.append(wire)
        off = int(page_options["offset"] or 0)
        page = rows[off : off + page_options["limit"]]
        nxt = off + page_options["limit"] if off + page_options["limit"] < len(rows) else None
        return {"data": page, "next_cursor": nxt}

    c = Connector(
        adapter_id="hubspot",
        endpoint_id="contacts",
        fields=["firstname", "email"],
        filters=[Filter("age", ">", 3)],
        sort=[Sort("firstname", "asc")],
        config={"transport": transport, "wire": True},
    )
    df = ServiceSource(SERVICES["hubspot"]).read(spark, c)
    assert df.count() == len(rows)
    assert len(seen) == 2  # 150 rows at page size 100
    first = seen[0]
    assert first["url"] == "https://api.hubapi.com/crm/v3/objects/contacts/search"
    assert first["method"] == "POST"
    assert first["body"] == {
        "limit": 100,
        "properties": ["firstname", "email"],
        "filterGroups": [
            {"filters": [{"propertyName": "age", "operator": "GT", "value": 3}]}
        ],
        "sorts": [{"propertyName": "firstname", "direction": "ASCENDING"}],
    }
    # second page: same body plus the echoed cursor folded in
    assert seen[1]["body"]["after"] == "100"
    assert seen[1]["body"]["filterGroups"] == first["body"]["filterGroups"]


def test_wire_mode_zoho_strips_search_path_without_criteria(spark):
    seen = []

    def transport(wire, page_options):
        seen.append(wire)
        return {"data": [], "total": 0}

    c = Connector(
        adapter_id="zoho",
        endpoint_id="contacts",
        config={"transport": transport, "wire": True},
    )
    ServiceSource(SERVICES["zoho"]).read(spark, c)
    assert seen[0]["url"] == "https://www.zohoapis.com/crm/v7/Contacts"
    assert "criteria" not in seen[0]["params"]

    seen.clear()
    c2 = Connector(
        adapter_id="zoho",
        endpoint_id="contacts",
        filters=[Filter("Last_Name", "=", "Smith")],
        config={"transport": transport, "wire": True},
    )
    ServiceSource(SERVICES["zoho"]).read(spark, c2)
    assert seen[0]["url"].endswith("/crm/v7/Contacts/search")
    assert seen[0]["params"]["criteria"] == "(Last_Name:equals:Smith)"


def test_wire_mode_gmail_get_message_requires_id(spark):
    c = Connector(
        adapter_id="gmail",
        endpoint_id="get-message",
        config={"transport": lambda *a: {"data": []}, "wire": True},
    )
    with pytest.raises(ValueError, match="config\\['id'\\]"):
        ServiceSource(SERVICES["gmail"]).read(spark, c)


def test_twitter_endpoint_field_whitelist_residualizes():
    """adapters/twitter/src/index.ts:119-138 drops filters outside the
    per-endpoint field list; the engine keeps them as residual so the
    predicate still applies post-ingest."""
    c = Connector(
        adapter_id="twitter",
        endpoint_id="tweets_search",
        filters=[Filter("query", "=", "spark"), Filter("lang", "=", "en")],
    )
    push, residual = split_filters(c, SERVICES["twitter"])
    assert [f.field for f in push] == ["query"]
    assert [f.field for f in residual] == ["lang"]


def test_wire_mode_twitter_exact_params(spark):
    seen = []

    def transport(wire, page_options):
        seen.append(wire)
        return {"data": [{"id": "1", "text": "t"}], "next_cursor": None}

    c = Connector(
        adapter_id="twitter",
        endpoint_id="tweets_search",
        fields=["id", "text", "created_at"],
        filters=[Filter("query", "=", "pyspark"), Filter("since_id", "=", "9")],
        config={"transport": transport, "wire": True},
    )
    ServiceSource(SERVICES["twitter"]).read(spark, c)
    assert seen[0]["url"] == "https://api.twitter.com/2/tweets/search/recent"
    assert seen[0]["params"] == {
        "query": "pyspark",
        "since_id": "9",
        "tweet.fields": "id,text,created_at",
        "max_results": 100,
    }


def test_wire_mode_xero_headers_and_where_reach_transport(spark):
    """Xero wire mode end-to-end: the If-Modified-Since header, special
    param filters, and the where string arrive at the transport with
    page/pageSize windowing."""
    seen = []

    def transport(wire, page_options):
        seen.append(wire)
        return {"data": [{"Name": "ACME"}]}

    c = Connector(
        adapter_id="xero",
        endpoint_id="contacts",
        filters=[
            Filter("includeArchived", "=", "true"),
            Filter("Modified After", "=", "2024-01-01T00:00:00"),
            Filter("Name", "=", "ACME"),
        ],
        config={"transport": transport, "wire": True},
    )
    df = ServiceSource(SERVICES["xero"]).read(spark, c)
    assert df.count() == 1
    w = seen[0]
    assert w["headers"] == {"If-Modified-Since": "2024-01-01T00:00:00"}
    assert w["params"]["includeArchived"] == "true"
    assert w["params"]["where"] == "Name='ACME'"
    assert w["params"]["page"] == 1 and w["params"]["pageSize"] > 0


def test_wire_mode_stripe_search_query_reaches_transport(spark):
    seen = []

    def transport(wire, page_options):
        seen.append(wire)
        return {"data": [{"id": "cus_1", "email": "a@x.com"}]}

    c = Connector(
        adapter_id="stripe",
        endpoint_id="customers",
        filters=[Filter("email", "=", "a@x.com")],
        config={"transport": transport, "wire": True},
    )
    ServiceSource(SERVICES["stripe"]).read(spark, c)
    assert seen[0]["url"].endswith("/customers/search")
    assert seen[0]["params"]["query"] == 'email:"a@x.com"'


def test_wire_mode_github_chartmogul_s3_params():
    """The remaining param dialects render natively too — every one of
    the 10 services now has a wire renderer."""
    from openetl_spark.sources.services import wire_request

    g = wire_request(
        Connector(
            adapter_id="github", endpoint_id="user_repos",
            filters=[Filter("type", "=", "owner")],
            config={"username": "u"},
        ),
        SERVICES["github"],
        {"limit": 250, "offset": 200},
    )
    # per_page caps at 100; page is 1-based over the capped size
    assert g["params"] == {"type": "owner", "per_page": "100", "page": "3"}

    c = wire_request(
        Connector(
            adapter_id="chartmogul", endpoint_id="customers",
            filters=[Filter("status", "=", "Active"), Filter("mrr", ">", 5)],
        ),
        SERVICES["chartmogul"],
        {"limit": 50},
    )
    assert c["params"] == {"status": "Active", "per_page": 50}

    s = wire_request(
        Connector(
            adapter_id="s3", endpoint_id="list-objects",
            filters=[Filter("prefix", "=", "data/2024/")],
            config={"bucket": "b"},
        ),
        SERVICES["s3"],
        {"limit": 1000, "offset": "tok"},
    )
    assert s["params"]["Prefix"] == "data/2024/"
    assert s["params"]["MaxKeys"] == 1000
    assert s["params"]["ContinuationToken"] == "tok"

    with pytest.raises(ValueError, match="must be a string"):
        wire_request(
            Connector(
                adapter_id="s3", endpoint_id="list-objects",
                filters=[Filter("prefix", "=", 7)],
                config={"bucket": "b"},
            ),
            SERVICES["s3"],
            {"limit": 10},
        )
