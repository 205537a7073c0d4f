"""Default stdlib HTTP transport (VERDICT r04 missing #1): wire-mode
pipelines with NO injected transport execute end-to-end against an
in-process http.server, sending the exact native payloads the dialect
renderers produce and honoring the retry/refresh hooks."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from openetl_spark.sources.http_transport import HttpTransport, page_parser
from openetl_spark.sources.rest import AuthError
from openetl_spark.sources.services import SERVICES, ServiceSink, ServiceSource
from openetl_spark.spec import Connector, Filter, Sort


class _Recorder:
    """Capture (method, path, query, headers, body) per request and
    serve a scripted list of responses."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.requests = []


def _serve(rec: _Recorder):
    class Handler(BaseHTTPRequestHandler):
        def _handle(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n).decode() if n else ""
            path, _, query = self.path.partition("?")
            rec.requests.append(
                {
                    "method": self.command,
                    "path": path,
                    "query": query,
                    "headers": dict(self.headers),
                    "body": json.loads(body) if body else None,
                }
            )
            status, payload, headers = rec.responses.pop(0)
            self.send_response(status)
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            if payload is not None:
                self.wfile.write(json.dumps(payload).encode())

        do_GET = _handle
        do_POST = _handle

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_hubspot_wire_pipeline_no_injected_transport(spark):
    """Cursor-paged POST search: two pages, exact filterGroups body,
    auth header attached, cursor folded into page 2's body."""
    page1 = {
        "results": [{"firstname": "A", "email": "a@x.com"},
                    {"firstname": "B", "email": "b@x.com"}],
        "paging": {"next": {"after": "AFTER-1"}},
    }
    page2 = {"results": [{"firstname": "C", "email": "c@x.com"}]}
    rec = _Recorder([(200, page1, None), (200, page2, None)])
    srv, base = _serve(rec)
    try:
        c = Connector(
            adapter_id="hubspot",
            endpoint_id="contacts",
            fields=["firstname", "email"],
            filters=[Filter("age", ">", 3)],
            sort=[Sort("firstname", "asc")],
            config={
                "wire": True,
                "base_url": base,
                "http_headers": {"Authorization": "Bearer tok-1"},
            },
        )
        df = ServiceSource(SERVICES["hubspot"]).read(spark, c)
        assert {r["firstname"] for r in df.collect()} == {"A", "B", "C"}
        assert len(rec.requests) == 2
        r1, r2 = rec.requests
        assert r1["method"] == "POST"
        assert r1["path"] == "/crm/v3/objects/contacts/search"
        assert r1["headers"]["Authorization"] == "Bearer tok-1"
        assert r1["body"] == {
            "limit": 100,
            "properties": ["firstname", "email"],
            "filterGroups": [
                {"filters": [{"propertyName": "age", "operator": "GT", "value": 3}]}
            ],
            "sorts": [{"propertyName": "firstname", "direction": "ASCENDING"}],
        }
        assert r2["body"]["after"] == "AFTER-1"
    finally:
        srv.shutdown()


def test_github_wire_offset_pagination_params(spark):
    """Offset-paged GET: plain-array pages, per_page/page params, stop
    on the short page."""
    full = [{"id": i, "name": f"r{i}"} for i in range(3)]
    rec = _Recorder([(200, full, None), (200, [{"id": 99, "name": "last"}], None)])
    srv, base = _serve(rec)
    try:
        c = Connector(
            adapter_id="github",
            endpoint_id="user_repos",
            limit=3,  # page size 3 → second page is short → stop
            config={"wire": True, "base_url": base,
                    "http_headers": {"Authorization": "token gh"}},
        )
        df = ServiceSource(SERVICES["github"]).read(spark, c)
        assert df.count() == 3  # limit applies
        q1 = dict(p.split("=") for p in rec.requests[0]["query"].split("&"))
        assert q1 == {"per_page": "3", "page": "1"}
    finally:
        srv.shutdown()


def test_429_retry_after_then_success(spark):
    rec = _Recorder([
        (429, {"message": "rate limited"}, {"Retry-After": "0"}),
        (200, {"results": [{"email": "x@x.com"}]}, None),
    ])
    srv, base = _serve(rec)
    try:
        c = Connector(
            adapter_id="hubspot",
            endpoint_id="contacts",
            fields=["email"],
            config={"wire": True, "base_url": base, "max_retries": 1},
        )
        df = ServiceSource(SERVICES["hubspot"]).read(spark, c)
        assert df.count() == 1
        assert len(rec.requests) == 2
    finally:
        srv.shutdown()


def test_401_refresh_auth_rotates_shared_headers(spark):
    """refresh_auth mutates config['http_headers'] in place; the
    transport holds the dict by reference so the retry carries the new
    token."""
    rec = _Recorder([
        (401, {"message": "expired"}, None),
        (200, {"results": [{"email": "y@x.com"}]}, None),
    ])
    srv, base = _serve(rec)
    headers = {"Authorization": "Bearer stale"}

    def refresh():
        headers["Authorization"] = "Bearer fresh"

    try:
        c = Connector(
            adapter_id="hubspot",
            endpoint_id="contacts",
            fields=["email"],
            config={
                "wire": True, "base_url": base,
                "http_headers": headers, "refresh_auth": refresh,
            },
        )
        df = ServiceSource(SERVICES["hubspot"]).read(spark, c)
        assert df.count() == 1
        assert rec.requests[0]["headers"]["Authorization"] == "Bearer stale"
        assert rec.requests[1]["headers"]["Authorization"] == "Bearer fresh"
    finally:
        srv.shutdown()


def test_missing_transport_without_wire_raises(spark):
    c = Connector(adapter_id="hubspot", endpoint_id="contacts", config={})
    with pytest.raises(KeyError, match="wire"):
        ServiceSource(SERVICES["hubspot"]).read(spark, c)


# ------------------------------------------------- parser units (pure)

def test_parsers_match_reference_envelopes():
    stripe = page_parser("stripe", {"path": "/charges/search"})
    assert stripe({"data": [{"id": "ch_1"}], "has_more": True,
                   "next_page": "np"}, "charges") == {
        "data": [{"id": "ch_1"}], "next_cursor": "np"}
    # list-style fallback: has_more without next_page pages by last id
    assert stripe({"data": [{"id": "ch_9"}], "has_more": True}, "charges")[
        "next_cursor"] == "ch_9"
    xero = page_parser("xero", {"path": "/Contacts"})
    assert xero({"Contacts": [{"Name": "ACME"}]}, "contacts") == {
        "data": [{"Name": "ACME"}], "next_cursor": None}
    gmail = page_parser("gmail", {"path": "/users/me/messages"})
    assert gmail({"messages": [{"id": "m1"}], "nextPageToken": "t"},
                 "list-messages") == {"data": [{"id": "m1"}], "next_cursor": "t"}
    assert gmail({"id": "m1", "snippet": "s"}, "get-message") == {
        "data": [{"id": "m1", "snippet": "s"}], "next_cursor": None}
    cm = page_parser("chartmogul", {"path": "/v1/customers"})
    assert cm({"entries": [{"uuid": "u"}], "has_more": True, "cursor": "c"},
              "customers") == {"data": [{"uuid": "u"}], "next_cursor": "c"}
    tw = page_parser("twitter", {"path": "/tweets/search/recent"})
    assert tw({"data": [{"id": "1"}], "meta": {"next_token": "nt"}},
              "tweets_search") == {"data": [{"id": "1"}], "next_cursor": "nt"}
    zoho = page_parser("zoho", {"path": "/crm/v2/Leads"})
    assert zoho({"data": [{"id": 1}], "info": {"more_records": True}},
                "leads") == {"data": [{"id": 1}], "next_cursor": None}


def test_non_http_services_are_rejected_with_pointer():
    with pytest.raises(NotImplementedError, match="boto3"):
        page_parser("s3", {"path": "/"})
    with pytest.raises(NotImplementedError, match="gads"):
        page_parser("google-ads", {"path": "/"})


def test_transport_rejects_abstract_requests():
    t = HttpTransport("hubspot", "contacts", lambda p, e: {"data": []})
    with pytest.raises(ValueError, match="wire"):
        t({"url": "http://x", "method": "GET", "fields": []}, {})


def test_http_error_maps_to_auth_error_with_retry_after():
    import urllib.error
    from email.message import Message

    def opener(req, timeout):
        hdrs = Message()
        hdrs["Retry-After"] = "2.5"
        raise urllib.error.HTTPError(req.full_url, 429, "rate", hdrs, None)

    t = HttpTransport("hubspot", "contacts", lambda p, e: {"data": []},
                      opener=opener)
    with pytest.raises(AuthError) as ei:
        t({"url": "http://x", "method": "GET", "params": {}, "headers": {},
           "body": None}, {})
    assert ei.value.status == 429 and ei.value.retry_after == 2.5


def test_residual_filter_over_projected_and_pruned(spark):
    """r05 layering fix: a RESIDUAL filter (filter groups never push)
    whose column isn't in connector.fields must (a) widen the wire
    properties so the predicate can resolve, (b) be applied Spark-side,
    and (c) stay out of the user-visible projection. The PUSHED age
    filter must NOT be re-applied (the server already dropped those
    rows; the response doesn't even carry 'age')."""
    from openetl_spark.pipeline import Orchestrator, Pipeline
    from openetl_spark.spec import FilterGroup

    page = {
        "results": [
            {"email": "keep@x.com", "tier": "gold"},
            {"email": "drop@x.com", "tier": "wood"},
        ]
    }
    rec = _Recorder([(200, page, None)])
    srv, base = _serve(rec)
    try:
        c = Connector(
            adapter_id="hubspot",
            endpoint_id="contacts",
            fields=["email"],
            filters=[
                Filter("age", ">", 3),  # pushes: server-side only
                FilterGroup("OR", [Filter("tier", "=", "gold"),
                                   Filter("tier", "=", "silver")]),  # residual
            ],
            config={"wire": True, "base_url": base},
        )
        res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="p", source=c))
        rows = res.collect()
        assert [r["email"] for r in rows] == ["keep@x.com"]
        assert "tier" not in res.df.columns  # pruned back to fields
        body = rec.requests[0]["body"]
        assert body["properties"] == ["email", "tier"]  # over-projected
        # pushed filter rendered server-side, untouched by over-projection
        assert body["filterGroups"] == [
            {"filters": [{"propertyName": "age", "operator": "GT", "value": 3}]}
        ]
    finally:
        srv.shutdown()


def test_5xx_is_retryable_not_auth_error(spark):
    """Review r05: a transient 503 must ride the generic retry path —
    the old blanket AuthError mapping hit _fetch_with_retry's bare
    re-raise and killed the ingest despite max_retries."""
    rec = _Recorder([
        (503, {"message": "unavailable"}, None),
        (200, {"results": [{"email": "ok@x.com"}]}, None),
    ])
    srv, base = _serve(rec)
    try:
        c = Connector(
            adapter_id="hubspot", endpoint_id="contacts", fields=["email"],
            config={"wire": True, "base_url": base,
                    "max_retries": 1, "retry_interval_s": 0.0},
        )
        df = ServiceSource(SERVICES["hubspot"]).read(spark, c)
        assert df.count() == 1 and len(rec.requests) == 2
    finally:
        srv.shutdown()


def test_boolean_params_render_json_style(spark):
    """Review r05: axios serializes JS booleans as 'true'/'false';
    Python str() would send 'True' and break case-sensitive services."""
    rec = _Recorder([(200, {"Contacts": []}, None)])
    srv, base = _serve(rec)
    try:
        c = Connector(
            adapter_id="xero", endpoint_id="contacts",
            filters=[Filter("includeArchived", "=", True)],
            config={"wire": True, "base_url": base},
        )
        ServiceSource(SERVICES["xero"]).read(spark, c)
        assert "includeArchived=true" in rec.requests[0]["query"]
    finally:
        srv.shutdown()


def test_sort_column_outside_fields_over_projected(spark):
    """Review r05: the compiler re-applies the FULL sort post-ingest,
    so a sort key outside connector.fields must be over-projected into
    the wire properties (and pruned from user-visible output)."""
    from openetl_spark.pipeline import Orchestrator, Pipeline

    page = {"results": [
        {"email": "b@x.com", "firstname": "B"},
        {"email": "a@x.com", "firstname": "A"},
    ]}
    rec = _Recorder([(200, page, None)])
    srv, base = _serve(rec)
    try:
        c = Connector(
            adapter_id="hubspot", endpoint_id="contacts",
            fields=["email"],
            sort=[Sort("firstname", "asc")],
            config={"wire": True, "base_url": base},
        )
        res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="p", source=c))
        rows = res.collect()
        assert [r["email"] for r in rows] == ["a@x.com", "b@x.com"]
        assert "firstname" not in res.df.columns
        assert rec.requests[0]["body"]["properties"] == ["email", "firstname"]
    finally:
        srv.shutdown()


# ------------------------------------------------- default upload sink

def test_hubspot_upload_default_transport_batch_body(spark):
    """ServiceSink with no injected transport POSTs HubSpot's native
    {inputs: [...]} batch body (executor-side foreachPartition hits the
    local server)."""
    rec = _Recorder([(200, {"status": "ok"}, None)] * 8)
    srv, base = _serve(rec)
    try:
        df = spark.createDataFrame(
            [("A", "a@x.com"), ("B", "b@x.com")], "firstname string, email string"
        ).coalesce(1)
        c = Connector(
            adapter_id="hubspot", endpoint_id="create-contact",
            config={"base_url": base,
                    "http_headers": {"Authorization": "Bearer t"}},
        )
        ServiceSink(SERVICES["hubspot"]).write(df, c)
        sent = [r for r in rec.requests if r["body"]]
        assert len(sent) == 1
        assert sorted(sent[0]["body"]["inputs"], key=lambda d: d["email"]) == [
            {"firstname": "A", "email": "a@x.com"},
            {"firstname": "B", "email": "b@x.com"},
        ]
        assert sent[0]["headers"]["Authorization"] == "Bearer t"
    finally:
        srv.shutdown()


def test_stripe_upload_form_encoding_with_nested_objects():
    from openetl_spark.sources.http_transport import _stripe_form_encode

    body = _stripe_form_encode(
        {"name": "Widget", "active": True, "metadata": {"sku": "s1", "n": 2}}
    )
    assert "name=Widget" in body
    assert "active=true" in body
    assert "metadata%5Bsku%5D=s1" in body  # metadata[sku]=s1
    assert "metadata%5Bn%5D=2" in body


def test_gmail_upload_raw_rfc822():
    import base64

    from openetl_spark.sources.http_transport import _gmail_raw

    raw = _gmail_raw({"to": "x@y.z", "subject": "Hi", "body": "Hello"})
    pad = raw + "=" * (-len(raw) % 4)
    decoded = base64.urlsafe_b64decode(pad).decode()
    assert decoded == "To: x@y.z\r\nSubject: Hi\r\n\r\nHello"


def test_upload_unknown_service_rejected():
    from openetl_spark.sources.http_transport import HttpUploadTransport

    with pytest.raises(NotImplementedError, match="transport"):
        HttpUploadTransport("github")


def test_hubspot_real_shape_properties_flattened(spark):
    """Real HubSpot CRM responses nest fields under `properties`
    ({id, properties: {...}, createdAt}); the reference reads
    item.properties[field] — the default parser must flatten so the
    engine's fields projection resolves."""
    page = {
        "results": [
            {"id": "101", "createdAt": "2024-01-01T00:00:00Z",
             "properties": {"firstname": "A", "email": "a@x.com"}},
            {"id": "102", "createdAt": "2024-01-02T00:00:00Z",
             "properties": {"firstname": "B", "email": "b@x.com"}},
        ]
    }
    rec = _Recorder([(200, page, None)])
    srv, base = _serve(rec)
    try:
        c = Connector(
            adapter_id="hubspot", endpoint_id="contacts",
            fields=["firstname", "email"],
            config={"wire": True, "base_url": base},
        )
        df = ServiceSource(SERVICES["hubspot"]).read(spark, c)
        rows = {(r["firstname"], r["email"]) for r in df.collect()}
        assert rows == {("A", "a@x.com"), ("B", "b@x.com")}
        assert set(df.columns) >= {"firstname", "email"}
    finally:
        srv.shutdown()
