"""Google Ads adapter e2e over the in-process GAQL fake (VERDICT r02
task #6, closing SURVEY §2B B3): the rendered GAQL actually executes —
build/push/evaluate round-trip, nested dotted-path result shaping, auth
headers, and the 401 refresh-retry path — mirroring the reference's
`adapters/google-ads/src/index.ts` without network or credentials."""

import pytest

from openetl_spark.pipeline import Orchestrator, Pipeline
from openetl_spark.sources.gads import render_gaql
from openetl_spark.spec import Connector, Filter, FilterGroup, Sort
from tests.fake_gads import FakeGoogleAds

CAMPAIGNS = [
    {
        "campaign": {"id": i, "name": f"camp{i}", "status": ["ENABLED", "PAUSED"][i % 2]},
        "metrics": {"clicks": i * 10, "cost_micros": i * 1_000_000},
        "resourceName": f"customers/1/campaigns/{i}",
    }
    for i in range(1, 21)
]

AUTH = {
    "type": "oauth2",
    "credentials": {
        "access_token": "tok-live",
        "refresh_token": "rt",
        "client_id": "cid",
        "client_secret": "sec",
    },
}


def base_config(fake, **extra):
    return {
        "transport": fake,
        "customerId": "123",
        "developerToken": "dev-tok",
        "auth": {**AUTH, "credentials": dict(AUTH["credentials"])},
        **extra,
    }


def run(src):
    from openetl_spark.session import get_spark

    return Orchestrator(spark=get_spark()).run_pipeline(Pipeline(id="g", source=src)).df


def test_table_query_roundtrip_pushdown(spark):
    fake = FakeGoogleAds({"campaign": CAMPAIGNS})
    src = Connector(
        adapter_id="google-ads", endpoint_id="table_query",
        config=base_config(fake, table="campaign"),
        fields=["campaign.id", "campaign.name", "metrics.clicks"],
        filters=[Filter("campaign.status", "=", "ENABLED"),
                 Filter("metrics.clicks", ">", 50)],
        sort=[Sort("metrics.clicks", "desc")],
        limit=3,
    )
    df = run(src)
    rows = [tuple(r) for r in df.collect()]
    exp = sorted(
        [
            (c["campaign"]["id"], c["campaign"]["name"], c["metrics"]["clicks"])
            for c in CAMPAIGNS
            if c["campaign"]["status"] == "ENABLED" and c["metrics"]["clicks"] > 50
        ],
        key=lambda t: -t[2],
    )[:3]
    assert rows == exp
    # pushdown evidence: the full GAQL (incl. LIMIT — all filters
    # rendered) reached the transport, with the reference's headers
    query, headers = fake.calls[0]
    assert query == (
        "SELECT campaign.id, campaign.name, metrics.clicks, campaign.status "
        "FROM campaign "
        "WHERE campaign.status = 'ENABLED' AND metrics.clicks > 50 "
        "ORDER BY metrics.clicks DESC LIMIT 3"
    )
    assert headers["Authorization"] == "Bearer tok-live"
    assert headers["developer-token"] == "dev-tok"


def test_group_filter_stays_residual_no_limit_push(spark):
    """GAQL has no OR groups: the group must run Spark-side and the
    limit must NOT be pushed (first-N-fetched guard)."""
    fake = FakeGoogleAds({"campaign": CAMPAIGNS})
    src = Connector(
        adapter_id="google-ads", endpoint_id="table_query",
        config=base_config(fake, table="campaign"),
        fields=["campaign.id", "metrics.clicks"],
        filters=[FilterGroup("OR", [Filter("campaign.status", "=", "PAUSED"),
                                    Filter("metrics.clicks", ">", 150)])],
        limit=5,
    )
    df = run(src)
    query, _ = fake.calls[0]
    assert "WHERE" not in query and "LIMIT" not in query
    got = {r["id"] for r in df.collect()}
    exp = sorted(
        c["campaign"]["id"] for c in CAMPAIGNS
        if c["campaign"]["status"] == "PAUSED" or c["metrics"]["clicks"] > 150
    )[:5]
    assert len(got) == 5 and got <= set(exp) or got == set(exp)


def test_expired_token_refreshes_before_call(spark):
    fake = FakeGoogleAds({"campaign": CAMPAIGNS}, valid_tokens={"tok-new"})
    refreshed = []

    def refresher(creds):
        refreshed.append(creds["refresh_token"])
        return "tok-new", 3600

    cfg = base_config(fake, table="campaign", token_refresher=refresher)
    cfg["auth"]["expires_at"] = "2000-01-01T00:00:00+00:00"  # long expired
    src = Connector(adapter_id="google-ads", endpoint_id="table_query",
                    config=cfg, fields=["campaign.id"])
    df = run(src)
    assert df.count() == len(CAMPAIGNS)
    assert refreshed == ["rt"]
    # exactly one transport call, already with the fresh token
    assert len(fake.calls) == 1
    assert fake.calls[0][1]["Authorization"] == "Bearer tok-new"


def test_401_refresh_and_retry_once(spark):
    """Stale-but-unexpired token: the 401 surfaces mid-call; the adapter
    refreshes once and retries (reference index.ts:311-324)."""
    fake = FakeGoogleAds({"campaign": CAMPAIGNS}, valid_tokens={"tok-new"})
    src = Connector(
        adapter_id="google-ads", endpoint_id="table_query",
        config=base_config(fake, table="campaign",
                           token_refresher=lambda c: ("tok-new", 3600)),
        fields=["campaign.id"],
    )
    df = run(src)
    assert df.count() == len(CAMPAIGNS)
    assert len(fake.calls) == 2  # 401 then retry
    assert fake.calls[0][1]["Authorization"] == "Bearer tok-live"
    assert fake.calls[1][1]["Authorization"] == "Bearer tok-new"


def test_custom_query_passthrough(spark):
    fake = FakeGoogleAds({"campaign": CAMPAIGNS})
    gaql = "SELECT campaign.id FROM campaign WHERE campaign.status = 'PAUSED'"
    src = Connector(
        adapter_id="google-ads", endpoint_id="custom_query",
        config=base_config(fake, custom_query=gaql, fields=["campaign.id"]),
    )
    df = run(src)
    assert fake.calls[0][0] == gaql  # verbatim, no LIMIT appended
    assert df.count() == sum(1 for c in CAMPAIGNS if c["campaign"]["status"] == "PAUSED")


def test_missing_required_config_raises():
    fake = FakeGoogleAds({"campaign": CAMPAIGNS})
    with pytest.raises(ValueError, match="customerId required"):
        run(Connector(adapter_id="google-ads", endpoint_id="table_query",
                      config={"transport": fake, "developerToken": "d", "table": "campaign"},
                      fields=["campaign.id"]))
    with pytest.raises(ValueError, match="developerToken required"):
        run(Connector(adapter_id="google-ads", endpoint_id="table_query",
                      config={"transport": fake, "customerId": "1", "table": "campaign"},
                      fields=["campaign.id"]))
    c = Connector(adapter_id="google-ads", endpoint_id="table_query",
                  config={"table": "campaign"})
    with pytest.raises(ValueError, match="At least one field name"):
        render_gaql(c)
    with pytest.raises(ValueError, match="Table required"):
        render_gaql(Connector(adapter_id="google-ads", endpoint_id="table_query",
                              config={}, fields=["campaign.id"]))


def test_empty_results_yield_zero_rows(spark):
    """No matches (and a transport returning a non-list) → 0 rows with a
    stable schema derived from the requested paths, not a crash."""
    fake = FakeGoogleAds({"campaign": []})
    src = Connector(
        adapter_id="google-ads", endpoint_id="table_query",
        config=base_config(fake, table="campaign"),
        fields=["campaign.id", "metrics.clicks"],
        filters=[Filter("metrics.clicks", ">", 10**9)],
    )
    df = run(src)
    assert df.count() == 0
    assert df.columns == ["id", "clicks"]  # struct-leaf projection names
