"""Dialect-renderer tests (B3/B4): canonical filters → MongoDB find
documents and GAQL strings, incl. the same-field AND fix over the
reference's Object.assign overwrite bug."""

import pytest

from openetl_spark.functions.dialects import gaql_query, mongo_find_filter
from openetl_spark.spec import Filter, FilterGroup, Sort


def test_mongo_basic_operators():
    doc = mongo_find_filter([Filter("age", ">", 21)])
    assert doc == {"age": {"$gt": 21}}
    assert mongo_find_filter([Filter("name", "=", "x")]) == {"name": "x"}
    assert mongo_find_filter([Filter("k", "in", [1, 2])]) == {"k": {"$in": [1, 2]}}


def test_mongo_same_field_range_is_anded():
    # the reference's Object.assign would keep only the second clause
    # (adapters/mongodb/src/index.ts:124-127 — documented bug, not copied)
    doc = mongo_find_filter([Filter("age", ">", 18), Filter("age", "<", 65)])
    assert doc == {"$and": [{"age": {"$gt": 18}}, {"age": {"$lt": 65}}]}


def test_mongo_groups_and_null_ops():
    doc = mongo_find_filter(
        [FilterGroup("OR", [Filter("a", "=", 1), Filter("b", "is_null")])]
    )
    assert doc == {"$or": [{"a": 1}, {"b": None}]}
    assert mongo_find_filter([Filter("c", "between", (1, 5))]) == {
        "c": {"$gte": 1, "$lte": 5}
    }


def test_mongo_contains_escapes_regex():
    doc = mongo_find_filter([Filter("name", "contains", "a.b")])
    assert doc == {"name": {"$regex": "a\\.b"}}


def test_gaql_full_query():
    q = gaql_query(
        "campaign",
        ["campaign.id", "campaign.name"],
        [Filter("campaign.status", "=", "ENABLED"), Filter("metrics.clicks", ">", 100)],
        [Sort("metrics.clicks", "desc")],
        limit=50,
    )
    assert q == (
        "SELECT campaign.id, campaign.name FROM campaign "
        "WHERE campaign.status = 'ENABLED' AND metrics.clicks > 100 "
        "ORDER BY metrics.clicks DESC LIMIT 50"
    )


def test_gaql_quoting_and_in():
    q = gaql_query("ad", ["ad.id"], [Filter("ad.name", "in", ["a'b", "c"])])
    assert q == "SELECT ad.id FROM ad WHERE ad.name IN ('a\\'b', 'c')"


def test_gaql_rejects_groups():
    with pytest.raises(ValueError, match="no OR"):
        gaql_query("x", ["f"], [FilterGroup("OR", [Filter("a", "=", 1)])])


# ---------------------------------------------------------------------
# SaaS wire dialects (VERDICT r03 #7/#8) — exact-payload assertions
# mirroring the reference request shapes.
# ---------------------------------------------------------------------

from openetl_spark.functions.dialects import (  # noqa: E402
    gmail_query_params,
    hubspot_search_body,
    stripe_query_params,
    xero_wire,
    zoho_query_params,
)


def test_hubspot_search_body_exact():
    # adapters/hubspot/src/index.ts:357-398
    body = hubspot_search_body(
        ["email", "firstname"],
        [
            {"field": "age", "op": ">", "value": 21},
            {"field": "email", "op": "contains", "value": "@x.com"},
            {"field": "hs_lead_status", "op": "is_not_null", "value": None},
        ],
        [{"field": "createdate", "dir": "desc"}],
        limit=50,
        after="abc123",
    )
    assert body == {
        "limit": 50,
        "after": "abc123",
        "properties": ["email", "firstname"],
        "filterGroups": [
            {
                "filters": [
                    {"propertyName": "age", "operator": "GT", "value": 21},
                    {
                        "propertyName": "email",
                        "operator": "CONTAINS_TOKEN",
                        "value": "@x.com",
                    },
                    {
                        "propertyName": "hs_lead_status",
                        "operator": "NOT_NULL",
                        "value": None,
                    },
                ]
            }
        ],
        "sorts": [{"propertyName": "createdate", "direction": "DESCENDING"}],
    }


def test_hubspot_body_omits_empty_sections():
    assert hubspot_search_body([], [], []) == {}


def test_zoho_criteria_string_exact():
    # adapters/zoho/src/index.ts:348-379: (field:op:value) joined ' and '
    params = zoho_query_params(
        ["First_Name", "Email"],
        [
            {"field": "Last_Name", "op": "=", "value": "Smith"},
            {"field": "Annual_Revenue", "op": ">=", "value": 100000},
        ],
        [{"field": "Created_Time", "dir": "asc"}],
        limit=200,
        offset=400,
    )
    assert params == {
        "fields": "First_Name,Email",
        "criteria": "(Last_Name:equals:Smith) and (Annual_Revenue:greater_equal:100000)",
        "sort_by": "Created_Time",
        "sort_order": "asc",
        "per_page": 200,
        "page": 3,
    }


def test_stripe_search_query_string_exact():
    # adapters/stripe/src/index.ts:303-331: quoted strings, -field for !=
    params = stripe_query_params(
        "/customers/search",
        [
            {"field": "email", "op": "=", "value": "a@x.com"},
            {"field": "delinquent", "op": "!=", "value": "true"},
            {"field": "created", "op": ">", "value": 17000},
        ],
        limit=25,
        offset=2,
    )
    assert params == {
        "query": 'email:"a@x.com" AND -delinquent:"true" AND created>17000',
        "limit": 25,
        "page": 2,
    }


def test_stripe_list_params_and_cursor():
    params = stripe_query_params(
        "/charges",
        [{"field": "customer", "op": "=", "value": "cus_9"}],
        limit=10,
        offset="ch_last",
    )
    assert params == {"customer": "cus_9", "limit": 10, "starting_after": "ch_last"}


def test_stripe_search_without_query_degrades_to_list_paging():
    # index.ts:252-254: empty query → isSearchEndpoint = false
    params = stripe_query_params("/customers/search", [], limit=10, offset="cus_x")
    assert params == {"limit": 10, "starting_after": "cus_x"}


def test_xero_param_header_where_routing_exact():
    # adapters/xero/src/index.ts:308-333
    wire = xero_wire(
        [
            {"field": "includeArchived", "op": "=", "value": "true"},
            {"field": "Modified After", "op": "=", "value": "2024-01-01T00:00:00"},
            {"field": "Name", "op": "=", "value": "ACME"},
            {"field": "AmountDue", "op": ">", "value": 100},
        ],
        limit=50,
        offset=100,
    )
    assert wire == {
        "params": {
            "includeArchived": "true",
            "where": "Name='ACME' AND AmountDue>'100'",
            "page": 3,
            "pageSize": 50,
        },
        "headers": {"If-Modified-Since": "2024-01-01T00:00:00"},
    }


def test_xero_rejects_string_offset():
    with pytest.raises(ValueError, match="string as offset"):
        xero_wire([], limit=10, offset="tok")


def test_xero_non_equality_special_filters_dropped():
    # the reference only routes '=' for includeArchived/searchTerm and
    # Modified After; other operators on those fields are ignored
    wire = xero_wire([{"field": "searchTerm", "op": "!=", "value": "x"}])
    assert wire == {"params": {}, "headers": {}}


def test_gmail_list_messages_param_vs_q_routing_exact():
    # adapters/gmail/src/index.ts:183-209
    params = gmail_query_params(
        "list-messages",
        [
            {"field": "labelIds", "op": "=", "value": "INBOX"},
            {"field": "from", "op": "=", "value": "a@x.com"},
            {"field": "subject", "op": "!=", "value": "spam"},
        ],
        limit=100,
        offset="tok9",
    )
    assert params == {
        "labelIds": "INBOX",
        "q": "from:a@x.com -subject:spam",
        "maxResults": 100,
        "pageToken": "tok9",
    }


def test_gmail_zero_offset_omits_page_token():
    assert gmail_query_params("list-messages", [], limit=5, offset=0) == {
        "maxResults": 5
    }
    assert gmail_query_params("list-messages", [], limit=5, offset="0") == {
        "maxResults": 5
    }


def test_gmail_get_message_equality_params_only():
    params = gmail_query_params(
        "get-message",
        [
            {"field": "format", "op": "=", "value": "full"},
            {"field": "metadataHeaders", "op": "!=", "value": "x"},
        ],
    )
    assert params == {"format": "full"}
