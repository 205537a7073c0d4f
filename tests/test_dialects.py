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
