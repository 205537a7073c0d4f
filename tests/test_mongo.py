"""Mongo adapter e2e over the in-process fake transport (VERDICT r01
task #3): the rendered find documents actually execute — find/sort/
projection/limit round-trip plus insert_many load — mirroring the
reference's integration suite (`/root/reference/adapters/mongodb/src/
index.ts:99-260`) without a mongod."""

import pytest
from pyspark.sql import functions as F

from openetl_spark.pipeline import Orchestrator, Pipeline
from openetl_spark.sources.mongo import render_find
from openetl_spark.spec import Connector, Filter, FilterGroup, Sort
from tests.fake_mongo import FakeCollection, match

DOCS = [
    {"user_id": i, "name": f"user{i}", "age": 18 + (i * 7) % 50,
     "city": ["paris", "tokyo", "lima", None][i % 4]}
    for i in range(40)
]
SCHEMA = "user_id long, name string, age long, city string"


def run(col, **kw):
    from openetl_spark.session import get_spark

    spark = get_spark()
    src = Connector(adapter_id="mongodb", endpoint_id="table_query",
                    config={"collection": col, "schema": SCHEMA}, **kw)
    return Orchestrator(spark=spark).run_pipeline(Pipeline(id="m", source=src)).df


def test_find_filter_sort_project_limit_roundtrip(spark):
    col = FakeCollection(DOCS)
    df = run(
        col,
        filters=[Filter("age", ">=", 30), Filter("city", "!=", "lima")],
        sort=[Sort("age", "desc"), Sort("user_id", "asc")],
        fields=["user_id", "age"],
        limit=5,
    )
    got = [(r["user_id"], r["age"]) for r in df.collect()]
    # independent expectation computed in Python over the same docs
    exp = sorted(
        [(d["user_id"], d["age"]) for d in DOCS
         if d["age"] >= 30 and d["city"] is not None and d["city"] != "lima"],
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert got == exp
    # pushdown evidence: the rendered $and doc reached the fake; the
    # projection over-includes filter/sort columns (compiler prunes)
    flt, proj = col.find_calls[0]
    assert "$and" in flt and proj == {"user_id": 1, "age": 1, "city": 1, "_id": 0}
    assert df.columns == ["user_id", "age"]


def test_same_field_filters_both_apply(spark):
    """The reference Object.assign-merges same-field filters so the
    later one overwrites the earlier (documented bug); this engine
    $and-combines them."""
    col = FakeCollection(DOCS)
    df = run(col, filters=[Filter("age", ">", 25), Filter("age", "<", 35)])
    ages = {r["age"] for r in df.collect()}
    assert ages and all(25 < a < 35 for a in ages)


def test_or_group_renders_and_executes(spark):
    col = FakeCollection(DOCS)
    df = run(
        col,
        filters=[FilterGroup("OR", [Filter("city", "=", "paris"), Filter("age", ">", 60)])],
    )
    for r in df.collect():
        assert r["city"] == "paris" or r["age"] > 60
    assert df.count() == sum(1 for d in DOCS if d["city"] == "paris" or d["age"] > 60)


def test_non_renderable_operator_stays_residual(spark):
    """starts_with has no Mongo rendering: it must NOT be mistranslated
    into equality (the reference's default branch) — the fake receives a
    find doc without it and Spark applies it post-ingest."""
    col = FakeCollection(DOCS)
    df = run(col, filters=[Filter("name", "starts_with", "user1"), Filter("age", ">=", 18)])
    names = {r["name"] for r in df.collect()}
    assert names == {d["name"] for d in DOCS if d["name"].startswith("user1")}
    flt, _ = col.find_calls[0]
    assert "name" not in str(flt)  # only the age filter pushed


def test_custom_query_endpoint(spark):
    col = FakeCollection(DOCS)
    src = Connector(
        adapter_id="mongodb", endpoint_id="custom_query",
        config={"collection": col, "schema": SCHEMA,
                "custom_query": '{"age": {"$gte": 60}}'},
    )
    from openetl_spark.session import get_spark

    df = Orchestrator(spark=get_spark()).run_pipeline(Pipeline(id="cq", source=src)).df
    assert {r["age"] >= 60 for r in df.collect()} == {True}


def test_custom_query_invalid_json_raises():
    c = Connector(adapter_id="mongodb", endpoint_id="custom_query",
                  config={"collection": FakeCollection(), "custom_query": "{nope"})
    with pytest.raises(ValueError, match="Invalid custom query JSON"):
        render_find(c)


def test_endpoint_direction_errors(spark):
    from openetl_spark.session import get_spark

    spark_ = get_spark()
    with pytest.raises(Exception, match="only supports upload"):
        Orchestrator(spark=spark_).run_pipeline(
            Pipeline(id="bad", source=Connector(
                adapter_id="mongodb", endpoint_id="collection_insert",
                config={"collection": FakeCollection()})))
    with pytest.raises(Exception, match="collection_insert"):
        Orchestrator(spark=spark_).run_pipeline(
            Pipeline(id="bad2", data=[{"a": 1}],
                     target=Connector(adapter_id="mongodb", endpoint_id="table_query",
                                      config={"collection": FakeCollection()})))


def test_insert_many_load_roundtrip(spark):
    """load → fake collection via insert_many, then read back through
    the source and compare (the reference's upload/download pair)."""
    col = FakeCollection()
    from openetl_spark.session import get_spark

    spark_ = get_spark()
    Orchestrator(spark=spark_).run_pipeline(Pipeline(
        id="ins",
        data=[{"k": i, "v": f"x{i}"} for i in range(25)],
        target=Connector(adapter_id="mongodb", endpoint_id="collection_insert",
                         config={"collection": col, "batch_size": 10}),
    ))
    assert len(col.docs) == 25
    src = Connector(adapter_id="mongodb", endpoint_id="table_query",
                    config={"collection": col, "schema": "k long, v string"},
                    filters=[Filter("k", ">=", 20)])
    back = Orchestrator(spark=spark_).run_pipeline(Pipeline(id="rb", source=src)).df
    assert sorted(r["k"] for r in back.collect()) == [20, 21, 22, 23, 24]


def test_custom_query_with_filters_no_limit_push(spark):
    """ADVICE r02: custom_query + connector.filters must NOT push the
    find-limit — the filters run Spark-side AFTER ingest, so a pushed
    cursor.limit(N) would truncate before filtering (first-N-fetched
    bug). Expect the full top-up: exactly `limit` rows that match."""
    col = FakeCollection(DOCS)
    src = Connector(
        adapter_id="mongodb", endpoint_id="custom_query",
        config={"collection": col, "schema": SCHEMA,
                "custom_query": '{"age": {"$gte": 18}}'},
        filters=[Filter("city", "=", "lima")],  # NOT rendered into the find doc
        limit=5,
    )
    from openetl_spark.session import get_spark

    df = Orchestrator(spark=get_spark()).run_pipeline(Pipeline(id="cqf", source=src)).df
    rows = df.collect()
    n_lima = sum(1 for d in DOCS if d["city"] == "lima")
    assert len(rows) == min(5, n_lima) == 5
    assert all(r["city"] == "lima" for r in rows)


def test_empty_find_without_schema_yields_zero_rows(spark):
    """ADVICE r02: an empty find with no config['schema'] must produce a
    0-row DataFrame whose columns still satisfy the compiler's re-applied
    filters/sort/select — not UNRESOLVED_COLUMN."""
    col = FakeCollection(DOCS)
    src = Connector(
        adapter_id="mongodb", endpoint_id="table_query",
        config={"collection": col},
        filters=[Filter("age", ">", 1000)],
        sort=[Sort("age", "desc")],
        fields=["user_id", "age"],
    )
    from openetl_spark.session import get_spark

    df = Orchestrator(spark=get_spark()).run_pipeline(Pipeline(id="e0", source=src)).df
    assert df.count() == 0
    assert df.columns == ["user_id", "age"]


def test_id_never_leaks_into_schema_inference(spark):
    """ADVICE r02: fake docs now carry an ObjectId-like _id (as real
    pymongo returns); the pushed projection must exclude it or schema
    inference fails."""
    col = FakeCollection(DOCS)
    src = Connector(adapter_id="mongodb", endpoint_id="table_query",
                    config={"collection": col}, filters=[Filter("age", ">=", 60)])
    from openetl_spark.session import get_spark

    df = Orchestrator(spark=get_spark()).run_pipeline(Pipeline(id="noid", source=src)).df
    assert "_id" not in df.columns
    assert df.count() == sum(1 for d in DOCS if d["age"] >= 60)


def test_fake_mongo_null_semantics():
    docs = [{"a": 1, "b": None}, {"a": 2}, {"a": 3, "b": "x"}]
    assert [d["a"] for d in docs if match(d, {"b": None})] == [1, 2]
    assert [d["a"] for d in docs if match(d, {"b": {"$ne": None}})] == [3]
    assert [d["a"] for d in docs if match(d, {"b": {"$gt": ""}})] == [3]
    assert [d["a"] for d in docs if match(d, {"a": {"$in": [2, 3]}})] == [2, 3]
    assert [d["a"] for d in docs if match(d, {"a": {"$nin": [2, 3]}})] == [1]
