"""Python Data Source API tests: partition-parallel offset reads,
serial cursor reads, and Catalyst filter pushdown into the source."""

import pytest
from pyspark.sql import functions as F

from openetl_spark.sources.rest_datasource import RestDataSource
from tests.mock_http import N_ROWS


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    from openetl_spark.sources.rest_datasource import register as reg

    reg(spark)


BASE_OPTS = {
    "transport": "tests.mock_http:serve",
    "schema_ddl": "id long, name string, score double",
    "items_per_page": "25",
}


def read(spark, **extra):
    opts = dict(BASE_OPTS)
    opts.update({k: str(v) for k, v in extra.items()})
    return spark.read.format("openetl_rest").options(**opts).load()


def test_offset_mode_partitioned_reads_all(spark):
    df = read(spark, pagination="offset", total_count=N_ROWS, num_partitions=4)
    assert df.rdd.getNumPartitions() == 4
    got = sorted(r["id"] for r in df.collect())
    assert got == list(range(N_ROWS))


def test_offset_mode_unknown_total_serial(spark):
    df = read(spark, pagination="offset")
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == N_ROWS


def test_cursor_mode_serial_complete(spark):
    df = read(spark, pagination="cursor")
    assert df.rdd.getNumPartitions() == 1
    got = sorted(r["id"] for r in df.collect())
    assert got == list(range(N_ROWS))


def test_filter_pushdown_into_source(spark):
    df = read(spark, pagination="offset", total_count=N_ROWS, num_partitions=3)
    filtered = df.filter((F.col("id") >= 200) & (F.col("id") < 220))
    got = sorted(r["id"] for r in filtered.collect())
    assert got == list(range(200, 220))
    # defense-in-depth: the comparisons are pushed into the request AND
    # kept as a residual Filter in the plan, so results never depend on
    # the transport honoring request['filters']
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain()  # physical only
    plan = buf.getvalue()
    assert "BatchScan openetl_rest" in plan
    assert ">= 200" in plan and "< 220" in plan  # residual re-check


def test_push_filters_unit_translation_and_residuals():
    """pushFilters translates supported top-level comparisons into the
    request AND yields every filter back — pushdown is an optimization,
    never a correctness dependency (ADVICE r01)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, StringContains
    from pyspark.sql.types import StructType

    from openetl_spark.sources.rest_datasource import RestReader

    reader = RestReader(dict(BASE_OPTS), StructType())
    filters = [GreaterThan(("id",), 5), EqualTo(("name",), "x"),
               StringContains(("name",), "Item")]
    residuals = list(reader.pushFilters(filters))
    assert residuals == filters  # everything re-checked by Spark
    assert reader.pushed == [
        {"field": "id", "op": ">", "value": 5},
        {"field": "name", "op": "=", "value": "x"},
    ]


def test_transport_ignoring_pushed_filters_still_correct(spark):
    """A transport that ignores request['filters'] must yield extra rows
    that Spark's residual filter removes — not silently-unfiltered
    results (ADVICE r01 rest_datasource.py:90)."""
    df = read(
        spark,
        transport="tests.mock_http:serve_ignoring_filters",
        pagination="offset",
        total_count=N_ROWS,
    )
    filtered = df.filter((F.col("id") >= 200) & (F.col("id") < 220))
    got = sorted(r["id"] for r in filtered.collect())
    assert got == list(range(200, 220))


def test_unsupported_filter_stays_in_spark(spark):
    df = read(spark, pagination="offset", total_count=N_ROWS)
    filtered = df.filter(F.col("name").contains("Item23"))
    got = sorted(r["id"] for r in filtered.collect())
    assert got == [23] + list(range(230, 237))


def test_projection_column_subset(spark):
    df = read(spark, pagination="offset", total_count=N_ROWS, num_partitions=2)
    assert df.select("name").distinct().count() == N_ROWS
