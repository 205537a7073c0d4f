"""Differential tests: every catalog query with an oracle must match
DuckDB at the test scale factor — the local mirror of the driver's t2
correctness gate."""

import pytest

from openetl_spark import catalog
from tests.oracle_utils import compare, duckdb_con

ORACLE_QUERIES = sorted(catalog.ORACLE)
ROWS_ONLY = sorted(set(catalog.QUERIES) - set(catalog.ORACLE))


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, con, name):
    df = catalog.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, con, catalog.ORACLE[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = catalog.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
