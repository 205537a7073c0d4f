"""Randomized groupBy/agg differential sweep (ROADMAP #5, generalizing
the hand-written oracle catalog): seeded random (filter, group-keys,
aggregates) specs over lineitem are rendered BOTH as a Spark DataFrame
query and as DuckDB SQL, then compared with the same order-insensitive
value check the driver gate uses. 30 seeds × up to 4 aggregates each —
a few hundred engine-vs-engine agreement points per run, all
reproducible from the seed.

Rounding conventions follow the catalog's proven-stable forms
(`q1_pricing`): sums→2dp, avgs→4dp, counts→BIGINT; min/max compare raw
(identical doubles from the same parquet)."""

import random

import pytest
from pyspark.sql import functions as F

from openetl_spark import catalog
from tests.oracle_utils import compare, duckdb_con

CATS = ["l_returnflag", "l_linestatus"]
NUMS = {
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (900.0, 105000.0),
    "l_discount": (0.0, 0.1),
    "l_tax": (0.0, 0.08),
}

AGG_KINDS = ["sum", "avg", "min", "max", "cnt", "cntd"]


def gen_spec(seed: int):
    rng = random.Random(seed)
    keys = rng.sample(CATS, rng.randint(0, len(CATS)))
    aggs = []
    for i in range(rng.randint(1, 4)):
        aggs.append((rng.choice(AGG_KINDS), rng.choice(sorted(NUMS)), f"a{i}"))
    filt = None
    if rng.random() < 0.7:
        col = rng.choice(sorted(NUMS))
        lo, hi = NUMS[col]
        filt = (col, rng.choice(["<", "<=", ">", ">="]), round(rng.uniform(lo, hi), 2))
    return keys, aggs, filt


def spark_query(spark, sf_dir, spec):
    keys, aggs, filt = spec
    df = catalog.load(spark, sf_dir, "lineitem")
    if filt:
        col, op, val = filt
        cond = {"<": F.col(col) < val, "<=": F.col(col) <= val,
                ">": F.col(col) > val, ">=": F.col(col) >= val}[op]
        df = df.filter(cond)
    exprs = []
    for kind, col, alias in aggs:
        e = {
            "sum": lambda: F.round(F.sum(col), 2),
            "avg": lambda: F.round(F.avg(col), 4),
            "min": lambda: F.min(col),
            "max": lambda: F.max(col),
            "cnt": lambda: F.count(col),
            "cntd": lambda: F.countDistinct(col),
        }[kind]()
        exprs.append(e.alias(alias))
    return df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)


def duckdb_sql(spec) -> str:
    keys, aggs, filt = spec
    sel = list(keys)
    for kind, col, alias in aggs:
        expr = {
            "sum": f"round(sum({col}), 2)",
            "avg": f"round(avg({col}), 4)",
            "min": f"min({col})",
            "max": f"max({col})",
            "cnt": f"CAST(count({col}) AS BIGINT)",
            "cntd": f"CAST(count(DISTINCT {col}) AS BIGINT)",
        }[kind]
        sel.append(f"{expr} AS {alias}")
    sql = f"SELECT {', '.join(sel)} FROM lineitem"
    if filt:
        col, op, val = filt
        sql += f" WHERE {col} {op} {val}"
    if keys:
        sql += f" GROUP BY {', '.join(keys)}"
    return sql


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("seed", range(30))
def test_random_agg_spec_matches_duckdb(spark, sf_dir, con, seed):
    spec = gen_spec(seed)
    ok, msg = compare(spark_query(spark, sf_dir, spec), con, duckdb_sql(spec))
    assert ok, f"seed={seed} spec={spec}: {msg}"
