"""Unit tests for the mergeable HLL cell relation (r07): cells match a
pure-Python bit-level reference, the max-merge law holds (associative /
idempotent / union-equivalent), and the estimate tracks exact distinct
counts within the analytic error bound."""

import hashlib
import math

import pytest

from openetl_spark.operators import sketches as SK


def _py_cells(values, p=9):
    """Independent bit-level reference: 60-bit md5 prefix, top-p
    register index, leading-zero rank of the (60-p)-bit suffix."""
    w = 60 - p
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        j, suf = h >> w, h & ((1 << w) - 1)
        rho = (w + 1) if suf == 0 else (w + 1 - suf.bit_length())
        regs[j] = max(regs.get(j, 0), rho)
    return regs


def test_hll_cells_match_python_reference(spark):
    vals = [f"user-{i}" for i in range(500)] + ["user-3", "user-3"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r["j"]: r["r"] for r in SK.hll_cells(df, "v", p=9).collect()}
    assert got == _py_cells(vals, p=9)


def test_hll_cells_keyed_and_null_dropped(spark):
    rows = [("a", 1), ("a", 2), ("b", 1), ("a", None)]
    df = spark.createDataFrame(rows, "g string, v int")
    cells = SK.hll_cells(df, "v", keys=["g"], p=9).collect()
    by_g = {}
    for r in cells:
        by_g.setdefault(r["g"], {})[r["j"]] = r["r"]
    assert by_g["a"] == _py_cells([1, 2])
    assert by_g["b"] == _py_cells([1])


def test_hll_merge_equals_cells_of_union_and_is_idempotent(spark):
    a_vals = [f"x{i}" for i in range(300)]
    b_vals = [f"x{i}" for i in range(200, 600)]  # overlapping
    a = SK.hll_cells(
        spark.createDataFrame([(v,) for v in a_vals], "v string"), "v"
    )
    b = SK.hll_cells(
        spark.createDataFrame([(v,) for v in b_vals], "v string"), "v"
    )
    u = SK.hll_cells(
        spark.createDataFrame([(v,) for v in a_vals + b_vals], "v string"), "v"
    )
    merged = {(r["j"], r["r"]) for r in SK.hll_merge(a, b).collect()}
    assert merged == {(r["j"], r["r"]) for r in u.collect()}
    # idempotent: A merge A = A; commutative: B merge A = A merge B
    assert {(r["j"], r["r"]) for r in SK.hll_merge(a, a).collect()} == {
        (r["j"], r["r"]) for r in a.collect()
    }
    assert {(r["j"], r["r"]) for r in SK.hll_merge(b, a).collect()} == merged


@pytest.mark.parametrize("n", [80, 1500, 20000])
def test_hll_estimate_tracks_exact_count(spark, n):
    """|est - n| within 4 standard errors (σ = 1.04/√m); the n=80 case
    exercises the linear-counting small-range branch."""
    df = spark.createDataFrame([(f"id-{i}",) for i in range(n)], "v string")
    (row,) = SK.hll_estimate(SK.hll_cells(df, "v", p=9), p=9).collect()
    se = 1.04 / math.sqrt(512)
    assert abs(row["estimate"] - n) <= 4 * se * n, row


def test_hll_p_validation():
    with pytest.raises(ValueError, match="outside"):
        SK.hll_cells(None, "v", p=3)
