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


def test_streaming_hll_cells_merge_equals_batch(spark, tmp_path):
    """Streamed HLL: each micro-batch's cells APPEND to a persisted
    cell log; the read-side max-merge of the log must equal the
    one-shot batch cells over the full corpus — the mergeable-relation
    contract under out-of-order, multi-batch arrival (the CMS /
    rollup-cells streaming discipline)."""
    import os

    import pyspark.sql.functions as F

    vals = [(f"cust-{i % 700}",) for i in range(2000)]  # dupes across batches
    src = str(tmp_path / "hll_src")
    spark.createDataFrame(vals, "v string").repartition(4).write.parquet(src)

    log_path = str(tmp_path / "hll_cells_log")
    os.makedirs(log_path)

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        SK.hll_cells(df, "v", p=9).write.mode("append").parquet(log_path)

    q = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    merged = {
        (r["j"], r["r"])
        for r in spark.read.parquet(log_path)
        .groupBy("j")
        .agg(F.max("r").alias("r"))
        .collect()
    }
    batch = {
        (r["j"], r["r"])
        for r in SK.hll_cells(
            spark.createDataFrame(vals, "v string"), "v", p=9
        ).collect()
    }
    assert merged == batch and len(batch) > 0


# ------------------------------------------------------------- Bloom

def _py_bloom_positions(v, m, k):
    h = hashlib.md5(str(v).encode()).hexdigest()
    h1, h2 = int(h[:15], 16), int(h[15:30], 16)
    return {(h1 + i * h2) % m for i in range(k)}


def test_bloom_no_false_negatives_and_python_reference(spark):
    members = [f"gram-{i}" for i in range(400)]
    df = spark.createDataFrame([(v,) for v in members], "v string")
    cells = SK.bloom_cells(df, "v", m_bits=4096, k=4)
    got = {r["pos"] for r in cells.collect()}
    want = set()
    for v in members:
        want |= _py_bloom_positions(v, 4096, 4)
    assert got == want
    # every member probes true — the no-false-negative guarantee
    probed = SK.bloom_probe(cells, df, "v", m_bits=4096, k=4)
    assert probed.filter("NOT bloom_hit").count() == 0
    assert probed.count() == len(members)


def test_bloom_probe_fp_rate_and_determinism(spark):
    """Non-members probe mostly false; the FP set is a deterministic
    function of the hashes — two runs agree exactly, and the observed
    rate is within 3x of the analytic (1-e^{-kn/m})^k."""
    import math

    members = [f"in-{i}" for i in range(500)]
    others = [f"out-{i}" for i in range(2000)]
    cells = SK.bloom_cells(
        spark.createDataFrame([(v,) for v in members], "v string"),
        "v", m_bits=4096, k=4,
    )
    odf = spark.createDataFrame([(v,) for v in others], "v string")
    fp1 = {r["v"] for r in SK.bloom_probe(cells, odf, "v", 4096, 4)
           .filter("bloom_hit").collect()}
    fp2 = {r["v"] for r in SK.bloom_probe(cells, odf, "v", 4096, 4)
           .filter("bloom_hit").collect()}
    assert fp1 == fp2
    p = (1 - math.exp(-4 * 500 / 4096)) ** 4
    assert len(fp1) <= 3 * p * len(others) + 5
    # python cross-check: exactly the values whose every position is set
    setbits = {r["pos"] for r in cells.collect()}
    want = {v for v in others if _py_bloom_positions(v, 4096, 4) <= setbits}
    assert fp1 == want


def test_bloom_merge_is_union_distinct(spark):
    a = SK.bloom_cells(
        spark.createDataFrame([(f"a{i}",) for i in range(100)], "v string"),
        "v", m_bits=2048, k=3,
    )
    b = SK.bloom_cells(
        spark.createDataFrame([(f"b{i}",) for i in range(100)], "v string"),
        "v", m_bits=2048, k=3,
    )
    u = SK.bloom_cells(
        spark.createDataFrame(
            [(f"a{i}",) for i in range(100)] + [(f"b{i}",) for i in range(100)],
            "v string",
        ),
        "v", m_bits=2048, k=3,
    )
    merged = {r["pos"] for r in a.unionByName(b).distinct().collect()}
    assert merged == {r["pos"] for r in u.collect()}


def test_bloom_probe_duplicate_rows_and_nulls(spark):
    """Duplicate probe rows each keep their flag (multiplicity
    preserved); NULL values probe false."""
    members = spark.createDataFrame([("x",)], "v string")
    cells = SK.bloom_cells(members, "v", m_bits=512, k=4)
    probe = spark.createDataFrame(
        [("x",), ("x",), (None,)], "v string"
    )
    rows = SK.bloom_probe(cells, probe, "v", m_bits=512, k=4).collect()
    from collections import Counter

    assert Counter((r["v"], r["bloom_hit"]) for r in rows) == Counter(
        [("x", True), ("x", True), (None, False)]
    )


def test_streaming_bloom_cells_union_equals_batch(spark, tmp_path):
    """Streamed Bloom: each micro-batch's positions APPEND to a
    persisted cell log; read-side union-distinct must equal the
    one-shot filter over the full corpus, and a probe against the
    merged log keeps no-false-negatives (the OR-merge twin of the
    streaming HLL parity test)."""
    import os

    vals = [(f"g-{i % 250}",) for i in range(900)]
    src = str(tmp_path / "bloom_src")
    spark.createDataFrame(vals, "v string").repartition(3).write.parquet(src)

    log_path = str(tmp_path / "bloom_cells_log")
    os.makedirs(log_path)

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        SK.bloom_cells(df, "v", m_bits=4096, k=4).write.mode("append").parquet(
            log_path
        )

    q = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_bloom"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    merged_cells = spark.read.parquet(log_path).distinct()
    batch_cells = SK.bloom_cells(
        spark.createDataFrame(vals, "v string"), "v", m_bits=4096, k=4
    )
    assert {r["pos"] for r in merged_cells.collect()} == {
        r["pos"] for r in batch_cells.collect()
    }
    probe = spark.createDataFrame(sorted(set(vals)), "v string")
    hits = SK.bloom_probe(merged_cells, probe, "v", m_bits=4096, k=4)
    assert hits.filter("NOT bloom_hit").count() == 0


def test_bloom_probe_null_in_other_columns_and_reserved_names(spark):
    """Review r07: a NULL in a NON-value probe column must not turn a
    true member into a false negative (the earlier join-back used
    null-unsafe equality); internals-colliding column names raise."""
    cells = SK.bloom_cells(
        spark.createDataFrame([("x",)], "v string"), "v", m_bits=512, k=4
    )
    probe = spark.createDataFrame(
        [(None, "x"), (7, "x"), (None, "nope")], "doc_id int, v string"
    )
    rows = SK.bloom_probe(cells, probe, "v", m_bits=512, k=4).collect()
    got = {(r["doc_id"], r["v"], r["bloom_hit"]) for r in rows}
    assert (None, "x", True) in got and (7, "x", True) in got
    assert not [r for r in rows if r["v"] == "nope" and r["bloom_hit"]]
    with pytest.raises(ValueError, match="reserves"):
        SK.bloom_probe(
            cells,
            probe.withColumnRenamed("doc_id", "_bp0"),
            "v", m_bits=512, k=4,
        )


def _py_kmv(values, k):
    import hashlib

    hs = sorted(
        {int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) for v in values}
    )
    return hs[:k]


def test_kmv_cells_match_python_reference(spark):
    vals = [f"v{i}" for i in range(300)] + ["v7", "v7"]  # dups collapse
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    got = sorted(r["h"] for r in SK.kmv_cells(df, "x", k=64).collect())
    assert got == _py_kmv(set(vals), 64)


def test_kmv_merge_equals_cells_of_union_and_is_idempotent(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(200)], "x string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(100, 250)] + [(f"b{i}",) for i in range(80)],
        "x string",
    )
    k = 64
    ca, cb = SK.kmv_cells(a, "x", k=k), SK.kmv_cells(b, "x", k=k)
    merged = sorted(r["h"] for r in SK.kmv_merge(ca, cb, k=k).collect())
    union = sorted(
        r["h"] for r in SK.kmv_cells(a.unionByName(b), "x", k=k).collect()
    )
    assert merged == union
    again = sorted(
        r["h"] for r in SK.kmv_merge(SK.kmv_merge(ca, cb, k=k), cb, k=k).collect()
    )
    assert again == union  # idempotent under re-merge


@pytest.mark.parametrize("n", [100, 2000])
def test_kmv_estimate_tracks_exact_count(spark, n):
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "x string")
    k = 128
    cells = SK.kmv_cells(df, "x", k=k)
    (row,) = SK.kmv_estimate(cells, k=k).collect()
    if n <= k:
        assert row["estimate"] == float(n)  # under-full sketch is exact
    else:
        assert abs(row["estimate"] - n) <= 0.3 * n  # ~3 sigma at k=128


def test_kmv_k_validation(spark):
    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(ValueError, match="k must be"):
        SK.kmv_cells(df, "v", k=0)


def test_kmv_intersection_report_bound_holds_on_testdata(spark, sf_dir):
    """The within_bound column is engine-identical by construction
    (same integers, same divisions) — this asserts it is also TRUE at
    test scale, so an accuracy regression cannot hide behind
    cross-engine agreement."""
    from openetl_spark import catalog

    rows = catalog.QUERIES["kmv_intersection_report"](spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) priority pairs
    assert all(r["within_bound"] for r in rows), [
        (r["pa"], r["pb"], r["n_exact"], r["estimate"]) for r in rows
    ]


def test_streaming_kmv_cells_merge_equals_batch(spark, tmp_path):
    """Streamed KMV: per-batch cells APPEND to a persisted cell log;
    the read-side merge (union-distinct -> k smallest) must equal the
    one-shot batch cells over the full corpus — the same
    mergeable-relation contract as the HLL/CMS/Bloom streaming twins,
    closing the story for the fifth sketch family."""
    import os

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    k = 64
    vals = [(f"cust-{i % 500}",) for i in range(1500)]
    src = str(tmp_path / "kmv_src")
    spark.createDataFrame(vals, "v string").repartition(4).write.parquet(src)

    log_path = str(tmp_path / "kmv_cells_log")
    os.makedirs(log_path)

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        SK.kmv_cells(df, "v", k=k).write.mode("append").parquet(log_path)

    q = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_kmv"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    w = Window.partitionBy(F.lit(0)).orderBy("h")
    merged = sorted(
        r["h"]
        for r in spark.read.parquet(log_path)
        .select("h")
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .collect()
    )
    batch = sorted(
        r["h"]
        for r in SK.kmv_cells(
            spark.createDataFrame(vals, "v string"), "v", k=k
        ).collect()
    )
    assert merged == batch and len(batch) == k


def test_kmv_reserved_key_names_raise(spark):
    df = spark.createDataFrame([("x", "g1")], "h string, g string")
    with pytest.raises(ValueError, match="reserves"):
        SK.kmv_cells(df.withColumnRenamed("g", "x"), "x", k=4, keys=["h"])


# ---------------------------------------------------------------------
# AMS tug-of-war F2 sketch (r09)
# ---------------------------------------------------------------------


def test_ams_cells_are_exact_sign_sums(spark):
    """Bit-exactness: each counter equals the pure-Python sum of
    md5-derived signs over the multiset (the FULL-oracle premise)."""
    rows = [(v,) for v in [1, 1, 1, 2, 2, 3]]
    df = spark.createDataFrame(rows, "v int")
    got = {r["i"]: r["c"] for r in SK.ams_cells(df, "v", k=8, seed=7).collect()}

    def sign(i, v):
        h = int(hashlib.md5(f"7:{i}:{v}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 1 else -1

    want = {
        i: sum(sign(i, v) * f for v, f in [(1, 3), (2, 2), (3, 1)])
        for i in range(8)
    }
    assert got == want


def test_ams_merge_law_and_f2_accuracy(spark):
    """Counters of a union are elementwise sums (linearity), and the
    median-of-group-sums estimate lands within the Chebyshev band on a
    skewed frequency vector."""
    rows = [(v,) for v in range(1, 41) for _ in range(v)]
    df = spark.createDataFrame(rows, "v int")
    full = {r["i"]: r["c"] for r in SK.ams_cells(df, "v", k=63).collect()}
    ca = SK.ams_cells(df.filter("v <= 20"), "v", k=63)
    cb = SK.ams_cells(df.filter("v > 20"), "v", k=63)
    merged = {r["i"]: r["c"] for r in SK.ams_merge(ca, cb).collect()}
    assert merged == full
    exact = sum(v * v for v in range(1, 41))
    est = SK.ams_f2_estimate(SK.ams_cells(df, "v", k=63)).first()["f2_estimate"]
    assert exact / 3 <= est <= 3 * exact, (exact, est)


def test_ams_cells_from_freq_matches_ams_cells(spark):
    """r12 sharing hook: deriving the sketch from a precomputed
    (value, _f) frequency relation must be bit-identical to ams_cells
    over the raw multiset — the contract q_ams_join_size_report relies
    on to compute each side's frequency vector once."""
    from pyspark.sql import functions as F

    rows = [(v,) for v in [1, 1, 1, 2, 2, 3, None]]
    df = spark.createDataFrame(rows, "v int")
    direct = {r["i"]: r["c"] for r in SK.ams_cells(df, "v", k=8, seed=7).collect()}
    freq = (
        df.filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count("*").cast("bigint").alias("_f"))
    )
    via_freq = {
        r["i"]: r["c"]
        for r in SK.ams_cells_from_freq(freq, "v", k=8, seed=7).collect()
    }
    assert via_freq == direct


def test_ams_validation(spark):
    with pytest.raises(ValueError, match="k must"):
        SK.ams_cells(None, "v", k=0)
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="odd"):
        SK.ams_f2_estimate(SK.ams_cells(df, "v", k=8), groups=4)


def test_streaming_ams_cells_merge_equals_batch(spark, tmp_path):
    """Streamed AMS: per-batch cells APPEND to a persisted cell log;
    the read-side sum-merge must equal the one-shot batch cells — the
    mergeable-relation contract (HLL/Bloom/KMV cell-log discipline,
    sum-merge instead of max/union)."""
    import os

    import pyspark.sql.functions as F

    vals = [(f"cust-{i % 40}",) for i in range(1200)]
    src = str(tmp_path / "ams_src")
    spark.createDataFrame(vals, "v string").repartition(4).write.parquet(src)
    log_path = str(tmp_path / "ams_cells_log")
    os.makedirs(log_path)

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        SK.ams_cells(df, "v", k=31).write.mode("append").parquet(log_path)

    q = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_ams"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    streamed = {
        r["i"]: r["c"]
        for r in spark.read.parquet(log_path)
        .groupBy("i")
        .agg(F.sum("c").cast("bigint").alias("c"))
        .collect()
    }
    batch = {
        r["i"]: r["c"]
        for r in SK.ams_cells(spark.read.parquet(src), "v", k=31).collect()
    }
    assert streamed == batch and len(batch) == 31


# ---------------------------------------------------------------------
# q-digest (r09): deterministic mergeable quantile summary
# ---------------------------------------------------------------------


def _py_qdigest(values, L, sigma):
    """Pure-Python reference: leaf counts then the bottom-up fold
    sweep (fold children into parent when s + c(parent) < n div
    sigma)."""
    from collections import Counter

    cells = Counter()
    for x in values:
        cells[(1 << L) + x] += 1
    n = len(values)
    t = n // sigma
    for lvl in range(L, 0, -1):
        lo, hi = 1 << lvl, 1 << (lvl + 1)
        parents = {}
        for v in [v for v in cells if lo <= v < hi]:
            parents.setdefault(v // 2, 0)
            parents[v // 2] += cells[v]
        for p, s in parents.items():
            if s + cells.get(p, 0) < t:
                cells[p] = cells.get(p, 0) + s
                for chv in (2 * p, 2 * p + 1):
                    cells.pop(chv, None)
    return dict(cells)


@pytest.mark.parametrize("seed", [61, 62])
def test_qdigest_cells_match_python_reference(spark, seed):
    """Bit-exactness of the whole cell relation vs the sequential
    reference — the FULL-oracle premise, and the determinism claim
    (the sweep is a pure function of the frequency multiset)."""
    import random

    rng = random.Random(seed)
    vals = [rng.randint(0, 63) for _ in range(800)] + [5] * 100
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    got = {r["v"]: r["c"] for r in SK.qdigest_cells(df, "x", 6, 8).collect()}
    assert got == _py_qdigest(vals, 6, 8)


def test_qdigest_rank_bounds_hold_and_count_preserved(spark):
    import random

    rng = random.Random(9)
    vals = [rng.randint(0, 255) for _ in range(2500)] + [7] * 400
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    cells = SK.qdigest_cells(df, "x", 8, 16)
    rows = cells.collect()
    assert sum(r["c"] for r in rows) == len(vals)  # mass is never lost
    probes = spark.createDataFrame([(q,) for q in [1, 10, 128, 250]], "q int")
    for r in SK.qdigest_rank_bounds(cells, 8, probes).collect():
        true = sum(1 for v in vals if v < r["q"])
        assert r["rank_lo"] <= true <= r["rank_hi"], (r, true)
        assert r["rank_hi"] - r["rank_lo"] <= 8 * (len(vals) // 16)


def test_qdigest_merge_preserves_mass_and_bounds(spark):
    import random

    rng = random.Random(11)
    vals = [(i, rng.randint(0, 127)) for i in range(1500)]
    df = spark.createDataFrame(vals, "id int, x int")
    ca = SK.qdigest_cells(df.filter("id % 2 = 0"), "x", 7, 16)
    cb = SK.qdigest_cells(df.filter("id % 2 = 1"), "x", 7, 16)
    m = SK.qdigest_merge(ca, cb, 7, 16)
    assert sum(r["c"] for r in m.collect()) == len(vals)
    probes = spark.createDataFrame([(q,) for q in [30, 64, 100]], "q int")
    allv = [x for _, x in vals]
    for r in SK.qdigest_rank_bounds(m, 7, probes).collect():
        true = sum(1 for v in allv if v < r["q"])
        assert r["rank_lo"] <= true <= r["rank_hi"], (r, true)


def test_qdigest_driver_fold_equals_distributed(spark, monkeypatch):
    """r12 session 3: the driver-side compress fold (universe-bounded
    collect, Python-int arithmetic) must be bit-identical to the
    distributed level loop it replaced for log_universe ≤ the collect
    bound — both paths stay pinned by forcing the distributed loop via
    the threshold."""
    import random

    rng = random.Random(17)
    vals = [(i, rng.randint(0, 127)) for i in range(1200)]
    df = spark.createDataFrame(vals, "id int, x int")
    fast = {r["v"]: r["c"] for r in SK.qdigest_cells(df, "x", 7, 16).collect()}
    ca_f = SK.qdigest_cells(df.filter("id % 2 = 0"), "x", 7, 16)
    cb_f = SK.qdigest_cells(df.filter("id % 2 = 1"), "x", 7, 16)
    merged_fast = {
        r["v"]: r["c"] for r in SK.qdigest_merge(ca_f, cb_f, 7, 16).collect()
    }
    monkeypatch.setattr(SK, "_QDIGEST_DRIVER_FOLD_MAX_L", -1)
    slow = {r["v"]: r["c"] for r in SK.qdigest_cells(df, "x", 7, 16).collect()}
    merged_slow = {
        r["v"]: r["c"]
        for r in SK.qdigest_merge(ca_f, cb_f, 7, 16).collect()
    }
    assert fast == slow
    assert merged_fast == merged_slow


def test_qdigest_validation(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError, match="log_universe"):
        SK.qdigest_cells(df, "x", 0)
    with pytest.raises(ValueError, match="sigma"):
        SK.qdigest_cells(df, "x", 8, 0)
    with pytest.raises(Exception, match="outside"):
        SK.qdigest_cells(
            spark.createDataFrame([(300,)], "x int"), "x", 8, 16
        ).collect()


# ---------------------------------------------------------- hyperball

def _hb_python_balls(pairs, hops):
    """Independent reference: exact balls by BFS, then per-ball HLL
    registers from the same 60-bit md5 arithmetic."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    balls = {v: {v} for v in nodes}
    out = {0: {v: set(b) for v, b in balls.items()}}
    for t in range(1, hops + 1):
        balls = {
            v: set.union(balls[v], *(balls[u] for u in adj[v]))
            for v in nodes
        }
        out[t] = {v: set(b) for v, b in balls.items()}
    return out


def _hb_python_cells(members, p):
    w = 60 - p
    cells = {}
    for v in members:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        j, suf = h >> w, h & ((1 << w) - 1)
        r = (w + 1) if suf == 0 else (w + 1) - suf.bit_length()
        cells[j] = max(cells.get(j, 0), r)
    return cells


def test_hyperball_cells_equal_hll_of_exact_balls(spark):
    # The defining property: the hop-t cells of node v ARE the HLL
    # cells of the exact ball B_t(v) — max-merge along edges commutes
    # with set union under the register max.
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (7, 8)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = SK.hyperball(df, hops=3, p=6).collect()
    ref = _hb_python_balls(pairs, 3)
    want = {
        (t, v, j, r)
        for t, by_node in ref.items()
        for v, members in by_node.items()
        for j, r in _hb_python_cells(members, 6).items()
    }
    assert {(r["t"], r["node"], r["j"], r["r"]) for r in got} == want


def test_hyperball_saturates_to_component_sketch(spark):
    # Once t reaches the component diameter every node's sketch equals
    # the whole component's HLL — and stays there (max idempotence).
    pairs = [(0, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    cells = SK.hyperball(df, hops=4, p=6)
    comp = _hb_python_cells({0, 1, 2, 3}, 6)
    for t in (3, 4):
        rows = cells.filter(f"t = {t}").collect()
        by_node = {}
        for r in rows:
            by_node.setdefault(r["node"], {})[r["j"]] = r["r"]
        assert by_node == {v: comp for v in range(4)}


def test_hyperball_hops_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="hops"):
        SK.hyperball(df, hops=0)


# ------------------------------------------------- AMS inner product

def _ams_py_cells(values, k, seed):
    import hashlib

    cells = [0] * k
    for v in values:
        for i in range(k):
            h = int(
                hashlib.md5(f"{seed}:{i}:{v}".encode()).hexdigest()[:15], 16
            )
            cells[i] += 1 if h % 2 == 1 else -1
    return cells


def test_ams_inner_product_matches_python(spark):
    import random

    random.seed(61)
    a_vals = [random.randint(0, 30) for _ in range(300)]
    b_vals = [random.randint(0, 30) for _ in range(200)]
    da = spark.createDataFrame([(v,) for v in a_vals], "x int")
    db = spark.createDataFrame([(v,) for v in b_vals], "x int")
    ca = SK.ams_cells(da, "x", k=63, seed=42)
    cb = SK.ams_cells(db, "x", k=63, seed=42)
    got = SK.ams_inner_product_estimate(ca, cb, groups=9).first()["j_estimate"]
    pa = _ams_py_cells(a_vals, 63, 42)
    pb = _ams_py_cells(b_vals, 63, 42)
    sums = sorted(
        sum(pa[i] * pb[i] for i in range(g * 7, (g + 1) * 7)) for g in range(9)
    )
    assert got == sums[4] / 7


def test_ams_inner_product_estimates_join_size(spark):
    # Deterministic accuracy on a fixed instance: the estimate must
    # land within the AGMS 3-sigma bound of the true inner product.
    import random

    random.seed(67)
    a_vals = [random.randint(0, 40) for _ in range(500)]
    b_vals = [random.randint(0, 40) for _ in range(400)]
    from collections import Counter

    fa, fb = Counter(a_vals), Counter(b_vals)
    true_j = sum(fa[v] * fb[v] for v in fa)
    f2a = sum(c * c for c in fa.values())
    f2b = sum(c * c for c in fb.values())
    da = spark.createDataFrame([(v,) for v in a_vals], "x int")
    db = spark.createDataFrame([(v,) for v in b_vals], "x int")
    est = SK.ams_inner_product_estimate(
        SK.ams_cells(da, "x", k=63, seed=42),
        SK.ams_cells(db, "x", k=63, seed=42),
        groups=9,
    ).first()["j_estimate"]
    assert abs(est - true_j) <= 3 * (2 * f2a * f2b / 7) ** 0.5


def test_ams_inner_product_self_is_f2_estimate(spark):
    # A against itself reduces to the F2 path: same cells, same
    # median-of-group-sums arithmetic.
    d = spark.createDataFrame([(v % 7,) for v in range(100)], "x int")
    c = SK.ams_cells(d, "x", k=63, seed=42)
    ip = SK.ams_inner_product_estimate(c, c, groups=9).first()["j_estimate"]
    f2 = SK.ams_f2_estimate(c, groups=9).first()["f2_estimate"]
    assert ip == f2


def test_ams_inner_product_validation(spark):
    d = spark.createDataFrame([(1,)], "x int")
    c = SK.ams_cells(d, "x", k=9)
    with pytest.raises(ValueError, match="groups"):
        SK.ams_inner_product_estimate(c, c, groups=4)


def test_ams_undersized_sketch_raises_not_null(spark):
    # ADVICE r09: a cell count below ``groups`` used to zero the
    # group size, drop every row through the tail filter, and emit a
    # silent NULL/absent estimate — both estimators now raise at
    # execution time instead.
    from py4j.protocol import Py4JJavaError

    d = spark.createDataFrame([(i,) for i in range(20)], "x int")
    small = SK.ams_cells(d, "x", k=5)  # 5 cells < groups=9
    with pytest.raises(Exception, match="groups=9"):
        SK.ams_f2_estimate(small, groups=9).collect()
    with pytest.raises(Exception, match="groups=9"):
        SK.ams_inner_product_estimate(small, small, groups=9).collect()
    # And the healthy path still returns one estimate row.
    ok = SK.ams_cells(d, "x", k=9)
    assert SK.ams_f2_estimate(ok, groups=9).count() == 1
