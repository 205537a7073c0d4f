"""Scale-helper tests: salted joins equal plain joins; observe()
metrics flow; bucketed writes enable shuffle-free joins."""

from pyspark.sql import functions as F

from openetl_spark import catalog
from openetl_spark.operators.skew import salted_join, with_salt


def test_salted_join_equals_plain(spark, sf_dir):
    o = catalog.load(spark, sf_dir, "orders")
    c = catalog.load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(c, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(o, c, "o_custkey", salt=8).groupBy("c_mktsegment").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark):
    fact = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c"), (9, "z")], "k long, v string")
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")
    out = salted_join(fact, dim, "k", salt=4, how="left").collect()
    by_v = {r["v"]: r["name"] for r in out}
    assert by_v == {"a": "one", "b": "one", "c": "two", "z": None}
    assert len(out) == 4  # no duplication from salting


def test_salt_distribution_spreads_hot_key(spark):
    hot = spark.createDataFrame([(1, i) for i in range(1000)], "k long, i long")
    salted = with_salt(hot, 16)
    buckets = salted.groupBy("_salt").count().collect()
    # a 1000-row hot key must spread across many salt buckets
    assert len(buckets) >= 12
    assert max(r["count"] for r in buckets) < 1000 * 0.25


def test_observe_metrics_capture(spark, sf_dir):
    from openetl_spark.pipeline import Orchestrator

    orch = Orchestrator(spark=spark)
    df = catalog.load(spark, sf_dir, "orders")
    observed, obs = orch.observe(
        df, "m", F.count(F.lit(1)).alias("rows"), F.sum("o_totalprice").alias("total")
    )
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] == df.count()
    assert obs.get["total"] > 0


def test_bucketed_write_join_without_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both sides on the join key lets Catalyst plan a
    SortMergeJoin with NO Exchange on either side — the co-located
    join pattern for repeatedly-joined 100 TB tables."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    catalog.load(spark, sf_dir, "orders").write.bucketBy(8, "o_custkey").sortBy(
        "o_custkey"
    ).mode("overwrite").saveAsTable("b_orders")
    catalog.load(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    ).write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode("overwrite").saveAsTable(
        "b_customer"
    )
    # disable broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        import io, contextlib

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain()
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_ivf_partitioned_layout_prunes_files(spark, sf_dir, tmp_path):
    """VERDICT r01 #5: write embeddings partitioned by ivf_list, then
    prove ivf_knn's list filter becomes real partition pruning — the
    scan touches only the n_probe list directories and the plan carries
    the filter as a PartitionFilter, while results match the unpruned
    in-memory path exactly."""
    import io, contextlib

    from openetl_spark.operators import similarity as S

    emb = catalog.load(spark, sf_dir, "embeddings")
    cents = S.train_ivf_centroids(emb, n_lists=8, seed=7)
    out = str(tmp_path / "ivf")
    S.write_ivf_partitioned(emb, out, centroids=cents)

    on_disk = spark.read.parquet(out)
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    pruned = S.ivf_knn(on_disk, cents, q, k=10, n_probe=2)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "ivf_list" in plan.split("PartitionFilters", 1)[1][:200]

    # physical evidence: only files under the 2 probed list dirs are read
    touched = {
        r["f"] for r in
        on_disk.filter(F.col("ivf_list").isin(
            [int(p) for p in _probe_lists(cents, q, 2)]))
        .select(F.input_file_name().alias("f")).distinct().collect()
    }
    dirs = {f.split("ivf_list=")[1].split("/")[0] for f in touched}
    assert len(dirs) == 2
    all_files = {r["f"] for r in on_disk.select(F.input_file_name().alias("f")).distinct().collect()}
    assert len(touched) < len(all_files)  # strictly fewer files read

    # correctness: pruned disk path == in-memory assignment path
    mem = S.ivf_knn(S.with_ivf_assignment(emb, cents), cents, q, k=10, n_probe=2)
    assert [tuple(r) for r in pruned.collect()] == [tuple(r) for r in mem.collect()]


def test_catalog_ivf_knn_plan_prunes_and_matches_brute_force(spark, sf_dir):
    """VERDICT r02 #3: the CATALOG ivf_knn path (not just the helper)
    must show partition pruning — train-once persisted layout, broadcast
    probe join driving dynamic partition pruning, no driver .first() —
    and its top-k must match lazy brute force on this corpus."""
    from openetl_spark.operators import similarity as S

    df = catalog.QUERIES["ivf_knn"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    tail = plan.split("PartitionFilters", 1)[1][:300]
    assert "dynamicpruning" in tail and "ivf_list" in tail, tail

    e = catalog.load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0)
    bf = S.brute_force_knn_lazy(e.filter(F.col("vec_id") != 0), q, k=10)
    got = [tuple(r) for r in df.collect()]
    want = [tuple(r) for r in bf.collect()]
    recall = len(set(got) & set(want)) / len(want)
    assert recall >= 0.9, f"IVF recall {recall}: {got} vs {want}"


def _probe_lists(cents, q, n_probe):
    import numpy as np

    q = np.asarray(q, dtype=np.float64)
    d = ((np.asarray(cents) - q[None, :]) ** 2).sum(axis=1)
    return d.argsort()[:n_probe]


def test_approx_sketches_error_bounds(spark, sf_dir):
    """approx_count_distinct and percentile_approx are rows-only in the
    oracle gate (approximate by design); here their error bounds are
    pinned against exact answers."""
    o = catalog.load(spark, sf_dir, "orders")
    row = o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50_exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.15 * row["exact"])
    # percentile_approx with high accuracy lands within 1% of exact
    assert abs(row["p50_approx"] - row["p50_exact"]) <= 0.01 * row["p50_exact"] + 1


def test_connector_pushdown_reaches_parquet_scan(spark, sf_dir):
    """SCALE.md's core claim, pinned: a compiled connector's filter and
    projection reach the parquet scan as PushedFilters + pruned
    ReadSchema, and the plan runs inside WholeStageCodegen."""
    from openetl_spark.plans.compiler import compile_connector
    from openetl_spark.spec import Connector, Filter

    c = Connector(
        adapter_id="parquet",
        endpoint_id=f"{sf_dir}/lineitem.parquet",
        fields=["l_orderkey", "l_extendedprice"],
        filters=[Filter("l_quantity", ">", 30)],
    )
    df = compile_connector(spark, c)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
    assert "l_quantity" in pushed and "GreaterThan" in pushed, pushed
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    # pruned to the union of projected + filtered columns only
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_comment" not in read and "l_shipdate" not in read, read
    # '*' prefixes in formatted mode = operator runs inside
    # whole-stage-codegen; the filter and project must both be starred
    assert "* Filter" in plan and "* Project" in plan, plan.splitlines()[:8]


def test_broadcast_if_small_guards_fact_sized_dims(spark, sf_dir):
    """ROADMAP #4: the guard hints genuinely-small dims (plan shows
    BroadcastHashJoin) but refuses to force a fact-sized side into
    executor memory (falls back to an unhinted plan)."""
    import io, contextlib

    from openetl_spark.operators.skew import broadcast_if_small

    nation = catalog.load(spark, sf_dir, "nation")
    orders = catalog.load(spark, sf_dir, "orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def plan_of(dim):
            j = orders.join(dim, orders["o_custkey"] % 25 == dim["n_nationkey"])
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                j.explain()
            return buf.getvalue()

        assert "BroadcastHashJoin" in plan_of(broadcast_if_small(nation))
        # a 1-byte budget rejects everything → no forced broadcast
        assert "BroadcastHashJoin" not in plan_of(broadcast_if_small(nation, max_bytes=1))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_vocabulary_broadcasts_are_conditional(spark, monkeypatch, tmp_path):
    """VERDICT r11 #2: association_rules' item-support relation and
    skipgram_negative_pairs' candidate vocabulary both scale with the
    corpus (distinct items / walked nodes), so their broadcast hints
    must go through broadcast_if_small, never an unconditional
    F.broadcast. Pin both directions: with the real guard the small
    test relations ARE hinted (BroadcastHashJoin with the session
    threshold disabled — only a hint can produce it), and with the
    guard's budget shrunk to 1 byte every vocabulary-sized side falls
    back to an unhinted shuffle join while the genuinely-1-row totals
    keep their unconditional broadcast."""
    import io, contextlib

    import openetl_spark.operators.skew as skew
    from openetl_spark.operators import analytics as A
    from openetl_spark.operators import graph as G

    # parquet-backed inputs: createDataFrame relations carry no size
    # stats, so the guard would (correctly) refuse them outright —
    # the positive arm needs Catalyst's real file-size estimate
    spark.createDataFrame(
        [(b, (b * 3 + i) % 7) for b in range(20) for i in range(3)],
        "l_orderkey long, l_partkey long",
    ).write.parquet(str(tmp_path / "baskets"))
    baskets = spark.read.parquet(str(tmp_path / "baskets"))
    spark.createDataFrame(
        [(w, s, (w * 7 + s * 3) % 9) for w in range(6) for s in range(5)],
        "walker long, step int, node long",
    ).write.parquet(str(tmp_path / "walks"))
    walks = spark.read.parquet(str(tmp_path / "walks"))

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        return buf.getvalue()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # real guard, tiny relations: the hint fires
        assert "BroadcastHashJoin" in plan_of(
            A.association_rules(baskets, min_support=1)
        )
        assert "BroadcastHashJoin" in plan_of(
            G.skipgram_negative_pairs(walks, window=2, k=2, n_buckets=4)
        )

        # 1-byte budget = the "vocabulary too big" arm: no forced
        # hash broadcast anywhere; the 1-row totals stay broadcast
        # (nested-loop cross join)
        real = skew.broadcast_if_small
        monkeypatch.setattr(
            skew, "broadcast_if_small", lambda df, **kw: real(df, max_bytes=1)
        )
        rules_plan = plan_of(A.association_rules(baskets, min_support=1))
        assert "BroadcastHashJoin" not in rules_plan, rules_plan
        assert "BroadcastNestedLoopJoin" in rules_plan, rules_plan
        neg_plan = plan_of(
            G.skipgram_negative_pairs(walks, window=2, k=2, n_buckets=4)
        )
        assert "BroadcastHashJoin" not in neg_plan, neg_plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_new_tpch_shapes_plan_evidence(spark, sf_dir):
    """r05 TPC-H additions, plan-pinned. q19: Catalyst derives the
    per-relation projections of the OR-of-ANDs predicate and pushes
    them to BOTH scans (quantity bands -> lineitem, brand/size bands ->
    part), and the join is broadcast. q8: every dimension of the
    7-relation join arrives via BroadcastExchange and the order-date
    filter reaches the orders scan."""
    import re

    def scans(df):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        pushed = {
            m.group(1).rsplit("/", 1)[-1]: m.group(2)
            for m in re.finditer(
                r"Location: InMemoryFileIndex \[file:([^\]]+)\].*?"
                r"PushedFilters: (\[[^\]]*\])",
                plan,
                re.S,
            )
        }
        return plan, pushed

    plan19, pushed19 = scans(catalog.QUERIES["q19_discounted_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan19
    li = pushed19["lineitem.parquet"]
    assert "Or(" in li and "l_quantity" in li, li
    pt = pushed19["part.parquet"]
    assert "Or(" in pt and "p_brand" in pt and "p_size" in pt, pt

    plan8, pushed8 = scans(catalog.QUERIES["q8_market_share"](spark, sf_dir))
    assert plan8.count("BroadcastExchange") >= 5, plan8.count("BroadcastExchange")
    assert "o_orderdate" in pushed8["orders.parquet"], pushed8["orders.parquet"]
    assert "EqualTo(p_type,ECONOMY)" in pushed8["part.parquet"], pushed8["part.parquet"]


def test_histogram_quantiles_error_bounded_by_bin_width(spark, sf_dir):
    """The fixed-width-histogram percentile estimate must sit within
    one bin width below the exact percentile. The comparison point is
    the NON-interpolating rank statistic (order statistic at rank
    ceil(q*n)): Spark's percentile() interpolates between adjacent
    order statistics, and on a sparse tail the interpolated value can
    exceed the crossing bin's lower edge by more than one bin width —
    a false failure on valid data. The rank statistic lies inside the
    crossing bin by construction, so lower-edge <= x <= lower-edge + w
    holds as a true invariant."""
    import math

    est = catalog.QUERIES["histogram_quantiles"](spark, sf_dir).first()
    vals = sorted(
        r[0]
        for r in catalog.load(spark, sf_dir, "lineitem")
        .select("l_extendedprice")
        .collect()
    )
    n = len(vals)
    w = 525.0
    for q, key in ((0.50, "p50"), (0.90, "p90"), (0.99, "p99")):
        e = est[f"{key}_est"]
        x = float(vals[math.ceil(q * n) - 1])
        assert x - w <= e <= x, (key, e, x)


def test_no_catalog_plan_degenerates_to_cartesian_or_nested_loop(spark):
    """Global scale invariant over the ENTIRE catalog: no query's
    physical plan may contain a CartesianProduct, and any
    BroadcastNestedLoopJoin must be the benign scalar-broadcast form
    (a one-row aggregate joined via IdentityBroadcastMode — the
    threshold/total-attach pattern). This is the single check that
    would have caught a fact×fact cross product anywhere in the 103
    queries."""
    sf = "/root/testdata/sf0.001"
    violations = []
    for name, fn in catalog.QUERIES.items():
        plan = fn(spark, sf)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        if "CartesianProduct" in plan:
            violations.append((name, "CartesianProduct"))
        elif (
            "BroadcastNestedLoopJoin" in plan
            and "IdentityBroadcastMode" not in plan
        ):
            violations.append((name, "non-scalar BroadcastNestedLoopJoin"))
    assert not violations, violations


def test_event_analytics_plans_push_type_filters(spark, sf_dir):
    """funnel_conversion / retention_cohorts plan evidence: the
    event_type stage filters reach the parquet scan, and every join is
    a hash join on user_id (the benign scalar-broadcast cross for the
    funnel's three one-row counts is IdentityBroadcastMode, allowed by
    the global no-cartesian invariant)."""
    import re

    def plan_and_pushed(df):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        pushed = {
            m.group(1).rsplit("/", 1)[-1]: m.group(2)
            for m in re.finditer(
                r"Location: InMemoryFileIndex \[file:([^\]]+)\].*?"
                r"PushedFilters: (\[[^\]]*\])",
                plan,
                re.S,
            )
        }
        return plan, pushed

    plan, pushed = plan_and_pushed(catalog.QUERIES["funnel_conversion"](spark, sf_dir))
    ev = " ".join(v for k, v in pushed.items() if "events" in k)
    assert "event_type" in ev, pushed
    assert "CartesianProduct" not in plan

    plan_r, _ = plan_and_pushed(catalog.QUERIES["retention_cohorts"](spark, sf_dir))
    assert "CartesianProduct" not in plan_r
    assert "HashAggregate" in plan_r


def test_ivf_pq_layout_scan_reads_codes_only_and_prunes(spark, sf_dir):
    """The composed IVF×PQ catalog layout: the hot scan's ReadSchema
    carries pq_codes but NO embedding column (the float vectors never
    enter the layout), the probe join drives dynamic partition pruning
    on ivf_list, and the ADC result is dominated by the same vectors
    the flat PQ scan ranks highly (composition sanity)."""
    import io, contextlib

    from pyspark.sql import functions as F
    from openetl_spark.operators import similarity as S

    df = catalog.QUERIES["ivf_pq_knn"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    ivf_scan = next(
        s for s in plan.split("(")
        if "ivf_pq_cache" in s
    )
    assert "pq_codes" in ivf_scan and "embedding" not in ivf_scan
    assert "dynamicpruning" in plan or "PartitionFilters" in plan

    got = [r["vec_id"] for r in df.collect()]
    assert len(got) == 10
    # flat-PQ cross-check: the composed top-10 must be drawn from the
    # flat ADC ranking restricted to probed lists — verify overlap with
    # the unrestricted flat top-50 is high (probing 8/16 lists)
    books = catalog._pq_codebooks(spark, sf_dir)
    e = catalog.load(spark, sf_dir, "embeddings")
    corpus = S.with_pq_codes(e.filter(F.col("vec_id") != 0), books)
    qdf = e.filter(F.col("vec_id") == 0)
    flat50 = {r["vec_id"] for r in S.pq_adc_knn(corpus, qdf, books, k=50).collect()}
    assert len(set(got) & flat50) >= 7


def test_runtime_bloom_filter_prunes_shuffle_join_probe(spark, sf_dir):
    """Scale feature evidence: when a selective dim filter feeds a
    shuffle join (broadcast disabled, as with two fact-sized sides at
    100 TB), Spark's runtime bloom filter injects might_contain on the
    probe side — rows that cannot join are dropped at the fact scan
    before the shuffle. Thresholds are lowered to make the optimizer
    fire at testdata size; results must equal the unfiltered join."""
    from pyspark.sql import functions as F

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    expected = (
        l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
    ).collect()

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100000000b",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        assert "might_contain" in buf.getvalue()
        assert j.collect() == expected
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_r08_plans_broadcast_not_shuffle_corpus(spark, sf_dir):
    """r08 plan evidence: domain_mix_sample's rate lookup joins the
    corpus against a BROADCAST rates relation (the corpus itself never
    hash-shuffles for the join), and hot_keys_report plans its top-k
    as TakeOrdered, never a global Sort+Limit."""
    from openetl_spark import catalog

    plan = (
        catalog.QUERIES["domain_mix_sample"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    plan2 = (
        catalog.QUERIES["hot_keys_report"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan2


def test_semantic_dedup_matches_exact_within_clusters(spark, sf_dir):
    """semantic_dedup's cluster-scoped pairs must agree with the exact
    blocked all-pairs join RESTRICTED to same-cluster pairs — the
    operator's only approximation is the clustering boundary itself."""
    import numpy as np

    from openetl_spark import catalog
    from openetl_spark.operators import similarity as S

    cents, _ = catalog._ivf_layout(spark, sf_dir, n_lists=16, seed=42)
    e = catalog.load(spark, sf_dir, "embeddings")
    got = {
        (r["vec_id"], r["dup_of"])
        for r in S.semantic_dedup(e, cents, threshold=0.4).collect()
    }
    # exact pairs + assignment, driver-side reference
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    c = np.asarray(cents)
    assign = (np.square(c).sum(1)[None, :] - 2 * m @ c.T).argmin(1)
    nrm = np.linalg.norm(m, axis=1)
    sims = np.round((m @ m.T) / np.outer(nrm, nrm), 4)
    expected = {}
    n = len(ids)
    for i in range(n):
        for j in range(n):
            if (
                ids[i] < ids[j]
                and assign[i] == assign[j]
                and sims[i, j] >= 0.4
            ):
                cur = expected.get(ids[j])
                if cur is None or ids[i] < cur:
                    expected[ids[j]] = ids[i]
    assert got == set(expected.items())


def test_semantic_dedup_chunked_equals_unchunked(spark, sf_dir):
    """VERDICT r04 #5: the row-blocked in-cluster kernel must produce
    exactly the unchunked results (block_rows larger than any cluster
    degenerates to the original single-matmul path)."""
    from openetl_spark.operators import similarity as S

    cents, _ = catalog._ivf_layout(spark, sf_dir, n_lists=16, seed=42)
    e = catalog.load(spark, sf_dir, "embeddings")
    chunked = {
        tuple(r)
        for r in S.semantic_dedup(e, cents, threshold=0.4, block_rows=3).collect()
    }
    unchunked = {
        tuple(r)
        for r in S.semantic_dedup(e, cents, threshold=0.4, block_rows=1 << 30).collect()
    }
    assert chunked == unchunked and len(chunked) > 0


def test_semantic_dedup_hot_cluster_bounded_blocks(spark):
    """VERDICT r04 #8: hot-cluster posture. One cluster holds 50% of
    the corpus; with block_rows=2 the kernel walks that cluster in
    ~n/2 slabs whose similarity buffers are O(2·cluster) — and the
    output must still be the exact min-id-survivor answer."""
    import numpy as np

    from openetl_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    n_hot, n_cold = 100, 10
    # hot cluster: tight ball around e0 → everything dups of the min id
    hot = (np.array([10.0, 0.0, 0.0, 0.0]) + rng.normal(0, 1e-3, (n_hot, 4))).tolist()
    # cold vectors: fan across the e1–e2 plane at 10° steps — adjacent
    # cosine ≈ cos 10° ≈ 0.985 < the 0.99 threshold, so no cold dups
    # (cosine is magnitude-blind: same-axis scaling would all be dups)
    cold = []
    for i in range(n_cold):
        th = np.deg2rad(10.0 * i)
        cold.append([0.0, float(10.0 * np.cos(th)), float(10.0 * np.sin(th)), 0.0])
    rows = [(i, hot[i]) for i in range(n_hot)] + [
        (n_hot + i, cold[i]) for i in range(n_cold)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.array(
        [[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0], [0, 0, 0, 10.0]]
    )
    out = S.semantic_dedup(
        df, cents, threshold=0.99, block_rows=2
    ).collect()
    # every hot vector except the min id is a duplicate of vec 0
    assert {(r["vec_id"], r["dup_of"]) for r in out} == {
        (i, 0) for i in range(1, n_hot)
    }
    # cluster occupancy really is hot: 50% in one list
    from openetl_spark.operators.similarity import with_ivf_assignment

    occ = (
        with_ivf_assignment(df, cents, "embedding", "l")
        .groupBy("l").count().collect()
    )
    assert max(r["count"] for r in occ) == n_hot


def test_r05_plans_scale_evidence(spark, sf_dir):
    """Plan evidence for the r05 additions' scale claims:
    - temperature_sampling: the corpus join against the rates relation
      is BROADCAST (zero corpus shuffles — the mix_to_target posture);
    - winnow_overlap: no exchange carries the text column (fingerprints
      shuffle, documents don't);
    - gap_fill_interpolate: every Window is keyed (no global
      'No Partition Defined' pass over the grid);
    - langid_confusion: per-lang totals ride a broadcast join."""
    plan = (
        catalog.QUERIES["temperature_sampling"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # the only SortMergeJoin-eligible join is corpus×rates; it must not be one
    assert "SortMergeJoin" not in plan

    plan2 = (
        catalog.QUERIES["winnow_overlap"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # text feeds the scan-side projection only; exchanges carry hashes
    for line in plan2.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line

    plan3 = (
        catalog.QUERIES["gap_fill_interpolate"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan3
    # every window pass is keyed on the group column
    import re as _re

    for m in _re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan3):
        assert "event_type" in m.group(1)

    plan4 = (
        catalog.QUERIES["langid_confusion"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan4 and "SortMergeJoin" not in plan4


def test_pigeonhole_dense_budget_guard(spark):
    """r06 (VERDICT #2): budgets whose chunk width would drop below 8
    bits raise — the candidate equi-join degenerates toward all-pairs
    (k=16 → 3–4-bit chunks → random collision p≈0.9). allow_dense
    overrides for small-corpus diagnostics only."""
    import pytest

    from openetl_spark.operators import dedup as D

    # hamming(0, 0xFFF) = 12: outside k=7, inside k=16
    df = spark.createDataFrame([(1, 0), (2, 0xFFF)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="MinHash"):
        D.simhash_candidates(df, "doc_id", max_hamming=16).collect()
    with pytest.raises(ValueError, match="MinHash"):
        D.simhash_candidates(df, "doc_id", max_hamming=8).collect()
    # k=7 → eight 8-bit chunks: allowed; dense override also works
    assert D.simhash_candidates(df, "doc_id", max_hamming=7).count() == 0
    assert (
        D.simhash_candidates(df, "doc_id", max_hamming=16, allow_dense=True)
        .count() == 1
    )


def test_pigeonhole_candidate_stream_density(spark, sf_dir):
    """The enumerated candidate stream at the shipped k=6 budget stays
    near the analytic random-collision bound n²·p/2 (p = Σ 2^-width ≈
    1.3%), while the r05 k=16 configuration enumerates an order of
    magnitude more pairs on the SAME corpus — the measured fact behind
    the dense-budget guard. (A fixed-width fingerprint can't make the
    stream linear in n — buckets stay sparse only while n ≲ 2^width —
    so the assertion is against the density constant, not a growth
    exponent; SCALE.md §hamming-mining.)"""
    from openetl_spark.operators import dedup as D

    d = catalog.load(spark, sf_dir, "documents")
    sim = D.with_simhash(D.with_shingles(d, "text", 5), "doc_id", "shingles")
    n = d.count()

    def stream_count(k, **kw):
        return D.pigeonhole_candidate_stream(
            sim, "doc_id", max_hamming=k, **kw
        ).count()

    tight = stream_count(6)
    dense = stream_count(16, allow_dense=True)
    # analytic expectation for unrelated pairs at k=6 (one 10-bit +
    # six 9-bit chunks); true near-dup pairs add a corpus-dependent
    # but small constant on top
    p6 = 2.0 ** -10 + 6 * 2.0 ** -9
    bound = n * (n - 1) / 2 * p6
    assert tight < 3 * bound + 200
    assert dense > 10 * tight


def test_ngram_novelty_plan_shingles_once_per_arm(spark, sf_dir):
    """r06-s2: Catalyst's InferFiltersFromGenerate can silently double
    shingling cost by re-inlining the transform into the scan filter;
    ngram_novelty ships the explode_outer form. The shingle transform
    must appear at most twice in the executed plan (the totals scan
    projection + the explode arm), not four times."""
    from openetl_spark import catalog

    plan = (
        catalog.QUERIES["ngram_novelty"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("array_distinct(transform") <= 2, plan[:2000]


def test_spread_cpu_dense_pins_explicit_width(spark):
    """r08 (VERDICT r07 #6): the helper's repartition must land in the
    executed plan with the EXPLICIT width (AQE cannot coalesce a
    user-specified numPartitions), both keyed (hash) and unkeyed
    (round-robin), and a downstream groupBy on the same keys must
    REUSE the exchange instead of adding a second one."""
    import pyspark.sql.functions as F

    from openetl_spark.operators.skew import spread_cpu_dense

    par = spark.sparkContext.defaultParallelism
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    keyed = spread_cpu_dense(df, "k")
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert f"hashpartitioning(k#" in plan and f", {par})" in plan, plan[:1500]
    spread = spread_cpu_dense(df)
    plan2 = spread._jdf.queryExecution().executedPlan().toString()
    assert f"roundrobinpartitioning({par})" in plan2.lower().replace(
        " ", ""
    ) or f"RoundRobinPartitioning({par})" in plan2, plan2[:1500]
    # exchange reuse: groupBy on the spread keys adds NO second shuffle
    agg = spread_cpu_dense(df, "k").groupBy("k").count()
    plan3 = agg._jdf.queryExecution().executedPlan().toString()
    assert plan3.count("Exchange") == 1, plan3[:2000]
    # width override honored
    w = spread_cpu_dense(df, "k", width=5)
    assert ", 5)" in w._jdf.queryExecution().executedPlan().toString()


def test_r10_layout_consumers_read_artifacts_not_rederive(spark, sf_dir):
    """r10 layouts: the consumers' plans must SCAN the persisted
    artifacts instead of re-deriving them — graph_triangles reads the
    triangle parquet (no wedge self-join in its plan), harmonic
    centrality reads the landmark-hops parquet (no iterative BFS
    lineage), hyperball_cells reads the cell parquet. The artifacts'
    CONTENT is pinned by each oracle re-deriving from lineitem; this
    test pins the PLAN SHAPE (the offline-build/online-query
    contract)."""
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    tri = catalog.QUERIES["graph_triangles"](spark, sf_dir)
    plan = tri._jdf.queryExecution().explainString(fmt)
    assert "triangles_full" in plan, plan[:2000]
    # The wedge enumeration would appear as a self-join of the edge
    # relation: the layout-consuming count has exactly the one scan.
    assert plan.count("triangles_full") >= 1

    hc = catalog.QUERIES["harmonic_centrality"](spark, sf_dir)
    plan = hc._jdf.queryExecution().explainString(fmt)
    assert "landmark_hops_h6" in plan, plan[:2000]

    hb = catalog.QUERIES["hyperball_cells"](spark, sf_dir)
    plan = hb._jdf.queryExecution().explainString(fmt)
    assert "hyperball_h4_p6" in plan, plan[:2000]

    nv = catalog.QUERIES["node2vec_walks"](spark, sf_dir)
    plan = nv._jdf.queryExecution().explainString(fmt)
    assert "n2v_walks" in plan, plan[:2000]

    # r11 consumers of the same layouts
    bt = catalog.QUERIES["landmark_betweenness"](spark, sf_dir)
    plan = bt._jdf.queryExecution().explainString(fmt)
    assert "path_counts_full_h6" in plan, plan[:2000]

    tp = catalog.QUERIES["node2vec_training_pairs"](spark, sf_dir)
    plan = tp._jdf.queryExecution().explainString(fmt)
    assert "n2v_walks" in plan, plan[:2000]

    # r12 consumers of the FULL-graph σ layout (pair grain)
    br = catalog.QUERIES["betweenness_report"](spark, sf_dir)
    plan = br._jdf.queryExecution().explainString(fmt)
    assert "path_counts_full_h6" in plan, plan[:2000]

    st = catalog.QUERIES["landmark_stress"](spark, sf_dir)
    plan = st._jdf.queryExecution().explainString(fmt)
    assert "path_counts_full_h6" in plan, plan[:2000]


def test_lm_layout_consumers_read_artifact_not_retrain(spark, sf_dir):
    """r11 corpus-LM layout: ngram_lm_score must read ONLY the
    persisted score parquet (no documents scan, no bigram explode in
    its plan); perplexity_buckets and llm_data_pipeline must gate off
    the artifact (lm_scores in the plan). Content stays pinned by the
    oracles re-deriving LM counts and scores from raw text."""
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    lm = catalog.QUERIES["ngram_lm_score"](spark, sf_dir)
    plan = lm._jdf.queryExecution().explainString(fmt)
    assert "lm_scores" in plan, plan[:2000]
    assert "documents.parquet" not in plan, plan[:2000]

    pb = catalog.QUERIES["perplexity_buckets"](spark, sf_dir)
    plan = pb._jdf.queryExecution().explainString(fmt)
    assert "lm_scores" in plan, plan[:2000]
    # the tercile machinery runs over the artifact, not raw text
    assert "documents.parquet" not in plan, plan[:2000]

    pipe = catalog.QUERIES["llm_data_pipeline"](spark, sf_dir)
    plan = pipe._jdf.queryExecution().explainString(fmt)
    assert "lm_scores" in plan, plan[:2000]


def test_ivf_assignment_consumers_read_partitioned_corpus(spark, sf_dir):
    """r11 (VERDICT r10 #4): cluster_purity_report, cluster_profile,
    and semantic_dedup read the IVF assignment off the partitioned
    corpus layout (ivf_list is a partition column — zero compute)
    instead of re-running the Arrow matmul assignment per invocation.
    No embeddings.parquet scan may remain in their plans; the purity
    report's ReadSchema must carry only the label column (+ the
    partition column), never the float vectors."""
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    pure = catalog.QUERIES["cluster_purity_report"](spark, sf_dir)
    plan = pure._jdf.queryExecution().explainString(fmt)
    assert "ivf_cache" in plan, plan[:2000]
    assert "embeddings.parquet" not in plan, plan[:2000]
    assert "ArrowEvalPython" not in plan, plan[:2000]
    import re

    rs = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert rs and "embedding" not in rs.group(1), plan[:2000]

    prof = catalog.QUERIES["cluster_profile"](spark, sf_dir)
    plan = prof._jdf.queryExecution().explainString(fmt)
    assert "ivf_cache" in plan, plan[:2000]
    assert "embeddings.parquet" not in plan, plan[:2000]
    assert "ArrowEvalPython" not in plan, plan[:2000]

    sd = catalog.QUERIES["semantic_dedup"](spark, sf_dir)
    plan = sd._jdf.queryExecution().explainString(fmt)
    assert "ivf_cache" in plan, plan[:2000]
    assert "embeddings.parquet" not in plan, plan[:2000]


def test_lm_layout_missing_meta_forces_rebuild(spark):
    """An lm_scores artifact WITHOUT meta is stale by definition —
    rebuild, never adopt (the _node2vec_layout ADVICE-r10 discipline
    applied from birth)."""
    import os

    from openetl_spark.queries.lm_dedup import _LM_VERIFIED, _lm_scores_layout

    sf = "/root/testdata/sf0.001"
    scores = _lm_scores_layout(spark, sf)
    meta = os.path.join(os.path.dirname(scores), "lm_meta.json")
    assert os.path.exists(meta)
    os.remove(meta)
    sentinel = os.path.join(scores, "_stale_sentinel")
    open(sentinel, "w").write("old params")
    _LM_VERIFIED.discard("sf0.001")
    scores2 = _lm_scores_layout(spark, sf)
    assert scores2 == scores
    assert os.path.exists(meta)
    assert not os.path.exists(sentinel)  # rebuilt, not adopted


def test_lm_layout_missing_data_forces_rebuild(spark):
    """The symmetric hole (ADVICE r11): intact meta but a deleted /
    externally-cleaned scores DIRECTORY must rebuild, not return a
    dangling path every consumer fails to read."""
    import os
    import shutil

    from openetl_spark.queries.lm_dedup import _LM_VERIFIED, _lm_scores_layout

    sf = "/root/testdata/sf0.001"
    scores = _lm_scores_layout(spark, sf)
    meta = os.path.join(os.path.dirname(scores), "lm_meta.json")
    assert os.path.exists(meta) and os.path.exists(scores)
    shutil.rmtree(scores)
    _LM_VERIFIED.discard("sf0.001")
    scores2 = _lm_scores_layout(spark, sf)
    assert scores2 == scores
    assert os.path.exists(scores)  # data rebuilt behind the meta
    assert spark.read.parquet(scores).count() > 0


def test_bipartite_census_plan_has_no_pair_enumeration(spark, sf_dir):
    """bipartite_stats with the layout codegrees must not contain the
    incidence self-join (the m·d pair enumeration) — the butterfly
    count is one aggregate over the persisted codegree relation."""
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    df = catalog.QUERIES["bipartite_stats"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(fmt)
    assert "edges_w" in plan, plan[:2000]
    # lineitem appears only for the degree aggregates (scans), never
    # self-joined on l_orderkey with a l_partkey inequality.
    assert "l_partkey < l_partkey" not in plan


def test_dp_release_plan_no_per_row_hash(spark, sf_dir):
    """The DP release's five md5 draws must be computed per CELL, not
    per input row: an inner range join lets Catalyst infer
    isnotnull(u) and push the hash expression below the aggregate
    (measured: a scan-side Filter evaluating 5 md5/row). The left
    range join keeps the uniform post-agg — no Filter or Scan node may
    mention md5."""
    df = catalog.QUERIES["dp_event_counts"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    for block in plan.split("\n\n"):
        if block.startswith("(") and ("Filter" in block.split("\n")[0]
                                      or "Scan" in block.split("\n")[0]):
            assert "md5" not in block, block[:400]
