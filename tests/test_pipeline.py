"""Pipeline orchestrator + REST ingest tests (reference behaviors from
SURVEY.md §5 layer 1: pagination fan-out, rate limiting, retry, timeout
partial result, cursor termination, total-limit trim, hooks, events)."""

import pytest

from openetl_spark.pipeline import Orchestrator, Pipeline, PipelineAbort
from openetl_spark.sources.rest import AuthError, paged_fetch
from openetl_spark.spec import Connector, Filter, Sort


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps = []

    def clock(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(round(s, 3))
        self.t += s


def make_pages(n_items, page_size):
    def fetch(opts):
        off = int(opts["offset"] or 0)
        return {"data": [{"id": i} for i in range(off, min(off + opts["limit"], n_items))]}

    return fetch


# ----------------------------------------------------------- paged_fetch

def test_offset_pagination_terminates_on_short_page():
    calls = []

    def fetch(opts):
        calls.append(dict(opts))
        return make_pages(25, 10)(opts)

    res = paged_fetch(fetch, pagination="offset", items_per_page=10)
    assert [r["id"] for r in res.rows] == list(range(25))
    assert [c["offset"] for c in calls] == [0, 10, 20]
    assert not res.partial


def test_offset_exact_page_boundary_extra_fetch():
    # 20 items, pages of 10: page 2 is full, so a 3rd (empty) fetch
    # confirms the end — same as the reference's stop rule.
    calls = []

    def fetch(opts):
        calls.append(1)
        return make_pages(20, 10)(opts)

    res = paged_fetch(fetch, pagination="offset", items_per_page=10)
    assert len(res.rows) == 20
    assert len(calls) == 3


def test_cursor_pagination_terminates_on_none():
    pages = {None: ([1, 2], "c1"), "c1": ([3], "c2"), "c2": ([4], None)}

    def fetch(opts):
        data, nxt = pages[opts["offset"]]
        return {"data": [{"id": i} for i in data], "next_cursor": nxt}

    res = paged_fetch(fetch, pagination="cursor", items_per_page=10)
    assert [r["id"] for r in res.rows] == [1, 2, 3, 4]


def test_total_limit_trims_overshoot():
    res = paged_fetch(make_pages(100, 10), pagination="offset", items_per_page=10, total_limit=25)
    assert len(res.rows) == 25


def test_max_items_per_page_clamps():
    calls = []

    def fetch(opts):
        calls.append(opts["limit"])
        return make_pages(5, opts["limit"])(opts)

    paged_fetch(fetch, pagination="offset", items_per_page=500, max_items_per_page=100)
    assert calls[0] == 100


def test_rate_limiting_inter_request_interval():
    fc = FakeClock()

    def fetch(opts):
        fc.t += 0.01  # each request takes 10ms
        return make_pages(30, 10)(opts)

    paged_fetch(
        fetch,
        pagination="offset",
        items_per_page=10,
        requests_per_second=2.0,
        sleep=fc.sleep,
        clock=fc.clock,
    )
    # min interval 0.5s: sleeps of ~0.49 between the fetches
    assert len(fc.sleeps) >= 2
    assert all(0.4 <= s <= 0.5 for s in fc.sleeps)


def test_retry_until_success_fixed_interval():
    fc = FakeClock()
    attempts = []

    def fetch(opts):
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("flaky")
        return {"data": [{"id": 1}]}

    res = paged_fetch(
        fetch, pagination="none", max_retries=3, retry_interval_s=2.0, sleep=fc.sleep
    )
    assert len(res.rows) == 1
    assert fc.sleeps == [2.0, 2.0]


def test_retry_exhaustion_raises():
    def fetch(opts):
        raise RuntimeError("down")

    with pytest.raises(RuntimeError):
        paged_fetch(fetch, pagination="none", max_retries=2, sleep=lambda s: None)


def test_deadline_returns_partial_flagged():
    fc = FakeClock()

    def fetch(opts):
        fc.t += 10  # each page costs 10s
        return make_pages(1000, 10)(opts)

    res = paged_fetch(
        fetch,
        pagination="offset",
        items_per_page=10,
        deadline_s=25,
        sleep=fc.sleep,
        clock=fc.clock,
    )
    assert res.partial  # explicit flag, not silent truncation
    assert 0 < len(res.rows) < 1000


def test_auth_401_refresh_then_retry():
    state = {"token": "old", "calls": 0}

    def fetch(opts):
        state["calls"] += 1
        if state["token"] == "old":
            raise AuthError(401)
        return {"data": [{"id": 1}]}

    def refresh():
        state["token"] = "new"

    res = paged_fetch(fetch, pagination="none", refresh_auth=refresh)
    assert len(res.rows) == 1 and state["calls"] == 2


def test_429_honors_retry_after():
    fc = FakeClock()
    state = {"n": 0}

    def fetch(opts):
        state["n"] += 1
        if state["n"] == 1:
            raise AuthError(429, retry_after=7.5)
        return {"data": [{"id": 1}]}

    res = paged_fetch(fetch, pagination="none", max_retries=1, sleep=fc.sleep)
    assert len(res.rows) == 1
    assert fc.sleeps == [7.5]


# ------------------------------------------------------------ orchestrator

def test_pipeline_events_and_hooks(spark):
    events, loaded, uploaded = [], [], []
    cap = []
    src = Connector(
        adapter_id="parquet",
        endpoint_id="/root/testdata/sf0.001/nation.parquet",
        filters=[Filter("n_regionkey", "=", 0)],
        sort=[Sort("n_name")],
    )
    tgt = Connector(adapter_id="memory", endpoint_id="t_nation", config={"capture": cap})
    p = Pipeline(
        id="p1",
        source=src,
        target=tgt,
        onload=lambda df: loaded.append(df),
        onupload=lambda: uploaded.append(True),
        logging=lambda e: events.append(e["type"]),
    )
    res = Orchestrator(spark=spark).run_pipeline(p)
    assert cap and all(r["n_regionkey"] == 0 for r in cap)
    assert loaded and uploaded
    assert events[0] == "start" and "extract" in events and "load" in events
    assert events[-1] == "complete"


def test_pipeline_source_xor_data(spark):
    with pytest.raises(ValueError):
        Orchestrator(spark=spark).run_pipeline(Pipeline(id="neither"))
    with pytest.raises(ValueError):
        Orchestrator(spark=spark).run_pipeline(
            Pipeline(
                id="both",
                source=Connector(adapter_id="memory", endpoint_id="x", config={"data": [{"a": 1}]}),
                data=[{"a": 1}],
            )
        )


def test_push_only_pipeline_with_abort(spark):
    with pytest.raises(PipelineAbort):
        Orchestrator(spark=spark).run_pipeline(
            Pipeline(
                id="abort",
                data=[{"a": 1}],
                target=Connector(adapter_id="memory", endpoint_id="t_x"),
                onbeforesend=lambda df: False,
            )
        )


def test_onbeforesend_replaces_data(spark):
    cap = []
    res = Orchestrator(spark=spark).run_pipeline(
        Pipeline(
            id="replace",
            data=[{"a": 1}, {"a": 2}],
            target=Connector(adapter_id="memory", endpoint_id="t_y", config={"capture": cap}),
            onbeforesend=lambda df: df.filter("a > 1"),
        )
    )
    assert [r["a"] for r in cap] == [2]


def test_vault_credential_resolution(spark):
    cap = []
    seen = {}

    class SpySource:
        def read(self, spark_, connector):
            seen.update(connector.config.get("auth", {}))
            return spark_.createDataFrame([{"ok": 1}])

    from openetl_spark.registry import register_source

    register_source("spy", SpySource())
    orch = Orchestrator(vault={"cred1": {"type": "api_key", "key": "xyz"}}, spark=spark)
    orch.run_pipeline(
        Pipeline(
            id="auth",
            source=Connector(adapter_id="spy", endpoint_id="e", credential_id="cred1"),
            target=Connector(adapter_id="memory", endpoint_id="t_z", config={"capture": cap}),
        )
    )
    assert seen == {"type": "api_key", "key": "xyz"}
    assert cap


def test_missing_credential_raises(spark):
    with pytest.raises(KeyError, match="cred"):
        Orchestrator(spark=spark).run_pipeline(
            Pipeline(
                id="nocred",
                source=Connector(adapter_id="parquet", endpoint_id="/x", credential_id="cred9"),
            )
        )


def test_rest_source_to_dataframe(spark):
    src = Connector(
        adapter_id="rest",
        endpoint_id="api/items",
        config={
            "fetch_page": make_pages(35, 10),
            "pagination": "offset",
            "items_per_page": 10,
            "schema": "id long",
        },
        limit=30,
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="rest", source=src))
    assert res.df.count() == 30


def test_jdbc_option_building():
    from openetl_spark.sources.jdbc import build_jdbc_options

    c = Connector(
        adapter_id="jdbc",
        endpoint_id="users",
        config={"url": "jdbc:postgresql://h/db", "schema_name": "public", "user": "u", "fetchsize": 1000},
    )
    opts = build_jdbc_options(c)
    assert opts["dbtable"] == "public.users" and opts["fetchsize"] == "1000"
    c2 = Connector(
        adapter_id="jdbc",
        endpoint_id="custom_query",
        config={"url": "jdbc:mysql://h/db", "query": "SELECT 1"},
    )
    assert build_jdbc_options(c2)["query"] == "SELECT 1"


def test_sort_plus_limit_is_global_topn(spark):
    """ADVICE r01 (rest.py): sort is applied Spark-side AFTER ingest, so
    the fetch must not stop at `limit` rows — top-N must be global, as in
    the reference where the backend sorts before the limit trim."""
    src = Connector(
        adapter_id="rest",
        endpoint_id="api/items",
        config={"fetch_page": make_pages(35, 10), "items_per_page": 10, "schema": "id long"},
        sort=[Sort("id", "desc")],
        limit=5,
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="topn", source=src))
    assert [r["id"] for r in res.df.collect()] == [34, 33, 32, 31, 30]


def test_filter_plus_limit_fetches_fully(spark):
    """Filters are applied Spark-side for the generic REST source, so a
    pushed limit would drop matching rows past the fetched prefix."""
    src = Connector(
        adapter_id="rest",
        endpoint_id="api/items",
        config={"fetch_page": make_pages(35, 10), "items_per_page": 10, "schema": "id long"},
        filters=[Filter("id", ">=", 30)],
        limit=5,
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="fl", source=src))
    assert sorted(r["id"] for r in res.df.collect()) == [30, 31, 32, 33, 34]


def test_offset_plus_limit_widens_fetch_window(spark):
    """connector.offset is applied Spark-side, so the fetch window must
    cover offset + limit rows."""
    src = Connector(
        adapter_id="rest",
        endpoint_id="api/items",
        config={"fetch_page": make_pages(35, 10), "items_per_page": 10, "schema": "id long"},
        offset=30,
        limit=5,
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="ol", source=src))
    assert sorted(r["id"] for r in res.df.collect()) == [30, 31, 32, 33, 34]


def test_partial_marker_survives_projection(spark):
    """ADVICE r01 (compiler.py): the explicit _ingest_partial marker must
    not be silently dropped by a user projection."""
    import time as _time

    def slow_fetch(opts):
        _time.sleep(0.05)
        off = int(opts["offset"] or 0)
        return {"data": [{"id": i, "x": i} for i in range(off, off + opts["limit"])]}

    src = Connector(
        adapter_id="rest",
        endpoint_id="api/items",
        config={"fetch_page": slow_fetch, "items_per_page": 10, "schema": "id long, x long"},
        fields=["id"],
        timeout=0.01,
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="partial", source=src))
    assert "_ingest_partial" in res.df.columns
    assert res.df.columns[0] == "id" and "x" not in res.df.columns


def test_jdbc_partition_bound_discovery(spark):
    """VERDICT r01 #9: partitionColumn without bounds triggers a min/max
    probe (injectable — no driver jar in container) and auto-fills
    lowerBound/upperBound/numPartitions."""
    from openetl_spark.sources.jdbc import build_jdbc_options, discover_partition_bounds

    probed = []

    def probe(opts):
        probed.append(opts["query"])
        return (10, 500)

    c = Connector(
        adapter_id="jdbc", endpoint_id="users",
        config={"url": "jdbc:postgresql://h/db", "partitionColumn": "id",
                "bounds_probe": probe, "num_partitions": 16},
    )
    opts = discover_partition_bounds(spark, c, build_jdbc_options(c))
    assert opts["lowerBound"] == "10" and opts["upperBound"] == "500"
    assert opts["numPartitions"] == "16" and opts["partitionColumn"] == "id"
    assert probed == ["SELECT min(id) AS lo, max(id) AS hi FROM users"]

    # custom query source: bounds probe wraps the subquery
    c2 = Connector(
        adapter_id="jdbc", endpoint_id="custom_query",
        config={"url": "jdbc:mysql://h/db", "query": "SELECT * FROM t WHERE x > 0",
                "partitionColumn": "id", "bounds_probe": probe},
    )
    opts2 = discover_partition_bounds(spark, c2, build_jdbc_options(c2))
    assert probed[-1] == "SELECT min(id) AS lo, max(id) AS hi FROM (SELECT * FROM t WHERE x > 0) t"
    assert opts2["numPartitions"] == "8"  # default fan-out

    # empty table: NULL bounds → partition options dropped (serial read)
    c3 = Connector(
        adapter_id="jdbc", endpoint_id="empty",
        config={"url": "jdbc:postgresql://h/db", "partitionColumn": "id",
                "bounds_probe": lambda o: (None, None)},
    )
    opts3 = discover_partition_bounds(spark, c3, build_jdbc_options(c3))
    assert "partitionColumn" not in opts3 and "lowerBound" not in opts3

    # explicit bounds: no probe (JdbcSource only discovers when missing)
    c4 = Connector(
        adapter_id="jdbc", endpoint_id="users",
        config={"url": "jdbc:postgresql://h/db", "partitionColumn": "id",
                "lowerBound": 0, "upperBound": 99, "numPartitions": 4},
    )
    opts4 = build_jdbc_options(c4)
    assert "lowerBound" in opts4 and "upperBound" in opts4

    # ADVICE r02: ONE stray pre-set bound still triggers discovery, and
    # the probe options must carry NO partition options (Spark validates
    # them all-or-none) and no dbtable (query replaces it).
    seen = []

    def probe5(opts):
        seen.append(opts)
        return (1, 9)

    c5 = Connector(
        adapter_id="jdbc", endpoint_id="users",
        config={"url": "jdbc:postgresql://h/db", "partitionColumn": "id",
                "lowerBound": 7, "bounds_probe": probe5},
    )
    opts5 = discover_partition_bounds(spark, c5, build_jdbc_options(c5))
    assert opts5["lowerBound"] == "1" and opts5["upperBound"] == "9"
    bad = {"lowerBound", "upperBound", "partitionColumn", "numPartitions", "dbtable"}
    assert not (bad & set(seen[0]))


def test_table_format_sink_guard_and_writer(spark):
    """VERDICT r01 #10: delta/iceberg sinks registered; writer
    construction is real Spark API; execution without the jar raises a
    clear TableFormatUnavailable, not a raw py4j error."""
    import pytest as _pytest

    from openetl_spark.registry import get_sink
    from openetl_spark.sinks.table_format import (
        TableFormatUnavailable,
        build_writer,
        format_available,
    )

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    c = Connector(adapter_id="delta", endpoint_id="/tmp/nope",
                  config={"mode": "overwrite", "partition_by": ["v"]})
    build_writer(df, c, "delta")  # construction works jar or not
    with _pytest.raises(ValueError, match="append|overwrite"):
        build_writer(df, Connector(adapter_id="delta", endpoint_id="x",
                                   config={"mode": "merge"}), "delta")
    assert format_available(spark, "parquet") is True
    for fmt in ("delta", "iceberg"):
        sink = get_sink(fmt)
        if format_available(spark, fmt):  # jar present: smoke-write
            import tempfile

            sink.write(df, Connector(adapter_id=fmt, endpoint_id=tempfile.mkdtemp(),
                                     config={"mode": "overwrite"}))
        else:
            with _pytest.raises(TableFormatUnavailable, match="classpath"):
                sink.write(df, c)


def test_pagination_edge_cases():
    """The reference's Mongo-suite edge sweep (SURVEY §5): zero page
    size, negative offset, offset beyond data — none may hang or err."""
    fetch = make_pages(10, 10)
    r = paged_fetch(fetch, pagination="offset", items_per_page=0)
    assert [x["id"] for x in r.rows] == list(range(10))  # clamped to 1
    r = paged_fetch(fetch, pagination="offset", items_per_page=5, initial_offset=-7)
    assert [x["id"] for x in r.rows] == list(range(10))  # clamped to 0
    r = paged_fetch(fetch, pagination="offset", items_per_page=5, initial_offset=50)
    assert r.rows == []  # beyond data: clean empty


def test_staged_ingest_bounds_driver_memory(spark, tmp_path):
    """VERDICT r02 #8: with config['staging_dir'], a big extract spills
    page batches to JSONL as they arrive — peak driver buffering is one
    staging batch, the DataFrame comes from Spark's distributed JSON
    reader over multiple staged files, and values round-trip."""
    from openetl_spark.pipeline import Orchestrator, Pipeline

    N, PAGE = 50_000, 1_000

    def fetch(opts):
        off = int(opts["offset"] or 0)
        lim = opts["limit"]
        data = [{"k": i, "v": f"x{i}"} for i in range(off, min(off + lim, N))]
        return {"data": data}

    src = Connector(
        adapter_id="rest", endpoint_id="big",
        config={"fetch_page": fetch, "items_per_page": PAGE,
                "staging_dir": str(tmp_path / "stage"),
                "staging_batch_rows": 5_000,
                "schema": "k long, v string"},
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="big", source=src))
    df = res.df
    assert df.count() == N
    assert df.selectExpr("sum(k)").first()[0] == N * (N - 1) // 2
    import glob

    files = glob.glob(str(tmp_path / "stage" / "*.jsonl"))
    assert len(files) == N // 5_000  # 10 staged splits, not one giant list
    # scan parallelism comes from the staged layout
    assert df.rdd.getNumPartitions() > 1


def test_staged_ingest_respects_limit_and_empty(spark, tmp_path):
    from openetl_spark.pipeline import Orchestrator, Pipeline

    def fetch(opts):
        off = int(opts["offset"] or 0)
        data = [{"k": i} for i in range(off, min(off + opts["limit"], 1000))]
        return {"data": data}

    src = Connector(
        adapter_id="rest", endpoint_id="lim",
        config={"fetch_page": fetch, "items_per_page": 100,
                "staging_dir": str(tmp_path / "s2"), "schema": "k long"},
        limit=250,
    )
    res = Orchestrator(spark=spark).run_pipeline(Pipeline(id="lim", source=src))
    assert sorted(r["k"] for r in res.df.collect()) == list(range(250))

    empty = Connector(
        adapter_id="rest", endpoint_id="none",
        config={"fetch_page": lambda o: {"data": []}, "pagination": "none",
                "staging_dir": str(tmp_path / "s3"), "schema": "k long"},
    )
    res2 = Orchestrator(spark=spark).run_pipeline(Pipeline(id="mt", source=empty))
    assert res2.df.count() == 0 and res2.df.columns == ["k"]


def test_paged_fetch_sink_bounds_retention():
    """The sink path never accumulates: PageResult.rows stays empty and
    the sink sees every row exactly once (trimmed to total_limit)."""
    seen = []
    res = paged_fetch(
        make_pages(1000, 100), pagination="offset", items_per_page=100,
        total_limit=350, sink=seen.append,
    )
    assert res.rows == []
    got = [r for batch in seen for r in batch]
    assert len(got) == 350
    assert max(len(b) for b in seen) <= 100  # one page at a time


def test_staged_ingest_reused_dir_drops_stale_parts(spark, tmp_path):
    """A reused staging_dir from a previous LARGER extract must not leak
    stale part files into the new result."""
    from openetl_spark.pipeline import Orchestrator, Pipeline

    def src(n):
        def fetch(opts):
            off = int(opts["offset"] or 0)
            return {"data": [{"k": i} for i in range(off, min(off + opts["limit"], n))]}

        return Connector(
            adapter_id="rest", endpoint_id="r",
            config={"fetch_page": fetch, "items_per_page": 500,
                    "staging_dir": str(tmp_path / "reuse"),
                    "staging_batch_rows": 1000, "schema": "k long"},
        )

    big = Orchestrator(spark=spark).run_pipeline(Pipeline(id="b", source=src(5000))).df
    assert big.count() == 5000
    small = Orchestrator(spark=spark).run_pipeline(Pipeline(id="s", source=src(1500))).df
    assert small.count() == 1500  # not 1500 + stale tail of the 5000-run


# ------------------------------------------------------ declarative query

def test_compile_query_topk_having_and_plan(spark, sf_dir):
    """QuerySpec end-to-end: join + derived column + grouped aggregate +
    HAVING + sort + limit equals the hand-built DataFrame query, the
    broadcast hint lands in the physical plan, and the whole spec
    round-trips through a plain dict (JSON-able)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from openetl_spark import catalog
    from openetl_spark.plans.compiler import compile_query

    spec = {
        "table": "orders",
        "joins": [
            {"table": "customer", "on": [["o_custkey", "c_custkey"]],
             "broadcast": True},
        ],
        "derived": {"year": "year(o_orderdate)"},
        "group_by": ["c_mktsegment", "year"],
        "aggregates": [
            {"fn": "count", "expr": None, "alias": "n"},
            {"fn": "sum", "expr": "o_totalprice", "alias": "total",
             "round_dp": 2},
            {"fn": "count_distinct", "expr": "o_custkey", "alias": "custs"},
        ],
        "having": [{"field": "n", "operator": ">", "value": 50}],
        "sort": [{"field": "total", "type": "desc"},
                 {"field": "c_mktsegment"}, {"field": "year"}],
        "limit": 10,
    }
    df = compile_query(spec, lambda t: catalog.load(spark, sf_dir, t))

    o = catalog.load(spark, sf_dir, "orders")
    c = catalog.load(spark, sf_dir, "customer")
    exp = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("year", F.expr("year(o_orderdate)"))
        .groupBy("c_mktsegment", "year")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.countDistinct("o_custkey").alias("custs"),
        )
        .filter(F.col("n") > 50)
        .orderBy(F.col("total").desc(), "c_mktsegment", "year")
        .limit(10)
    )
    assert [tuple(r) for r in df.collect()] == [tuple(r) for r in exp.collect()]

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_staged_ingest_offset_respects_arrival_order(spark, tmp_path):
    """Regression (r08 review): offset/limit over a STAGED (multi-file)
    ingest must skip the first-k-fetched rows in driver arrival order,
    not whatever window Spark's file-split scheduling happens to put
    first — and _ingest_seq must never leak to user output."""
    from openetl_spark.plans.compiler import compile_connector
    from openetl_spark.spec import Connector

    n = 250

    def fetch_page(opts):
        off = opts.get("offset") or 0
        lim = opts["limit"]
        rows = [{"i": i, "v": f"r{i}"} for i in range(off, min(off + lim, n))]
        return {"data": rows}

    c = Connector(
        adapter_id="rest",
        endpoint_id="x",
        offset=40,
        limit=100,
        config={
            "fetch_page": fetch_page,
            "items_per_page": 30,          # many staged files
            "staging_dir": str(tmp_path / "stage"),
            "staging_batch_rows": 25,
            "schema": "i long, v string",
        },
    )
    df = compile_connector(spark, c)
    rows = df.collect()
    assert "_ingest_seq" not in df.columns
    assert [r["i"] for r in rows] == list(range(40, 140))


def test_pipeline_parquet_target_zorder_layout(spark, sf_dir, tmp_path):
    """Declarative z-order: a parquet target with config['zorder_by']
    writes the clustered layout (sinks/layout.py) through the normal
    pipeline path, and every listed column shows per-file locality."""
    import pyspark.sql.functions as F

    from openetl_spark.sinks.layout import file_locality_report

    out = str(tmp_path / "events_z")
    src = Connector(adapter_id="parquet", endpoint_id=f"{sf_dir}/events.parquet")
    tgt = Connector(
        adapter_id="parquet",
        endpoint_id=out,
        config={"mode": "overwrite", "zorder_by": ["user_id", "value"],
                "zorder_files": 8},
    )
    Orchestrator(spark=spark).run_pipeline(
        Pipeline(id="zorder", source=src, target=tgt)
    )
    got = spark.read.parquet(out)
    assert got.count() == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    rep = file_locality_report(spark, out, ["user_id", "value"]).agg(
        F.avg("span_frac_user_id"), F.avg("span_frac_value")
    ).first()
    assert rep[0] < 0.7 and rep[1] < 0.7, tuple(rep)
    # misuse guards: non-parquet format / non-overwrite mode
    import pytest as _pytest

    from openetl_spark.sources.files import FileSink

    with _pytest.raises(ValueError):
        FileSink("csv").write(
            got, Connector(adapter_id="csv", endpoint_id=out,
                           config={"mode": "overwrite", "zorder_by": ["user_id"]})
        )
    with _pytest.raises(ValueError):
        FileSink("parquet").write(
            got, Connector(adapter_id="parquet", endpoint_id=out,
                           config={"zorder_by": ["user_id"]})
        )


def test_streaming_target_rejects_zorder(spark, tmp_path):
    """zorder_by on a STREAMING file target must fail loudly — the
    layout is a batch table-maintenance pass, and silently writing
    unclustered files would defeat the option's whole point."""
    from openetl_spark.sources.files import FileSink

    src = str(tmp_path / "in")
    spark.range(3).selectExpr("id", "id * 2 AS v").write.json(src)
    stream = spark.readStream.schema("id long, v long").json(src)
    with pytest.raises(ValueError, match="batch-only"):
        FileSink("parquet").write(
            stream,
            Connector(
                adapter_id="parquet",
                endpoint_id=str(tmp_path / "out"),
                config={"zorder_by": ["id"], "sync": True},
            ),
        )
