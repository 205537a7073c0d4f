"""Structured Streaming tests (C20-C24): replay the events table as a
file stream split across several parquet files (multiple micro-batches
with maxFilesPerTrigger=1) and check streaming results against the
batch equivalents."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from openetl_spark import catalog
from openetl_spark.streaming import ops


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """events split into 4 parquet files -> 4 micro-batches."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    events = catalog.load(spark, sf_dir, "events")
    # cast ntz -> ltz to match the streaming schema (session TZ is UTC);
    # range-partition by ts so micro-batches arrive in event-time order
    # (random splits would make whole files "late" and watermark-dropped)
    events.withColumn("ts", F.col("ts").cast("timestamp")).repartitionByRange(
        4, "ts"
    ).write.mode("overwrite").parquet(d)
    files = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
    assert len(files) >= 2
    # The file stream source orders by modification time; all parts share
    # one mtime, so ingestion order would be arbitrary and a later-range
    # file arriving first would make entire earlier files "late". Pin
    # ascending mtimes in range (=time) order.
    for i, f in enumerate(files):
        os.utime(f, (1000000000 + i * 60, 1000000000 + i * 60))
    return d


def test_tumbling_counts_match_batch(spark, sf_dir, stream_dir):
    stream = ops.read_event_stream(spark, stream_dir)
    ops.run_to_memory_sink(ops.tumbling_counts(stream), "t_tumbling", "append")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    batch = (
        catalog.load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .collect()
    )
    expected = {(r["w"]["start"], r["event_type"]): (r["n"], r["sv"]) for r in batch}
    # Append mode only emits windows sealed by the final watermark; every
    # emitted window must agree exactly with the batch result, and most
    # windows must have been emitted.
    assert got
    for k, v in got.items():
        assert expected[k] == v
    # the last micro-batch's windows stay unsealed (watermark advances
    # at batch boundaries), so with 4 files expect ≥ ~3/4 coverage
    assert len(got) >= len(expected) * 0.7


def test_session_counts_total_events(spark, stream_dir):
    stream = ops.read_event_stream(spark, stream_dir)
    ops.run_to_memory_sink(ops.session_counts(stream), "t_sessions", "append")
    rows = spark.sql("SELECT * FROM t_sessions").collect()
    assert rows
    # session windows partition events: per user, session event counts
    # sum to at most the user's total event count (unsealed sessions
    # are withheld in append mode).
    totals = {
        r["user_id"]: r["cnt"]
        for r in spark.sql(
            "SELECT user_id, sum(n_events) AS cnt FROM t_sessions GROUP BY user_id"
        ).collect()
    }
    batch_totals = dict(
        spark.read.parquet(stream_dir).groupBy("user_id").count().collect()
    )
    for uid, cnt in totals.items():
        assert cnt <= batch_totals[uid]
    for r in spark.sql("SELECT * FROM t_sessions").collect():
        assert r["session_end"] >= r["session_start"]


def test_dedup_within_watermark(spark, stream_dir, tmp_path):
    # duplicate every file's rows -> stream must drop all duplicates
    dup_dir = str(tmp_path / "dup")
    base = spark.read.parquet(stream_dir)
    base.union(base).repartition(4).write.mode("overwrite").parquet(dup_dir)
    stream = ops.read_event_stream(spark, dup_dir)
    ops.run_to_memory_sink(ops.dedup_within_watermark(stream), "t_dedup", "append")
    n = spark.sql("SELECT count(DISTINCT event_id) AS n FROM t_dedup").collect()[0]["n"]
    total = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0]["n"]
    assert n == total  # no duplicate event_ids survived


def test_watermark_drops_late_data(spark, tmp_path):
    """C21: a row older than the watermark horizon arriving in a later
    micro-batch is dropped from its (already-sealed) window."""
    import datetime as dt

    d = str(tmp_path / "late")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows, name):
        sdf = spark.createDataFrame(rows, schema=ops.EVENTS_SCHEMA)
        sdf.coalesce(1).write.mode("overwrite").parquet(f"{d}/{name}")

    # batch 1: 6 rows in hour 0 plus one at 01:20 → watermark after the
    # batch = 01:10, sealing the [00:00,01:00) window; batch 2 pushes the
    # watermark to 05:52 and the sealed window is emitted + state
    # evicted; batch 3 delivers ONE row for the long-dead window — it
    # must be dropped (a merge would emit a duplicate window in append
    # mode). Spark only guarantees the drop after eviction, which is why
    # the late row arrives two batches later.
    early = [(i, base + dt.timedelta(minutes=10 * i), 1, "click", 1.0, "{}") for i in range(6)]
    early.append((6, base + dt.timedelta(hours=1, minutes=20), 1, "click", 1.0, "{}"))
    mid = [(10 + i, base + dt.timedelta(hours=6, minutes=i), 1, "click", 1.0, "{}") for i in range(3)]
    late = [(99, base + dt.timedelta(minutes=5), 1, "click", 1.0, "{}")]
    mk(early, "a")
    mk(mid, "b")
    mk(late, "c")

    stream = (
        spark.readStream.schema(ops.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    q = (
        ops.tumbling_counts(stream, window="1 hour", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["window_start"].hour: r["n"] for r in spark.sql("SELECT * FROM t_late").collect()}
    # hour-0 window sealed with only the 6 on-time rows; the late row
    # (event 99) was behind the watermark and must not be counted.
    assert rows.get(0) == 6


def test_running_totals_stateful(spark, stream_dir):
    stream = ops.read_event_stream(spark, stream_dir)
    ops.run_to_memory_sink(ops.running_totals(stream), "t_running", "update")
    # last update per user must equal the batch totals
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
              FROM t_running) WHERE rn = 1
            """
        ).collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["tv"])
        for r in spark.read.parquet(stream_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .collect()
    }
    assert final == batch


def test_stream_stream_join(spark, stream_dir):
    """Purchases joined to the same user's clicks within the following
    hour — both sides unbounded streams, state bounded by watermark +
    range condition. Result must equal the equivalent batch join."""
    batch = spark.read.parquet(stream_dir)
    purchases = ops.read_event_stream(spark, stream_dir).filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", F.col("event_id").alias("p_id"))
    clicks = ops.read_event_stream(spark, stream_dir).filter(
        F.col("event_type") == "click"
    ).select("user_id", "ts", F.col("event_id").alias("c_id"))
    joined = ops.stream_stream_join(
        purchases, clicks, on="user_id", watermark="10 minutes", within="1 hour"
    ).select("p_id", F.col("c_id_r").alias("c_id"))
    q = joined.writeStream.format("memory").queryName("t_ssj").outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["p_id"], r["c_id"]) for r in spark.sql("SELECT * FROM t_ssj").collect()
    }
    p = batch.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_id")
    )
    c = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    exp = {
        (r["p_id"], r["c_id"])
        for r in p.join(
            c,
            (F.col("user_id") == F.col("u2"))
            & (F.col("c_ts") >= F.col("ts"))
            & (F.col("c_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    # streaming may withhold pairs whose watermark never sealed (stream
    # tail) but must never invent pairs
    assert got <= exp
    assert len(got) >= len(exp) * 0.7


def test_streaming_rollup_cells_match_batch_and_reaggregate(spark, sf_dir, stream_dir):
    """The streamed continuous-aggregate cells equal the batch partial
    aggregation over everything ingested, and a coarse level derived
    from the STREAMED cells equals a direct batch re-scan — the full
    hypertable loop (stream-maintain fine cells, re-aggregate coarse)."""
    from openetl_spark.operators import timeseries as TS

    stream = ops.read_event_stream(spark, stream_dir)
    cells = ops.streaming_rollup_cells(stream, keys=("event_type",))
    ops.run_to_memory_sink(cells, "t_rollup_cells", "complete")
    got_df = spark.table("t_rollup_cells")
    got = {
        (r["bucket_start"], r["event_type"]): (
            r["n_events"], round(r["sum_value"], 6), r["min_value"], r["max_value"]
        )
        for r in got_df.collect()
    }
    batch = catalog.load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    exp = {
        (r["bucket_start"], r["event_type"]): (
            r["n_events"], round(r["sum_value"], 6), r["min_value"], r["max_value"]
        )
        for r in TS.partial_time_aggregate(
            batch, "15 minutes", keys=("event_type",)
        ).collect()
    }
    assert got == exp

    # coarse level from the STREAMED cells == direct batch re-scan
    derived = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in TS.reaggregate(got_df, "hour", keys=("event_type",)).collect()
    }
    direct = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in TS.partial_time_aggregate(
            batch, "1 hour", keys=("event_type",)
        ).collect()
    }
    assert derived == direct


def test_streaming_time_weighted_matches_batch(spark, sf_dir, stream_dir):
    """C108 streaming parity: the stateful LOCF accumulator over
    time-ordered micro-batches must converge to the batch
    time_weighted_avg exactly (span integers equal; the float integral
    to sequential-vs-tree summation tolerance)."""
    from openetl_spark.operators import timeseries as TS

    stream = ops.read_event_stream(spark, stream_dir)
    ops.run_to_memory_sink(
        ops.streaming_time_weighted(stream), "t_twa", "update"
    )
    rows = spark.sql("SELECT * FROM t_twa").collect()
    assert rows
    final = {}
    for r in rows:  # freshest emission per key = largest exact µs span
        cur = final.get(r["user_id"])
        if cur is None or r["span_us"] > cur["span_us"]:
            final[r["user_id"]] = r
    batch_src = catalog.load(spark, sf_dir, "events")
    batch = {
        r["user_id"]: r
        for r in TS.time_weighted_avg(
            # round_dp=12: the operator's 6dp presentation rounding
            # would mask (or fake) disagreement at the tolerance below
            batch_src, keys=["user_id"], order_tiebreak=["event_id"], round_dp=12
        ).collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        s = final[uid]
        assert s["span_us"] // 1_000_000 == b["span_s"]
        assert s["twa"] == pytest.approx(b["twa"], rel=1e-9)


def test_streaming_time_weighted_skips_late_cross_batch_rows(spark, tmp_path):
    """ADVICE r06: a row older than the state's last processed
    observation (cross-batch out-of-order arrival) must be SKIPPED, not
    folded with a negative Δt — span_us stays monotone non-decreasing
    and the late value never enters the integral."""
    import os

    d = str(tmp_path / "late_twa")
    os.makedirs(d)

    def write_one(name, rows, mtime):
        df = spark.createDataFrame(rows, ops.EVENTS_SCHEMA).coalesce(1)
        sub = str(tmp_path / name)
        df.write.mode("overwrite").parquet(sub)
        import glob
        import shutil

        (src,) = glob.glob(os.path.join(sub, "part-*.parquet"))
        dst = os.path.join(d, name + ".parquet")
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    import datetime as dt

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    # batch 1: t=0 (v=1.0), t=10 (v=2.0)   → twa 1.0 over 10 s
    write_one(
        "b1",
        [(1, t(0), 7, "m", 1.0, "{}"), (2, t(10), 7, "m", 2.0, "{}")],
        1000000000,
    )
    # batch 2: t=5 LATE (v=99, must be ignored), t=20 (v=3.0)
    write_one(
        "b2",
        [(3, t(5), 7, "m", 99.0, "{}"), (4, t(20), 7, "m", 3.0, "{}")],
        1000000060,
    )
    stream = ops.read_event_stream(spark, d)
    ops.run_to_memory_sink(
        ops.streaming_time_weighted(stream), "t_twa_late", "update"
    )
    rows = sorted(
        spark.sql("SELECT * FROM t_twa_late").collect(),
        key=lambda r: r["span_us"],
    )
    spans = [r["span_us"] for r in rows]
    assert spans == sorted(spans) and spans[-1] == 20_000_000
    final = rows[-1]
    # integral = 1.0·10s + 2.0·10s over 20s = 1.5; the late 99 is absent
    assert final["twa"] == pytest.approx(1.5, abs=1e-12)


def test_streaming_last_touch_matches_batch(spark, sf_dir, stream_dir):
    """C109 streaming parity: the stateful last-touch accumulator over
    time-ordered micro-batches must assign every purchase exactly the
    channel the batch window form computes — purchase-by-purchase
    (event_id-keyed), with values carried verbatim."""
    from pyspark.sql import Window as W

    stream = ops.read_event_stream(spark, stream_dir)
    ops.run_to_memory_sink(
        ops.streaming_last_touch(stream), "t_attr", "append"
    )
    got = {
        r["event_id"]: (r["channel"], r["value"])
        for r in spark.sql("SELECT * FROM t_attr").collect()
    }
    events = catalog.load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_type")
    )
    batch = {
        r["event_id"]: (r["channel"], r["value"])
        for r in events.select(
            "event_id",
            "event_type",
            "value",
            F.coalesce(
                F.last(touch, ignorenulls=True).over(w), F.lit("direct")
            ).alias("channel"),
        )
        .filter(F.col("event_type") == "purchase")
        .collect()
    }
    assert len(got) == len(batch) > 0
    assert got == batch


def test_streaming_funnel_matches_batch(spark, sf_dir, stream_dir):
    """C148 streaming parity: the stateful strict-order funnel over
    time-ordered micro-batches emits exactly the batch operator's
    per-user advances — same reached steps, same exact conversion
    microseconds — and the per-step counts reproduce funnel_steps."""
    from openetl_spark.operators import analytics as A

    steps = ["signup", "view", "click", "purchase"]
    w = 7 * 86400
    stream = ops.read_event_stream(spark, stream_dir)
    ops.run_to_memory_sink(
        ops.streaming_funnel(stream, steps, window_sec=w),
        "t_funnel",
        "append",
    )
    streamed = {
        (r["user_id"], r["step_idx"]): (r["step"], r["conv_usec"])
        for r in spark.sql("SELECT * FROM t_funnel").collect()
    }
    assert streamed
    # one emission per (user, advance), never duplicates
    assert len(streamed) == spark.sql(
        "SELECT count(*) FROM t_funnel"
    ).collect()[0][0]

    e = catalog.load(spark, sf_dir, "events")
    batch_times = {
        (r["user_id"], r["step_idx"]): (r["step"], r["conv_usec"])
        for r in A.funnel_user_times(e, steps, window_sec=w).collect()
    }
    # batch funnel_user_times covers steps >= 2; streaming also emits
    # the step-1 anchor row (conv 0)
    streamed_tail = {k: v for k, v in streamed.items() if k[1] >= 2}
    assert streamed_tail == batch_times
    step1_users = {k[0] for k in streamed if k[1] == 1}
    batch_step1 = {
        r["user_id"]
        for r in e.filter(F.col("event_type") == steps[0])
        .select("user_id")
        .distinct()
        .collect()
    }
    assert step1_users == batch_step1
    # the per-step counts reproduce funnel_steps exactly
    from collections import Counter

    counts = Counter(k[1] for k in streamed)
    batch_counts = {
        r["step_idx"]: r["n_users"]
        for r in A.funnel_steps(e, steps, window_sec=w).collect()
    }
    assert {i: counts.get(i, 0) for i in batch_counts} == batch_counts


def test_streaming_funnel_validation(spark, stream_dir):
    stream = ops.read_event_stream(spark, stream_dir)
    with pytest.raises(ValueError, match="steps"):
        ops.streaming_funnel(stream, ["signup"])
    with pytest.raises(ValueError, match="duplicate"):
        ops.streaming_funnel(stream, ["signup", "signup"])


def test_streaming_ewma_matches_batch(spark, sf_dir, stream_dir):
    """C162 streaming parity: the one-integer-state EWMA fold over
    time-ordered micro-batches emits exactly the batch scan's
    smoothed value for every event — bit-exact, since both sides run
    the same fixed-point recurrence."""
    from openetl_spark.operators import timeseries as T

    stream = ops.read_event_stream(spark, stream_dir)
    ops.run_to_memory_sink(ops.streaming_ewma(stream), "t_ewma", "append")
    streamed = {
        r["event_id"]: (r["xi"], r["ewma_k"])
        for r in spark.sql("SELECT * FROM t_ewma").collect()
    }
    assert streamed
    # exactly one emission per event
    assert len(streamed) == spark.sql(
        "SELECT count(*) FROM t_ewma"
    ).collect()[0][0]
    e = catalog.load(spark, sf_dir, "events")
    x = e.select(
        "user_id", "event_id", "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("xi"),
    )
    batch = {
        r["event_id"]: (r["xi"], r["ewma_k"])
        for r in T.ewma_fixed_point(
            x, "user_id", ("ts", "event_id"), "xi"
        ).collect()
    }
    assert streamed == batch


def test_streaming_ewma_validation(spark, stream_dir):
    stream = ops.read_event_stream(spark, stream_dir)
    with pytest.raises(ValueError, match="alpha"):
        ops.streaming_ewma(stream, alpha_num=0)


def test_streaming_cusum_matches_batch(spark, sf_dir, stream_dir):
    """C163 streaming parity: the one-integer-state CUSUM fold over a
    stream-static centered series reproduces the batch scan exactly —
    same g, same alarms — when both center against the same static
    in-control relation."""
    from openetl_spark.operators import timeseries as T

    e = catalog.load(spark, sf_dir, "events")
    x = e.select(
        "user_id", "event_id", "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("xi"),
    )
    mu = x.groupBy("user_id").agg(
        F.expr("sum(xi) div count(*)").cast("bigint").alias("mu")
    )
    stream = ops.read_event_stream(spark, stream_dir)
    ops.run_to_memory_sink(
        ops.streaming_cusum(stream, mu, slack=1000, threshold=10000),
        "t_cusum",
        "append",
    )
    streamed = {
        r["event_id"]: (r["c"], r["cusum_g"], r["alarm"])
        for r in spark.sql("SELECT * FROM t_cusum").collect()
    }
    assert streamed
    centered = x.join(mu, "user_id").select(
        "user_id", "event_id", "ts", (F.col("xi") - F.col("mu")).alias("c")
    )
    batch = {
        r["event_id"]: (r["c"], r["cusum_g"], r["alarm"])
        for r in T.cusum_fixed_point(
            centered, "user_id", ("ts", "event_id"), "c",
            target=0, slack=1000, threshold=10000,
        ).collect()
    }
    assert streamed == batch
    assert any(a for _, _, a in streamed.values())
    assert not all(a for _, _, a in streamed.values())
