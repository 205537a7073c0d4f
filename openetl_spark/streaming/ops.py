"""Structured Streaming operators (SURVEY.md §2C C20-C24).

The reference has no streams at all — its closest concept is the serial
page-fetch loop (`/root/reference/src/index.ts:224-282`, a bounded pull
iterator). The Spark-native engine gets real unbounded streams:
file/rate/kafka sources, event-time watermarks, tumbling/sliding/
session windows, stateful dedup and custom state.

Each helper takes/returns streaming DataFrames so they compose with
``spark.readStream`` and any sink. The batch-mode equivalents of the
window shapes are oracle-checked in catalog.py (tumbling_hourly,
session_windows); here the *streaming* semantics (watermarks, state,
incremental triggers) are exercised by tests/test_streaming.py via the
memory sink.

Scale notes: streaming aggregations shuffle by (window, key) exactly
like their batch forms; state store size is bounded by the watermark
horizon — the knobs that matter at 100 TB/day are watermark delay
(state retention) and trigger interval (micro-batch amortization).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based event stream: each parquet file in ``path`` becomes
    (at most ``max_files_per_trigger``) micro-batch input. Local replay
    of the `events` table; swap for kafka in production."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """C21+C22: watermarked tumbling (or sliding, with ``slide``)
    window counts per event_type. Append-mode capable: a window emits
    once the watermark passes its end."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """C23: native session windows — sessions close ``gap`` after the
    last event, emitted once the watermark passes."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """C24: stateful exactly-once dedup on event_id. State is bounded by
    the watermark horizon (late duplicates beyond it are dropped by the
    watermark itself)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


RUNNING_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def running_totals(stream: DataFrame) -> DataFrame:
    """C24: custom stateful operator via applyInPandasWithState —
    per-user running (count, sum) emitted every micro-batch. The
    pattern slot for arbitrary per-key state machines (fraud windows,
    session carts, ...).

    The state function is a local closure on purpose: cloudpickle then
    ships it BY VALUE to executors. A module-level function is pickled
    by reference and requires this package importable on every worker's
    own sys.path (true for installs, not for path-injected checkouts).
    """

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
        (n, total) = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory_sink(
    df: DataFrame, query_name: str, output_mode: str = "append"
) -> None:
    """Drive a bounded file-stream to completion synchronously into a
    memory-sink table named ``query_name`` (test/demo harness)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    within: str = "1 hour",
    right_suffix: str = "_r",
) -> DataFrame:
    """C20-C24 capstone: stream-stream inner join with a time-range
    condition. Both sides are watermarked so Spark can bound the join
    state: a buffered left row is droppable once the right watermark
    passes its ts + ``within`` (and vice versa) — without the range
    bound the state would grow forever.

    Joins ``left.on == right.on AND right_ts ∈ [left_ts, left_ts +
    within]``. Right columns are suffixed to avoid collisions."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    for c in r.columns:
        r = r.withColumnRenamed(c, f"{c}{right_suffix}")
    cond = (
        (F.col(on) == F.col(f"{on}{right_suffix}"))
        & (F.col(f"{right_ts}{right_suffix}") >= F.col(left_ts))
        & (F.col(f"{right_ts}{right_suffix}") <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")


def streaming_cms_cells(
    stream: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 2048,
    lowercase: bool = True,
) -> DataFrame:
    """Streaming count-min sketch maintenance: because the batch CMS is
    pure relational algebra (operators/curation.cms_positions → a
    groupBy count whose cells relation IS the sketch), the STREAMING
    version is the same plan run as a streaming aggregation — Spark's
    state store keeps the ≤ depth×width running cells, each micro-batch
    folds in map-side, and the emitted table always equals the batch
    CMS over everything ingested so far (pinned by test). Bounded
    state by construction; no custom stateful operator needed."""
    from openetl_spark.operators.curation import cms_positions
    from openetl_spark.operators.text import tokens

    toks = tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, F.lower)
    return (
        stream.select(F.explode(toks).alias("token"))
        .select(F.explode(cms_positions(F.col("token"), depth, width)).alias("dp"))
        .select("dp.d", "dp.pos")
        .groupBy("d", "pos")
        .agg(F.count("*").alias("cell"))
    )


def streaming_rollup_cells(
    stream: DataFrame,
    width: str = "15 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Streaming maintenance of the continuous-aggregate partial cells
    (operators/timeseries.py): the same mergeable state vector —
    (bucket, keys…, count, sum, min, max) — run as a streaming
    aggregation, so Spark's state store keeps one running cell per
    (bucket, keys) and each micro-batch folds in map-side. In complete
    mode the emitted table always equals the batch
    ``partial_time_aggregate`` over everything ingested so far (pinned
    by test); with a ``watermark``, append mode emits each cell once
    its bucket closes — the production hypertable writer. Coarser
    resolutions never touch the stream: derive them from this table
    with ``timeseries.reaggregate`` (tested equal to a batch re-scan).
    avg is intentionally absent — it is not mergeable and is derived
    at read time."""
    src = stream.withWatermark(ts_col, watermark) if watermark else stream
    return (
        src.groupBy(F.window(ts_col, width).alias("_w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(F.col("_w.start").alias("bucket_start"), *keys,
                "n_events", "sum_value", "min_value", "max_value")
    )


TWA_SCHEMA = "user_id bigint, twa double, span_us bigint"
TWA_STATE_SCHEMA = (
    "has_last boolean, last_ts bigint, last_v double, wsum double, dtsum bigint"
)


def streaming_time_weighted(stream: DataFrame) -> DataFrame:
    """C24×C108: streaming twin of timeseries.time_weighted_avg — the
    per-key LOCF integral as an applyInPandasWithState accumulator.
    State per user is four scalars (last observation's epoch-µs and
    value, the running Σ value·Δt and Σ Δt); each micro-batch folds its
    rows in (ts, event_id) order into the state and emits the running
    time-weighted average. A row whose timestamp precedes the state's
    last processed observation (out-of-order arrival ACROSS
    micro-batches — within a batch the fold sorts) is a late arrival
    the LOCF integral cannot extend backwards; it is skipped rather
    than folded with a negative Δt (ADVICE r06: a negative dt would
    shrink dtsum and corrupt the integral). Σ Δt (emitted in exact
    microseconds) is therefore monotone non-decreasing across
    emissions, and STRICTLY increasing whenever arrivals carry
    distinct in-order timestamps — the condition the file-replay
    parity harness pins — so the freshest emission per key is the one
    with the largest span_us, which is what the batch-parity test keys
    on (a whole-second rendering could TIE across batches and make
    "freshest" ambiguous; review r06). Keys still holding a
    single observation have Δt-sum 0 and emit nothing (the batch
    operator drops them too: a TWA over a zero-length interval is
    undefined). A group's micro-batch rows arrive as MULTIPLE pandas
    chunks with no cross-chunk ordering (Arrow batch size), so the
    fold concatenates and sorts once per batch — per-key batch volume
    is the working set, the same bound the batch window carries. The
    "no previous observation" marker is an explicit state boolean,
    not a timestamp sentinel (pre-1970 events have negative µs).

    Micro-batch boundaries are invisible to the integral: the fold only
    ever looks at consecutive observations per key, so streamed ≡ batch
    whenever per-key arrival respects event-time order (the file-replay
    harness pins that; a production source uses watermarked reordering
    upstream or accepts LOCF over the arrival order).
    """

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
        has_last, last_ts, last_v, wsum, dtsum = (
            state.get if state.exists else (False, 0, 0.0, 0.0, 0)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        ordered = batch.sort_values(["mu", "event_id"])[["mu", "value"]]
        for mu, v in ordered.itertuples(index=False):
            if has_last:
                dt = int(mu) - last_ts
                if dt < 0:  # late cross-batch arrival: see docstring
                    continue
                wsum += last_v * dt
                dtsum += dt
            has_last, last_ts, last_v = True, int(mu), float(v)
        state.update((has_last, last_ts, last_v, wsum, dtsum))
        if dtsum > 0:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "twa": [wsum / dtsum],
                    "span_us": [dtsum],
                }
            )

    return (
        stream.select(
            "user_id", F.unix_micros("ts").alias("mu"), "value", "event_id"
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=TWA_SCHEMA,
            stateStructType=TWA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ATTR_SCHEMA = "user_id bigint, event_id bigint, channel string, value double"
ATTR_STATE_SCHEMA = "has_last boolean, last_ts bigint, touch string"


def streaming_last_touch(stream: DataFrame) -> DataFrame:
    """C24×C109: streaming twin of attribution_last_touch — per-key
    stateful credit assignment emitting one row PER PURCHASE as it
    arrives (append semantics), carrying the user's most recent
    preceding click/view channel ('direct' when none yet). State per
    user is three scalars: the last processed event's epoch-µs, and
    the current touch channel ('' = none — an explicit boolean marks
    "no event yet", the streaming_time_weighted sentinel discipline).

    The fold sorts each micro-batch's rows per key by (ts, event_id)
    once (Arrow chunks carry no cross-chunk order) and SKIPS rows
    older than the state's last processed timestamp — a late
    cross-batch arrival can neither retro-credit an already-emitted
    purchase nor resurrect a stale touch (the TWA late-row rule;
    equal-timestamp rows still fold, and the file-replay harness's
    range-partitioned batches keep same-(user, ts) rows in one batch
    where the in-batch sort orders them). Streamed output ≡ the batch
    window form whenever per-key arrival respects event-time order —
    pinned purchase-by-purchase by tests/test_streaming.py.
    """

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
        has_last, last_ts, touch = (
            state.get if state.exists else (False, 0, "")
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        ordered = batch.sort_values(["mu", "event_id"])[
            ["mu", "event_id", "event_type", "value"]
        ]
        out = []
        for mu, eid, etype, value in ordered.itertuples(index=False):
            if has_last and int(mu) < last_ts:
                continue  # late cross-batch arrival: see docstring
            if etype == "purchase":
                out.append(
                    (key[0], int(eid), touch if touch else "direct",
                     float(value))
                )
            elif etype in ("click", "view"):
                touch = etype
            has_last, last_ts = True, int(mu)
        state.update((has_last, last_ts, touch))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "event_id": [r[1] for r in out],
                    "channel": [r[2] for r in out],
                    "value": [r[3] for r in out],
                }
            )

    return (
        stream.select(
            "user_id",
            F.unix_micros("ts").alias("mu"),
            "event_id",
            "event_type",
            "value",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=ATTR_SCHEMA,
            stateStructType=ATTR_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_SCHEMA = "user_id bigint, step_idx int, step string, conv_usec bigint"
FUNNEL_STATE_SCHEMA = "cur int, t0 bigint, t_last bigint"


def streaming_funnel(
    stream: DataFrame,
    steps: list[str],
    window_sec: int | None = None,
) -> DataFrame:
    """C24×C148: stateful streaming twin of the strict-order funnel —
    the funnel has NO mergeable-cell decomposition (step k's anchor
    depends on step k−1's FINAL value across all batches, unlike the
    cohort matrix's min-anchors + distinct cells), so its streaming
    form is per-user STATE: (steps completed, first-step epoch-µs,
    last-completed-step epoch-µs), three scalars per user, advanced by
    folding each micro-batch's rows in (ts, event_id) order.

    An advance emits exactly one append row (user_id, step_idx, step,
    conv_usec = t_step − t_first in exact µs) at the moment it
    happens — the union of emissions across all batches equals the
    batch operator's per-user relation, because a scan in event-time
    order advancing only on the next needed step type reproduces the
    batch recurrence exactly: the first step-k event strictly after
    t_{k−1} encountered in time order IS min{ts > t_{k−1}} (and the
    journey window ts − t0 ≤ W only ever grows, so a violating path
    stays violated). Parity therefore holds whenever per-key arrival
    respects event-time order — the same contract as
    streaming_time_weighted (watermarked reordering upstream, or the
    file-replay harness's range-partitioned files); a cross-batch
    late arrival of an EARLIER step cannot retroactively rewind the
    anchor and is skipped by the strict ts > t_last guard.

    State is three scalars per user forever (never the event
    history); per-batch work is the batch's own rows, sorted once per
    key (Arrow chunks carry no cross-chunk order).
    """
    if len(steps) < 2:
        raise ValueError(f"streaming_funnel: need >= 2 steps, got {steps}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"streaming_funnel: duplicate step names in {steps}")
    step_list = list(steps)
    wus = None if window_sec is None else int(window_sec) * 1_000_000

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
        cur, t0, t_last = state.get if state.exists else (0, 0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        ordered = batch.sort_values(["mu", "event_id"])[["mu", "event_type"]]
        rows = []
        for mu, et in ordered.itertuples(index=False):
            if cur >= len(step_list):
                break
            if et != step_list[cur]:
                continue
            mu = int(mu)
            if cur == 0:
                cur, t0, t_last = 1, mu, mu
                rows.append((key[0], 1, step_list[0], 0))
                continue
            if mu <= t_last:
                continue
            if wus is not None and mu - t0 > wus:
                continue
            cur, t_last = cur + 1, mu
            rows.append((key[0], cur, step_list[cur - 1], mu - t0))
        state.update((cur, t0, t_last))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "step_idx", "step", "conv_usec"]
            )

    return (
        stream.select(
            "user_id",
            F.unix_micros("ts").alias("mu"),
            "event_type",
            "event_id",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_SCHEMA = "user_id bigint, event_id bigint, xi bigint, ewma_k bigint"
EWMA_STATE_SCHEMA = "s bigint"


def streaming_ewma(
    stream: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 2,
    scale_bits: int = 20,
) -> DataFrame:
    """C24×C162: stateful streaming twin of the fixed-point EWMA scan.
    Like the funnel (and unlike the mergeable cell logs), the
    recursion has no per-batch decomposition — s_t depends on the
    FINAL smoothed value across all prior batches — so the streaming
    form is per-user STATE: the single fixed-point integer s,
    advanced by folding each micro-batch's rows in (ts, event_id)
    order. Each input event emits exactly one append row carrying its
    smoothed value, and the union of emissions across batches equals
    ``timeseries.ewma_fixed_point`` on the same events whenever
    per-key arrival respects event-time order (the
    streaming_funnel/streaming_time_weighted contract: watermarked
    reordering upstream, or the replay harness's range-partitioned
    files) — the fold is literally the batch recurrence.

    State is ONE integer per series forever; per-batch work is the
    batch's own rows sorted once per key (Arrow chunks carry no
    cross-chunk order). Values are quantized upstream of the state
    fold: xi = floor(value·100), the C162 discipline (negative inputs
    raise — floor-division semantics diverge below zero).
    """
    if not (0 < alpha_num <= alpha_den):
        raise ValueError(
            f"streaming_ewma: need 0 < alpha_num <= alpha_den, got "
            f"{alpha_num}/{alpha_den}"
        )
    k = 1 << scale_bits

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
        s = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        ordered = batch.sort_values(["mu", "event_id"])[["event_id", "xi"]]
        rows = []
        for eid, x in ordered.itertuples(index=False):
            xi = int(x)
            if xi < 0:
                raise ValueError(
                    "streaming_ewma: negative input — floor-division "
                    "semantics diverge across engines below zero"
                )
            s = (
                xi * k
                if s is None
                else (alpha_num * xi * k + (alpha_den - alpha_num) * s)
                // alpha_den
            )
            rows.append((key[0], int(eid), xi, s))
        state.update((s,))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "event_id", "xi", "ewma_k"]
            )

    return (
        stream.select(
            "user_id",
            F.unix_micros("ts").alias("mu"),
            "event_id",
            F.floor(F.col("value") * 100).cast("bigint").alias("xi"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=EWMA_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_SCHEMA = (
    "user_id bigint, event_id bigint, c bigint, cusum_g bigint, alarm boolean"
)
CUSUM_STATE_SCHEMA = "g bigint"


def streaming_cusum(
    stream: DataFrame,
    mu: DataFrame,
    slack: int,
    threshold: int,
) -> DataFrame:
    """C24×C163: stateful streaming twin of the CUSUM scan — one
    bigint of per-series state (the current g), the streaming_ewma
    contract verbatim (per-key event-time arrival ⇒ the fold IS the
    batch recurrence; one append row per event).

    ``mu``: the per-key in-control level (user_id, mu) as a STATIC
    relation, stream-static joined per micro-batch — the standard
    deployment shape (the level is fitted on history, the stream is
    monitored against it). The batch operator centers against the
    same relation, so parity is exact.
    """

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
        g = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        ordered = batch.sort_values(["mu_us", "event_id"])[["event_id", "c"]]
        rows = []
        for eid, c in ordered.itertuples(index=False):
            g = max(0, g + (int(c) - slack))
            rows.append((key[0], int(eid), int(c), g, g > threshold))
        state.update((g,))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "event_id", "c", "cusum_g", "alarm"]
            )

    centered = (
        stream.select(
            "user_id",
            F.unix_micros("ts").alias("mu_us"),
            "event_id",
            F.floor(F.col("value") * 100).cast("bigint").alias("xi"),
        )
        .join(mu, "user_id")
        .select(
            "user_id", "mu_us", "event_id",
            (F.col("xi") - F.col("mu")).alias("c"),
        )
    )
    return centered.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
