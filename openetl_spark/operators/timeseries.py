"""Hypertable-style continuous aggregates (time-series rollups).

The reference has no time-series surface at all (no date arithmetic
exists anywhere under `/root/reference/src`); this module is part of
the Spark-native extension surface (SURVEY.md §2C, event analytics).
It implements the *mergeable rollup* pattern popularized by
TimescaleDB's continuous aggregates and Druid/Pinot rollup ingestion:

1. ``partial_time_aggregate`` — one scan of the raw event stream
   produces fine-grained PARTIAL cells ``(bucket, keys…, count, sum,
   min, max)``. Every cell is a mergeable summary: count/sum re-add,
   min/max re-min/max. This is the relation a production deployment
   persists (and maintains incrementally with Structured Streaming —
   the cells are exactly a streaming-aggregation state snapshot).
2. ``reaggregate`` — coarser resolutions (hour, day, …) are derived by
   re-aggregating the partial cells, never by re-scanning raw data.
   At 100 TB of events the hourly/daily levels read a few thousand
   partial rows per key instead of the raw corpus: the scan cost of
   every additional resolution is proportional to the CELL count of
   the next-finer level, not the event count.
3. ``multi_resolution`` — the union of all levels tagged with a
   resolution label, one lazy plan, the fine scan shared by every
   level (Spark executes the raw scan once per union branch unless
   cached; the PLAN reuse is the point — production persists step 1).

Average is intentionally NOT a partial cell: avg is not mergeable, so
it is derived (``sum/count``) at read time at every resolution — the
classic mergeable-summary discipline (same reason the histogram /
CMS / SpaceSaving operators in this repo carry mergeable state).

Correctness contract: the catalog's ``multires_rollup`` oracle computes
every resolution DIRECTLY from the raw table in DuckDB, so the test
proves re-aggregation ≡ re-scan (not merely that both engines ran the
same two-step plan).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, LongType, StructType

__all__ = [
    "partial_time_aggregate",
    "reaggregate",
    "multi_resolution",
    "anomalous_buckets",
    "gap_fill",
    "seasonal_anomalies",
]

#: partial-cell column names (the mergeable state vector)
_CELLS = ("n_events", "sum_value", "min_value", "max_value")


def partial_time_aggregate(
    df: DataFrame,
    width: str,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = (),
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """One raw scan → fine-grained mergeable partial cells.

    ``width`` is a Spark window width (e.g. ``'15 minutes'``). Buckets
    are epoch-aligned tumbling windows (``F.window``), matching
    DuckDB's ``time_bucket``. Spark plans this as a partial+final hash
    aggregate — map-side combine collapses each input split to at most
    one row per (bucket, keys) before the shuffle."""
    w = F.window(ts_col, width)
    return (
        df.groupBy(w.alias("_w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(F.col("_w.start").alias(bucket_col), *keys, *_CELLS)
    )


def reaggregate(
    partials: DataFrame,
    trunc: str,
    keys: tuple[str, ...] = (),
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Derive a coarser resolution from partial cells ONLY (no raw
    scan): counts and sums re-add, min/max re-min/max. ``trunc`` is a
    ``date_trunc`` unit (``'hour'``, ``'day'``, …) — valid whenever the
    fine bucket width divides the coarse one and both are epoch-aligned
    (15 min → hour → day all qualify)."""
    return (
        partials.groupBy(
            F.date_trunc(trunc, F.col(bucket_col)).alias(bucket_col), *keys
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def multi_resolution(
    df: DataFrame,
    levels: tuple[tuple[str, str | None], ...] = (
        ("15m", None),
        ("1h", "hour"),
        ("1d", "day"),
    ),
    fine_width: str = "15 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """The full continuous-aggregate ladder as one DataFrame: the fine
    level from one raw scan, every coarser level re-aggregated from the
    fine cells, unioned with a ``resolution`` tag. ``levels`` is
    ``(label, date_trunc_unit)`` with ``None`` marking the fine level.
    Derived (non-mergeable) metrics are added uniformly at the end."""
    fine = partial_time_aggregate(df, fine_width, ts_col, value_col, keys)
    parts = []
    for label, unit in levels:
        lvl = fine if unit is None else reaggregate(fine, unit, keys)
        parts.append(lvl.select(F.lit(label).alias("resolution"), "*"))
    out = reduce(DataFrame.unionByName, parts)
    # avg is derived from the ROUNDED sum via floor-based fixed-point
    # (4 implied decimals): re-aggregated and re-scanned sums agree
    # only to fp noise, so the quotient must start from identical
    # inputs — and `round()` itself is engine-divergent at exact .5
    # decimal boundaries (Spark HALF_UPs the shortest decimal rendering
    # of the double, DuckDB rounds the binary value; 307.03/8 =
    # 38.37875 flips the 4th decimal). floor of the same IEEE double is
    # bit-deterministic everywhere.
    sum_r = F.round("sum_value", 2)
    avg4 = F.floor(sum_r * 10000.0 / F.col("n_events")) / 10000.0
    return out.select(
        "resolution",
        "bucket_start",
        *keys,
        "n_events",
        sum_r.alias("sum_value"),
        F.round("min_value", 2).alias("min_value"),
        F.round("max_value", 2).alias("max_value"),
        avg4.alias("avg_value"),
    )


def anomalous_buckets(
    cells: DataFrame,
    by: tuple[str, ...] = ("event_type",),
    metric: str = "sum_value",
    threshold: float = 2.5,
    bucket_col: str = "bucket_start",
    round_dp: int = 2,
) -> DataFrame:
    """Z-score anomaly detection over continuous-aggregate cells — the
    standard monitoring read on a hypertable: per group, flag buckets
    whose metric deviates more than ``threshold`` standard deviations
    from the group mean. Inputs are the (tiny) cell relation, never raw
    events, so the whole detection pass costs one scan of the rollup
    regardless of corpus size; the per-group stats relation is
    broadcast back onto the cells.

    Mean/stddev are spelled out as explicit moment expressions
    (sqrt(E[x²] − E[x]²)) rather than builtin stddev so the DuckDB
    oracle computes the bit-identical formula; the flag tests the
    ROUNDED z-score so membership does not ride on fp noise at the
    threshold."""
    x = F.col(metric)
    stats = cells.groupBy(*by).agg(
        (F.sum(x) / F.count("*")).alias("_mean"),
        F.sqrt(
            F.sum(x * x) / F.count("*")
            - (F.sum(x) / F.count("*")) * (F.sum(x) / F.count("*"))
        ).alias("_std"),
    )
    z = F.round((x - F.col("_mean")) / F.col("_std"), round_dp)
    return (
        cells.join(F.broadcast(stats), list(by))
        .filter(F.col("_std") > 0)
        .select(*by, bucket_col, "n_events", F.round(x, 2).alias(metric),
                z.alias("z_score"))
        .filter(F.abs(F.col("z_score")) > threshold)
    )


def scd2_history(
    df,
    key_col: str,
    attr_col: str,
    ts_col: str = "ts",
    tie_col: str | None = None,
):
    """Build a type-2 slowly-changing-dimension history from an event
    stream: one row per (key, attribute-value run) with
    [valid_from, valid_to) interval and an is_current flag — the
    standard warehouse shape for "what was this entity's attribute at
    time T" lookups (pair with the as-of join for point-in-time
    reads).

    Two key-partitioned windows (lag to detect changes, lead to close
    intervals) — the key is maximally high-cardinality (users/
    entities), so partitions stay small at any history length; no
    other shuffle. ``tie_col`` breaks equal-timestamp ordering
    deterministically (required for an oracle-stable result when a key
    has same-instant events)."""
    from pyspark.sql import Window as W

    order = [F.col(ts_col).asc()] + (
        [F.col(tie_col).asc()] if tie_col else []
    )
    w = W.partitionBy(key_col).orderBy(*order)
    changes = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col))
        )
    )
    return (
        changes.withColumn("valid_to", F.lead(ts_col).over(w))
        .select(
            key_col,
            F.col(attr_col),
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def gap_fill(
    df: DataFrame,
    width: str = "15 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    bucket_col: str = "bucket_start",
    round_dp: int = 4,
) -> DataFrame:
    """Gap-filled continuous aggregate with linear interpolation — the
    TimescaleDB ``time_bucket_gapfill`` + ``interpolate`` verb: per key
    group, emit EVERY bucket of the [min, max] grid; buckets with no
    events carry n_events = 0 and a value-sum linearly interpolated
    between the nearest present neighbors ((t−t₀)/(t₁−t₀) on epoch
    seconds — the identical expression tree a DuckDB oracle computes);
    leading/trailing gaps, having only one neighbor, stay NULL. The
    ``filled`` flag marks synthesized rows.

    Scale shape: the grid derives from the CELL relation (per-key
    min/max + one sequence explode — span/width rows per key, cell
    scale, never event scale), the neighbor search is two
    ignore-nulls window passes keyed on the group, and window
    partitions are grid-sized per key (a year of 15-min buckets is
    ~35k rows), never corpus-sized."""
    from pyspark.sql import Window as W

    # bucket sums round BEFORE interpolation: engines sum a bucket's
    # events in different orders (last-ulp noise), and the (t−t₀)/(t₁−t₀)
    # division amplifies an ulp into the output's 4th decimal — rounding
    # the inputs pins both engines to identical interpolants
    #
    # localCheckpoint: the cell relation feeds TWO consumers (the
    # per-key span derivation and the grid left-join); left lazy, each
    # re-ran the full event-scale scan+aggregate (r12 plan: two
    # parquet scans, two Exchanges). Cells are bucket-cardinality-sized
    # — span/width rows per key — so materializing them is cell-scale
    # cheap and the corpus pays ONE aggregation pass.
    cells = partial_time_aggregate(df, width, ts_col, value_col, keys).select(
        bucket_col, *keys, "n_events",
        F.round("sum_value", round_dp).alias("sum_value"),
    ).localCheckpoint()
    spans = cells.groupBy(*keys).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {width}"))
        ).alias(bucket_col),
    )
    j = grid.join(cells, [*keys, bucket_col], "left")
    # (epoch, value) of the nearest PRESENT row on each side; the struct
    # is NULL on gap rows so ignore-nulls last/first skips them
    point = F.when(
        F.col("sum_value").isNotNull(),
        F.struct(
            F.unix_timestamp(F.col(bucket_col).cast("timestamp")).alias("t"),
            F.col("sum_value").alias("v"),
        ),
    )
    order = W.partitionBy(*keys).orderBy(bucket_col)
    # Evaluate each window function ONCE and reference the resulting
    # attribute: inlining `prev`/`nxt` into every field access made
    # Catalyst emit EIGHT running window aggregates (5× last + 3×
    # first over identical frames — r12 plan) where two suffice; the
    # shared columns also keep the pre-window Sort payload narrow.
    j = j.withColumn(
        "_prev",
        F.last(point, ignorenulls=True).over(
            order.rowsBetween(W.unboundedPreceding, -1)
        ),
    ).withColumn(
        "_nxt",
        F.first(point, ignorenulls=True).over(
            order.rowsBetween(1, W.unboundedFollowing)
        ),
    )
    prev, nxt = F.col("_prev"), F.col("_nxt")
    t = F.unix_timestamp(F.col(bucket_col).cast("timestamp"))
    interp = prev["v"] + (nxt["v"] - prev["v"]) * (t - prev["t"]) / (
        nxt["t"] - prev["t"]
    )
    # floor-based half-up rounding, NOT F.round: a single-bucket gap
    # interpolates to the exact midpoint of two 4-dp neighbors — a
    # 5th-digit-5 value where Spark's round (HALF_UP on the decimal
    # rendering) and DuckDB's (nearest on the binary double) disagree.
    # floor(x·10⁴ + 0.5)/10⁴ is the same IEEE ops in both engines.
    scale = float(10 ** round_dp)
    value = F.when(F.col("sum_value").isNotNull(), F.col("sum_value")).otherwise(
        F.when(prev.isNotNull() & nxt.isNotNull(), interp)
    )
    rounded = F.floor(value * scale + F.lit(0.5)) / scale
    return j.select(
        *keys,
        F.col(bucket_col),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        rounded.alias("sum_value"),
        F.col("sum_value").isNull().alias("filled"),
    )


def seasonal_anomalies(
    df: DataFrame,
    width: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    threshold: float = 2.0,
    round_dp: int = 2,
) -> DataFrame:
    """Seasonal z-score anomalies: like ``anomalous_buckets`` but the
    baseline is per (key, HOUR-OF-DAY) instead of a single per-key
    global — a traffic spike at 3am is anomalous even when the same
    volume at noon is routine (the seasonal-naive baseline, the first
    thing real monitoring adds after the global z). Runs entirely on
    the CELL relation: one rollup scan, a (key × 24)-row stats
    broadcast, moments as explicit expressions, round-then-compare
    flags — the oracle computes the bit-identical formula."""
    cells = partial_time_aggregate(df, width, ts_col, value_col, keys)
    hod = F.hour(F.col("bucket_start"))
    x = F.col("sum_value")
    # E[x²]−E[x]² can land at ±1e-18 for near-constant groups (the
    # per-hod slices are small): one engine would get a tiny positive
    # std and emit exploded z rows, the other a NaN sqrt — rounding
    # the variance at 6 dp BEFORE sqrt pins both to the same zero
    # (review finding r05). round() is safe here: a variance landing
    # exactly on a .5×10⁻⁶ boundary is measure-zero for sums of
    # continuous values, unlike the ratio-of-integers panels.
    var = F.round(
        F.sum(x * x) / F.count("*")
        - (F.sum(x) / F.count("*")) * (F.sum(x) / F.count("*")),
        6,
    )
    stats = (
        cells.withColumn("_hod", hod)
        .groupBy(*keys, "_hod")
        .agg(
            (F.sum(x) / F.count("*")).alias("_mean"),
            F.sqrt(F.greatest(var, F.lit(0.0))).alias("_std"),
            F.count("*").alias("_n"),
        )
    )
    z = F.round((x - F.col("_mean")) / F.col("_std"), round_dp)
    return (
        cells.withColumn("_hod", hod)
        .join(F.broadcast(stats), [*keys, "_hod"])
        .filter((F.col("_std") > 0) & (F.col("_n") >= 3))
        .select(
            *keys,
            F.col("bucket_start"),
            F.col("_hod").cast("int").alias("hour_of_day"),
            "n_events",
            F.round(x, 2).alias("sum_value"),
            z.alias("z_score"),
        )
        .filter(F.abs(F.col("z_score")) > threshold)
    )


def time_weighted_avg(
    df: DataFrame,
    keys: list[str],
    ts: str = "ts",
    value: str = "value",
    order_tiebreak: list[str] | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Time-weighted average per key — TimescaleDB ``time_weight('LOCF',
    …)`` semantics: each observation holds its value until the next one
    (last-observation-carried-forward), so the average weights every
    value by the duration it was current, not by sample count. The
    correct mean for irregularly sampled series (a sensor reporting
    10× more often while idle would drag a plain avg toward idle).

    One keyed window (lead over (ts, tiebreak) — high-cardinality
    partition key, single shuffle spread across the cluster) plus a
    partial-aggregated groupBy. The final observation of each key has
    no successor and carries zero weight (the window is closed at the
    last sample — Timescale's LOCF does the same unless given an
    explicit interval end). Keys with a single observation have zero
    total weight and are dropped (a TWA over a zero-length interval is
    undefined). Deltas are computed in epoch microseconds (exact
    integers cross-engine); the final ratio rounds via the fixed
    floor(x·10^dp + .5) so both engines render identical doubles.
    """
    from pyspark.sql import Window as W

    from openetl_spark.operators.text import _round_fixed

    tie = order_tiebreak or []
    w = W.partitionBy(*keys).orderBy(ts, *tie)
    mu = F.unix_micros(F.col(ts).cast("timestamp"))
    delta = (F.lead(mu).over(w) - mu).cast("double").alias("_dt")
    obs = df.select(*keys, F.col(value).alias("_v"), delta).filter(
        F.col("_dt").isNotNull()
    )
    return (
        obs.groupBy(*keys)
        .agg(
            _round_fixed(F.sum(F.col("_v") * F.col("_dt")) / F.sum("_dt"), round_dp).alias(
                "twa"
            ),
            F.floor(F.sum("_dt") / F.lit(1000000.0)).cast("bigint").alias("span_s"),
            F.sum("_dt").alias("_total_dt"),
        )
        .filter(F.col("_total_dt") > 0)
        .drop("_total_dt")
    )


def ewma_fixed_point(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    x_col: str = "xi",
    alpha_num: int = 1,
    alpha_den: int = 2,
    scale_bits: int = 20,
) -> DataFrame:
    """Per-series exponentially-weighted moving average in EXACT
    fixed-point integers — the sequential-stateful scan that has no
    closed DataFrame form (each floor interleaves with the next
    recursion step, so prefix tricks like Σ α(1-α)^i·x cannot
    reproduce it): s_1 = x_1·K, s_t = (a·x_t·K + (b-a)·s_{t-1}) div b
    with α = a/b and K = 2^scale_bits. Every step is bounded integer
    arithmetic with floor division, so the relation is bit-identical
    in any engine — the DuckDB oracle replays the recursion as a
    recursive CTE over the per-series row_number.

    Spark shape (r12 optimization, guide §4.5): ONE shuffle on the
    high-cardinality series key (``repartition``), the per-series
    ordering done ONCE in the JVM (``sortWithinPartitions`` — codegen
    sort, not a per-group pandas ``sort_values``), then a single
    ``mapInPandas`` pass per partition that resets state at series
    boundaries and carries it across Arrow batches. The earlier
    ``groupBy().applyInPandas`` shape paid one Python call + pandas
    sort + frame copy per GROUP; this pays them per PARTITION while
    computing the identical recursion (the multimodal decode-loop
    precedent: per-row Python inside the Arrow batch is what the
    ladder prescribes when built-ins can't express the semantics).
    State per series is one integer.

    ``x_col`` must already be an exact nonnegative bigint (quantize
    floats with floor(x·scale) BEFORE calling — cross-engine float→int
    casts disagree, and Python's floor-div and DuckDB's ``//``
    disagree on NEGATIVES, so both are guarded: negative inputs
    raise here and via error() in the paired oracles).
    """
    from collections.abc import Iterator

    import pandas as pd

    if not (0 < alpha_num <= alpha_den):
        raise ValueError(
            f"ewma_fixed_point: need 0 < alpha_num <= alpha_den, got "
            f"{alpha_num}/{alpha_den}"
        )
    k = 1 << scale_bits
    a, d_ = alpha_num, alpha_den
    keep = [key_col, *order_cols, x_col]
    fields = [df.schema[c] for c in keep]
    out_schema = StructType(fields).add("ewma_k", LongType())

    def smooth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key, s = object(), None  # sentinel ≠ any real key
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            out = []
            for key, x in zip(keys, pdf[x_col].to_numpy()):
                xi = int(x)
                if xi < 0:
                    raise ValueError(
                        "ewma_fixed_point: negative input — floor-division "
                        "semantics diverge across engines below zero"
                    )
                if key != cur_key:
                    cur_key, s = key, xi * k
                else:
                    s = (a * xi * k + (d_ - a) * s) // d_
                out.append(s)
            pdf = pdf[keep].copy()
            pdf["ewma_k"] = pd.array(out, dtype="int64")
            yield pdf

    return (
        df.select(*keep)
        .repartition(key_col)
        .sortWithinPartitions(key_col, *order_cols)
        .mapInPandas(smooth, out_schema)
    )


def cusum_fixed_point(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    x_col: str = "xi",
    target: int = 0,
    slack: int = 0,
    threshold: int = 0,
) -> DataFrame:
    """One-sided (upper) CUSUM change-point statistic per series (Page
    1954 — the sequential-detection classic next to the EWMA scan):
    g_t = max(0, g_{t-1} + (x_t − target − slack)), alarm when
    g_t > threshold. All parameters and state are exact integers on
    the caller's quantized scale, so the relation is bit-identical
    cross-engine (max and + have no rounding at all — unlike the EWMA
    there is not even a floor division); the paired oracle replays
    the recursion as a recursive CTE.

    Same scale shape as ``ewma_fixed_point`` (r12: one JVM
    repartition + sortWithinPartitions, one ``mapInPandas`` partition
    scan with per-series state reset — not a per-group grouped map),
    one integer of state. Emits (…, cusum_g, alarm) per input row;
    g is NOT reset at alarms (the report form — consumers segment on
    the alarm column; a resetting variant is one line here but a
    different relation).
    """
    from collections.abc import Iterator

    import pandas as pd

    keep = [key_col, *order_cols, x_col]
    fields = [df.schema[c] for c in keep]
    out_schema = (
        StructType(fields).add("cusum_g", LongType()).add("alarm", BooleanType())
    )
    off = target + slack

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key, g = object(), 0
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            out = []
            for key, x in zip(keys, pdf[x_col].to_numpy()):
                if key != cur_key:
                    cur_key, g = key, 0
                g = max(0, g + (int(x) - off))
                out.append(g)
            pdf = pdf[keep].copy()
            pdf["cusum_g"] = pd.array(out, dtype="int64")
            pdf["alarm"] = pdf["cusum_g"] > threshold
            yield pdf

    return (
        df.select(*keep)
        .repartition(key_col)
        .sortWithinPartitions(key_col, *order_cols)
        .mapInPandas(scan, out_schema)
    )


#: Offset making every Holt division operate on a POSITIVE numerator:
#: python's // floors while SQL's // truncates toward zero, and they
#: only agree above zero — floor(y/d) == (y + M*d)//d - M for any y
#: once y + M*d > 0. |level diffs| and |trends| stay far below M.
HOLT_SHIFT = 1 << 41


def holt_fixed_point(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    x_col: str = "xi",
    alpha: tuple[int, int] = (1, 2),
    beta: tuple[int, int] = (1, 2),
    scale_bits: int = 20,
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend; Holt 1957)
    per series in EXACT fixed-point integers — the two-state
    extension of ``ewma_fixed_point``:

        l_t = (a_n·x_t·K + (a_d−a_n)·(l_{t−1}+b_{t−1})) fdiv a_d
        b_t = (b_n·(l_t − l_{t−1}) + (b_d−b_n)·b_{t−1}) fdiv b_d

    with l_1 = x_1·K, b_1 = 0. The trend numerator can be NEGATIVE
    (a falling series), where python floor-division and SQL ``//``
    disagree — every fdiv is therefore rendered with the HOLT_SHIFT
    offset ((y + M·d) div d − M), which keeps the divided quantity
    positive so truncation IS floor in both engines; the paired
    oracle replays the identical shifted recursion. Inputs must be
    nonnegative (same guard as the EWMA).

    Same scale shape (r12: one JVM repartition + sortWithinPartitions,
    one ``mapInPandas`` partition scan with per-series state reset —
    not a per-group grouped map), two integers of state.
    """
    from collections.abc import Iterator

    import pandas as pd

    for name, (n_, d_) in (("alpha", alpha), ("beta", beta)):
        if not (0 < n_ <= d_):
            raise ValueError(
                f"holt_fixed_point: need 0 < {name}_num <= {name}_den, "
                f"got {n_}/{d_}"
            )
    k = 1 << scale_bits
    an, ad = alpha
    bn, bd = beta
    m = HOLT_SHIFT

    def fdiv(y: int, d: int) -> int:
        return (y + m * d) // d - m

    keep = [key_col, *order_cols, x_col]
    fields = [df.schema[c] for c in keep]
    out_schema = (
        StructType(fields).add("level_k", LongType()).add("trend_k", LongType())
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key, lv, tr = object(), 0, 0
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            lvs, trs = [], []
            for key, x in zip(keys, pdf[x_col].to_numpy()):
                xi = int(x)
                if xi < 0:
                    raise ValueError(
                        "holt_fixed_point: negative input — see "
                        "ewma_fixed_point"
                    )
                if key != cur_key:
                    cur_key, lv, tr = key, xi * k, 0
                else:
                    prev = lv
                    lv = fdiv(an * xi * k + (ad - an) * (lv + tr), ad)
                    tr = fdiv(bn * (lv - prev) + (bd - bn) * tr, bd)
                lvs.append(lv)
                trs.append(tr)
            pdf = pdf[keep].copy()
            pdf["level_k"] = pd.array(lvs, dtype="int64")
            pdf["trend_k"] = pd.array(trs, dtype="int64")
            yield pdf

    return (
        df.select(*keep)
        .repartition(key_col)
        .sortWithinPartitions(key_col, *order_cols)
        .mapInPandas(scan, out_schema)
    )
