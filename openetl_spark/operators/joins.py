"""Join operators Spark lacks natively: as-of join and range join.

The reference implements no joins at all (SURVEY.md §2C C1-C6 — it
delegates everything relational to the backing store). These two are
the genuinely custom compositions (SURVEY.md §7 watch-list #4); plain
equi/semi/anti/cross joins are native ``df.join`` and appear only in
the query catalog.

Scale design:

* ``asof_join`` uses the union+window technique: tag both sides, union
  on aligned columns, one window over (keys, ts) carrying the last
  right-side value forward. Cost = ONE shuffle by key (the window),
  versus a naive range join's O(n·m) BNLJ blowup per key. This is the
  plan that survives 100 TB: no cross product ever materializes.
* ``range_join`` offers bucketed mode: bucketize the range key to an
  equi-join key so Catalyst plans a shuffled hash/sort-merge join on
  (keys, bucket) and the residual range predicate filters after —
  turning an O(n·m) nested loop into O(matches) with bounded bucket
  fan-out. Without buckets Spark would BNLJ any pure range predicate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the nearest prior (``backward``) or next
    (``forward``) right-side row per key group (≈ pandas merge_asof,
    DuckDB ASOF JOIN). Ties (right_ts == left_ts) match.

    Returns all left columns plus ``{v}{suffix}`` for each value col and
    ``{right_ts}{suffix}`` (the matched timestamp).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != right_ts]

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    ts_out = f"{right_ts}{suffix}"
    # Align the union schema: keys + event time + tag + left payload +
    # ONE struct carrying the whole right payload. The struct matters:
    # picking value columns independently with last(ignorenulls) would
    # conflate genuine right-side nulls with the left rows' placeholder
    # nulls and stitch together fields from DIFFERENT right rows; the
    # struct is carried atomically, so the matched row stays one row.
    lpay = [c for c in left.columns if c not in keys and c != left_ts]
    r_struct_type = (
        "struct<"
        + ",".join(
            [f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in value_cols]
            + [f"__ts:{right.schema[right_ts].dataType.simpleString()}"]
        )
        + ">"
    )
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lpay],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        F.struct(
            *[F.col(c) for c in value_cols], F.col(right_ts).alias("__ts")
        ).alias("_r"),
    )
    u = l_side.unionByName(r_side)

    if direction == "backward":
        # Right rows sort before left rows at equal ts so ties match.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        picked = F.last("_r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_is_left").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        picked = F.first("_r", ignorenulls=True).over(w)

    out = u.select(
        *keys,
        F.col("_t").alias(left_ts),
        F.col("_is_left"),
        *lpay,
        *[picked[c].alias(f"{c}{suffix}") for c in value_cols],
        picked["__ts"].alias(ts_out),
    )
    return out.filter(F.col("_is_left") == 1).drop("_is_left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | None,
    left_point: str,
    right_lo,
    right_hi,
    bucket_width: float | str | None = None,
) -> DataFrame:
    """Join where ``left.left_point BETWEEN right_lo AND right_hi``
    (bounds are Column expressions over the right side), optionally
    with equi-keys ``on``.

    With ``bucket_width`` set (numeric width, or seconds for
    timestamps), both sides get bucket keys and the join runs as an
    equi-join on (keys, bucket) with the exact predicate as a residual
    filter — each right interval expands to ceil(span/width)+1 buckets,
    so pick a width near the typical interval span.
    """
    keys = list(on) if on else []
    lo_c = right_lo if not isinstance(right_lo, str) else F.col(right_lo)
    hi_c = right_hi if not isinstance(right_hi, str) else F.col(right_hi)
    point = F.col(left_point)

    if bucket_width is None:
        cond = (point >= lo_c) & (point <= hi_c)
        for k in keys:
            cond = cond & (left[k] == right[k])
        return left.join(right, cond)

    w = float(bucket_width)

    def to_num(df_, name, c):
        # Timestamps bucket on epoch seconds; numerics on their value.
        if _is_ts(df_, name):
            return c.cast("timestamp").cast("double")
        return c.cast("double")

    point_num = to_num(left, left_point, point)
    l2 = left.withColumn("_b", F.floor(point_num / F.lit(w)).cast("long"))
    span_lo = to_num(right, right_lo, lo_c)
    span_hi = to_num(right, right_hi, hi_c)
    r2 = right.withColumn(
        "_bs",
        F.sequence(
            F.floor(span_lo / F.lit(w)).cast("long"), F.floor(span_hi / F.lit(w)).cast("long")
        ),
    ).withColumn("_b", F.explode("_bs")).drop("_bs")

    cond = l2["_b"] == r2["_b"]
    for k in keys:
        cond = cond & (l2[k] == r2[k])
    joined = l2.join(r2, cond).filter((point >= lo_c) & (point <= hi_c))
    return joined.drop("_b")


def _is_ts(df: DataFrame, col) -> bool:
    if not isinstance(col, str):
        return False
    t = dict(df.dtypes).get(col, "")
    return t.startswith("timestamp")
