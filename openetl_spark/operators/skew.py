"""Skew-handling helpers for large joins (SURVEY.md §7 step 7).

AQE's skew-join splitting (on by default in the session factory)
handles sort-merge skew at runtime; this module covers the cases AQE
can't: broadcast-ineligible dimension joins against a fact table whose
key distribution is pathological (one tenant/user/null-bucket owning a
double-digit percentage of rows).

``salted_join`` replicates the *small* side ``salt`` ways and
scatters the fact side's hot keys across salt buckets, so no single
reducer receives a hot key's full volume. Cost: small side × salt
(bounded, choose salt ≈ executor count), one fact-side column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt: int, out: str = "_salt") -> DataFrame:
    """Uniform random-ish salt derived from a stable row hash (no RNG:
    deterministic across retries, which matters for task re-execution)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(out, F.pmod(h, F.lit(salt)).cast("int"))


def explode_salt(df: DataFrame, salt: int, out: str = "_salt") -> DataFrame:
    """Replicate each row ``salt`` times with salt values 0..salt-1
    (applied to the SMALL side of a salted join)."""
    return df.withColumn(
        out, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim on fact[on] == dim[on]`` with the join key
    salted: fact rows scatter across ``salt`` buckets, dim rows
    replicate into every bucket. Result is identical to the plain join
    for inner/left joins; the shuffle for any single key is spread over
    ``salt`` reducers.

    Right/full-outer are rejected: an unmatched dim row would surface
    once per salt bucket (``salt`` duplicates) — use AQE skew handling
    for outer joins instead."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "replicated dim rows would duplicate unmatched right-side output"
        )
    f = with_salt(fact, salt)
    d = explode_salt(dim, salt)
    out = f.join(d, [on, "_salt"], how)
    return out.drop("_salt")


def broadcast_if_small(df: DataFrame, max_bytes: int = 64 << 20) -> DataFrame:
    """Broadcast hint guarded by Catalyst's own size estimate: a
    user-supplied "dimension" that is secretly fact-sized must not be
    forced into executor memory (an unconditional ``F.broadcast``
    overrides autoBroadcastJoinThreshold and OOMs at scale). Returns the
    hinted DataFrame when the optimized-plan estimate fits
    ``max_bytes``, the unhinted one otherwise — the join then falls back
    to whatever AQE picks at runtime."""
    size = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    return F.broadcast(df) if size <= max_bytes else df


def hot_keys(df: DataFrame, col: str, k: int = 20, round_dp: int = 6) -> DataFrame:
    """Skew diagnostic: the k hottest values of a prospective join/
    aggregation key with their row share — the number you look at
    before deciding between AQE skew-split, salting, and broadcast.
    One partial-aggregated count per key + a top-k (TakeOrdered, no
    global sort); the total re-aggregates the tiny post-agg COUNTS
    relation rather than scanning the fact table a second time, then
    joins as a broadcast scalar."""
    counts = df.groupBy(F.col(col).alias("key")).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("_t"), round_dp).alias("share"),
        )
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(k)
    )


def spread_cpu_dense(df: DataFrame, *keys: str, width: int | None = None) -> DataFrame:
    """Explicit-width repartition for SKINNY-but-CPU-DENSE stages —
    relations whose cost is per-row compute (a levenshtein, an
    array_intersect over long arrays, a per-group numpy kernel), not
    bytes.

    AQE's size-based shuffle coalescing estimates stage cost from
    shuffle BYTES, so a few-column candidate relation feeding an
    expensive per-row expression gets funneled into 1–2 tasks (the r07
    Ed-Join lesson, measured: 2 tasks / 16 s at sf0.1 until the verify
    stage was spread; BASELINE.md "Ed-Join AQE lesson"). A
    user-specified numPartitions is exempt from coalescing, so an
    explicit repartition pins the stage's parallelism. With ``keys``
    the spread is a hash exchange those keys' downstream
    groupBy/dropDuplicates can REUSE (no second shuffle); without, a
    round-robin scatter.

    ``width`` defaults to the session's default parallelism — at
    cluster scale that is executor-cores-sized, exactly the width a
    CPU-bound stage wants. This trades one extra exchange of a SKINNY
    relation for full-width compute; do not apply it to byte-heavy
    relations, where AQE's estimate is already right."""
    w = width or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(w, *[F.col(k) for k in keys]) if keys else df.repartition(w)
