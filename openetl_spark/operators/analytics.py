"""Analytic operators without a direct Spark built-in: skyline
(Pareto frontier), exact grouped ranks without corpus-scale window
partitions.

Reference parity note: the reference's query surface has no skyline
(filters are per-row predicates, `src/filters.ts`); this is
Spark-native extension surface, the multi-criteria companion to top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _local_skyline(pdf: pd.DataFrame, crit: list[str]) -> pd.DataFrame:
    """Non-dominated subset of ``pdf`` under maximize-all criteria
    ``crit``. Dominance: q dominates p iff q ≥ p on every criterion
    and q > p on at least one — exact ties on ALL criteria dominate
    nothing, so full duplicates are both kept (the textbook SKYLINE OF
    semantics, Börzsönyi et al., ICDE 2001).

    Sort-first block-nested-loop: rows sorted lexicographically
    descending can only be dominated by EARLIER rows, so one pass with
    a running frontier suffices; the frontier comparison is a numpy
    broadcast against the (small) current frontier.
    """
    if len(pdf) == 0:
        return pdf
    srt = pdf.sort_values(crit, ascending=False, kind="mergesort")
    vals = srt[crit].to_numpy(dtype="float64")
    frontier: list[np.ndarray] = []
    keep = np.zeros(len(srt), dtype=bool)
    for i, row in enumerate(vals):
        if frontier:
            fr = np.asarray(frontier)
            dominated = ((fr >= row).all(axis=1) & (fr > row).any(axis=1)).any()
        else:
            dominated = False
        if not dominated:
            keep[i] = True
            frontier.append(row)
    return srt[keep]


def skyline(
    df: DataFrame,
    maximize: list[str] | None = None,
    minimize: list[str] | None = None,
) -> DataFrame:
    """Distributed skyline (Pareto frontier): the rows not dominated by
    any other row, maximizing ``maximize`` columns and minimizing
    ``minimize`` columns simultaneously.

    Two-phase distributed plan (the MR-BNL shape, Börzsönyi-style BNL
    per slice):
      1. LOCAL PRUNE — ``mapInPandas`` computes a local skyline per
         Arrow batch, in place on the scan partitions: NO shuffle, no
         cap on parallelism, and per-task memory bounded by the Arrow
         batch size regardless of corpus size (review r06 replaced a
         fixed-64-bucket groupBy that both shuffled the whole input
         and funneled it into 64 tasks). Pruning any SUBSET is safe:
         every global skyline row is undominated in its batch too, so
         phase 1 loses nothing and discards the overwhelming bulk
         (expected frontier of a d-dim random slice is O(log^{d-1} n)
         rows).
      2. MERGE — the surviving candidates (union of batch frontiers,
         small by construction) collapse to one group for an exact
         skyline pass. Worst case (fully anti-correlated data) the
         skyline IS O(n) and no algorithm returns a small answer; for
         that data shape the result itself is corpus-sized and callers
         want the phase-1 per-slice form anyway.

    Internally all criteria are maximize-form (minimized columns join
    negated), so one kernel serves both phases. A NULL criterion value
    becomes NaN in the kernel, where every comparison is false: such a
    row neither dominates nor is dominated — it is always kept
    (incomparable), mirroring SQL's NULL comparison semantics under
    the NOT EXISTS dominance definition.
    """
    maximize = list(maximize or [])
    minimize = list(minimize or [])
    if not maximize and not minimize:
        raise ValueError("skyline needs at least one criterion")
    crit = [f"__sk{i}" for i in range(len(maximize) + len(minimize))]
    clash = [c for c in df.columns if c in crit or c == "__sk_g"]
    if clash:
        raise ValueError(f"skyline reserves column names {clash}")
    aug = df
    for c, name in zip(maximize, crit):
        aug = aug.withColumn(name, F.col(c).cast("double"))
    for c, name in zip(minimize, crit[len(maximize):]):
        aug = aug.withColumn(name, -F.col(c).cast("double"))
    schema: StructType = aug.schema

    def prune(batches):
        for pdf in batches:
            yield _local_skyline(pdf, crit)

    local = aug.mapInPandas(prune, schema)
    # A bare groupBy(lit(0)) trips Spark 4's ordinal resolution inside
    # flatMapGroupsInPandas — group on an explicit constant column.
    merged = (
        local.withColumn("__sk_g", F.lit(0))
        .groupBy("__sk_g")
        .applyInPandas(
            lambda _, pdf: _local_skyline(pdf.drop(columns="__sk_g"), crit),
            schema,
        )
    )
    return merged.drop(*crit)


def grouped_exact_ranks(
    df: DataFrame,
    group: str,
    order_col: str,
    tiebreak: str,
    bucket_width: float,
    pos_col: str = "pos",
    n_col: str = "n_group",
) -> DataFrame:
    """EXACT per-row rank within ``group`` under ``(order_col DESC,
    tiebreak ASC)`` — the value a ``row_number() OVER (PARTITION BY
    group ORDER BY ...)`` window computes — WITHOUT ever holding a
    whole group in one window partition.

    A low-cardinality ``group`` (an order priority, a returnflag) makes
    the naive window a skew wall by construction: the entire table
    flows through #groups tasks, and rank/ntile/percent_rank need the
    whole partition resident (VERDICT r06 "what's wrong" #1). This is
    the two-level exact formulation the repo's histogram family
    (``grouped_quantiles``, ``length_band_filter``) already uses,
    applied to per-row ranks:

      1. COARSE HISTOGRAM — ``floor(order_col / bucket_width)`` buckets
         each row; ``groupBy(group, bucket).count()`` is a partial-agg
         shuffle on a HIGH-cardinality compound key. The bin relation
         is bounded by value-range/width per group — independent of row
         count.
      2. OFFSETS — a cumulative window over the BIN relation (ordered
         bucket DESC) gives each bucket the number of rows in strictly
         higher buckets. The only single-key window in the plan, and
         its input is the bounded bin relation, never the corpus.
      3. LOCAL RANK — ``row_number`` partitioned by ``(group, bucket)``
         ordered ``(order_col DESC, tiebreak)``: high-cardinality
         partitions whose size is bucket occupancy (~rows/#buckets),
         the skew knob. ``bucket_width`` tunes it: at 100× the data,
         shrink the width (more buckets) and occupancy stays bounded —
         nothing else changes.
      4. ``pos = offset + local_rank``; group totals join back the same
         way. Offsets and totals are broadcast (bin-relation-sized).

    floor() is monotone, so bucket-DESC-then-within-bucket-DESC is
    exactly global DESC order: every row in a higher bucket has a
    strictly higher ``order_col``. Rows with NULL ``order_col`` are
    excluded (a rank under an ordering is undefined for them — the
    caller decides their placement), matching neither-first-nor-last
    explicitly rather than inheriting an engine default.

    Returns ``df``'s columns plus ``pos_col`` (1-based, dense within
    the group: every position 1..n occurs exactly once when
    ``tiebreak`` is unique) and ``n_col`` (group row count).
    """
    reserved = {pos_col, n_col, "__bkt", "__loc", "__off", "__cnt"}
    clash = reserved & set(df.columns)
    if clash:
        # Same discipline as bloom_probe: withColumn would silently
        # REPLACE an existing column (or the bin join keys would
        # collide), yielding wrong ranks with no error.
        raise ValueError(
            f"grouped_exact_ranks reserves column names {sorted(clash)}"
        )
    bkt = F.floor(F.col(order_col) / F.lit(float(bucket_width)))
    aug = df.filter(F.col(order_col).isNotNull()).withColumn("__bkt", bkt)

    # persist: offsets AND totals both aggregate this bounded bin
    # relation — left lazy, each re-derived it (and the whole input
    # subtree beneath it), so every grouped_exact_ranks consumer
    # executed its input one extra full time (r12 optimization pass;
    # the relation is bin-grid-sized, never corpus-sized).
    bins = aug.groupBy(group, "__bkt").agg(F.count("*").alias("__cnt")).persist()
    w_off = (
        Window.partitionBy(group)
        .orderBy(F.col("__bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bins.select(
        group,
        "__bkt",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    totals = bins.groupBy(group).agg(F.sum("__cnt").alias(n_col))

    w_loc = Window.partitionBy(group, "__bkt").orderBy(
        F.col(order_col).desc(), F.col(tiebreak)
    )
    ranked = (
        aug.withColumn("__loc", F.row_number().over(w_loc))
        .join(F.broadcast(offsets), [group, "__bkt"])
        .join(F.broadcast(totals), [group])
        .withColumn(pos_col, (F.col("__off") + F.col("__loc")).cast("bigint"))
        .drop("__bkt", "__cnt", "__off", "__loc")
    )
    return ranked


def ntile_from_pos(pos, n, k: int):
    """ntile(k) of 1-based position ``pos`` among ``n`` rows, as a pure
    Column expression (SQL-standard big-tiles-first: the first n % k
    tiles hold ceil(n/k) rows, the rest floor(n/k)) — the arithmetic
    twin of the ntile window function for plans that already carry
    exact positions from grouped_exact_ranks. Lazy CASE branches keep
    the floor(n/k)=0 small-n case off the division (ANSI mode)."""
    big = n % k
    size_big = F.floor(n / k) + 1
    cut = big * size_big
    small = F.floor(n / k)
    return F.when(
        pos <= cut, F.floor((pos - 1) / size_big) + 1
    ).otherwise(big + F.floor((pos - cut - 1) / small) + 1)


def funnel_steps(
    events,
    steps,
    window_sec=None,
    user_col="user_id",
    type_col="event_type",
    ts_col="ts",
    group_col=None,
):
    """Strict-order conversion FUNNEL over an event stream — the
    product-analytics staple: per user, take the FIRST occurrence of
    step 1, then the first occurrence of step 2 strictly after it,
    and so on; ``window_sec`` bounds the whole journey to
    t_k − t_1 ≤ window (the standard "converted within 7 days"
    constraint — without a window a long-lived event stream converts
    everyone eventually and the funnel is flat).

    Returns one row per step: (step_idx, step, n_users,
    sum_conv_usec) with n_users monotone non-increasing and
    sum_conv_usec = Σ over converted users of t_step − t_first in
    EXACT epoch MICROseconds (0 for step 1) — all bigint, hash-exact
    cross-engine: microsecond integers carry the timestamps' full
    precision (second-truncating unix_timestamp loses sub-second
    parts differently from a fractional-epoch sum), and epoch
    differences cancel any timezone rendering offset.

    Shape: k−1 equi-joins of the (user, ts) step relations — each a
    partial-agg min per user, state one row per surviving user; no
    window function, no per-user event sort. At 100 TB the event scan
    is touched once per step with the type filter pushed to the scan.

    ``group_col``: optional per-USER attribute column already joined
    onto ``events`` (a market segment, a cohort) — the funnel then
    reports per group: (group_col, step_idx, step, n_users,
    sum_conv_usec). The attribute must be constant per user (it rides
    the per-user groupBy key).
    """
    import pyspark.sql.functions as F

    if len(steps) < 2:
        raise ValueError(f"funnel_steps: need >= 2 steps, got {steps}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel_steps: duplicate step names in {steps}")
    gcol = group_col if group_col is not None else None
    e = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_e"),
        F.col(ts_col).alias("_ts"),
        (F.col(gcol) if gcol else F.lit(0)).alias("_g"),
    )
    frontier = (
        e.filter(F.col("_e") == steps[0])
        .groupBy("_u", "_g")
        .agg(F.min("_ts").alias("_t"))
        .select("_u", "_g", F.col("_t").alias("_t0"), "_t")
        # persist: level-1 aggregate + the step-2 join both consume
        # this (see _funnel_frontiers).
        .persist()
    )
    ep = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731

    def level(fr, idx, name):
        aggs = [
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.coalesce(F.sum(ep("_t") - ep("_t0")), F.lit(0))
            .cast("bigint")
            .alias("sum_conv_usec"),
        ]
        cols = [
            F.lit(idx).cast("int").alias("step_idx"),
            F.lit(name).alias("step"),
            "n_users",
            "sum_conv_usec",
        ]
        if gcol:
            # A segment whose converted set empties at this step drops
            # out, matching the grouped oracle's GROUP BY semantics.
            return fr.groupBy("_g").agg(*aggs).select(F.col("_g").alias(gcol), *cols)
        # ungrouped: GLOBAL aggregate (not groupBy on the sentinel _g)
        # so a step whose converted-user set is empty still yields its
        # n_users=0 row — the docstring's one-row-per-step contract and
        # the ungrouped oracle's scalar-subquery behavior.
        return fr.agg(*aggs).select(*cols)

    out = level(frontier, 1, steps[0])
    for i, s, frontier in _funnel_frontiers(e, steps, window_sec, frontier):
        out = out.unionByName(level(frontier, i, s))
    return out


def _funnel_frontiers(e, steps, window_sec, frontier):
    """Yield (idx, step, frontier) for steps 2..k — the shared strict-
    order advance used by funnel_steps (counts) and funnel_user_times
    (the per-user conversion relation)."""
    import pyspark.sql.functions as F

    ep = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            e.drop("_g")
            .filter(F.col("_e") == s)
            .join(frontier, "_u")
            .filter(F.col("_ts") > F.col("_t"))
        )
        if window_sec is not None:
            nxt = nxt.filter(ep("_ts") - ep("_t0") <= window_sec * 1_000_000)
        # persist: each frontier is consumed by BOTH its own level
        # aggregate and the next step's join — left lazy, frontier_i
        # re-derived every shallower frontier per consumer, touching
        # the event scan O(k²) times per invocation instead of the
        # documented once per step (r12 optimization pass; lazy
        # persist keeps Catalyst's size stats for the join planning).
        frontier = (
            nxt.groupBy("_u", "_t0", "_g").agg(F.min("_ts").alias("_t")).persist()
        )
        yield i, s, frontier


def funnel_user_times(
    events,
    steps,
    window_sec=None,
    user_col="user_id",
    type_col="event_type",
    ts_col="ts",
):
    """The per-user companion of funnel_steps: one row per (user,
    reached step ≥ 2) with the EXACT conversion time t_step − t_first
    in epoch microseconds — the relation time-to-convert statistics
    (medians, tail quantiles) derive from. Same strict-order + journey-
    window semantics; all bigint."""
    import pyspark.sql.functions as F

    if len(steps) < 2:
        raise ValueError(f"funnel_user_times: need >= 2 steps, got {steps}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel_user_times: duplicate step names in {steps}")
    e = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_e"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_g"),
    )
    first = (
        e.filter(F.col("_e") == steps[0])
        .groupBy("_u", "_g")
        .agg(F.min("_ts").alias("_t"))
        .select("_u", "_g", F.col("_t").alias("_t0"), "_t")
        # NOT persisted here: unlike funnel_steps' frontier, this
        # relation has exactly one consumer (the step-2 join).
    )
    ep = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    out = None
    for i, s, frontier in _funnel_frontiers(e, steps, window_sec, first):
        part = frontier.select(
            F.col("_u").cast("long").alias("user_id"),
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(s).alias("step"),
            (ep("_t") - ep("_t0")).cast("bigint").alias("conv_usec"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def cohort_retention(
    events,
    user_col="user_id",
    type_col="event_type",
    ts_col="ts",
    cohort_type="signup",
    grain_days=7,
):
    """Cohort RETENTION matrix over an event stream — the other
    product-analytics staple next to the funnel (C148): users are
    cohorted by the ``grain_days``-day bucket of their FIRST
    ``cohort_type`` event (default weekly, the standard growth-team
    grain), and each cohort's activity is tracked per bucket offset;
    one row per (cohort, period) with the cohort size, the distinct
    active users, and retention = n_active/n_cohort.

    EXACT-INTEGER form: buckets are the integer epoch-day index
    div grain_days (never months_between — a float of fractional
    months), the cohort renders as its bucket's start DATE as a plain
    'yyyy-MM-dd' string, and retention is ONE IEEE division of exact
    bigints (the purity discipline) — the whole relation is
    hash-exact cross-engine. Bucket grain deliberately means "active
    in the signup bucket counts as period 0, even for events earlier
    in that bucket"; pre-cohort buckets are excluded (period ≥ 0).

    Shape: one partial-agg min per user for the cohort anchor, one
    (user ⋈ anchor) activity pass collapsed to (cohort, period, user)
    grain by a distinct partial agg, then a count per (cohort,
    period) with the broadcast cohort sizes joined back — no window
    function, no per-user sort; the widest state is one row per
    (user, active-bucket).
    """
    import pyspark.sql.functions as F

    if grain_days < 1:
        raise ValueError(
            f"cohort_retention: grain_days must be >= 1, got {grain_days}"
        )
    epoch = F.lit("1970-01-01").cast("date")
    midx = lambda c: F.floor(  # noqa: E731
        F.datediff(F.col(c).cast("date"), epoch) / grain_days
    ).cast("int")
    first = (
        events.filter(F.col(type_col) == cohort_type)
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts_col).alias("_t0"))
        .select(
            "_u",
            F.date_format(
                F.date_add(epoch, midx("_t0") * grain_days), "yyyy-MM-dd"
            ).alias("cohort"),
            midx("_t0").alias("_c"),
        )
    )
    sizes = first.groupBy("cohort", "_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    act = (
        events.select(F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"))
        .join(first, "_u")
        .select(
            "cohort",
            "_c",
            (midx("_ts") - F.col("_c")).cast("int").alias("period"),
            "_u",
        )
        .filter(F.col("period") >= 0)
        .distinct()
        .groupBy("cohort", "_c", "period")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    return (
        act.join(F.broadcast(sizes), ["cohort", "_c"])
        .select(
            "cohort",
            "period",
            "n_cohort",
            "n_active",
            (F.col("n_active").cast("double") / F.col("n_cohort")).alias(
                "retention"
            ),
        )
    )


def rfm_scores(
    orders,
    customer_col="o_custkey",
    date_col="o_orderdate",
    amount_col="o_totalprice",
    n_tiles=3,
    bucket_widths=(64.0, 4.0, 65536.0),
):
    """RFM segmentation (Hughes, "Strategic Database Marketing" 1994 —
    the classic customer-value triage): per customer, Recency = days
    since their last order (relative to the corpus max date, so the
    relation is a pure function of the data), Frequency = order
    count, Monetary = lifetime spend in exact CENTS (per-row
    round(amount·100) — the same double rounds identically in any
    engine; summing first would accumulate float error), then each
    dimension split into ``n_tiles`` quantile tiles with tile 1 the
    BEST (most recent / most orders / biggest spend) and the combined
    segment label 'R{r}F{f}M{m}'.

    Scale shape: the tiles are NOT an ntile window over raw customers
    (one task per corpus — the low-cardinality-window trap); each
    dimension runs through grouped_exact_ranks' two-level histogram
    (bin relation bounded by value-range/width — ``bucket_widths``
    sizes each dimension's bins to its range: days, counts, cents)
    and the tile is
    ntile_from_pos arithmetic on the exact position — three
    histogram-rank passes, each a high-cardinality partial-agg
    shuffle, no corpus-scale window anywhere. Ordering is total
    (metric, then customer id), so tiles are deterministic and
    engine-portable.

    Returns (custkey, r_days, f_orders, m_cents, r_tile, f_tile,
    m_tile, segment); customers with no orders are absent (RFM is
    undefined without a purchase history).

    Streaming posture (VERDICT r11 #5): BATCH-ONLY BY NATURE. The
    per-customer (last date, count, cents) triple is mergeable —
    max/sum/sum cells — but the TILES are corpus-RELATIVE ranks: one
    arriving order can move every other customer's tile, so there is
    no per-batch cell whose merge yields the tile columns (contrast
    cohort_retention/association_rules, whose outputs are audits over
    mergeable cells). The honest streaming rendering is
    "maintain the mergeable triple incrementally, re-rank on read" —
    i.e. re-run the three histogram passes over the merged state,
    which is exactly this operator.
    """
    import pyspark.sql.functions as F

    if n_tiles < 2:
        raise ValueError(f"rfm_scores: n_tiles must be >= 2, got {n_tiles}")
    ref = orders.agg(
        F.max(F.col(date_col).cast("date")).alias("_ref")
    )
    per = (
        orders.groupBy(F.col(customer_col).alias("custkey"))
        .agg(
            F.max(F.col(date_col).cast("date")).alias("_last"),
            F.count(F.lit(1)).cast("bigint").alias("f_orders"),
            F.sum(F.round(F.col(amount_col) * 100).cast("bigint"))
            .cast("bigint")
            .alias("m_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "custkey",
            F.datediff("_ref", "_last").cast("int").alias("r_days"),
            "f_orders",
            "m_cents",
        )
    )
    # Tile 1 = best: most recent (r_days ASC), most orders (DESC),
    # biggest spend (DESC). grouped_exact_ranks ranks order_col DESC,
    # so recency ranks on the negated value.
    dims = [
        ("r_tile", (-F.col("r_days")).cast("bigint"), bucket_widths[0]),
        ("f_tile", F.col("f_orders"), bucket_widths[1]),
        ("m_tile", F.col("m_cents"), bucket_widths[2]),
    ]
    # grouped_exact_ranks references its input ~4× (histogram,
    # offsets, totals, probe); chaining three passes lazily would
    # embed each prior pass's subtree 4× per reference — an
    # exponential plan (measured: 108 scans of orders, ~9 s at
    # sf0.1). localCheckpoint between passes keeps every pass's plan
    # a leaf scan of the customer-cardinality relation (3 bounded
    # jobs, the iterative-operator discipline).
    out = per.withColumn("_grp", F.lit(0)).localCheckpoint()
    for tile_col, order_expr, width in dims:
        ranked = grouped_exact_ranks(
            out.withColumn("_ord", order_expr),
            "_grp",
            "_ord",
            "custkey",
            width,
            pos_col="_pos",
            n_col="_n",
        )
        out = (
            ranked.withColumn(
                tile_col,
                ntile_from_pos(F.col("_pos"), F.col("_n"), n_tiles)
                .cast("int"),
            )
            .drop("_ord", "_pos", "_n")
            .localCheckpoint()
        )
    return out.drop("_grp").withColumn(
        "segment",
        F.concat(
            F.lit("R"), F.col("r_tile").cast("string"),
            F.lit("F"), F.col("f_tile").cast("string"),
            F.lit("M"), F.col("m_tile").cast("string"),
        ),
    )


def association_rules(
    baskets,
    basket_col="l_orderkey",
    item_col="l_partkey",
    min_support=2,
    pairs=None,
):
    """Market-basket ASSOCIATION RULES (Agrawal & Srikant, VLDB 1994 —
    support / confidence / lift over item PAIRS): for every directed
    rule antecedent → consequent whose pair support reaches
    ``min_support`` baskets, the exact counts and the two classic
    strength metrics. Confidence = n_both/n_ante is ONE IEEE division
    of exact bigints (the purity discipline); LIFT — the
    independence-adjusted metric — is emitted as the exact rational
    (lift_num, lift_den) = (n_both·n_baskets, n_ante·n_cons), so
    "lift > 1" is a cross-multiplication, no float anywhere in it.

    ``pairs``: optional precomputed undirected co-occurrence relation
    (x, y, n_both) with x < y — e.g. the persisted co-purchase edge
    layout, where the basket self-join has already been paid once per
    corpus; when absent it is derived here (one self-join on the
    basket key, count-distinct baskets per pair — m·d-bounded like
    the co-purchase CTE). Item supports and the basket total are
    partial-agg relations joined back; the item relation is
    VOCABULARY-sized (distinct items grow with the corpus — ~20M
    parts at sf100), so its broadcast is conditional on Catalyst's
    size estimate (``broadcast_if_small``, the C121 dictionary
    discipline) — past the threshold the two equi-joins fall back to
    whatever AQE picks shuffled. Only the 1-row basket total is
    broadcast unconditionally.

    Returns one row per DIRECTED rule: (antecedent, consequent,
    n_both, n_ante, n_cons, n_baskets, confidence, lift_num,
    lift_den).
    """
    import pyspark.sql.functions as F

    if min_support < 1:
        raise ValueError(
            f"association_rules: min_support must be >= 1, got {min_support}"
        )
    b = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    )
    derived_pairs = pairs is None
    if derived_pairs:
        l, r = b.alias("l"), b.alias("r")
        pairs = (
            l.join(
                r,
                (F.col("l._b") == F.col("r._b"))
                & (F.col("l._i") < F.col("r._i")),
            )
            .groupBy(F.col("l._i").alias("x"), F.col("r._i").alias("y"))
            .agg(F.count_distinct(F.col("l._b")).cast("bigint").alias("n_both"))
        )
    sup = pairs.filter(F.col("n_both") >= min_support)
    if derived_pairs:
        # Both directed-rule arms consume `sup`; when the pair
        # relation was derived here (no persisted co-purchase layout),
        # each arm would re-run the basket self-join — cache the
        # collision-sized support relation once instead (lazy persist,
        # stats-preserving). Layout-fed callers skip this (their pairs
        # are already a parquet read).
        sup = sup.persist()
    items = b.groupBy(F.col("_i").alias("_it")).agg(
        F.count_distinct("_b").cast("bigint").alias("_n_it")
    )
    total = b.agg(F.count_distinct("_b").cast("bigint").alias("n_baskets"))
    directed = sup.select(
        F.col("x").alias("antecedent"), F.col("y").alias("consequent"), "n_both"
    ).unionByName(
        sup.select(
            F.col("y").alias("antecedent"), F.col("x").alias("consequent"), "n_both"
        )
    )
    from openetl_spark.operators.skew import broadcast_if_small

    return (
        directed.join(
            broadcast_if_small(
                items.select(F.col("_it").alias("antecedent"),
                             F.col("_n_it").alias("n_ante"))),
            "antecedent",
        )
        .join(
            broadcast_if_small(
                items.select(F.col("_it").alias("consequent"),
                             F.col("_n_it").alias("n_cons"))),
            "consequent",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            "n_ante",
            "n_cons",
            "n_baskets",
            (F.col("n_both").cast("double") / F.col("n_ante")).alias(
                "confidence"
            ),
            (F.col("n_both") * F.col("n_baskets"))
            .cast("bigint")
            .alias("lift_num"),
            (F.col("n_ante") * F.col("n_cons")).cast("bigint").alias("lift_den"),
        )
    )


def association_rules_k3(
    baskets,
    basket_col="l_orderkey",
    item_col="l_partkey",
    min_support=2,
    pairs=None,
):
    """Level-3 A-PRIORI association rules (Agrawal & Srikant, VLDB
    1994 §2.1 — the candidate-generation step that makes frequent
    triples tractable): {a, b} → c rules over item TRIPLES whose
    support reaches ``min_support`` baskets, with the same exact
    metrics as the pair rules (confidence = n_triple/n_ante is one
    IEEE division of bigints; lift vs the consequent as the exact
    rational (n_triple·n_baskets, n_ante·n_cons)).

    The A-priori downward-closure property is the scale argument: a
    triple can be frequent only if all THREE of its pairs are, so
    candidates are generated from the frequent-PAIR relation (join
    (x,y)×(x,z) on the shared prefix, y < z, then a semi-join against
    (y,z)) — the candidate relation is collision-sized, NEVER a
    3-way basket self-join. Support counting joins candidates back to
    the deduplicated basket relation once per member (three equi-joins
    chained on the basket key — the TID-list intersection), so cost is
    Σ_cand support(x), linear in candidate coverage.

    ``pairs``: optional precomputed undirected co-occurrence relation
    (x, y, n_both), x < y — the persisted co-purchase layout; derived
    here when absent (one basket self-join, paid once). Item supports
    and the basket total follow the C156 conditional-broadcast
    discipline (items are vocabulary-sized).

    Returns one row per directed rule, 3 per frequent triple
    (antecedent pair ordered ante_a < ante_b): (ante_a, ante_b,
    consequent, n_triple, n_ante, n_cons, n_baskets, confidence,
    lift_num, lift_den).
    """
    import pyspark.sql.functions as F

    from openetl_spark.operators.skew import broadcast_if_small

    if min_support < 1:
        raise ValueError(
            f"association_rules_k3: min_support must be >= 1, got {min_support}"
        )
    # The deduplicated basket relation feeds SIX consumers (pair
    # derivation ×2, pair/triple enumeration ×3, item supports +
    # total): localCheckpoint it once so the dedup shuffle and the
    # upstream scan are paid once, not per consumer — the
    # iterative-operator discipline; measured as the dominant cost of
    # the first cut at sf0.1.
    b = (
        baskets.select(
            F.col(basket_col).alias("_o"), F.col(item_col).alias("_i")
        )
        .dropDuplicates()
        .localCheckpoint()
    )
    bx = b.select(F.col("_o"), F.col("_i").alias("x"))
    by = b.select(F.col("_o"), F.col("_i").alias("y"))
    bz = b.select(F.col("_o"), F.col("_i").alias("z"))
    pair_inst_all = bx.join(by, "_o").filter(F.col("x") < F.col("y"))
    if pairs is None:
        # b is deduplicated, so plain count == count distinct baskets
        pairs = pair_inst_all.groupBy("x", "y").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_both")
        )
    # persist: the frequent-pair relation has FIVE consumers (two arms
    # + closure semi of candidate generation, the transaction-trimming
    # semi, the n_ante join) — left lazy, each re-ran the basket
    # self-join + support aggregate. Lazy persist (not localCheckpoint
    # — the RDD scan hides size stats and demotes the broadcast_if_
    # small semis to shuffles) pays the self-join once and keeps every
    # consumer join broadcast.
    fp = (
        pairs.filter(F.col("n_both") >= min_support)
        .select("x", "y", "n_both")
        .persist()
    )
    # A-priori candidate generation: shared-prefix join + closure semi
    cand = (
        fp.select("x", "y")
        .alias("ab")
        .join(
            fp.select(F.col("x").alias("_x2"), F.col("y").alias("z")).alias(
                "ac"
            ),
            (F.col("ab.x") == F.col("_x2")) & (F.col("ab.y") < F.col("z")),
        )
        .select("x", "y", "z")
        .join(
            fp.select(F.col("x").alias("y"), F.col("y").alias("z")),
            ["y", "z"],
            "semi",
        )
    )
    # Support counting by IN-BASKET enumeration, not candidate×basket
    # joins: starting the chain from `cand` matches every basket
    # containing the candidate's first item (fan-out |cand per item| ×
    # |baskets per item| — measured 55M intermediate rows at sf0.1 /
    # ~34 s warm), while enumerating each basket's own triples is
    # bounded by C(basket_size, 3) per basket — corpus-LINEAR with
    # small constants (~4 triples per TPC-H order). The A-priori
    # relation still prunes: pair instances are trimmed against the
    # frequent-pair relation before extending (transaction trimming,
    # Agrawal-Srikant §2.1.1), and the final semi-join keeps only
    # closure-complete candidates.
    pair_inst = pair_inst_all.join(
        broadcast_if_small(fp.select("x", "y")), ["x", "y"], "semi"
    )
    tri = (
        pair_inst.join(bz, "_o")
        .filter(F.col("y") < F.col("z"))
        .join(broadcast_if_small(cand), ["x", "y", "z"], "semi")
        .groupBy("x", "y", "z")
        # b is deduplicated, so each (triple, basket) instance is
        # unique — count(*) == count distinct, minus a dedup pass
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triple"))
        .filter(F.col("n_triple") >= min_support)
        # persist: the three directed-rule arms each re-ran the whole
        # in-basket enumeration + support count without it; the
        # frequent-triple relation is tiny (lazy persist to keep its
        # size stats visible to the planner).
        .persist()
    )
    rules = (
        tri.select(
            F.col("x").alias("ante_a"), F.col("y").alias("ante_b"),
            F.col("z").alias("consequent"), "n_triple",
        )
        .unionByName(
            tri.select(
                F.col("x").alias("ante_a"), F.col("z").alias("ante_b"),
                F.col("y").alias("consequent"), "n_triple",
            )
        )
        .unionByName(
            tri.select(
                F.col("y").alias("ante_a"), F.col("z").alias("ante_b"),
                F.col("x").alias("consequent"), "n_triple",
            )
        )
    )
    items = b.groupBy(F.col("_i").alias("_it")).agg(
        F.count_distinct("_o").cast("bigint").alias("_n_it")
    )
    total = b.agg(F.count_distinct("_o").cast("bigint").alias("n_baskets"))
    return (
        rules.join(
            fp.select(
                F.col("x").alias("ante_a"), F.col("y").alias("ante_b"),
                F.col("n_both").alias("n_ante"),
            ),
            ["ante_a", "ante_b"],
        )
        .join(
            broadcast_if_small(
                items.select(
                    F.col("_it").alias("consequent"),
                    F.col("_n_it").alias("n_cons"),
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "ante_a",
            "ante_b",
            "consequent",
            "n_triple",
            "n_ante",
            "n_cons",
            "n_baskets",
            (F.col("n_triple").cast("double") / F.col("n_ante")).alias(
                "confidence"
            ),
            (F.col("n_triple") * F.col("n_baskets"))
            .cast("bigint")
            .alias("lift_num"),
            (F.col("n_ante") * F.col("n_cons")).cast("bigint").alias("lift_den"),
        )
    )


def markov_transition_counts(
    events,
    user_col="user_id",
    type_col="event_type",
    ts_col="ts",
    order_col="event_id",
    conversion_type="purchase",
):
    """Journey-segmented Markov transition counts — the corpus-scale
    half of removal-effect attribution (Anderl et al. 2016, "Mapping
    the customer journey"; the first-order chain every marketing-
    attribution vendor fits). Each user's event stream is split into
    JOURNEYS at every conversion: a touch following a conversion (or
    starting the stream) enters from the synthetic START state, a
    conversion event absorbs into CONV, and a stream that ends on a
    non-conversion touch absorbs into NULL. One row per observed
    (from_state, to_state) with its count.

    Shape: ONE window pass keyed on the high-cardinality user column
    (lag + lead in the same frame), each event emitting its incoming
    transition plus an optional terminal NULL row through a 2-slot
    array_compact/explode — no second scan of the corpus — then a
    partial-agg count. The output relation is bounded by
    (channels+2)^2, independent of corpus size.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    state = F.when(
        F.col(type_col) == conversion_type, F.lit("CONV")
    ).otherwise(F.col(type_col))
    seq = events.select(
        state.alias("_s"),
        F.lag(state).over(w).alias("_prev"),
        F.lead(state).over(w).alias("_next"),
    )
    inc_from = F.when(
        F.col("_prev").isNull() | (F.col("_prev") == "CONV"), F.lit("START")
    ).otherwise(F.col("_prev"))
    pairs = F.array_compact(
        F.array(
            F.struct(inc_from.alias("f"), F.col("_s").alias("t")),
            F.when(
                F.col("_next").isNull() & (F.col("_s") != "CONV"),
                F.struct(F.col("_s").alias("f"), F.lit("NULL").alias("t")),
            ),
        )
    )
    return (
        seq.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.f").alias("from_state"), F.col("p.t").alias("to_state")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


#: Fixed-point scale for the Markov chain solve: probabilities live in
#: units of 2^-26.  K^2 * (channels+2) must stay inside int64 — 2^52
#: per product term, so a few dozen states are safe; floor division at
#: every step makes the iteration bit-identical in any engine.
MARKOV_K = 1 << 26
#: Value-iteration rounds.  Error vs the exact absorption probability
#: is (transient mass)^H + H ulps — at H=48 far below 2^-20 on any
#: chain whose journeys actually convert.
MARKOV_H = 48


def _markov_solve(t_probs, transient, removed=None, k=MARKOV_K, h=MARKOV_H):
    """Fixed-point value iteration for P(absorb in CONV | start state).

    ``t_probs``: {(from, to): t} with t = floor(K * n / d) — fixed-
    point first-order transition probabilities. CONV is worth K, NULL
    (and the ``removed`` channel, per the removal-effect convention:
    a removed channel keeps receiving traffic but yields nothing) is
    worth 0. Pure bounded integer arithmetic — deterministic across
    engines; the DuckDB oracle re-runs the same recursion as a
    recursive CTE.
    """
    p = {s: 0 for s in transient}
    for _ in range(h):
        nxt = {}
        for s in transient:
            acc = 0
            for (f, t), tp in t_probs.items():
                if f != s:
                    continue
                if t == "CONV":
                    acc += tp * k
                elif t == "NULL" or t == removed:
                    pass
                else:
                    acc += tp * p.get(t, 0)
            nxt[s] = acc // k
        p = nxt
    return p


def markov_attribution(
    events,
    user_col="user_id",
    type_col="event_type",
    ts_col="ts",
    order_col="event_id",
    conversion_type="purchase",
):
    """Removal-effect (Markov-chain) attribution over an event stream
    — the principled successor to last-touch (C109): fit the first-
    order journey chain, compute the base conversion probability from
    START, then re-solve the chain once per channel with that channel
    REMOVED (it still absorbs its incoming traffic but converts
    nothing); a channel's credit is the conversion probability it
    would take with it.

    EXACT-INTEGER rendering: transition probabilities and absorption
    values are 2^-26 fixed-point bigints with floor division at every
    step (t = K·n div d once per edge, then H=48 value-iteration
    rounds of p_s = (Σ t·p) div K) — bit-identical cross-engine, so
    the whole relation hashes except ``share``, which is ONE IEEE
    division of exact bigints. Returns one row per channel:
    (channel, n_in, base_p_k, removal_p_k, effect_k, share).

    Scale split (the NMI-dictionary discipline): the corpus-scale work
    is the single window pass in ``markov_transition_counts``; the
    chain solve is O((channels+2)^2 · H) on the channel vocabulary —
    bounded BY DEFINITION of a marketing channel taxonomy — and runs
    driver-side on the collected count relation, exactly like the
    Mondrian split search and the NMI micro-nat fit. The corpus never
    leaves the cluster.
    """
    spark = events.sparkSession
    counts = markov_transition_counts(
        events, user_col, type_col, ts_col, order_col, conversion_type
    )
    rows = counts.collect()  # bounded: (channels+2)^2 rows
    n = {(r["from_state"], r["to_state"]): int(r["n"]) for r in rows}
    outdeg = {}
    for (f, _t), c in n.items():
        outdeg[f] = outdeg.get(f, 0) + c
    t_probs = {
        (f, t): (MARKOV_K * c) // outdeg[f] for (f, t), c in n.items()
    }
    channels = sorted(
        ({f for f, _ in n} | {t for _, t in n}) - {"START", "CONV", "NULL"}
    )
    transient = ["START"] + channels
    base = _markov_solve(t_probs, transient)
    out = []
    for c in channels:
        rem = _markov_solve(t_probs, transient, removed=c)
        n_in = sum(v for (f, t), v in n.items() if t == c)
        out.append(
            (c, n_in, base["START"], rem["START"], base["START"] - rem["START"])
        )
    total_eff = sum(e for *_x, e in out)
    res = spark.createDataFrame(
        out, "channel string, n_in long, base_p_k long, removal_p_k long, "
        "effect_k long",
    )
    share = (
        (F.col("effect_k").cast("double") / F.lit(total_eff))
        if total_eff > 0
        else F.lit(None).cast("double")
    )
    return res.select("*", share.alias("share"))
