"""Mergeable HyperLogLog as a RELATION (SURVEY.md §2C, sketch family
C45/C46's third member, r07): distinct counting whose entire state is
an ordinary DataFrame of register cells, so shards/partitions/streams
merge with a plain ``groupBy(...).max()`` — the same
mergeable-summary discipline as the histogram cells and CMS counters.

Why a relation and not ``approx_count_distinct``: Spark's built-in HLL
is a black-box aggregate whose binary sketch an oracle can't re-derive
(approx_sketches settles for an inequality oracle). These cells are
derived from ``md5`` arithmetic both engines compute bit-identically —
``conv(substr(md5(x),1,15),16,10)`` ≡ DuckDB
``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``, integer div/mod, and
``ltrim(bin(suffix),'0')`` for the leading-zero rank — so the FULL
cell relation is hash-checkable cross-engine (the CMS/PQ bit-exact
oracle discipline), and the estimate is one tiny aggregate over it.

Scale shape: one partial-agg ``groupBy(keys, j).max(rho)`` — register
cells combine map-side, the shuffle carries at most ``m = 2**p`` rows
per key group regardless of corpus size, and merging two corpora's
cells is the same max-merge again (tested associative/idempotent).
Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 60-bit hash = 15 md5 hex chars: nonnegative in a signed 64-bit long
# on both engines (the simhash/winnowing fingerprint discipline).
HASH_BITS = 60


def _alpha(m: int) -> float:
    """Flajolet's bias-correction constant (§4, Fig. 3)."""
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_cells(
    df: DataFrame,
    value: str,
    keys: Sequence[str] = (),
    p: int = 9,
) -> DataFrame:
    """HyperLogLog register cells of ``value``'s distinct set, per
    ``keys`` group: (``*keys``, j, r) where ``j`` is the register index
    (top ``p`` hash bits, 0 ≤ j < 2**p) and ``r`` the register value —
    the maximum over hashed values of the 1-based position of the
    first 1-bit in the remaining ``60 - p`` bits (``60 - p + 1`` for
    an all-zero suffix). Registers no value hashed into are ABSENT
    (sparse form): readers treat missing registers as 0, and the
    max-merge of two sparse cell sets is a union-groupBy-max.

    All arithmetic is exact integer div/mod on a nonnegative 60-bit
    md5 prefix plus a binary-string length for the leading-zero rank —
    every step renders identically in DuckDB, so the whole relation is
    a FULL cross-engine oracle target (no floats anywhere).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"hll_cells: p={p} outside [4, 16]")
    w = HASH_BITS - p
    m_suffix = 1 << w
    return (
        df.filter(F.col(value).isNotNull())
        .select(
            *keys,
            F.conv(
                F.substring(F.md5(F.col(value).cast("string")), 1, 15), 16, 10
            )
            .cast("bigint")
            .alias("_h"),
        )
        .select(
            *keys,
            # `div` (not `/`): exact integer division on the 60-bit
            # hash — a double round-trip is lossy above 2^53.
            F.expr(f"_h div {m_suffix}").cast("int").alias("j"),
            (F.col("_h") % F.lit(m_suffix)).alias("_suf"),
        )
        # Spark's bin() emits no leading zeros, so length(bin(x)) IS
        # the bit length; the DuckDB oracle pads, so IT renders
        # length(ltrim(bin(x), '0')) — same integer either way.
        .select(
            *keys,
            "j",
            F.when(F.col("_suf") == 0, F.lit(w + 1))
            .otherwise(F.lit(w + 1) - F.length(F.bin(F.col("_suf"))))
            .cast("int")
            .alias("_rho"),
        )
        .groupBy(*keys, "j")
        .agg(F.max("_rho").alias("r"))
    )


def hll_merge(cells_a: DataFrame, cells_b: DataFrame, keys: Sequence[str] = ()) -> DataFrame:
    """Merge two sparse cell relations: union + groupBy max. The HLL
    merge law — registers of A ∪ B are the elementwise max — holds
    exactly because each register is itself a max over hashed values;
    merge is associative, commutative, idempotent (property-tested)."""
    return (
        cells_a.unionByName(cells_b)
        .groupBy(*keys, "j")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(
    cells: DataFrame,
    p: int = 9,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Cardinality estimate per ``keys`` group from a (sparse) cell
    relation: the Flajolet raw estimate α_m·m²/Σ 2^{-M_j} (absent
    registers contribute 2⁰ each) with the small-range linear-counting
    correction m·ln(m/V) when E ≤ 2.5m and V > 0 empty registers
    remain. No large-range correction: the 51-bit suffix space makes
    hash saturation negligible below ~2⁵⁰ distincts (the 32-bit
    variant's 2³² wall does not apply).

    Float arithmetic lives ONLY here, in one m-row aggregate per group
    — the cells relation stays the exact/mergeable truth. Returns
    (``*keys``, n_registers_set, estimate double).
    """
    m = 1 << p
    a = _alpha(m)
    agg = cells.groupBy(*keys).agg(
        F.count("*").alias("n_registers_set"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("_s"),
    )
    zeros = F.lit(m) - F.col("n_registers_set")
    raw = F.lit(a * m * m) / (F.col("_s") + zeros.cast("double"))
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*keys, "n_registers_set", est.alias("estimate"))


# ------------------------------------------------------------- Bloom

def _bloom_positions(value_col: str, m_bits: int, k: int):
    """The k bit positions of Kirsch–Mitzenmacher double hashing
    (g_i = h1 + i·h2 mod m, "Less Hashing, Same Performance", ESA
    2006) as a Column array: h1/h2 are two independent 60-bit md5
    slices (hex chars 1-15 and 16-30), so h1 + (k-1)·h2 < 2^63 — no
    signed overflow, and every step renders identically in DuckDB
    (CAST('0x'||substr(md5(x), ...) AS BIGINT) + % arithmetic)."""
    s = F.col(value_col).cast("string")
    h1 = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5(s), 16, 15), 16, 10).cast("bigint")
    return F.array(
        *[((h1 + F.lit(i) * h2) % F.lit(m_bits)).cast("int") for i in range(k)]
    )


def bloom_cells(
    df: DataFrame,
    value: str,
    m_bits: int = 1 << 14,
    k: int = 4,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Bloom filter of ``value``'s distinct set as a sparse RELATION:
    the distinct set bit positions (``*keys``, pos) — the OR-merge
    twin of hll_cells' max-merge (two corpora's filters merge by
    union-distinct; associative/idempotent by construction). One
    explode + partial-agg distinct whose shuffle carries ≤ m_bits rows
    per key group at any corpus size. All arithmetic is exact integer
    md5 double hashing — bit-identical in DuckDB, so the FULL cell
    relation (and anything derived from it, false positives included)
    is a cross-engine oracle target.

    Sizing: FP rate ≈ (1 - e^{-k·n/m})^k; m_bits = 16k with k = 4
    holds ~1% at n ≈ 1.6k per group — at 100 TB pick m from the
    expected distinct count exactly as with any Bloom filter, the
    relation stays broadcastable (m rows max)."""
    return (
        df.filter(F.col(value).isNotNull())
        .select(
            *keys,
            F.explode(_bloom_positions(value, m_bits, k)).alias("pos"),
        )
        .distinct()
    )


def bloom_probe(
    cells: DataFrame,
    df: DataFrame,
    value: str,
    m_bits: int = 1 << 14,
    k: int = 4,
    hit_col: str = "bloom_hit",
) -> DataFrame:
    """Membership probe of every ``df`` row against a (single-group)
    ``cells`` relation: ``hit_col`` is true iff ALL k of the value's
    bit positions are set — no false negatives ever; false positives
    at the filter's designed rate (and DETERMINISTIC: both engines
    derive the same positions, so even the FP set hash-matches).

    Shape: each of the k positions becomes a column, then k LEFT joins
    against a BROADCAST of the distinct set positions (≤ m_bits rows
    by construction, unique keys — no fan-out) mark presence; a row
    hits iff every marker landed. Row-local by construction: no
    groupBy, no join-back on the probe's own columns, so duplicate
    probe rows, NULLs in OTHER columns, and exotic column types all
    pass through untouched (review r07: the earlier
    group-by-all-columns + null-unsafe rejoin silently false-negatived
    rows with a NULL in any non-value column — a contaminated row
    slipping a decontamination gate). A NULL probe VALUE has no hash —
    it probes false. Raises on probe column names colliding with the
    internals (the skyline reserved-name rule)."""
    reserved = {hit_col, "_bh1", "_bh2"} | {f"_bp{i}" for i in range(k)} | {
        f"_bin{i}" for i in range(k)
    }
    clash = [c for c in df.columns if c in reserved]
    if clash:
        raise ValueError(f"bloom_probe reserves column names {clash}")
    s = F.col(value).cast("string")
    out = df.withColumn(
        "_bh1", F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
    ).withColumn(
        "_bh2", F.conv(F.substring(F.md5(s), 16, 15), 16, 10).cast("bigint")
    )
    for i in range(k):
        out = out.withColumn(
            f"_bp{i}",
            ((F.col("_bh1") + F.lit(i) * F.col("_bh2")) % F.lit(m_bits)).cast(
                "int"
            ),
        )
    cset = cells.select("pos").distinct()
    for i in range(k):
        ci = F.broadcast(cset.withColumnRenamed("pos", f"_bin{i}"))
        out = out.join(ci, out[f"_bp{i}"] == ci[f"_bin{i}"], "left")
    hit = F.lit(True)
    for i in range(k):
        hit = hit & F.col(f"_bin{i}").isNotNull()
    return out.select(*df.columns, hit.alias(hit_col))


# ------------------------------------------------------------------ KMV

def kmv_cells(
    df: DataFrame,
    value: str,
    k: int = 256,
    keys: Sequence[str] = (),
) -> DataFrame:
    """K-minimum-values sketch of ``value``'s distinct set as a sparse
    RELATION: per key group, the ``k`` SMALLEST distinct 60-bit md5
    hashes (``*keys``, h) — the fifth mergeable sketch family, and the
    one that buys what HLL structurally cannot: SET-OPERATION
    estimates. Two KMV sketches intersect/union by plain relational
    algebra (merge = union-distinct → re-take the k smallest,
    associative/idempotent; jaccard ≈ share of the merged sketch's
    members present in both inputs — Beyer et al., SIGMOD 2007;
    Bar-Yossef et al., RANDOM 2002), so "how many distinct customers
    do these two segments SHARE" becomes a kilobyte-relation join.
    Everything is exact md5 integer arithmetic — the FULL cell
    relation is bit-checkable in DuckDB (the hll_cells discipline).

    Scale shape: the distinct-hash relation never collects per group —
    the k smallest are selected by grouped_exact_ranks' two-level
    histogram rank (operators/analytics): a coarse value-bucket
    partial agg bounded by range/width, cumulative offsets over that
    BIN relation, and row_number within (group, bucket) partitions
    whose size is bucket occupancy — never a whole group in one window
    partition even when ``keys`` is low-cardinality (the r07
    window_ranking_extras lesson, reused verbatim). A collect_set
    bottom-k would materialize every distinct hash per group in one
    task; this shape's shuffles are all partial-agg or
    occupancy-bounded.
    """
    from openetl_spark.operators.analytics import grouped_exact_ranks

    if k < 1:
        raise ValueError(f"kmv_cells: k must be >= 1, got {k}")
    clash = {"h", "_negh", "_g"} & set(keys)
    if clash:
        # the bloom_probe/grouped_exact_ranks reserved-name rule
        raise ValueError(f"kmv_cells reserves column names {sorted(clash)}")
    s = F.col(value).cast("string")
    h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
    grp = list(keys) if keys else []
    dh = (
        df.filter(F.col(value).isNotNull())
        .select(*grp, h.alias("h"))
        .distinct()
        .withColumn("_negh", -F.col("h"))
    )
    if not grp:
        dh = dh.withColumn("_g", F.lit(0))
        grp = ["_g"]
    elif len(grp) > 1:
        raise ValueError("kmv_cells: at most one key column supported")
    # rank h ASC as (-h) DESC through the histogram-rank machinery;
    # hashes are uniform in [0, 2^60), so 2^44-wide buckets give ~65k
    # bins — occupancy (the window-partition size) ~ n/65k per group.
    ranked = grouped_exact_ranks(
        dh, grp[0], "_negh", "h", bucket_width=float(1 << 44)
    )
    out = ranked.filter(F.col("pos") <= k).select(
        *(list(keys) if keys else []), "h"
    )
    return out


def kmv_merge(
    cells_a: DataFrame,
    cells_b: DataFrame,
    k: int = 256,
    keys: Sequence[str] = (),
) -> DataFrame:
    """OR-merge two KMV cell relations: union-distinct, then re-take
    the k smallest per group (associative + idempotent — the
    bloom/hll merge-law discipline, property-tested). Cell relations
    are ≤ k rows per group, so the re-rank runs on sketch-sized
    input — a plain per-group window is safe HERE (bounded by 2k)."""
    from pyspark.sql import Window

    u = cells_a.unionByName(cells_b).distinct()
    grp = list(keys)
    w = (
        Window.partitionBy(*grp).orderBy("h")
        if grp
        else Window.partitionBy(F.lit(0)).orderBy("h")
    )
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(
    cells: DataFrame, k: int = 256, keys: Sequence[str] = ()
) -> DataFrame:
    """Distinct-count estimate from a KMV cell relation: when a group
    holds k cells, n̂ = (k−1)·2^60 / h_(k) (h_(k) = the k-th smallest
    hash — the unbiased KMV estimator, Beyer et al. 2007); with fewer
    than k cells every distinct value is IN the sketch and the count
    is exact. One tiny aggregate per group over ≤ k rows."""
    grp = list(keys)
    agg = cells.groupBy(*grp).agg(
        F.count("*").alias("n_cells"), F.max("h").alias("hk")
    )
    est = F.when(
        F.col("n_cells") < k, F.col("n_cells").cast("double")
    ).otherwise(
        (k - 1) * float(1 << HASH_BITS) / F.col("hk")
    )
    return agg.select(*grp, "n_cells", est.alias("estimate"))


def ams_cells(
    df: DataFrame,
    value: str,
    keys: Sequence[str] = (),
    k: int = 63,
    seed: int = 42,
) -> DataFrame:
    """AMS "tug-of-war" second-moment sketch cells (Alon, Matias &
    Szegedy, STOC 1996) of ``value``'s frequency vector, per ``keys``
    group: (``*keys``, i, c) with 0 ≤ i < ``k`` and c_i = Σ_v
    s_i(v)·f_v, where f_v is v's row count and s_i(v) ∈ {−1, +1} is a
    deterministic md5-derived sign — E[c_i²] = F₂ = Σ_v f_v², the
    SELF-JOIN SIZE of the column, which is what a query optimizer
    wants before running the join and what a skew auditor reads as
    the repeat-rate mass. The sixth mergeable family next to
    histogram/CMS/HLL/Bloom/KMV, covering the moment F₂ none of them
    estimates.

    Determinism/mergeability (the cell-relation discipline): each
    counter is a plain SUM of per-row ±1 terms keyed by
    md5(seed:i:value) — sums are merge-order-free, so the cells of a
    UNION are the elementwise sums of per-part cells (ams_merge;
    property-tested), per-batch cells append in a streaming log, and
    every cell renders bit-identically in DuckDB (FULL oracle). This
    is exactly the determinism KLL/GK cannot offer (SCALE.md r09) —
    AMS's state is a sum, theirs is a merge-tree-shaped buffer.

    Shape (r12 optimization): c_i = Σ_v s_i(v)·f_v depends on the
    DISTINCT-value frequency vector only, so the corpus pass is one
    map-side-combinable grouped count per (keys, value) — the k-sign
    md5 array is computed once per DISTINCT value (weighted by its
    count), not once per corpus row, cutting the hash work from
    k·rows to k·distinct (a ~63× f̄ reduction at any scale, f̄ the
    mean frequency; the earlier per-row explode re-derived the same
    63 signs for every repeat of a hot key). The (keys, value, f)
    shuffle is partial-aggregated; the sign explode then feeds a
    second k-rows-per-group partial agg. Result rows and every c_i
    are bit-identical to the per-row form (sum linearity). NULLs are
    excluded (they carry no frequency mass).

    Counters fit comfortably: |c_i| ≤ total rows < 2⁶³.
    """
    if k < 1:
        raise ValueError(f"ams_cells: k must be >= 1, got {k}")
    freq = (
        df.filter(F.col(value).isNotNull())
        .groupBy(*keys, value)
        .agg(F.count("*").cast("bigint").alias("_f"))
    )
    return ams_cells_from_freq(freq, value, keys=keys, k=k, seed=seed)


def ams_cells_from_freq(
    freq: DataFrame,
    value: str,
    keys: Sequence[str] = (),
    k: int = 63,
    seed: int = 42,
) -> DataFrame:
    """``ams_cells`` from a PRECOMPUTED distinct-value frequency
    relation ``(keys..., value, _f)`` — the sharing hook for reports
    that need the frequency vector anyway (exact join-size arm, F₂
    sums): compute the grouped count once, persist it, and derive the
    sketch WITHOUT re-scanning the corpus (r12 optimization pass).
    Contract: ``_f`` is the exact row count per (keys, value) with
    NULL values excluded — exactly what ``ams_cells`` builds
    internally, so the cell relation is bit-identical."""
    if k < 1:
        raise ValueError(f"ams_cells_from_freq: k must be >= 1, got {k}")
    signed = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{seed}:"),
                                i.cast("string"),
                                F.lit(":"),
                                F.col(value).cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
            )
            * 2
            - 1
        )
        * F.col("_f"),
    )
    return (
        freq.select(*keys, F.posexplode(signed).alias("i", "_s"))
        .groupBy(*keys, "i")
        .agg(F.sum("_s").cast("bigint").alias("c"))
    )


def ams_merge(
    cells_a: DataFrame, cells_b: DataFrame, keys: Sequence[str] = ()
) -> DataFrame:
    """Merge two AMS cell relations: union + groupBy SUM — counters of
    a disjoint union of row sets are the elementwise sums (linearity
    of Σ s_i(v)·f_v in the frequencies). Associative and commutative;
    property-tested."""
    return (
        cells_a.unionByName(cells_b)
        .groupBy(*keys, "i")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def ams_f2_estimate(
    cells: DataFrame,
    keys: Sequence[str] = (),
    groups: int = 9,
) -> DataFrame:
    """F₂ estimate per ``keys`` group from an AMS cell relation by
    median-of-group-sums: counters are bucketed into ``groups``
    contiguous groups (i div group_size), each group contributes the
    INTEGER Σ c_i² over its counters, and the estimate is the exact
    median of those integers divided by group_size — with an ODD
    ``groups`` the median is one specific integer (no mid-pair
    averaging), so the only float in the output is one IEEE division,
    deterministic cross-engine. Chebyshev+Chernoff give the standard
    ε ≈ √(8/group_size) with error probability 2^{-Ω(groups)}.

    Returns (``*keys``, f2_estimate)."""
    if groups < 1 or groups % 2 == 0:
        raise ValueError(
            f"ams_f2_estimate: groups must be odd and >= 1, got {groups}"
        )
    # Guard: fewer cells than groups would make gsz = 0 and the tail
    # filter drop every row, emitting a silent NULL estimate — raise
    # at execution time instead (the cell count is data, not config).
    # The check lives on the per-KEY count relation (one row per key),
    # never in the per-cell filter expression — embedding raise_error
    # there measurably bloats the stage's codegen (review r10).
    n_cells = cells.groupBy(*keys).agg(
        F.when(F.count("*") >= groups, F.count("*"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("ams_f2_estimate: cell count "),
                    F.count("*").cast("string"),
                    F.lit(f" < groups={groups} for a key — rebuild the "
                          "sketch with k >= groups or lower groups"),
                )
            )
        )
        .alias("_k")
    )
    per_group = (
        cells.join(n_cells, list(keys)) if keys else cells.crossJoin(
            F.broadcast(n_cells)
        )
    )
    gsz = F.expr(f"_k div {groups}")
    per_group = (
        per_group.filter(F.col("i") < gsz * groups)  # drop the ragged tail
        .select(
            *keys,
            F.expr(f"i div (_k div {groups})").alias("_g"),
            (F.col("c") * F.col("c")).alias("_c2"),
            gsz.alias("_gsz"),
        )
        .groupBy(*keys, "_g")
        .agg(F.sum("_c2").cast("bigint").alias("_s"), F.max("_gsz").alias("_gsz"))
    )
    # exact integer median of an odd count: histogram-free here — the
    # relation is groups-sized per key (single-digit rows), a sort
    # within a tiny group via max over the bottom half
    w_rank = (
        per_group.groupBy(*keys)
        .agg(
            F.expr(f"sort_array(collect_list(_s))[{groups // 2}]").alias("_med"),
            F.max("_gsz").alias("_gsz"),
        )
    )
    return w_rank.select(
        *keys, (F.col("_med") / F.col("_gsz")).alias("f2_estimate")
    )


# Driver-fold bound (r12 session 3): the compress sweep operates on a
# relation bounded by the UNIVERSE (≤ 2^log_universe leaf cells plus
# the folded internals), never by the corpus — for log_universe ≤ 20
# that is ≤ 1M (v, c) longs (~16 MB), the observe/guard collect class.
# Folding driver-side replaces log_universe scheduled rounds (each a
# job + shuffle + localCheckpoint barrier on a kilobyte relation —
# pure scheduling overhead at ANY scale) with one bounded collect.
# Above the bound the distributed level loop below remains the path.
_QDIGEST_DRIVER_FOLD_MAX_L = 20


def _qdigest_fold_local(
    cells: dict[int, int], n: int, log_universe: int, sigma: int
) -> dict[int, int]:
    """The q-digest compress sweep on a collected cell dict — the SAME
    exact-integer fold as the distributed level loop (pooled child sums
    per parent, fold when s + c(parent) < ⌊n/σ⌋, bottom-up), executed
    driver-side on the universe-bounded relation. Python ints ARE the
    bigint arithmetic, so the result is bit-identical to the
    distributed fold (pinned by a unit test on both operators)."""
    t = n // sigma
    for lvl in range(log_universe, 0, -1):
        lo, hi = 1 << lvl, 1 << (lvl + 1)
        pooled: dict[int, int] = {}
        for v, c in cells.items():
            if lo <= v < hi:
                p = v >> 1
                pooled[p] = pooled.get(p, 0) + c
        for p, s in pooled.items():
            if s + cells.get(p, 0) < t:
                new_c = s + cells.pop(p, 0)
                cells.pop(2 * p, None)
                cells.pop(2 * p + 1, None)
                cells[p] = new_c
    return cells


def _qdigest_fold_df(cells: dict[int, int], spark) -> DataFrame:
    return spark.createDataFrame(
        [(int(v), int(c)) for v, c in sorted(cells.items())], "v long, c long"
    )


def qdigest_cells(
    df: DataFrame,
    value: str,
    log_universe: int,
    sigma: int = 32,
) -> DataFrame:
    """q-digest cells (Shrivastava, Buragohain, Agrawal & Suri,
    SenSys 2004) of an INTEGER ``value`` column in [0, 2**log_universe):
    (v, c) rows over the dyadic tree (heap ids: root 1, children
    2v/2v+1, leaf for x = 2**L + x) such that ranks read from the
    digest are within n·L/σ of exact — the GUARANTEED-rank-error
    mergeable quantile summary that KLL/GK cannot provide
    deterministically under Spark (SCALE.md r09): a q-digest is a pure
    function of the frequency MULTISET (leaf counts + a deterministic
    bottom-up compress sweep), not of any insertion or merge order.

    Build: leaf cells = per-value counts (one grouped agg — sparse,
    absent values carry nothing), then L bottom-up COMPRESS levels: at
    level ℓ the children of each parent pool their counts s, and if
    s + c(parent) < t = ⌊n/σ⌋ the children fold into the parent
    (detail too fine to matter at resolution t), else they stay.
    Every step is exact integer arithmetic on (v, c) relations —
    grouped sums and an anti-join per level, all bigint, rendering
    identically in DuckDB (FULL cell oracle). n and t ride a 1-row
    broadcast; the per-level relation shrinks toward O(σ·L) cells.

    ``log_universe`` ≤ 24 keeps the unrolled-level count (and the
    oracle) sane; values outside [0, 2^L) raise (ANSI mode surfaces
    the explicit check below).

    Returns (v, c): v the heap node id (bigint), c its count.
    """
    if not 1 <= log_universe <= 24:
        raise ValueError(
            f"qdigest_cells: log_universe={log_universe} outside [1, 24]"
        )
    if sigma < 1:
        raise ValueError(f"qdigest_cells: sigma must be >= 1, got {sigma}")
    big = 1 << log_universe
    val = F.col(value).cast("long")
    checked = F.when(
        (val >= 0) & (val < big), val
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"qdigest_cells: value outside [0, {big}) for "
                    f"log_universe={log_universe}: "
                ),
                val.cast("string"),
            )
        ).cast("long")
    )
    leaves = (
        df.filter(val.isNotNull())
        .select(checked.alias("_x"))
        .groupBy("_x")
        .agg(F.count("*").cast("bigint").alias("c"))
        .select((F.col("_x") + F.lit(big)).cast("bigint").alias("v"), "c")
    )
    if log_universe <= _QDIGEST_DRIVER_FOLD_MAX_L:
        # The leaf groupBy (the only corpus-scale work) stays
        # distributed; the fold runs driver-side on the collected
        # universe-bounded cells — one job instead of log_universe
        # scheduled rounds. Collected fresh per invocation (nothing is
        # memoized across calls).
        cells = {int(r["v"]): int(r["c"]) for r in leaves.collect()}
        n = sum(cells.values())
        return _qdigest_fold_df(
            _qdigest_fold_local(cells, n, log_universe, sigma),
            df.sparkSession,
        )
    n_rel = leaves.agg(F.sum("c").cast("bigint").alias("_n"))
    cur = leaves.crossJoin(F.broadcast(n_rel)).localCheckpoint()
    for lvl in range(log_universe, 0, -1):
        lo, hi = 1 << lvl, 1 << (lvl + 1)
        ch = cur.filter((F.col("v") >= lo) & (F.col("v") < hi))
        rest = cur.filter((F.col("v") < lo) | (F.col("v") >= hi))
        pooled = ch.groupBy(
            F.expr("v div 2").alias("p"), F.col("_n")
        ).agg(F.sum("c").cast("bigint").alias("s"))
        parents = rest.filter(
            (F.col("v") >= lo // 2) & (F.col("v") < lo)
        ).select(F.col("v").alias("p"), F.col("c").alias("pc"))
        dec = pooled.join(parents, "p", "left").select(
            "p",
            "s",
            F.coalesce("pc", F.lit(0)).cast("bigint").alias("pc"),
            "_n",
            (
                F.col("s") + F.coalesce("pc", F.lit(0))
                < F.expr(f"_n div {sigma}")
            ).alias("_fold"),
        )
        folded = dec.filter("_fold").select(
            F.col("p").alias("v"), (F.col("s") + F.col("pc")).alias("c"), "_n"
        )
        kept_children = ch.join(
            dec.filter("_fold").select("p"),
            F.expr("v div 2") == F.col("p"),
            "left_anti",
        )
        untouched = rest.join(
            dec.filter("_fold").select("p"),
            rest["v"] == F.col("p"),
            "left_anti",
        )
        cur = untouched.unionByName(kept_children).unionByName(folded)
        # Per-level checkpoint is LOAD-BEARING, not just lineage
        # hygiene: ``cur`` is referenced FOUR times per level (ch twice,
        # rest twice), so a lazy chain fans out ~4^levels copies of the
        # base subtree — a 4-level batch measurably OOMed the optimizer
        # on a 4g heap. The per-level job cost is scheduling on
        # kilobyte relations (~0.3 s/level locally, trivial on a
        # cluster). r12 re-measured the tempting halving (checkpoint
        # every 2nd level): the ~25-leaf lazy fan-out TRIPLED the
        # query (qdigest_cells 3.4 s → 11.4 s warm — optimizer +
        # duplicated level re-execution outweigh the saved rounds), so
        # the per-level checkpoint stays.
        cur = cur.localCheckpoint()
    return cur.select("v", "c")


def qdigest_merge(
    cells_a: DataFrame,
    cells_b: DataFrame,
    log_universe: int,
    sigma: int = 32,
) -> DataFrame:
    """Merge two q-digests: sum-union their cells, then re-run the
    deterministic compress sweep at the combined n. The result is a
    valid q-digest of the combined stream (error bounds add per the
    paper) and a pure function of the two input RELATIONS — no
    merge-order dependence — but unlike HLL/KMV/AMS it is not
    bit-identical to the digest built directly from the union (folding
    loses leaf resolution the direct build still had): the contract is
    bounded rank error, property-tested, not cell equality."""
    both = (
        cells_a.select("v", "c")
        .unionByName(cells_b.select("v", "c"))
        .groupBy("v")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    big = 1 << log_universe
    if log_universe <= _QDIGEST_DRIVER_FOLD_MAX_L:
        # Same driver-side fold as qdigest_cells: the summed cell
        # relation is universe-bounded (≤ 2 digests' cells), the fold
        # is pure bigint arithmetic.
        cells = {int(r["v"]): int(r["c"]) for r in both.collect()}
        n = sum(cells.values())
        return _qdigest_fold_df(
            _qdigest_fold_local(cells, n, log_universe, sigma),
            cells_a.sparkSession,
        )
    # re-express as a value stream is impossible (internal nodes span
    # ranges); compress directly on the summed cells instead
    n_rel = both.agg(F.sum("c").cast("bigint").alias("_n"))
    cur = both.crossJoin(F.broadcast(n_rel)).localCheckpoint()
    for lvl in range(log_universe, 0, -1):
        lo, hi = 1 << lvl, 1 << (lvl + 1)
        ch = cur.filter((F.col("v") >= lo) & (F.col("v") < hi))
        rest = cur.filter((F.col("v") < lo) | (F.col("v") >= hi))
        pooled = ch.groupBy(
            F.expr("v div 2").alias("p"), F.col("_n")
        ).agg(F.sum("c").cast("bigint").alias("s"))
        parents = rest.filter(
            (F.col("v") >= lo // 2) & (F.col("v") < lo)
        ).select(F.col("v").alias("p"), F.col("c").alias("pc"))
        dec = pooled.join(parents, "p", "left").select(
            "p",
            "s",
            F.coalesce("pc", F.lit(0)).cast("bigint").alias("pc"),
            "_n",
            (
                F.col("s") + F.coalesce("pc", F.lit(0))
                < F.expr(f"_n div {sigma}")
            ).alias("_fold"),
        )
        folded = dec.filter("_fold").select(
            F.col("p").alias("v"), (F.col("s") + F.col("pc")).alias("c"), "_n"
        )
        kept_children = ch.join(
            dec.filter("_fold").select("p"),
            F.expr("v div 2") == F.col("p"),
            "left_anti",
        )
        untouched = rest.join(
            dec.filter("_fold").select("p"),
            rest["v"] == F.col("p"),
            "left_anti",
        )
        cur = untouched.unionByName(kept_children).unionByName(folded)
        # Per-level checkpoint is LOAD-BEARING, not just lineage
        # hygiene: ``cur`` is referenced FOUR times per level (ch twice,
        # rest twice), so a lazy chain fans out ~4^levels copies of the
        # base subtree — a 4-level batch measurably OOMed the optimizer
        # on a 4g heap. The per-level job cost is scheduling on
        # kilobyte relations (~0.3 s/level locally, trivial on a
        # cluster). r12 re-measured the tempting halving (checkpoint
        # every 2nd level): the ~25-leaf lazy fan-out TRIPLED the
        # query (qdigest_cells 3.4 s → 11.4 s warm — optimizer +
        # duplicated level re-execution outweigh the saved rounds), so
        # the per-level checkpoint stays.
        cur = cur.localCheckpoint()
    return cur.select("v", "c")


def qdigest_rank_bounds(
    cells: DataFrame,
    log_universe: int,
    probe: DataFrame,
    probe_col: str = "q",
) -> DataFrame:
    """Rank bounds for each probe value q from a q-digest cell
    relation: lo = Σ c(v) over nodes whose dyadic interval lies
    entirely BELOW q (every such element is certainly < q), hi = lo +
    Σ c(v) over nodes whose interval CONTAINS q (those elements may
    fall either side). True rank(q) = |{x < q}| satisfies
    lo ≤ rank ≤ hi, with hi − lo ≤ L·⌊n/σ⌋ by the digest property —
    exact integer bounds, one broadcast join of the kilobyte cell
    relation against the probes, no sort.

    Node v at depth d (root depth 0, leaves depth L) covers values
    [ (v − 2^d)·2^(L−d), (v − 2^d + 1)·2^(L−d) ). Depth comes from the
    node id's BIT LENGTH (length(bin(v)) − 1 — Spark's bin() emits no
    leading zeros, mirroring DuckDB's ltrim(bin(v),'0')), and widths
    from integer shifts — no float log2/pow anywhere, so the bounds
    render bit-identically cross-engine."""
    d = (F.length(F.bin(F.col("v"))) - 1).cast("int")
    anno = cells.select("v", "c", d.alias("_d")).select(
        "c",
        (
            (F.col("v") - F.expr("shiftleft(cast(1 as bigint), _d)"))
            * F.expr(f"shiftleft(cast(1 as bigint), {log_universe} - _d)")
        ).alias("_lo"),
        (
            (F.col("v") - F.expr("shiftleft(cast(1 as bigint), _d)") + 1)
            * F.expr(f"shiftleft(cast(1 as bigint), {log_universe} - _d)")
        ).alias("_hi"),
    )
    q = F.col(probe_col).cast("long")
    joined = probe.crossJoin(F.broadcast(anno))
    return (
        joined.groupBy(probe_col)
        .agg(
            F.sum(F.when(F.col("_hi") <= q, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("rank_lo"),
            F.sum(
                F.when((F.col("_hi") <= q) | ((F.col("_lo") < q) & (q < F.col("_hi"))), F.col("c")).otherwise(0)
            )
            .cast("bigint")
            .alias("rank_hi"),
        )
    )


# --------------------------------------------------------- HyperBall

def hyperball(
    edges: DataFrame,
    hops: int = 4,
    p: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
    Centralities with HyperBall", ICDMW 2013 — the algorithm behind
    the Facebook four-degrees-of-separation measurement): per-node
    HyperLogLog counters of the hop-t ball B_t(v) = {u : d(v,u) ≤ t},
    advanced by the identity B_t(v) = {v} ∪ ⋃_{(v,u)∈E} B_{t-1}(u) —
    which on HLL registers is a MAX-MERGE along edges, so the entire
    per-hop state is one sparse cell relation (t, node, j, r) and a
    round is one cells⋈edges join + groupBy-max. Because max is
    associative/commutative/idempotent, the cells are a pure function
    of the graph — deterministic under any partitioning or execution
    order, hence a FULL bit-exact cross-engine oracle target (the
    hll_cells discipline; no float exists in the state).

    This is THE scale story for neighborhood functions: the exact
    ball relation is Σ_v |B_t(v)| rows (quadratic on small-diameter
    graphs), the HyperBall state is ≤ V·2^p rows per hop forever.
    Estimates (per-node ball sizes, the neighborhood function N(t),
    effective diameter) read off the cells via hll_estimate.

    Returns the union over t = 0..``hops`` of the cell relations,
    keyed (t, node, j, r); t=0 is each node's own singleton sketch.
    Fixed ``hops`` is the determinism contract (the bfs_hops/kcore
    bounded-round discipline); on these corpora the balls saturate
    within the bound.
    """
    if hops < 1:
        raise ValueError(f"hyperball: hops must be >= 1, got {hops}")
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = sym.select(F.col("u").alias("node")).distinct()
    cells = hll_cells(nodes, "node", keys=["node"], p=p).localCheckpoint()
    out = cells.select(F.lit(0).cast("int").alias("t"), "node", "j", "r")
    for t in range(1, hops + 1):
        nbr = (
            cells.join(sym, cells["node"] == sym["v"])
            .select(F.col("u").alias("node"), "j", "r")
        )
        cells = (
            cells.select("node", "j", "r")
            .unionByName(nbr)
            .groupBy("node", "j")
            .agg(F.max("r").alias("r"))
            .localCheckpoint()
        )
        out = out.unionByName(
            cells.select(F.lit(t).cast("int").alias("t"), "node", "j", "r")
        )
    return out


def ams_inner_product_estimate(
    cells_a: DataFrame,
    cells_b: DataFrame,
    keys: Sequence[str] = (),
    groups: int = 9,
) -> DataFrame:
    """JOIN-SIZE estimate from two AMS cell relations built with the
    SAME (seed, k) sign functions (Alon, Gibbons, Matias & Szegedy,
    PODS 1999 — the tug-of-war sketch's second act): E[cA_i·cB_i] =
    Σ_v fA(v)·fB(v), the inner product of the two frequency vectors,
    which IS the equi-join cardinality |A ⋈ B| — the number a query
    optimizer wants before picking a join strategy, estimated from
    2·k counters instead of scanning either side.

    Estimator: median over ``groups`` contiguous counter groups of
    the INTEGER Σ_{i∈g} cA_i·cB_i, divided by the group size — the
    ams_f2_estimate discipline (odd ``groups`` ⇒ the median is one
    specific integer; the only float is one IEEE division), so the
    estimate is bit-identical cross-engine. Variance per counter is
    ≤ 2·F₂(A)·F₂(B) (AGMS Lemma 4.1), so callers bound with
    3·√(2·F₂(A)·F₂(B)/group_size).

    Returns (``*keys``, j_estimate)."""
    if groups < 1 or groups % 2 == 0:
        raise ValueError(
            f"ams_inner_product_estimate: groups must be odd and >= 1, got {groups}"
        )
    j = cells_a.select(
        *keys, "i", F.col("c").alias("_ca")
    ).join(
        cells_b.select(*keys, "i", F.col("c").alias("_cb")),
        [*keys, "i"],
    )
    # Same silent-NULL edge as ams_f2_estimate: a joined cell count
    # below ``groups`` zeroes gsz and empties the key — raise instead,
    # on the per-KEY relation (see the f2 guard's codegen note).
    n_cells = j.groupBy(*keys).agg(
        F.when(F.count("*") >= groups, F.count("*"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("ams_inner_product_estimate: joined cell count "),
                    F.count("*").cast("string"),
                    F.lit(f" < groups={groups} for a key — both sketches "
                          "need k >= groups shared counters"),
                )
            )
        )
        .alias("_k")
    )
    per = (
        j.join(n_cells, list(keys)) if keys else j.crossJoin(F.broadcast(n_cells))
    )
    gsz = F.expr(f"_k div {groups}")
    per = (
        per.filter(F.col("i") < gsz * groups)
        .select(
            *keys,
            F.expr(f"i div (_k div {groups})").alias("_g"),
            (F.col("_ca") * F.col("_cb")).alias("_p"),
            gsz.alias("_gsz"),
        )
        .groupBy(*keys, "_g")
        .agg(F.sum("_p").cast("bigint").alias("_s"), F.max("_gsz").alias("_gsz"))
    )
    med = per.groupBy(*keys).agg(
        F.expr(f"sort_array(collect_list(_s))[{groups // 2}]").alias("_med"),
        F.max("_gsz").alias("_gsz"),
    )
    return med.select(
        *keys, (F.col("_med") / F.col("_gsz")).alias("j_estimate")
    )
