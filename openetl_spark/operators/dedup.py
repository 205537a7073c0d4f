"""Deduplication operators for large-scale text corpora (SURVEY.md §2C
C26-C27; driver-mandated training-data-pipeline surface).

All hot paths are built-in Column expressions (JVM, whole-stage
codegen): shingling via ``slice``/``transform`` array ops, MinHash via
``xxhash64`` + ``array_min``, SimHash via explode + 64 conditional
sums. No Python UDFs anywhere.

Scale design notes:

* exact dedup — one hash-shuffle on the dedup key (md5 of the text,
  not the text itself, so 100 TB of text shuffles as 16-byte keys when
  ``key_only`` grouping applies).
* MinHash+LSH — signatures are computed scan-side (no shuffle), then
  band buckets explode ×``bands`` and ONE shuffle groups candidates;
  the candidate self-join only ever materializes colliding pairs, never
  the n² cross product.
* SimHash — 64-bit fingerprint scan-side, then hamming-≤k candidate
  mining by the pigeonhole trick: split the fingerprint into k+1
  chunks; any pair within distance k collides on ≥1 chunk, so an
  equi-join per chunk finds all candidates with no cross product.
* n-gram jaccard — pair mining explodes distinct shingles and
  equi-joins on the shingle key (shuffle volume = shingle rows, linear
  in corpus size; join fan-out is only real collisions). Verification
  is per-pair ``array_intersect`` over the candidates' shingle arrays —
  the candidate relation is collision-sized, so it broadcasts and the
  corpus is never re-shuffled to verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openetl_spark.operators.skew import spread_cpu_dense


# ---------------------------------------------------------------- exact

def dedup_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact dedup, arbitrary survivor (≈ dropDuplicates)."""
    return df.dropDuplicates(subset)


def dedup_exact_keep_min(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup keeping the row with the smallest ``id_col`` per key —
    deterministic survivor selection (oracle-checkable, unlike
    dropDuplicates' arbitrary pick). One shuffle on the key columns."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ------------------------------------------------------------- shingles

def with_shingles(
    df: DataFrame, text_col: str, n: int = 5, out: str = "shingles"
) -> DataFrame:
    """Distinct word n-gram shingles as an array column. Pure array
    expressions: split → sequence of start offsets → slice+join.
    Tokenization is \\s+ with empty tokens dropped (so leading/irregular
    whitespace can't mint phantom shingles)."""
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return df.withColumn(out, F.array_distinct(shingles))


# -------------------------------------------------------------- minhash

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    shingle_col: str = "shingles",
    num_hashes: int = 128,
    out: str = "minhash",
    extra_cols: tuple = (),
) -> DataFrame:
    """MinHash signatures as (id, *extra_cols, minhash array) — one row per id,
    computed entirely scan-side: ZERO shuffles.

    Shape matters for both speed and scale: hash each shingle string
    ONCE (xxhash64), then derive the hash family as
    xxhash64(base_hash, seed_i) — cheap long mixing instead of
    ``num_hashes`` string hashes. Both passes are higher-order-function
    loops over the per-row shingle array, so codegen emits two small
    nested loops rather than ``num_hashes`` unrolled expressions.
    (History: an explode → groupBy with 128 min-aggregates computed the
    same values but paid a shuffle AND ~3 s of aggregate codegen
    compilation per query; before that, 128 separate
    array_min(transform(...)) projection COLUMNS were ~20× slower still
    — the unrolled method exceeded JIT limits. The loop form is the
    fast shape at both bench and cluster scale.)"""
    hs = F.transform(F.col(shingle_col), lambda s: F.xxhash64(s))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(hs, lambda h: F.xxhash64(h, i))),
    )
    return df.select(F.col(id_col), *extra_cols, sig.alias(out))


def _banded_signatures(
    df: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    sig_col: str = "minhash",
    extra_cols: tuple = (),
) -> DataFrame:
    """Explode a signature relation into (id, *extra_cols, band, band_hash) rows.
    Band hash = xxhash64 of the band's r signature elements + band id,
    taken straight off the array. A higher-order-function loop over
    the band index keeps codegen to one small loop body instead of
    ``bands`` unrolled hash expressions (r is a Python int, so the
    element accesses inside the body are a fixed r-ary xxhash64)."""
    r = num_hashes // bands
    return df.select(
        F.col(id_col),
        *extra_cols,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    *[F.element_at(F.col(sig_col), b * r + j + 1) for j in range(r)],
                    b,
                ),
            )
        ).alias("band", "band_hash"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    shingle_col: str = "shingles",
    num_hashes: int = 128,
    bands: int = 32,
    sig_col: str = "minhash",
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: split the signature into
    ``bands`` bands of ``num_hashes/bands`` rows, hash each band, group
    by (band index, band hash). Returns distinct (a, b) id pairs with
    a < b. Pair probability ≈ 1-(1-s^r)^b for jaccard s."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    if sig_col not in df.columns:
        df = minhash_signatures(df, id_col, shingle_col, num_hashes, sig_col)
    # localCheckpoint before the self-join: both join sides are the
    # SAME banded relation, and left lazy each side re-ran the whole
    # signature pipeline — ``num_hashes`` xxhash64 passes over every
    # shingle, the dominant CPU of the operator, paid twice (r12 plan:
    # two Generate(posexplode) subtrees over the cached shingle
    # relation). Banded rows are (id, band, band_hash) — docs×bands of
    # ~24 bytes — so materializing is corpus-row cheap and the
    # signature computation is paid exactly once.
    banded = _banded_signatures(df, id_col, num_hashes, bands, sig_col).localCheckpoint()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b"))
        .distinct()
    )


# ------------------------------------------------------ jaccard (exact)

def jaccard_similarity_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str = "shingles",
    threshold: float = 0.8,
    cache: bool = True,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact jaccard over distinct shingles: returns (a, b, jaccard)
    for pairs with similarity ≥ threshold, a < b. Columns aliased for
    the DuckDB oracle (round to 6 dp to absorb float noise).

    ``max_shingle_df`` bounds the self-join at scale: the pair-mining
    join fans out as Σ df(s)² per shingle, so one boilerplate shingle
    shared by 10⁵ docs would yield 10¹⁰ join rows. With a cap, shingles
    with document frequency > cap are excluded from *pair mining only*
    (standard stop-shingle practice); the mined candidates' jaccard is
    then recomputed over the FULL shingle sets, so every returned value
    is exact. Join input is provably ≤ cap·|shingle rows| and output
    ≤ cap²·|distinct shingles|. The only approximation is recall: a
    qualifying pair is missed only if ALL its shared shingles are
    hotter than the cap — for a near-dup pair at threshold t the pair
    shares ≥ t/(1+t)·(|A|+|B|) shingles, so any reasonable cap (≥ the
    corpus's boilerplate df) leaves recall intact; the cap-invariance
    test pins this on testdata.

    ``cache=True`` persists the exploded shingle relation for the
    branches that consume it. The cache is session-LRU managed, not
    unpersisted here (the result is lazy; releasing before action would
    defeat it) — long-lived sessions running MANY corpora can pass
    cache=False or unpersist via the returned plan's ``_cached_deps``."""
    sh = df.select(
        F.col(id_col).alias("id"), F.array_distinct(F.col(shingle_col)).alias("sh")
    )
    if cache:
        sh = sh.persist()
    # Exploded (id, shingle) relation — pair MINING only; verification
    # runs on the shingle arrays (see _verify_jaccard_on_candidates).
    ex = sh.select("id", F.explode("sh").alias("s"))

    mine = ex
    if max_shingle_df is not None:
        # document frequency per shingle; drop hot shingles from the
        # mining join (broadcast-sized at any cap worth using is NOT
        # assumed — this is a shuffle join on the shingle key)
        rare = (
            ex.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("s")
            # persist: `mine` sits on BOTH sides of the pair
            # self-join, so this dictionary-sized frequency relation
            # was aggregated from the full exploded shingle relation
            # twice (r12 plan: two Exchange+HashAggregate subtrees).
            # Cached once, each side rebuilds only its broadcast —
            # lazy persist (not localCheckpoint) so Catalyst keeps the
            # size stats that make the consumer joins broadcast.
            .persist()
        )
        mine = ex.join(rare, "s")

    pairs = (
        mine.alias("x")
        .join(mine.alias("y"), (F.col("x.s") == F.col("y.s")) & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    # Exact jaccard over the FULL shingle sets for the mined candidates
    # (capped mining may have excluded hot shingles from pair discovery,
    # but never from the verify) — every returned value is exact.
    out = _verify_jaccard_on_candidates(pairs, sh, threshold)
    out._cached_deps = [sh] if cache else []
    return out


def _verify_jaccard_on_candidates(
    cands: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact jaccard for (a, b) candidate pairs against the per-doc
    distinct-shingle ARRAY relation ``sh`` (columns id, sh) — shared
    tail of every candidates-then-verify pipeline (n-gram mining,
    MinHash/LSH, SimHash).

    Shape: two equi-joins attaching each side's shingle array, then
    |A∩B| via ``array_intersect`` — all JVM codegen, no Python. The
    candidate set is collision-sized (orders of magnitude smaller than
    the corpus), so AQE broadcasts it and the corpus side is scanned,
    never shuffled; the per-row intersect replaces the former
    explode → (b,s)-join → groupBy chain, which shuffled the whole
    exploded shingle relation twice."""
    a = sh.select(F.col("id").alias("a"), F.col("sh").alias("_sa"))
    b = sh.select(F.col("id").alias("b"), F.col("sh").alias("_sb"))
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    return (
        cands.join(a, "a")
        .join(b, "b")
        .withColumn(
            "jaccard",
            F.round(
                inter / (F.size(F.col("_sa")) + F.size(F.col("_sb")) - inter), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    cache: bool = True,
) -> DataFrame:
    """Full near-dup pipeline: shingle → MinHash/LSH candidates → exact
    jaccard verification on candidates only. The production-scale path:
    jaccard runs on the (tiny) candidate set, not the corpus.

    The per-doc distinct-shingle array relation is the shared base of
    both branches (scan-side signatures and array-intersect
    verification) — cached so the corpus is scanned and shingled
    exactly once. The only shuffle in the whole pipeline is the LSH
    band self-join; signatures and verification never leave the scan."""
    sh = with_shingles(df, text_col, n).select(
        F.col(id_col).alias("id"), F.col("shingles").alias("sh")
    )
    if cache:
        sh = sh.persist()
    sig = minhash_signatures(sh, "id", "sh", num_hashes, "minhash")
    cands = minhash_lsh_candidates(sig, "id", num_hashes=num_hashes, bands=bands, sig_col="minhash")
    out = _verify_jaccard_on_candidates(cands.select("a", "b"), sh, threshold)
    out._cached_deps = [sh] if cache else []
    return out


def prepare_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_hashes: int = 128,
) -> DataFrame:
    """The persistable dedup-index relation: (id, sh, minhash) — one
    row per document carrying its distinct shingle array (what exact
    verification needs) and its MinHash signature (what candidate
    banding needs). Write this once per ingested batch and
    ``incremental_near_duplicates(index_prepared=True)`` never touches
    index document TEXT again: banding reads 128 longs per doc, and
    verification's shingle access is pruned to the ids that actually
    collide with a new doc. Columns are fixed (id/sh/minhash) so
    batches append to one parquet index regardless of source schema."""
    sh = with_shingles(df, text_col, n).select(
        F.col(id_col).alias("id"), F.col("shingles").alias("sh")
    )
    return minhash_signatures(sh, "id", "sh", num_hashes, extra_cols=("sh",))


def incremental_near_duplicates(
    new_df: DataFrame,
    index_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_hashes: int = 128,
    bands: int = 64,
    threshold: float = 0.5,
    cache: bool = True,
    index_prepared: bool = False,
) -> DataFrame:
    """Dedup a NEW document batch against an existing corpus (the
    "index") plus itself — the incremental posture of a continuously
    growing training corpus, where re-deduplicating the full history
    on every ingest is the scale-killer. Reference parity: the
    reference has no incremental dedup; this is part of the
    Spark-native training-pipeline surface (SURVEY.md §2C C26/C27).

    Candidate generation shares the MinHash/LSH banding of
    ``minhash_near_duplicates`` but only ever joins NEW band rows
    against (index ∪ new) band rows — index×index pairs are never
    enumerated, so per-ingest cost is O(|new| · collision rate), not
    O(|corpus|²) and not even O(|corpus|): the index side contributes
    one scan to recompute signatures (in production the signature
    relation is persisted at build time — 128 longs per doc — and this
    scan disappears; verification still re-reads only the index docs
    that actually collide with a new doc, a collision-sized semi-join).

    A new doc is flagged when it has a qualifying partner in the index
    (any id) or an earlier (smaller-id) partner within its own batch —
    the same survivor rule exact dedup uses, so a batch containing an
    internal dup group keeps exactly its smallest id. Returns one row
    per flagged NEW doc: (id, n_dups, dup_of = smallest qualifying
    partner, jaccard of that pair), jaccard exact over full shingle
    sets (verification never trusts the sketch).

    Pass ``index_prepared=True`` when ``index_df`` is already a
    ``prepare_minhash_index`` relation (read back from the persisted
    parquet index) — signatures and shingles come off disk and index
    text is never re-shingled; this is the streaming dedup-on-arrival
    posture (each microbatch dedups against the index, then appends
    its own prepared rows)."""
    prep_new = prepare_minhash_index(new_df, id_col, text_col, n, num_hashes)
    prep_idx = (
        index_df.select("id", "sh", "minhash")
        if index_prepared
        else prepare_minhash_index(index_df, id_col, text_col, n, num_hashes)
    )
    # ONE tagged union drives both banding and verification — the side
    # flag rides the band join so only (any × new) pairs are kept.
    # new × index: partner id unconstrained (index ids may exceed new
    # ids); new × new: smaller id is the partner.
    allp = prep_idx.withColumn("_isidx", F.lit(True)).unionByName(
        prep_new.withColumn("_isidx", F.lit(False))
    )
    if cache:
        allp = allp.persist()
    # Checkpointed for the same reason as minhash_lsh_candidates: the
    # band join consumes this relation twice (new-side filter + full
    # side) and the signature hashing should be paid once.
    banded = _banded_signatures(
        allp, "id", num_hashes, bands, extra_cols=("_isidx",)
    ).localCheckpoint()
    on = ["band", "band_hash"]
    x = banded.filter(~F.col("_isidx")).select(F.col("id").alias("b"), *on)
    cands = (
        banded.select(F.col("id").alias("a"), "_isidx", *on)
        .join(x, on)
        .filter(
            (F.col("a") != F.col("b"))
            & (F.col("_isidx") | (F.col("a") < F.col("b")))
        )
        .select("a", "b")
        .distinct()
    )
    pairs = _verify_jaccard_on_candidates(cands, allp.select("id", "sh"), threshold)
    flagged = (
        pairs.groupBy("b")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(F.struct("a", "jaccard")).alias("_m"),
        )
        .select(
            F.col("b").alias(id_col),
            "n_dups",
            F.col("_m.a").alias("dup_of"),
            F.col("_m.jaccard").alias("jaccard"),
        )
    )
    flagged._cached_deps = [allp] if cache else []
    return flagged


# -------------------------------------------------------------- simhash

def portable_hash64_array(shingles: Column) -> Column:
    """Engine-portable 64-bit hash per array element: two 32-bit md5
    halves packed with a bitwise shift (DuckDB mirrors each half with
    CAST('0x'||substr(md5(s),...) AS BIGINT))."""

    def _h64(s):
        hi = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("long")
        return F.shiftleft(hi, 32).bitwiseOR(lo)

    return F.transform(shingles, _h64)


def with_simhash(
    df: DataFrame,
    id_col: str,
    shingle_col: str = "shingles",
    out: str = "simhash",
    portable: bool = False,
    hashes_col: str | None = None,
) -> DataFrame:
    """64-bit SimHash: hash each shingle (xxhash64), per bit position sum
    +1/-1 across shingles, sign → bit. Computed entirely scan-side as
    higher-order-function loops over the per-row shingle array — ZERO
    shuffles and a few small codegen loops. (History: explode → groupBy
    with 64 sum-aggregates + a join back computed the same values but
    paid a shuffle, a join, and seconds of aggregate-codegen compile.)

    ``portable=True`` (r06) swaps xxhash64 for an engine-portable
    64-bit md5 hash — two 32-bit halves from the md5 hex prefix,
    recombined with a bitwise shift (shifts are not ANSI-checked, so
    the high half's top bit packs exactly) — letting a DuckDB oracle
    re-derive the FINGERPRINTS bit-exactly (same split the oracle
    keeps: DuckDB's checked ``<<`` cannot pack the high half, so it
    compares per-half). Production paths keep xxhash64 (one JVM hash
    vs md5+conv+substr per shingle). The 64-step bit loop references
    the hash array once per bit, and Catalyst re-inlines the hashing
    expression into every evaluation — cheap for xxhash64, 64× md5 for
    portable (measured 1.4 s → 5.3 s at sf0.1). Callers on the
    portable path should precompute the array onto a PERSISTED
    relation and pass ``hashes_col`` — InMemoryRelation is a
    project-collapse barrier, so the cached column is hashed exactly
    once (simhash_near_duplicates does this).

    Assembly detail: bits are packed via Horner's rule over two 32-bit
    halves (acc*2 + bit, high bits first) and combined with one
    shiftleft(·, 32). A single 64-bit Horner pass would overflow a
    signed long at the top bit under ANSI arithmetic; shifts are
    bitwise, not ANSI-checked, so the halved form is exact."""
    if hashes_col is not None:
        hs = F.col(hashes_col)
    elif portable:
        hs = portable_hash64_array(F.col(shingle_col))
    else:
        hs = F.transform(F.col(shingle_col), lambda s: F.xxhash64(s))
    # Per bit i: sign of Σ_shingles (2·bit_i(h) − 1) chooses the term
    # 2^i or 0; the fingerprint is the XOR-fold of the 64 terms. The
    # packing weight is looked up from a literal array INSIDE the same
    # loop that computes the bit — expression trees here must be
    # straight-line (each subexpression referenced once): Catalyst
    # inlines multiply-referenced projections into higher-order-function
    # bodies, re-evaluating them per loop step (measured 20-30 s at
    # sf0.1 for a Horner pass referencing a shared bits array).
    # 2^63 as a signed long is MIN_LONG; the weight array carries it
    # directly so no shift/arithmetic can overflow under ANSI.
    weights = F.array(
        *[F.lit(1 << i).cast("long") for i in range(63)],
        F.lit(-(1 << 63)).cast("long"),
    )
    terms = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.when(
            F.aggregate(
                hs,
                F.lit(0),
                lambda acc, h: acc + (F.getbit(h, i) * 2 - 1),
            )
            > 0,
            F.element_at(weights, i + 1),
        ).otherwise(F.lit(0).cast("long")),
    )
    packed = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, t: acc.bitwiseXOR(t)
    )
    return df.withColumn(out, packed)


def pigeonhole_candidate_stream(
    df: DataFrame,
    id_col: str,
    simhash_col: str = "simhash",
    max_hamming: int = 3,
    min_chunk_bits: int = 8,
    allow_dense: bool = False,
) -> DataFrame:
    """The RAW pigeonhole candidate stream — every (a, b, ha, hb) pair
    some chunk equi-join emits, BEFORE the hamming filter and the
    distinct. Exposed separately (r06, VERDICT #2) so scale tests can
    measure what the join actually enumerates: the hamming filter runs
    per enumerated pair, it does not prevent enumeration, so THIS
    relation's size is the miner's true cost.

    Density guard: with k+1 chunks over 64 bits, a random unrelated
    pair collides on some chunk with probability ≈ Σ_c 2^-width_c, and
    the stream carries ~n²·p/2 rows — at the r05-shipped k=16 (3–4-bit
    chunks) p ≈ 0.9, i.e. NEAR-QUADRATIC enumeration regardless of
    corpus content. Chunk widths below ``min_chunk_bits`` (default 8 →
    budgets ≤ 7) therefore raise, directing wide budgets to MinHash
    banding, whose collision keys live in a 60-bit hash domain instead
    of a ⌊64/(k+1)⌋-bit one. ``allow_dense=True`` overrides for
    small-corpus diagnostics. Buckets stay sparse only while
    n ≲ 2^width — at larger corpora narrow the budget or use MinHash
    (SCALE.md §hamming-mining)."""
    chunks = max_hamming + 1
    if chunks > 64:
        raise ValueError("max_hamming must be ≤ 63 for a 64-bit simhash")
    base, rem = divmod(64, chunks)
    if base < min_chunk_bits and not allow_dense:
        raise ValueError(
            f"max_hamming={max_hamming} needs {chunks} chunks of "
            f"{base}-bit width over a 64-bit fingerprint — random pairs "
            f"collide with p≈{chunks / 2.0 ** base:.2f} and the candidate "
            "join degenerates toward all-pairs. Use a budget ≤ "
            f"{64 // min_chunk_bits - 1}, or MinHash/LSH banding for "
            "wide-radius mining (allow_dense=True overrides for "
            "small-corpus diagnostics)."
        )
    widths = [base + 1] * rem + [base] * (chunks - rem)
    offsets = [sum(widths[:i]) for i in range(chunks)]
    # signed-long masks: all-ones for a full-width chunk (2^64-1 doesn't
    # fit a JVM long)
    masks = [-1 if w >= 64 else (1 << w) - 1 for w in widths]
    banded = df.select(
        F.col(id_col),
        F.col(simhash_col),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col(simhash_col), offsets[c])
                    .bitwiseAND(F.lit(masks[c]))
                    for c in range(chunks)
                ]
            )
        ).alias("chunk", "chunk_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return a.join(
        b,
        (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.chunk_val") == F.col("b.chunk_val"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("a"),
        F.col(f"b.{id_col}").alias("b"),
        F.col(f"a.{simhash_col}").alias("ha"),
        F.col(f"b.{simhash_col}").alias("hb"),
    )


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    simhash_col: str = "simhash",
    max_hamming: int = 3,
    min_chunk_bits: int = 8,
    allow_dense: bool = False,
) -> DataFrame:
    """Hamming-≤k candidate pairs by pigeonhole banding: split 64 bits
    into k+1 chunks; any pair within distance k agrees on ≥1 full chunk.
    Equi-join per chunk — no cross product. Returns (a, b, hamming).

    Chunks cover ALL 64 bits (widths of ⌈64/(k+1)⌉ then ⌊64/(k+1)⌋ as
    the remainder runs out) — the recall guarantee only needs k+1
    chunks, but full coverage keeps precision from collapsing when the
    budget is large. Budgets whose chunk width would drop below
    ``min_chunk_bits`` raise (see pigeonhole_candidate_stream — the
    candidate join becomes near-quadratic); Manku et al. 2007 run 64-bit
    simhash at k=3 for web-scale dedup, and every shipped consumer here
    uses k ≤ 6."""
    raw = pigeonhole_candidate_stream(
        df, id_col, simhash_col, max_hamming, min_chunk_bits, allow_dense
    )
    # hamming filter BEFORE the distinct: the rowwise bit_count is
    # nearly free, so dedup only ever sees qualifying pairs — the raw
    # candidate stream is orders of magnitude larger than the result
    pairs = raw.filter(
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming
    ).distinct()
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def fingerprint_dedup_incremental(
    index: DataFrame,
    new: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 6,
    min_chunk_bits: int = 8,
    allow_dense: bool = False,
) -> DataFrame:
    """Hamming near-dup pairs of NEW fingerprints against index ∪ new —
    dedup-on-arrival for 64-bit perceptual fingerprints (aHash, audio
    energy-delta, simhash), mirroring ``incremental_dedup``'s contract:
    ONE tagged banding pass over index ∪ new, the candidate equi-join
    probes NEW rows only, and index×index is never enumerated (those
    pairs were mined when THEY arrived). Returns (a, b, hamming) with
    b always a new row and a either an index row or an earlier new row
    (a < b), so the union of per-batch results over an arrival
    sequence is exactly the one-shot batch miner's pair set, each pair
    once. Used by the streaming foreachBatch parity tests (r06,
    VERDICT #8)."""
    tag = "_is_new"
    both = index.select(
        F.col(id_col), F.col(fp_col), F.lit(False).alias(tag)
    ).unionByName(
        new.select(F.col(id_col), F.col(fp_col), F.lit(True).alias(tag))
    )
    chunks = max_hamming + 1
    base, rem = divmod(64, chunks)
    if base < min_chunk_bits and not allow_dense:
        raise ValueError(
            f"max_hamming={max_hamming} needs {chunks} chunks of "
            f"{base}-bit width — see pigeonhole_candidate_stream"
        )
    widths = [base + 1] * rem + [base] * (chunks - rem)
    offsets = [sum(widths[:i]) for i in range(chunks)]
    masks = [-1 if w >= 64 else (1 << w) - 1 for w in widths]
    banded = both.select(
        F.col(id_col),
        F.col(fp_col),
        F.col(tag),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col(fp_col), offsets[c])
                    .bitwiseAND(F.lit(masks[c]))
                    for c in range(chunks)
                ]
            )
        ).alias("chunk", "chunk_val"),
    )
    a = banded.alias("a")
    b = banded.filter(F.col(tag)).alias("b")  # probe side: NEW rows only
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (
                # (index, new) once, or (new, new) ordered a < b
                (~F.col(f"a.{tag}") & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")))
                | (F.col(f"a.{tag}") & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("a"),
            F.col(f"b.{id_col}").alias("b"),
            F.col(f"a.{fp_col}").alias("ha"),
            F.col(f"b.{fp_col}").alias("hb"),
        )
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming)
        .distinct()
    )
    return pairs.select(
        "a",
        "b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
    )


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    max_hamming: int = 6,
    threshold: float = 0.9,
    cache: bool = True,
    portable: bool = False,
) -> DataFrame:
    """SimHash as the coarse filter of a verified near-dup pipeline:
    shingle → 64-bit simhash → pigeonhole candidates at hamming ≤
    ``max_hamming`` → exact jaccard verification ≥ ``threshold`` on
    candidates only. Same candidates-then-verify architecture as
    ``minhash_near_duplicates``. The result is {pairs: hamming ≤ k AND
    jaccard ≥ threshold} — the hamming gate is PART of the semantics
    (with ``portable=True`` a DuckDB oracle re-derives both stages
    bit-exactly; see catalog ``simhash_dedup``).

    Budget choice (r06, VERDICT #2): a simhash bit's sign margin is
    ~√n_shingles, so ~100-token documents flip several bits per small
    edit — measured hamming of jaccard-0.9 pairs on this corpus runs
    to 8–12, so NO dense-safe budget covers every qualifying pair, and
    the r05-shipped k=16 made the candidate join near-quadratic (3–4
    bit chunks → random pairs collide at p≈0.9). k=6 keeps 9-bit
    chunks (random collision p≈1.3%, ~70× fewer enumerated candidates)
    and catches the near-identical mass simhash is actually for (Manku
    et al. 2007 use k=3 at 64 bits); recall-complete wide-radius
    mining is ``minhash_near_duplicates``' job, whose banding keys
    live in a 60-bit domain."""
    sh0 = with_shingles(df, text_col, n)
    if portable:
        # hash the shingles ONCE onto the (persisted) relation — the
        # 64-step bit loop would otherwise re-inline the md5 chain per
        # bit (see with_simhash docstring; 5.3 s → ~1.5 s at sf0.1)
        sh0 = sh0.withColumn("_h64", portable_hash64_array(F.col("shingles")))
    if cache:
        sh0 = sh0.persist()
    sh = sh0.select(F.col(id_col).alias("id"), F.col("shingles").alias("sh"))
    sim = with_simhash(
        sh0, id_col, "shingles",
        portable=portable,
        hashes_col="_h64" if portable else None,
    )
    cands = simhash_candidates(sim, id_col, max_hamming=max_hamming).select("a", "b")
    out = _verify_jaccard_on_candidates(cands, sh, threshold)
    out._cached_deps = [sh0] if cache else []
    return out


# ------------------------------------------- dedup groups (components)

def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the undirected near-dup pair graph —
    the step that turns PAIRWISE duplicates into dedup GROUPS (keep one
    doc per component; the reference has no counterpart, this is
    training-data-pipeline surface).

    Algorithm: iterative min-label propagation. Every node starts
    labeled with its own id; each round every node takes the minimum
    label among itself and its neighbors; at fixpoint each label is the
    smallest node id in the component. One shuffle per round (groupBy
    node), rounds ≈ label-propagation diameter of the widest component
    — near-dup clusters are shallow (pairs/cliques), so 2-3 rounds in
    practice. Convergence is detected by the (monotone, integral) sum
    of labels going unchanged; ``max_iter`` bounds adversarial chain
    graphs. Each round's labels are ``localCheckpoint``ed — iterative
    self-joins grow the LOGICAL plan exponentially if only persisted
    (persist caches data but keeps lineage; analysis itself OOMs by ~10
    rounds), while checkpointing truncates the plan so every round
    starts from a flat scan.

    ONE job per round (VERDICT r03 #9): the label sum rides the
    checkpoint's materialization job as an ``observe()`` metric —
    eager localCheckpoint fires observation metrics — instead of a
    second per-round agg action, halving the round count's job cost at
    scale.

    Returns (node, component) for every node with ≥1 edge.
    """
    from pyspark.sql import Observation

    def checkpoint_with_sum(df: DataFrame) -> tuple[DataFrame, int]:
        obs = Observation()
        out = df.observe(obs, F.sum("component").alias("s")).localCheckpoint()
        return out, obs.get["s"]

    sym = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).union(
        edges.select(F.col(dst).alias("x"), F.col(src).alias("y"))
    )
    sym = sym.localCheckpoint()
    labels, prev_sum = checkpoint_with_sum(
        sym.select(F.col("x").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["y"] == labels["node"])
            .groupBy("x")
            .agg(F.min("component").alias("nc"))
        )
        labels, new_sum = checkpoint_with_sum(
            labels.join(neighbor_min, labels["node"] == neighbor_min["x"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nc"), F.col("component"))
                ).alias("component"),
            )
        )
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


# ------------------------------------------------------------ winnowing

def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every CHARACTER k-gram,
    slide a window of ``window`` consecutive positions, keep each
    window's minimum hash (leftmost position on hash ties — Spark's
    struct ordering and DuckDB's struct min agree on this rule).
    Guarantee: two documents sharing any substring of length
    ≥ k + window − 1 select at least one identical fingerprint,
    REGARDLESS of alignment — the property position-strided sampling
    lacks and the reason MOSS uses winnowing. Character grams (not word
    shingles) catch copies that cross word boundaries and survive
    whitespace edits — the exact-substring half of the dedup family
    (Lee et al. 2022 dedup at 50-char spans is this shape).

    The hash is the engine-portable 60-bit md5 prefix
    (``conv(substr(md5(gram), 1, 15), 16, 10)`` ≡ DuckDB
    ``CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT)``), so oracles
    re-derive fingerprints bit-exactly.

    Physical shape: positions explode to rows with the k-gram hash
    computed in the SAME scan projection (the full text never
    shuffles), then the sliding minimum is one doc-keyed window pass.
    NOT nested array HOFs: a slice-of-materialized-array formulation
    re-inlines the whole hash array into every window step (Catalyst's
    project-collapse; the simhash 22 s lesson) — O(len²) md5 calls per
    document, measured as a hang at 500 docs. Window partitions are
    per-document positions: bounded by document length, the natural
    unit for a character-level operator."""
    t = F.col(text_col)
    base = df.filter(F.length(t) >= k + window - 1).select(
        F.col(id_col), t.alias("_t")
    )
    gram = F.col("_t").substr(F.col("_i"), F.lit(k))
    h = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint")
    g = base.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(1), F.length(F.col("_t")) - k + 1)
        ).alias("_i"),
        "_t",
    ).select(F.col(id_col), F.col("_i"), h.alias("_h"))
    order = Window.partitionBy(id_col).orderBy("_i")
    sel = (
        g.withColumn(
            "_m",
            F.min(F.struct(F.col("_h"), F.col("_i"))).over(
                order.rowsBetween(0, window - 1)
            ),
        )
        .withColumn("_mi", F.max("_i").over(Window.partitionBy(id_col)))
        .filter(F.col("_i") <= F.col("_mi") - (window - 1))
    )
    return (
        sel.select(F.col(id_col), F.col("_m._h").alias("fingerprint"))
        .distinct()
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = None,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    the exact-substring overlap miner. ``max_fp_df`` drops fingerprints
    present in more than that many documents BEFORE pair mining (the
    same boilerplate cap as the jaccard family: a corpus-wide k-gram
    would otherwise fan the self-join quadratically; overlap evidence
    comes from RARE fingerprints). One equi-join on the fingerprint
    key — shuffle volume is fingerprint rows (≈ 2/(window+1) of
    character count), join fan-out only real collisions, never n²."""
    # persist: the fingerprint relation feeds up to three consumers
    # (the df-cap aggregate + both self-join sides) — left lazy, the
    # per-character md5 explode + sliding-min window pass (the
    # operator's dominant CPU) ran once per consumer. Fingerprints are
    # two longs per row, ≈ 2/(window+1) of character count.
    fps = winnow_fingerprints(df, id_col, text_col, k, window).persist()
    if max_fp_df is not None:
        keep = (
            fps.groupBy("fingerprint")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_fp_df)
            .select("fingerprint")
        )
        fps = fps.join(keep, "fingerprint")
    a = fps.select(F.col(id_col).alias("a"), "fingerprint")
    b = fps.select(F.col(id_col).alias("b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def minhash_error_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 32,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """MinHash estimator calibration: for every pair with exact shingle
    jaccard ≥ threshold, the portable-minhash estimate (matching
    components / num_hashes) next to the exact value and the absolute
    error — the measurement behind choosing num_hashes (the estimator's
    std is √(j(1−j)/H); Broder 1997). The signature here hashes each
    (seed, shingle) with the engine-portable 60-bit md5 prefix so a
    DuckDB oracle re-derives the SIGNATURES bit-exactly — something the
    production xxhash64 path can't offer — making this the one place
    the approximate ESTIMATOR itself (not just the candidate recall) is
    differentially checked.

    Shape: signatures are computed ONLY for documents that appear in
    the exact-pair relation (one semi-join against the collision-sized
    pair-id set BEFORE the ×num_hashes explode — r06-s2: the unpruned
    corpus-wide explode cost ~4 s of md5 at sf0.1 for signatures the
    estimate join then discarded, and at 100 TB it would hash the
    whole corpus ×H for a kilobyte report); then (doc, seed, shingle)
    rows explode ×num_hashes → one partial-agg min per (doc, seed),
    and the estimate joins the signature relation twice against the
    exact pairs, never corpus × corpus. The ×H explode is the
    calibration harness's cost; the production signature path stays
    the scan-side xxhash64 HOF loop.

    The shingle relation is persisted ONCE and feeds both arms
    (r06-s2): Catalyst's InferFiltersFromGenerate pushes a
    ``size(shingles) > 0`` predicate into the scan, re-inlining the
    whole shingling transform into the filter — every unpersisted
    consumer shingles the corpus twice per pass (the simhash
    project-collapse lesson; measured ~4 s of the harness's 5 s at
    sf0.1). InMemoryRelation is the collapse barrier."""
    matched = _portable_pair_seed_matches(
        df, id_col, text_col, n, num_hashes, threshold, max_shingle_df
    )
    est = matched.groupBy("a", "b", "jaccard").agg(
        (
            F.sum(F.when(F.col("_ma") == F.col("_mb"), 1).otherwise(0))
            / float(num_hashes)
        ).alias("minhash_est")
    )
    return est.select(
        "a", "b", "jaccard", "minhash_est",
        F.round(F.abs(F.col("minhash_est") - F.col("jaccard")), 6).alias("abs_err"),
    )


def _portable_pair_seed_matches(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    threshold: float,
    max_shingle_df: int | None,
) -> DataFrame:
    """Shared substrate of the MinHash-family eval harnesses: for every
    exact-jaccard ≥ threshold pair, one row per hash seed carrying both
    documents' portable 60-bit minhash components —
    (a, b, jaccard, _ha, _ma, _mb). Signatures are computed only for
    pair members (semi-join before the ×num_hashes explode) and the
    shingle relation is persisted once (see minhash_error_report's
    docstring for both measurements)."""
    sh = with_shingles(df, text_col, n).select(id_col, "shingles").persist()
    # collision-sized (pairs above threshold); persisted because BOTH
    # the pair-id pruning semi-join and the final estimate join consume
    # it — unpersisted, the whole exact-jaccard subtree would evaluate
    # twice
    exact = jaccard_similarity_pairs(
        sh, id_col, threshold=threshold, max_shingle_df=max_shingle_df
    ).persist()
    pair_ids = (
        exact.select(F.col("a").alias("_pid"))
        .unionByName(exact.select(F.col("b").alias("_pid")))
        .distinct()
    )
    ex = (
        sh.join(pair_ids, F.col(id_col) == F.col("_pid"), "left_semi")
        .select(F.col(id_col).alias("_id"), F.explode("shingles").alias("_s"))
    )
    seeded = ex.withColumn(
        "_h", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1)))
    )
    phash = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("_h"), F.col("_s"))), 1, 15),
        16, 10,
    ).cast("bigint")
    sig = seeded.select("_id", "_h", phash.alias("_v")).groupBy(
        "_id", "_h"
    ).agg(F.min("_v").alias("_mh"))
    sa = sig.select(
        F.col("_id").alias("a"), F.col("_h").alias("_ha"), F.col("_mh").alias("_ma")
    )
    sb = sig.select(
        F.col("_id").alias("_bid"), F.col("_h").alias("_hb"), F.col("_mh").alias("_mb")
    )
    return exact.join(sa, "a").join(
        sb, (F.col("b") == F.col("_bid")) & (F.col("_ha") == F.col("_hb"))
    )


def lsh_banding_recall_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 32,
    rows_per_band: int = 2,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """LSH BANDING recall per jaccard bucket — the fifth eval harness:
    for every exact-jaccard ≥ threshold pair, whether MinHash banding
    (num_hashes/rows_per_band bands of rows_per_band rows) would have
    surfaced it as a candidate, aggregated into 0.1-wide jaccard
    buckets as (bucket, n_pairs, n_hit, recall). The measurement
    behind choosing (b, r): P(candidate) = 1 − (1 − j^r)^b, so low
    buckets SHOULD show partial recall — this reports where the shipped
    configuration's cliff actually sits on this corpus.

    A truth pair's candidacy depends only on its own two signature
    vectors, so no banding collision join over the corpus is needed:
    per pair, a band hits iff ALL its seeds' minhash components match,
    and the pair hits iff ANY band does — two small aggregations over
    the seed-matched relation, which is (pairs × num_hashes) rows,
    collision-sized. Portable md5 signatures so the oracle re-derives
    the whole computation bit-exactly."""
    matched = _portable_pair_seed_matches(
        df, id_col, text_col, n, num_hashes, threshold, max_shingle_df
    )
    band_hits = (
        matched.withColumn("_band", F.floor(F.col("_ha") / rows_per_band))
        .groupBy("a", "b", "jaccard", "_band")
        .agg(
            F.min(
                F.when(F.col("_ma") == F.col("_mb"), 1).otherwise(0)
            ).alias("_beq")
        )
    )
    pair_hits = band_hits.groupBy("a", "b", "jaccard").agg(
        F.max("_beq").alias("_hit")
    )
    # +1e-9 before floor: jaccard is already rounded to 6 dp, but its
    # nearest-double can sit just under a bucket boundary (0.3*10 =
    # 2.999…96); the epsilon makes the binning decision identical and
    # unsurprising in both engines.
    bucket = F.floor(F.col("jaccard") * 10 + F.lit(1e-9)) / 10.0
    recall = F.col("n_hit") * F.lit(10000.0) / F.col("n_pairs")
    return (
        pair_hits.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("_hit").alias("n_hit"),
        )
        .select(
            "bucket",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            (F.floor(recall + F.lit(0.5)) / F.lit(10000.0)).alias("recall"),
        )
    )


# ----------------------------------------- exact substring dedup (ExactSubstr)

def token_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Every ``window``-token sliding window of every document as one
    row ``(id, pos, wh)`` — ``pos`` the 0-based token index the window
    starts at, ``wh`` the md5 of the space-joined window text. The
    relational substrate for ExactSubstr dedup (Lee et al., ACL 2022,
    "Deduplicating Training Data Makes Language Models Better"): their
    suffix-array formulation is a single-machine algorithm; the
    equivalent corpus-scale shape is sliding fixed-width windows keyed
    by content hash, where a substring duplicated across the corpus is
    exactly a run of duplicated windows.

    Physical shape: tokenization and the window array are built in the
    scan projection (split → sequence → slice → md5 — whole-stage
    codegen, zero shuffles); one posexplode fans out ~n_tokens rows per
    document. Only (id, pos, 16-byte hash) rows ever move — the text
    itself never shuffles, so 100 TB of corpus shuffles as key traffic.
    Tokenization matches the shingle family: \\s+ split on trimmed
    text, empty tokens dropped. Documents shorter than ``window``
    tokens emit no rows (sequence(1,0) is DESCENDING in Spark, so the
    empty case is guarded explicitly — the r04 BPE lesson)."""
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    base = df.select(F.col(id_col), words.alias("_w"))
    k = F.size(F.col("_w")) - F.lit(window - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.md5(F.array_join(F.slice(F.col("_w"), i, window), " ").cast("binary")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "wh")
    )


def duplicate_window_occurrences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """Window occurrences whose content appears ≥ ``min_occurrences``
    times corpus-wide: ``(id, pos, n_occ, is_canonical)`` where the
    canonical occurrence is the lexicographically smallest (id, pos)
    holding that content — the single copy ExactSubstr dedup retains.

    One partial-aggregating groupBy on the 16-byte window hash finds
    duplicated contents AND their canonical occurrence (min(struct) —
    map-side combinable, so a corpus-wide boilerplate window costs one
    hot reducer key, never a per-key row_number window over every
    occurrence); one hash-keyed join fans the verdict back to
    occurrences. Both shuffles move md5 keys, linear in corpus tokens;
    heavy boilerplate keys are the same Zipf class as the token joins
    elsewhere — AQE skew-split territory."""
    # persist: the window relation feeds the duplicated-content
    # aggregate AND the verdict join's probe side; left lazy, the
    # tokenize + per-window md5 pass — the operator's dominant CPU —
    # ran twice per invocation (r12 plan: two Scan+Generate subtrees).
    # Lazy persist (not an eager checkpoint): the aggregate's build
    # runs first (its broadcast gates the probe stage), populating the
    # cache the probe then reads — one corpus hashing pass. Same
    # session-LRU posture as the minhash shingle cache.
    occ = token_windows(df, id_col, text_col, window).persist()
    dup = (
        occ.groupBy("wh")
        .agg(
            F.count("*").alias("n_occ"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_c"),
        )
        .filter(F.col("n_occ") >= min_occurrences)
    )
    return occ.join(dup, "wh").select(
        F.col(id_col),
        F.col("pos"),
        F.col("n_occ"),
        (
            (F.col(f"_c.{id_col}") == F.col(id_col))
            & (F.col("_c.pos") == F.col("pos"))
        ).alias("is_canonical"),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """Maximal duplicated spans per document: merge each document's
    duplicated-window start positions into islands (a new island starts
    when the gap to the previous duplicated window exceeds ``window`` —
    i.e. overlapping-or-adjacent windows fuse into one span) and report
    ``(id, span_start, span_end, span_tokens, n_windows)`` in token
    coordinates. This is the span-report half of ExactSubstr: at 100 TB
    the output is audit material (what fraction of each document is
    boilerplate?) and the removal mask's input.

    The island pass is two window functions over per-document
    partitions — bounded by document length, never corpus-keyed."""
    occ = duplicate_window_occurrences(
        df, id_col, text_col, window, min_occurrences
    )
    return merge_window_islands(occ, id_col, window)


def merge_window_islands(
    positions: DataFrame, id_col: str, window: int
) -> DataFrame:
    """Merge duplicated-window start ``positions`` (id, pos, ...) into
    maximal spans: a new island starts when the gap to the previous
    position exceeds ``window`` (overlapping-or-adjacent windows fuse).
    Two window functions + one aggregate over per-document partitions —
    bounded by document length, never corpus-keyed. Shared by the batch
    and incremental span operators so their island semantics are equal
    by construction."""
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    flagged = positions.withColumn("_prev", F.lag("pos").over(wdoc)).withColumn(
        "_new",
        F.when(
            F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > window), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "_island", F.sum("_new").over(wdoc.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(window - 1)).alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(window)).alias("span_tokens"),
            F.count("*").alias("n_windows"),
        )
        .drop("_island")
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """ExactSubstr REMOVAL: every occurrence of a duplicated window
    except the corpus-wide canonical one is masked out; a token is
    dropped iff some non-canonical duplicated window covers it. Returns
    one row per non-empty document: ``(id, n_tokens, n_removed,
    clean_text)`` with the surviving tokens re-joined in order. Matches
    Lee et al.'s policy of keeping exactly one copy of each duplicated
    substring (theirs keeps an arbitrary copy; this keeps the smallest
    (id, pos) so the result is deterministic and oracle-checkable).

    Shape: non-canonical windows explode ×``window`` into covered token
    positions, then the shared ``mask_positions_and_rebuild`` pass
    (one left_anti join + per-document ordered re-assembly)."""
    occ = duplicate_window_occurrences(
        df, id_col, text_col, window, min_occurrences
    )
    covered = (
        occ.filter(~F.col("is_canonical"))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(window - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    return mask_positions_and_rebuild(df, covered, id_col, text_col)


def mask_positions_and_rebuild(
    docs: DataFrame, covered: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Drop the (id, pos) token positions in ``covered`` from every
    document in ``docs`` and re-assemble the surviving text: one
    posexplode, ONE left_anti join, and a per-document ordered
    re-assembly (array_sort(collect_list(struct(pos, tok))) —
    collect_list partitions are single documents, bounded by document
    length). Returns (id, n_tokens, n_removed, clean_text) for every
    document of ``docs`` that has ≥1 token. Shared by ExactSubstr
    removal and span-level decontamination so the masking semantics
    can't drift apart."""
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    # persist: the exploded token relation feeds both the per-doc
    # totals and the anti-join + rebuild — without it the corpus is
    # tokenized and exploded twice per invocation.
    toks = docs.select(
        F.col(id_col), F.posexplode(words).alias("pos", "tok")
    ).persist()
    kept = toks.join(covered, [id_col, "pos"], "left_anti")
    stats = toks.groupBy(id_col).agg(F.count("*").alias("n_tokens"))
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        stats.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def prepare_window_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """The persistable ExactSubstr index: the DISTINCT window-content
    hashes of an already-ingested corpus (one 16-byte key per distinct
    window — presence is all incremental probing needs, so the index
    is dictionary-sized, not occurrence-sized). Write it out once;
    ``duplicate_spans_incremental`` probes arriving batches against it
    and the union of (index ∪ new windows) is the next index."""
    return token_windows(df, id_col, text_col, window).select("wh").distinct()


def duplicate_spans_incremental(
    index_wh: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """ExactSubstr spans for NEWLY ARRIVED documents against corpus ∪
    batch, without re-mining the indexed corpus: a new window is
    duplicated iff its hash exists in the index (≥1 prior occurrence)
    OR occurs ≥2 times within the arriving batch; the union of those
    position sets island-merges exactly like the batch operator, so
    for every new document the result EQUALS ``duplicate_spans`` over
    the full corpus (pinned by test). Index×index is never enumerated
    — the joins touch only the batch's window rows (the
    incremental_dedup contract, operators/dedup.py:323, applied to
    substring dedup). Streaming shape: call from foreachBatch, then
    append the batch's distinct hashes to the index."""
    # persist: the batch's window relation feeds three consumers
    # (index probe, within-batch frequency, batch probe) — hash the
    # arriving documents once, not three times.
    occ = token_windows(new_docs, id_col, text_col, window).persist()
    vs_index = occ.join(index_wh, "wh", "left_semi")
    within = (
        occ.groupBy("wh")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("wh")
    )
    vs_batch = occ.join(within, "wh", "left_semi")
    dup = vs_index.unionByName(vs_batch).select(id_col, "pos").distinct()
    return merge_window_islands(dup, id_col, window)


def edit_similarity_join(
    df: DataFrame,
    id_col: str,
    s_col: str,
    tau: int = 1,
    q: int = 4,
) -> DataFrame:
    """Edit-distance similarity SELF-join: all pairs with
    levenshtein(a, b) ≤ ``tau``, WITHOUT the all-pairs cross product —
    the Ed-Join shape (Xiao et al., VLDB 2008) built on prefix
    filtering (Chaudhuri et al., ICDE 2006):

      1. q-GRAMS — each string is padded with q−1 copies of a
         non-text sentinel char on both ends (Gravano et al., VLDB
         2001), then split into its DISTINCT q-grams in the scan
         projection. Padding makes every string carry len + q − 1
         grams, so boundary-length pairs ('cc' vs 'dcc') share edge
         grams; one edit still destroys ≤ q DISTINCT grams per side
         (a surviving occurrence appears verbatim in the other
         string), so ed(a,b) ≤ tau ⇒ |g(a) ∩ g(b)| ≥ |g| − q·tau on
         each side.
      2. PREFIX SIGNATURE — under the global total order (gram
         corpus-frequency ASC, gram ASC), a string's signature is its
         first ``q·tau + 1`` grams: the prefix-filtering lemma makes
         signature∩signature ≠ ∅ for every true pair whose per-side
         bound is non-vacuous. Strings so short the bound IS vacuous
         (|g| ≤ q·tau ⟺ len ≤ q·(tau−1)+1) can only match partners
         within tau of their length, so every string with len ≤
         q·(tau−1)+1+tau ALSO carries a forced sentinel signature
         gram — the degenerate-length bucket (tiny and rare in real
         corpora; the unit test brute-forces losslessness including
         empty strings). Rarest-first ordering keeps signature
         buckets the smallest available: the shared corporate prefix
         of near-identical keys ("Customer#…") never becomes a join
         bucket.
      3. VERIFY — candidates (one equi-join on the signature gram,
         canonical a < b, distinct) pass a length filter
         (|len_a − len_b| ≤ tau, free) then one JVM levenshtein.

    Scale shape: the only corpus-keyed shuffles are the gram-frequency
    partial agg and the per-id signature row_number (high-cardinality
    id partitions of ≤ len+q−1 rows); the candidate join keys on
    SIGNATURE grams whose buckets the frequency order minimizes.
    Everything is exact strings/integers — grams, frequencies, the
    total order, candidates, and distances render identically in
    DuckDB, so results are FULL-oracle checkable.

    Returns (a, b, dist): id pairs (a < b) with edit distance ≤ tau.
    Rows with NULL strings are excluded.
    """
    if tau < 0 or q < 1:
        raise ValueError(f"edit_similarity_join: tau={tau}, q={q}")
    sig_len = q * tau + 1
    tiny_len = q * (tau - 1) + 1 + tau  # may pair with a vacuous-bound string
    pad = chr(31) * (q - 1)  # empty at q=1, where padding is a no-op
    base = df.select(
        F.col(id_col).alias("_id"), F.col(s_col).alias("_s")
    ).filter(F.col("_s").isNotNull())
    grams = base.select(
        "_id",
        "_s",
        F.explode(
            F.expr(
                f"array_distinct(transform("
                f"sequence(1, length(concat('{pad}', _s, '{pad}')) - {q} + 1), "
                f"i -> substring(concat('{pad}', _s, '{pad}'), i, {q})))"
            )
        ).alias("g"),
    )
    # The gram-frequency dictionary is vocabulary-sized (distinct
    # grams grow sublinearly in the corpus) — broadcast it so ranking
    # grams costs NO corpus shuffle on the gram key; the only
    # corpus-keyed exchange is the per-id repartition feeding the
    # signature sort, at an explicit width AQE cannot coalesce into
    # one giant sort task (measured single-task at sf0.1 otherwise).
    freq = grams.groupBy("g").agg(F.count("*").alias("_f"))
    w = Window.partitionBy("_id").orderBy("_f", "g")
    sig = (
        spread_cpu_dense(grams.join(F.broadcast(freq), "g"), "_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= sig_len)
        .select("_id", "_s", "g")
    )
    sentinel = base.filter(F.length("_s") <= tiny_len).select(
        "_id", "_s", F.lit("").alias("g")
    )
    # persist before the self-join: both candidate sides are this SAME
    # signature relation, and left lazy each side re-ran the entire
    # pipeline — gram explode, frequency aggregate, broadcast join,
    # per-id sort + rank (r12 plan: six parquet scans, two Window
    # sorts, two freq aggregates). persist, NOT localCheckpoint: the
    # checkpointed RDD scan loses Catalyst's size estimate, which
    # demoted the candidate join from broadcast to sort-merge
    # (measured 2.2 s → 5.1 s); the lazy cache keeps the stats and
    # still runs the ranking pipeline exactly once.
    sig = sig.unionByName(sentinel).persist()
    a, b = sig.alias("a"), sig.alias("b")
    # spread_cpu_dense before dedup + verify: the candidate relation
    # is SKINNY (four short columns) but CPU-dense (one levenshtein
    # per row) — the AQE funnel measured at 2 tasks / 16 s at sf0.1;
    # dropDuplicates reuses the spread's hash partitioning, so it
    # costs no extra exchange (operators/skew.spread_cpu_dense).
    cand = spread_cpu_dense(
        a.join(
            b,
            (F.col("a.g") == F.col("b.g")) & (F.col("a._id") < F.col("b._id")),
        ).select(
            F.col("a._id").alias("a"),
            F.col("a._s").alias("_sa"),
            F.col("b._id").alias("b"),
            F.col("b._s").alias("_sb"),
        ),
        "a",
        "b",
    ).dropDuplicates(["a", "_sa", "b", "_sb"])
    return (
        cand.filter(
            F.abs(F.length("_sa") - F.length("_sb")) <= tau
        )
        .withColumn("dist", F.levenshtein("_sa", "_sb"))
        .filter(F.col("dist") <= tau)
        .select("a", "b", F.col("dist").cast("int").alias("dist"))
    )


def ppjoin(
    df: DataFrame,
    id_col: str,
    s_col: str,
    tau_num: int = 3,
    tau_den: int = 5,
    n: int = 1,
    cache: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """PPJoin: EXACT set-similarity SELF-join — all pairs whose word
    n-gram shingle sets have jaccard ≥ tau_num/tau_den — without the
    all-pairs cross product (Xiao, Wang, Lin & Yu, "Efficient
    Similarity Joins for Near Duplicate Detection", WWW 2008): prefix
    filtering (Chaudhuri et al., ICDE 2006) plus PPJoin's positional
    filter, on the same rarest-first global token order Ed-Join uses.
    The missing sibling between MinHash (approximate jaccard) and
    Ed-Join (edit distance): exact-jaccard pairs with a losslessness
    guarantee. ``n`` picks the set elements: 1 = word tokens, >1 =
    the with_shingles word-n-gram definition (a doc shorter than n
    words contributes its single short shingle).

    τ is a RATIONAL (tau_num/tau_den), so every filter is integer
    arithmetic — prefix lengths, length bounds, the positional bound,
    and the final jaccard test are all exact bigint comparisons that
    render identically in DuckDB (FULL-oracle checkable; the float
    jaccard in the output is one two-integer IEEE division, rounded
    like jaccard_ctes).

      1. TOKENS — distinct \\s+ word tokens per id; ℓ = |tokens|.
         All-whitespace/empty docs carry no tokens and are excluded
         (jaccard is undefined on an empty set).
      2. GLOBAL ORDER — corpus frequency ASC, token ASC (the Ed-Join
         rarest-first discipline: signature buckets are minimized,
         the shared boilerplate token never becomes a join bucket).
         rn = row_number per id in this order.
      3. PREFIX — the first p = ℓ − ⌈τℓ⌉ + 1 tokens per id. For a
         true pair the GLOBALLY FIRST common token provably sits
         inside both prefixes (ov ≥ ⌈τℓ⌉ on each side, and common
         tokens occupy the tail positions otherwise).
      4. CANDIDATES — one equi-join on prefix tokens (a < b), length
         filter den·min(ℓa,ℓb) ≥ num·max(ℓa,ℓb) (jaccard ≤ min/max),
         then PPJoin's positional filter: with (i, j) = min positions
         of a shared prefix token (the same token on both sides,
         since both orders restrict one total order), overlap ≤ 1 +
         min(ℓa−i, ℓb−j), which must reach t = ⌈τ/(1+τ)·(ℓa+ℓb)⌉ =
         ⌈num·(ℓa+ℓb)/(num+den)⌉.
      5. VERIFY — each survivor pair attaches both token ARRAYS and
         computes the exact overlap with ONE array_intersect. The
         arrays are built ONLY for candidate ids (a broadcast
         semi-join against the collision-sized id set): intersection
         ignores order, so this needs neither the frequency join nor
         a corpus-wide collect_list. Keep (num+den)·ov ≥ num·(ℓa+ℓb)
         ⟺ jaccard ≥ τ.

    Scale shape: the token-frequency dictionary is broadcast only
    when Catalyst's size estimate says it fits (word tokens — a true
    vocabulary) and is a plain AQE-skew-handled shuffle join when it
    doesn't (n-gram shingles are nearly corpus-cardinality — an
    unconditional broadcast would ship the corpus to every executor).
    The corpus-keyed shuffles are that join, the per-id spread
    feeding the rank window (explicit width — the Ed-Join AQE lesson,
    operators/skew.spread_cpu_dense), and the candidate join on
    PREFIX tokens, whose buckets the rarest-first order minimizes.
    Verification is candidate-sized, never corpus².

    ``stats`` (r09, VERDICT r08 #7): pass a dict to receive
    ``n_candidates`` — the pair count surviving prefix + length +
    positional filtering, i.e. what the verify stage must
    array_intersect. This is the number that would motivate Xiao et
    al.'s suffix filter (§4): MEASURED at sf0.01/sf0.1 with the
    catalog's 5-gram τ=3/5 regime, candidates == final output exactly
    (25/25 and 256/256) — zero false candidates, so suffix filtering
    has nothing to cut and stays unimplemented (decision recorded in
    SCALE.md; re-measure on any corpus where this ratio degrades —
    word-token regimes on boilerplate-heavy corpora are the known
    risk). The count is free when it runs: ``cand`` is already
    localCheckpoint-materialized.

    Returns (a, b, overlap, la, lb, jaccard): id pairs (a < b) with
    exact overlap count, set sizes, and jaccard ≥ τ rounded to 6dp.
    Unit tests brute-force losslessness against the cross product.
    """
    if not (0 < tau_num <= tau_den):
        raise ValueError(f"ppjoin: tau must be in (0, 1], got {tau_num}/{tau_den}")
    if n < 1:
        raise ValueError(f"ppjoin: n must be >= 1, got {n}")
    num, den = tau_num, tau_den
    # NULL text: split(NULL) is NULL and explode(NULL) emits no rows.
    # Empty/all-whitespace docs yield one '' shingle (the with_shingles
    # greatest(...,1) clamp) — filtered, so empty sets are excluded
    # (jaccard is undefined on an empty set) on BOTH engines.
    words = F.filter(F.split(F.trim(F.col(s_col)), r"\s+"), lambda t: t != "")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(shingles).alias("tok")
    ).filter(F.col("tok") != "")
    # The scan + shingle explode is the expensive projection and feeds
    # THREE consumers (frequency dictionary, ranked prefix build,
    # candidate-id verify arrays) — persist it once, like
    # minhash_near_duplicates' shared shingle base (unpersist via the
    # returned plan's ``_cached_deps``).
    if cache:
        toks = toks.persist()
    # The shingle-frequency dictionary is NOT vocabulary-small at
    # n > 1 (most word 5-grams are unique, so it is nearly
    # corpus-sized) — broadcast only when Catalyst's size estimate
    # says it fits, else this is a plain shuffle join AQE skew-handles
    # (unlike Ed-Join's char-q-gram dictionary, which is always tiny).
    from openetl_spark.operators.skew import broadcast_if_small

    freq = toks.groupBy("tok").agg(F.count("*").alias("_f"))
    w_rank = Window.partitionBy("_id").orderBy("_f", "tok")
    w_len = Window.partitionBy("_id")
    ranked = (
        spread_cpu_dense(toks.join(broadcast_if_small(freq), "tok"), "_id")
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn("l", F.count("*").over(w_len))
    )
    # prefix length p = l - ceil(num*l/den) + 1; ceil via (x+den-1) div den.
    # Lengths are document-token-counts (< 2^20), so double floor is exact.
    p = F.col("l") - F.floor((num * F.col("l") + den - 1) / den) + 1
    # localCheckpoint: BOTH candidate-join sides are this same prefix
    # relation — left lazy, each side re-ran the frequency aggregate,
    # the frequency join, and the per-id rank window (r12 plan: the
    # whole ranked pipeline twice). Prefixes are p ≤ ℓ−⌈τℓ⌉+1 rows per
    # doc, a fraction of the token relation — materialize once.
    pre = (
        ranked.filter(F.col("rn") <= p)
        .select("_id", "tok", "rn", "l")
        .localCheckpoint()
    )
    a, b = pre.alias("a"), pre.alias("b")
    la, lb = F.col("la"), F.col("lb")
    t_need = F.floor((num * (la + lb) + (num + den) - 1) / (num + den))
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok")) & (F.col("a._id") < F.col("b._id")),
        )
        .filter(
            den * F.least(F.col("a.l"), F.col("b.l"))
            >= num * F.greatest(F.col("a.l"), F.col("b.l"))
        )
        .groupBy(
            F.col("a._id").alias("a_id"),
            F.col("b._id").alias("b_id"),
            F.col("a.l").alias("la"),
            F.col("b.l").alias("lb"),
        )
        .agg(F.min("a.rn").alias("i"), F.min("b.rn").alias("j"))
        .filter(
            1 + F.least(la - F.col("i"), lb - F.col("j")) >= t_need
        )
        # Collision-sized; checkpointed so the candidate derivation
        # isn't recomputed for the id semi-join below (kcore precedent).
        .localCheckpoint()
    )
    if stats is not None:  # free: cand is checkpoint-materialized
        stats["n_candidates"] = cand.count()
    # Verify arrays ONLY for candidate ids (collision-sized set): the
    # intersection ignores order, so no freq join or rank is needed —
    # one semi-filtered groupBy over the raw token relation, never a
    # corpus-wide collect_list.
    ids = (
        cand.select(F.col("a_id").alias("_id"))
        .unionByName(cand.select(F.col("b_id").alias("_id")))
        .distinct()
    )
    recs = (
        toks.join(F.broadcast(ids), "_id", "left_semi")
        .groupBy("_id")
        .agg(F.collect_list("tok").alias("arr"))
        # localCheckpoint: both verify sides (ra/rb) consume this
        # candidate-ids-sized relation; left lazy each side re-ran the
        # token-cache semi-join + collect aggregate (r12 plan: two
        # ObjectHashAggregate subtrees). Candidate-scale, cheap.
        .localCheckpoint()
    )
    ra = recs.select(F.col("_id").alias("a_id"), F.col("arr").alias("_aa"))
    rb = recs.select(F.col("_id").alias("b_id"), F.col("arr").alias("_ab"))
    ov = F.size(F.array_intersect(F.col("_aa"), F.col("_ab")))
    out = (
        spread_cpu_dense(cand.join(ra, "a_id").join(rb, "b_id"), "a_id", "b_id")
        .withColumn("overlap", ov.cast("bigint"))
        .filter((num + den) * F.col("overlap") >= num * (la + lb))
        .select(
            F.col("a_id").alias("a"),
            F.col("b_id").alias("b"),
            "overlap",
            la.cast("bigint").alias("la"),
            lb.cast("bigint").alias("lb"),
            F.round(F.col("overlap") / (la + lb - F.col("overlap")), 6).alias(
                "jaccard"
            ),
        )
    )
    out._cached_deps = [toks] if cache else []
    return out


def ppjoin_dictionary(
    df: DataFrame, s_col: str, n: int = 1
) -> DataFrame:
    """The FROZEN global token order for incremental PPJoin: corpus
    shingle frequencies (tok, f) captured once at index build. Prefix
    filtering is lossless under ANY total order shared by both sides
    of a pair — freshness only affects bucket sizes — so later batches
    rank their tokens against THIS dictionary (unseen tokens take
    f = 0: rarest-first puts them ahead, which is both deterministic
    and bucket-minimal) instead of recomputing frequencies and
    silently reordering everyone's prefixes."""
    words = F.filter(F.split(F.trim(F.col(s_col)), r"\s+"), lambda t: t != "")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )
    return (
        df.select(F.explode(shingles).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("f"))
    )


def prepare_ppjoin_index(
    df: DataFrame,
    id_col: str,
    s_col: str,
    dict_df: DataFrame,
    tau_num: int = 3,
    tau_den: int = 5,
    n: int = 1,
) -> DataFrame:
    """The persistable exact-set-similarity index relation: one row
    per doc — (id, l, arr, pre) with ``arr`` the distinct shingle
    array (what verification needs), ``l`` its size, and ``pre`` the
    prefix tokens WITH their global-order positions (array of
    struct<tok, rn>, what candidate generation needs) under the frozen
    ``dict_df`` order. Batches append to one parquet index; probing
    never re-reads index text (the prepare_minhash_index posture,
    exact instead of probabilistic)."""
    if not (0 < tau_num <= tau_den):
        raise ValueError(
            f"prepare_ppjoin_index: tau must be in (0, 1], got {tau_num}/{tau_den}"
        )
    num, den = tau_num, tau_den
    words = F.filter(F.split(F.trim(F.col(s_col)), r"\s+"), lambda t: t != "")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(shingles).alias("tok")
    ).filter(F.col("tok") != "")
    from openetl_spark.operators.skew import broadcast_if_small

    ranked = (
        spread_cpu_dense(
            toks.join(
                broadcast_if_small(dict_df.select("tok", "f")), "tok", "left"
            ).withColumn("f", F.coalesce("f", F.lit(0))),
            "id",
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("id").orderBy("f", "tok")),
        )
        .withColumn("l", F.count("*").over(Window.partitionBy("id")))
    )
    p = F.col("l") - F.floor((num * F.col("l") + den - 1) / den) + 1
    return (
        ranked.withColumn(
            "_pre",
            F.when(
                F.col("rn") <= p,
                F.struct(F.col("tok"), F.col("rn").cast("int").alias("rn")),
            ),
        )
        .groupBy("id")
        .agg(
            F.max("l").cast("bigint").alias("l"),
            F.collect_list("tok").alias("arr"),
            F.array_sort(
                F.collect_list("_pre")
            ).alias("pre"),  # collect_list drops the NULL non-prefix rows
        )
    )


def ppjoin_incremental(
    new_df: DataFrame,
    index_df: DataFrame,
    dict_df: DataFrame,
    id_col: str,
    s_col: str,
    tau_num: int = 3,
    tau_den: int = 5,
    n: int = 1,
    cache: bool = True,
) -> DataFrame:
    """EXACT-jaccard dedup of a NEW batch against an existing corpus
    index plus itself — incremental_near_duplicates' posture with
    PPJoin's guarantee: every pair at jaccard ≥ τ is found, none is
    probabilistically missed. Candidates only ever join NEW prefixes
    against (index ∪ new) prefixes — index×index pairs are never
    enumerated; the frozen-dictionary order keeps the prefix lemma
    valid across batches (ppjoin_dictionary). A new doc is flagged on
    a qualifying partner in the index (any id) or an earlier
    (smaller-id) partner in its own batch.

    Returns one row per flagged NEW doc: (id_col, n_dups, dup_of =
    smallest qualifying partner by (id, jaccard) struct order, its
    exact jaccard). Unit tests pin the flag set against a brute-force
    sequential reference, including unseen-token batches."""
    num, den = tau_num, tau_den
    prep_new = prepare_ppjoin_index(
        new_df, id_col, s_col, dict_df, tau_num, tau_den, n
    )
    allp = index_df.select("id", "l", "arr", "pre").withColumn(
        "_isidx", F.lit(True)
    ).unionByName(prep_new.withColumn("_isidx", F.lit(False)))
    if cache:
        allp = allp.persist()
    pre = allp.select(
        "id", "l", "_isidx", F.explode("pre").alias("p")
    ).select("id", "l", "_isidx", F.col("p.tok").alias("tok"), F.col("p.rn").alias("rn"))
    a = pre.alias("a")
    b = pre.filter(~F.col("_isidx")).alias("b")
    la, lb = F.col("la"), F.col("lb")
    t_need = F.floor((num * (la + lb) + (num + den) - 1) / (num + den))
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") != F.col("b.id"))
            & (F.col("a._isidx") | (F.col("a.id") < F.col("b.id"))),
        )
        .filter(
            den * F.least(F.col("a.l"), F.col("b.l"))
            >= num * F.greatest(F.col("a.l"), F.col("b.l"))
        )
        .groupBy(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.l").alias("la"),
            F.col("b.l").alias("lb"),
        )
        .agg(F.min("a.rn").alias("i"), F.min("b.rn").alias("j"))
        .filter(1 + F.least(la - F.col("i"), lb - F.col("j")) >= t_need)
    )
    ra = allp.select(F.col("id").alias("a_id"), F.col("arr").alias("_aa"))
    rb = allp.select(F.col("id").alias("b_id"), F.col("arr").alias("_ab"))
    ov = F.size(F.array_intersect(F.col("_aa"), F.col("_ab"))).cast("bigint")
    pairs = (
        spread_cpu_dense(cand.join(ra, "a_id").join(rb, "b_id"), "a_id", "b_id")
        .withColumn("overlap", ov)
        .filter((num + den) * F.col("overlap") >= num * (la + lb))
        .withColumn(
            "jaccard",
            F.round(F.col("overlap") / (la + lb - F.col("overlap")), 6),
        )
    )
    flagged = (
        pairs.groupBy("b_id")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(F.struct(F.col("a_id").alias("a"), "jaccard")).alias("_m"),
        )
        .select(
            F.col("b_id").alias(id_col),
            "n_dups",
            F.col("_m.a").alias("dup_of"),
            F.col("_m.jaccard").alias("jaccard"),
        )
    )
    flagged._cached_deps = [allp] if cache else []
    return flagged


def containment_join(
    df: DataFrame,
    id_col: str,
    s_col: str,
    tau_num: int = 3,
    tau_den: int = 5,
    n: int = 1,
    cache: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """EXACT containment self-join — all DIRECTED pairs (a, b), a ≠ b,
    with |S_a ∩ S_b| / |S_a| ≥ tau_num/tau_den over word n-gram
    shingle sets: "most of a appears inside b", the quotation/subset
    duplication a symmetric jaccard join structurally under-scores
    (a short doc fully quoted in a long one has jaccard ≈ |S_a|/|S_b|,
    arbitrarily small). The asymmetric sibling of ppjoin, sharing its
    machinery and guarantees: rational τ keeps every filter bigint,
    and prefix filtering is LOSSLESS — a true pair shares ≥ ⌈τ·ℓa⌉
    tokens, so by pigeonhole the CONTAINED side's rarest-first prefix
    of ℓa − ⌈τℓa⌉ + 1 tokens holds a common token.

    Asymmetry changes the physics: the container side has NO prefix
    bound (a common token can sit anywhere in b), so candidates join
    the contained side's PREFIX against the container side's FULL
    ranked token relation — an inverted-index probe whose bucket
    sizes are driven by prefix-token rarity (rarest-first keeps hot
    boilerplate shingles out of prefixes unless a doc has nothing
    else). Length filter: ℓb ≥ ⌈τ·ℓa⌉ (the overlap must fit in b).
    Positional filter: overlap ≤ 1 + min(ℓa−i, ℓb−j) at the globally
    first shared token must reach ⌈τ·ℓa⌉. Verify = one
    array_intersect per candidate on arrays built only for candidate
    ids (the ppjoin shape).

    ``stats`` (r09, VERDICT r08 #7): pass a dict to receive
    ``n_candidates`` — the directed pair count reaching verification
    (free: ``cand`` is checkpoint-materialized). The asymmetric probe
    is the one the r08 review flagged to WATCH on boilerplate-heavy
    corpora; measured at the catalog regime (5-gram, τ=4/5) it is
    exactly output-sized at sf0.01/sf0.1 — see SCALE.md.

    Returns (a, b, overlap, la, lb, containment): a = the contained
    doc, containment = overlap/ℓa rounded 6dp; both directions emit
    independently (mutual near-dups appear twice, correctly)."""
    if not (0 < tau_num <= tau_den):
        raise ValueError(
            f"containment_join: tau must be in (0, 1], got {tau_num}/{tau_den}"
        )
    if n < 1:
        raise ValueError(f"containment_join: n must be >= 1, got {n}")
    num, den = tau_num, tau_den
    words = F.filter(F.split(F.trim(F.col(s_col)), r"\s+"), lambda t: t != "")
    kk = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), kk),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(shingles).alias("tok")
    ).filter(F.col("tok") != "")
    if cache:
        toks = toks.persist()
    from openetl_spark.operators.skew import broadcast_if_small

    freq = toks.groupBy("tok").agg(F.count("*").alias("_f"))
    # localCheckpoint: the ranked relation feeds the contained-side
    # prefix AND the container-side full probe — left lazy, the
    # frequency aggregate + join + two rank windows ran twice (the
    # asymmetric probe has no prefix cut, so unlike ppjoin the FULL
    # ranked relation is a join side and must be materialized, not
    # re-derived per side).
    ranked = (
        spread_cpu_dense(toks.join(broadcast_if_small(freq), "tok"), "_id")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("_id").orderBy("_f", "tok")),
        )
        .withColumn("l", F.count("*").over(Window.partitionBy("_id")))
        .localCheckpoint()
    )
    # contained-side prefix: p = la - ceil(num*la/den) + 1
    p = F.col("l") - F.floor((num * F.col("l") + den - 1) / den) + 1
    pre = ranked.filter(F.col("rn") <= p).select("_id", "tok", "rn", "l")
    a, b = pre.alias("a"), ranked.alias("b")
    la, lb = F.col("la"), F.col("lb")
    t_need = F.floor((num * la + den - 1) / den)  # ceil(tau * la)
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok")) & (F.col("a._id") != F.col("b._id")),
        )
        .filter(den * F.col("b.l") >= num * F.col("a.l"))
        .groupBy(
            F.col("a._id").alias("a_id"),
            F.col("b._id").alias("b_id"),
            F.col("a.l").alias("la"),
            F.col("b.l").alias("lb"),
        )
        .agg(F.min("a.rn").alias("i"), F.min("b.rn").alias("j"))
        .filter(1 + F.least(la - F.col("i"), lb - F.col("j")) >= t_need)
        .localCheckpoint()
    )
    if stats is not None:  # free: cand is checkpoint-materialized
        stats["n_candidates"] = cand.count()
    ids = (
        cand.select(F.col("a_id").alias("_id"))
        .unionByName(cand.select(F.col("b_id").alias("_id")))
        .distinct()
    )
    recs = (
        toks.join(F.broadcast(ids), "_id", "left_semi")
        .groupBy("_id")
        .agg(F.collect_list("tok").alias("arr"))
        # localCheckpoint: both verify sides (ra/rb) consume this
        # candidate-ids-sized relation; left lazy each side re-ran the
        # token-cache semi-join + collect aggregate (r12 plan: two
        # ObjectHashAggregate subtrees). Candidate-scale, cheap.
        .localCheckpoint()
    )
    ra = recs.select(F.col("_id").alias("a_id"), F.col("arr").alias("_aa"))
    rb = recs.select(F.col("_id").alias("b_id"), F.col("arr").alias("_ab"))
    ov = F.size(F.array_intersect(F.col("_aa"), F.col("_ab"))).cast("bigint")
    out = (
        spread_cpu_dense(cand.join(ra, "a_id").join(rb, "b_id"), "a_id", "b_id")
        .withColumn("overlap", ov)
        .filter(den * F.col("overlap") >= num * la)
        .select(
            F.col("a_id").alias("a"),
            F.col("b_id").alias("b"),
            "overlap",
            la.cast("bigint").alias("la"),
            lb.cast("bigint").alias("lb"),
            F.round(F.col("overlap") / la, 6).alias("containment"),
        )
    )
    out._cached_deps = [toks] if cache else []
    return out


def containment_incremental(
    new_df: DataFrame,
    index_df: DataFrame,
    dict_df: DataFrame,
    id_col: str,
    s_col: str,
    tau_num: int = 4,
    tau_den: int = 5,
    n: int = 1,
    cache: bool = True,
) -> DataFrame:
    """EXACT containment dedup of a NEW batch against an existing
    corpus index plus itself (VERDICT r08 #4) — quotation-duplication
    ON ARRIVAL, the asymmetric twin of ppjoin_incremental: flag every
    NEW doc whose shingle set is ≥ τ contained (|S_new ∩ S_other| /
    |S_new|) in an INDEX doc (any id) or an EARLIER (smaller-id) doc
    of its own batch. Directed and first-arrival: a short doc arriving
    after the long doc that quotes it IS flagged; the long container
    never is (it carries new content by definition of the direction).

    Shares ppjoin_incremental's machinery end-to-end: the FROZEN
    ppjoin_dictionary order keeps the prefix lemma valid across
    batches (unseen tokens rank rarest-first at f = 0), and
    prepare_ppjoin_index rows are reusable VERBATIM because the
    containment prefix needs overlap ≥ ⌈τ·ℓa⌉ — the same prefix
    length p = ℓ − ⌈τℓ⌉ + 1 the jaccard index stores at equal τ.
    Asymmetry (the containment_join physics): the container side has
    no prefix bound, so NEW prefixes probe the FULL token relation of
    (index ∪ new) — exploded from the index's stored ``arr``, never
    re-reading index text — and the positional filter keeps only the
    contained side's bound (1 + ℓa − min rn ≥ ⌈τℓa⌉; the container
    side's token positions are not stored, dropping that half of the
    filter only admits extra candidates, never loses a pair).
    index×index pairs are never enumerated; verify arrays are built
    only for candidate ids.

    Returns one row per flagged NEW doc: (id_col, n_containers,
    contained_in = smallest qualifying container id, containment =
    overlap/ℓa of that container, rounded 6dp). Unit tests pin the
    flag set against a brute-force sequential reference including
    unseen-token batches; a foreachBatch streaming twin holds the
    composition (tests/test_streaming_curation.py)."""
    if not (0 < tau_num <= tau_den):
        raise ValueError(
            f"containment_incremental: tau must be in (0, 1], got {tau_num}/{tau_den}"
        )
    num, den = tau_num, tau_den
    # persist: the prepared batch feeds the union (container side) AND
    # the prefix explode (contained side) — rank the arriving batch
    # under the frozen order once, not twice.
    prep_new = prepare_ppjoin_index(
        new_df, id_col, s_col, dict_df, tau_num, tau_den, n
    ).persist()
    allp = index_df.select("id", "l", "arr").withColumn(
        "_isidx", F.lit(True)
    ).unionByName(
        prep_new.select("id", "l", "arr").withColumn("_isidx", F.lit(False))
    )
    if cache:
        allp = allp.persist()
    # contained side: NEW docs' prefix tokens under the frozen order
    a = prep_new.select(
        F.col("id").alias("a_id"),
        F.col("l").alias("al"),
        F.explode("pre").alias("p"),
    ).select("a_id", "al", F.col("p.tok").alias("tok"), F.col("p.rn").alias("rn"))
    # container side: FULL token relation of index ∪ new
    b = allp.select(
        F.col("id").alias("b_id"),
        F.col("l").alias("bl"),
        F.col("_isidx"),
        F.explode("arr").alias("btok"),
    )
    la, lb = F.col("la"), F.col("lb")
    t_need = F.floor((num * la + den - 1) / den)  # ceil(tau * la)
    cand = (
        a.join(
            b,
            (F.col("tok") == F.col("btok"))
            & (F.col("a_id") != F.col("b_id"))
            & (F.col("_isidx") | (F.col("b_id") < F.col("a_id"))),
        )
        .filter(den * F.col("bl") >= num * F.col("al"))
        .groupBy(
            "a_id",
            "b_id",
            F.col("al").alias("la"),
            F.col("bl").alias("lb"),
        )
        .agg(F.min("rn").alias("i"))
        .filter(1 + (la - F.col("i")) >= t_need)
    )
    from openetl_spark.operators.skew import spread_cpu_dense

    ra = allp.select(F.col("id").alias("a_id"), F.col("arr").alias("_aa"))
    rb = allp.select(F.col("id").alias("b_id"), F.col("arr").alias("_ab"))
    ov = F.size(F.array_intersect(F.col("_aa"), F.col("_ab"))).cast("bigint")
    pairs = (
        spread_cpu_dense(cand.join(ra, "a_id").join(rb, "b_id"), "a_id", "b_id")
        .withColumn("overlap", ov)
        .filter(den * F.col("overlap") >= num * la)
        .withColumn("containment", F.round(F.col("overlap") / la, 6))
    )
    flagged = (
        pairs.groupBy("a_id")
        .agg(
            F.count("*").alias("n_containers"),
            F.min(F.struct(F.col("b_id").alias("b"), "containment")).alias("_m"),
        )
        .select(
            F.col("a_id").alias(id_col),
            "n_containers",
            F.col("_m.b").alias("contained_in"),
            F.col("_m.containment").alias("containment"),
        )
    )
    flagged._cached_deps = [allp] if cache else []
    return flagged
