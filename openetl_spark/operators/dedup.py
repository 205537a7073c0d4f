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
* n-gram jaccard — exact verification on candidate pairs (or small
  corpora): explode distinct shingles, equi-join on shingle, count →
  |A∩B|, join per-doc counts → jaccard. Shuffle volume = shingle rows,
  linear in corpus size; join fan-out is only real collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
) -> DataFrame:
    """MinHash signatures as (id, minhash array) — one row per id.

    Shape matters for both speed and scale: explode shingles ONCE, hash
    each shingle string ONCE (xxhash64), then derive the hash family as
    xxhash64(base_hash, seed_i) — cheap long mixing instead of
    ``num_hashes`` string hashes. The ``num_hashes`` mins run as partial
    aggregates (map-side combine), so the single shuffle carries one
    128-long row per document, never the shingles. A monolithic
    array_min(transform(...))×128 projection was ~20× slower: the giant
    generated method exceeds JIT limits and drops to interpreted mode.
    """
    ex = df.select(F.col(id_col), F.explode(shingle_col).alias("_s")).withColumn(
        "_h", F.xxhash64("_s")
    )
    sig = ex.groupBy(id_col).agg(
        *[F.min(F.xxhash64(F.col("_h"), F.lit(i))).alias(f"_m{i}") for i in range(num_hashes)]
    )
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias(out)
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
    r = num_hashes // bands
    if sig_col not in df.columns:
        df = minhash_signatures(df, id_col, shingle_col, num_hashes, sig_col)

    # Band hash = xxhash64 of the band's r signature elements + band id,
    # taken straight off the array (keeps the expression tree small —
    # string-concat banding made codegen balloon).
    banded = df.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.element_at(F.col(sig_col), b * r + j + 1) for j in range(r)],
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
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
    # The exploded (id, shingle) relation feeds three branches (sizes +
    # both join sides); cache it so the scan+shingle+distinct runs once.
    ex = df.select(F.col(id_col).alias("id"), F.explode(shingle_col).alias("s")).distinct()
    if cache:
        ex = ex.persist()
    sizes = ex.groupBy("id").agg(F.count("*").alias("n"))

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
        )
        mine = ex.join(rare, "s")

    pairs = (
        mine.alias("x")
        .join(mine.alias("y"), (F.col("x.s") == F.col("y.s")) & (F.col("x.id") < F.col("y.id")))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    if max_shingle_df is not None:
        # capped mining undercounts intersections (hot shingles were
        # excluded) — recompute the exact intersection for the bounded
        # candidate set over the full shingle relation
        cands = pairs.select("a", "b")
        pairs = (
            cands.join(ex.withColumnRenamed("id", "a"), "a")
            .join(ex.withColumnRenamed("id", "b"), ["b", "s"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
    out = (
        pairs.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    out._cached_deps = [ex] if cache else []
    return out


def _verify_jaccard_on_candidates(
    cands: DataFrame, ex: DataFrame, threshold: float
) -> DataFrame:
    """Exact jaccard for (a, b) candidate pairs over the exploded
    (id, shingle) relation ``ex`` — shared tail of every
    candidates-then-verify pipeline (MinHash/LSH, SimHash)."""
    sizes = ex.groupBy("id").agg(F.count("*").alias("n"))
    inter = (
        cands.join(ex.withColumnRenamed("id", "a"), "a")
        .join(ex.withColumnRenamed("id", "b"), ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
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

    The exploded (id, shingle, hash) relation is the shared base of all
    four branches (signature aggregation, per-doc sizes, and both
    intersection join sides) — cached so the corpus is scanned and
    shingled exactly once."""
    sh = with_shingles(df, text_col, n)
    ex = (
        sh.select(F.col(id_col).alias("id"), F.explode("shingles").alias("s"))
        .distinct()
        .withColumn("_h", F.xxhash64("s"))
    )
    if cache:
        ex = ex.persist()
    sig = ex.groupBy("id").agg(
        *[F.min(F.xxhash64(F.col("_h"), F.lit(i))).alias(f"_m{i}") for i in range(num_hashes)]
    ).select(F.col("id").alias(id_col), F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("minhash"))
    cands = minhash_lsh_candidates(sig, id_col, num_hashes=num_hashes, bands=bands, sig_col="minhash")
    out = _verify_jaccard_on_candidates(cands.select("a", "b"), ex, threshold)
    out._cached_deps = [ex] if cache else []
    return out


# -------------------------------------------------------------- simhash

def with_simhash(
    df: DataFrame, id_col: str, shingle_col: str = "shingles", out: str = "simhash"
) -> DataFrame:
    """64-bit SimHash: hash each shingle (xxhash64), per bit position sum
    +1/-1 across shingles, sign → bit. One explode + one groupBy-sum
    (single shuffle), then joined back on the id."""
    h = df.select(F.col(id_col), F.explode(shingle_col).alias("s")).withColumn(
        "h", F.xxhash64("s")
    )
    bit_sums = h.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    # Assemble sign bits into one signed 64-bit value.
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseXOR(term)
    fingerprints = bit_sums.select(F.col(id_col), sim.alias(out))
    return df.join(fingerprints, id_col, "left")


def simhash_candidates(
    df: DataFrame, id_col: str, simhash_col: str = "simhash", max_hamming: int = 3
) -> DataFrame:
    """Hamming-≤k candidate pairs by pigeonhole banding: split 64 bits
    into k+1 chunks; any pair within distance k agrees on ≥1 full chunk.
    Equi-join per chunk — no cross product. Returns (a, b, hamming).

    Chunks cover ALL 64 bits (widths of ⌈64/(k+1)⌉ then ⌊64/(k+1)⌋ as
    the remainder runs out) — the recall guarantee only needs k+1
    chunks, but full coverage keeps precision from collapsing when the
    budget is large."""
    chunks = max_hamming + 1
    if chunks > 64:
        raise ValueError("max_hamming must be ≤ 63 for a 64-bit simhash")
    base, rem = divmod(64, chunks)
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
    # hamming filter BEFORE the distinct: the rowwise bit_count is
    # nearly free, so dedup only ever sees qualifying pairs — at wide
    # budgets (many narrow chunks) the raw candidate stream is orders
    # of magnitude larger than the result
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a"),
            F.col(f"b.{id_col}").alias("b"),
            F.col(f"a.{simhash_col}").alias("ha"),
            F.col(f"b.{simhash_col}").alias("hb"),
        )
        .filter(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming
        )
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    max_hamming: int = 16,
    threshold: float = 0.9,
    cache: bool = True,
) -> DataFrame:
    """SimHash as the coarse filter of a verified near-dup pipeline:
    shingle → 64-bit simhash → pigeonhole candidates at hamming ≤
    ``max_hamming`` → exact jaccard verification ≥ ``threshold`` on
    candidates only. Same candidates-then-verify architecture as
    ``minhash_near_duplicates``; returned values are exact jaccard, so
    the result is oracle-checkable against the all-pairs baseline
    whenever the hamming budget covers every qualifying pair.

    Budget choice: a simhash bit's sign margin is ~√n_shingles, so
    short documents flip several bits per small edit — at jaccard 0.9
    this corpus needs hamming ≤ 13 (measured); 16 leaves margin. At
    64-bit scale a budget of k costs k+1 chunk equi-joins of width
    ≥ ⌊64/(k+1)⌋ bits — still no cross product, but precision drops as
    chunks narrow; MinHash/LSH is the better coarse filter for small
    shingle sets, which is why both ship."""
    sh = with_shingles(df, text_col, n)
    ex = sh.select(F.col(id_col).alias("id"), F.explode("shingles").alias("s")).distinct()
    if cache:
        ex = ex.persist()
    sim = with_simhash(sh, id_col, "shingles")
    cands = simhash_candidates(sim, id_col, max_hamming=max_hamming).select("a", "b")
    out = _verify_jaccard_on_candidates(cands, ex, threshold)
    out._cached_deps = [ex] if cache else []
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
    of labels going unchanged, one small agg action per round;
    ``max_iter`` bounds adversarial chain graphs. Each round's labels
    are ``localCheckpoint``ed — iterative self-joins grow the LOGICAL
    plan exponentially if only persisted (persist caches data but keeps
    lineage; analysis itself OOMs by ~10 rounds), while checkpointing
    truncates the plan so every round starts from a flat scan.

    Returns (node, component) for every node with ≥1 edge.
    """
    sym = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).union(
        edges.select(F.col(dst).alias("x"), F.col(src).alias("y"))
    )
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("x").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["y"] == labels["node"])
            .groupBy("x")
            .agg(F.min("component").alias("nc"))
        )
        labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["x"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nc"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        new_sum = labels.agg(F.sum("component")).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
