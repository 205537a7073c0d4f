"""Dataset-curation operators for training-data pipelines (SURVEY.md
§2C extension surface, round 4): benchmark decontamination,
deterministic stratified sampling / domain mixing, sequence packing,
and PII redaction.

These are the standard steps between "raw crawl" and "training mix"
that the reference engine has no analogue for (its surface stops at
extract/transform/load, `/root/reference/src/index.ts:120-320`).
Everything here is built-in Column expressions — whole-stage codegen,
no Python in the hot path — so each step is a linear scan plus at most
one key-hashed shuffle at any corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from openetl_spark.operators.text import tokens

# ---------------------------------------------------------------------
# Deterministic hash bucketing (the reproducible-sampling primitive)
# ---------------------------------------------------------------------


def hash_bucket(col: Column, n_buckets: int = 100) -> Column:
    """Deterministic, engine-portable bucket in [0, n_buckets): md5 of
    the value's string form, first three hex chars mixed via ascii
    codes. Identical results in Spark and any engine with md5/ascii
    (the DuckDB oracles render the same formula), so sampling decisions
    are reproducible across engines and runs — the property that makes
    a training mix auditable. md5 is evaluated once per row JVM-side;
    16^3 = 4096 distinct states is plenty for percent-level rates.

    The mixing multipliers are primes (65521, 257), NOT byte shifts:
    with 65536/256 every multiplier is ≡ 0 mod any power-of-two bucket
    count, so e.g. n_buckets=16 collapsed to the last char's ascii
    value — 10 reachable buckets out of 16 (caught by the r05 shard
    assignment). Prime multipliers mix all three chars into every
    modulus.

    FORMULA VERSION 2 (r05+): the 65536/256 → 65521/257 multiplier
    change silently remaps every bucket assignment, so sample
    memberships recorded under the v1 formula (pre-r05 rounds) are NOT
    comparable to v2 runs. Any downstream consumer pinning recorded
    memberships must re-derive them; re-running a v2 pipeline is
    byte-stable going forward."""
    h = F.md5(col.cast("string"))
    mixed = (
        F.ascii(F.substring(h, 1, 1)) * 65521
        + F.ascii(F.substring(h, 2, 1)) * 257
        + F.ascii(F.substring(h, 3, 1))
    )
    return F.pmod(mixed, F.lit(n_buckets))


def hash_bucket_sql(expr: str, n_buckets: int = 100) -> str:
    """The exact DuckDB/ANSI rendering of hash_bucket() for oracles."""
    m = f"md5(CAST({expr} AS VARCHAR))"
    return (
        f"(ascii(substr({m},1,1))*65521 + ascii(substr({m},2,1))*257 "
        f"+ ascii(substr({m},3,1))) % {n_buckets}"
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the 'domain mixing' step of
    a training-data pipeline: given target inclusion rates per stratum
    (language, source domain, quality band), keep a reproducible,
    engine-portable subset. Unlike df.sample()/sampleBy(), membership
    depends only on the row id, so the mix is stable across runs,
    engines, partitionings, and cluster sizes — re-running the pipeline
    on 100 TB yields byte-identical training sets.

    Plan shape: one scan, zero shuffles — the rate lookup is a literal
    CASE expression and the bucket is computed per-row. Filters still
    push down past it.

    Rates quantize to whole percents as INTEGER literals before the
    plan is built: a float CASE compared against the bucket would ride
    on `rate*100` double arithmetic, where e.g. 0.29*100 =
    28.999999999999996 truncates to 28 in one engine and rounds to 29
    in another — integer literals make membership bit-identical
    everywhere."""
    pct_expr = F.lit(int(round(float(default_rate) * 100)))
    for stratum, rate in sorted(rates.items()):
        pct_expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(float(rate) * 100)))
        ).otherwise(pct_expr)
    bucket = hash_bucket(F.col(id_col), 100)
    return df.where(bucket < pct_expr)


# ---------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap vs an eval set)
# ---------------------------------------------------------------------


def ngrams(text: Column, n: int = 5) -> Column:
    """Whitespace-token n-grams as space-joined strings. Docs with
    fewer than n tokens have none. Guarded with when(): Spark's
    sequence(1, stop) infers step -1 when stop < 1 and would emit
    index 0, which slice() rejects."""
    toks = tokens(text)
    cnt = F.size(toks)
    return F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(1), cnt - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing >=
    min_shared distinct n-grams with an evaluation corpus (the
    GPT-3/PaLM-style 13-gram-overlap test, shrunk to n-gram size n for
    the synthetic corpus). Returns (id, n_shared, contamination_frac)
    for flagged docs, contamination_frac = shared / doc's distinct
    n-grams.

    Scale shape: eval sets are benchmark-sized (thousands of docs) vs
    a 100 TB training corpus, so the distinct eval n-gram relation is
    broadcast — the corpus side never shuffles for the join; the only
    corpus-keyed shuffle is the single per-doc aggregation, carrying
    (id, partial-count) pairs, not text. explode() streams: no per-doc
    n-gram array ever materializes whole in an executor's state."""
    ev = (
        eval_df.select(F.explode(ngrams(F.col(text_col), n)).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    tr = train.select(
        F.col(id_col), F.explode(ngrams(F.col(text_col), n)).alias("g")
    )
    per_doc = (
        tr.join(F.broadcast(ev), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count_distinct("g").alias("n_grams"),
            F.count_distinct(
                F.when(F.col("hit").isNotNull(), F.col("g"))
            ).alias("n_shared"),
        )
    )
    return per_doc.where(F.col("n_shared") >= min_shared).select(
        id_col,
        "n_shared",
        F.round(F.col("n_shared") / F.col("n_grams"), 4).alias(
            "contamination_frac"
        ),
    )


# ---------------------------------------------------------------------
# Sequence packing (context-window bin assignment)
# ---------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 1,
    shard_seed: int = 0,
    materialize: bool = True,
) -> DataFrame:
    """Contiguous sequence packing: within each group (language),
    documents are laid out in id order and assigned to context-window
    bins of `budget` tokens by exclusive running token count —
    bin = floor(tokens_before_me / budget). This is the deterministic
    streaming-concat packing used to build fixed-length training
    examples; docs longer than the budget span bins exactly as a
    streaming tokenizer would consume them. Returns one row per
    (group, bin): docs packed and fill level.

    Scale shape (n_shards > 1, the 100 TB path): the running-sum window
    is keyed on (group, shard) where shard is the deterministic
    engine-portable hash_bucket of the doc id (the training_shuffle
    sharder keyed with seed `shard_seed`), so NO window partition ever
    exceeds 1/n_shards of a group — a single language never becomes a
    single task. Per-shard local bins are then offset by the cumulative
    bin count of lower-numbered shards (a window over the tiny
    group × shard aggregate, broadcast back), making bin ids globally
    unique, shard-pure, and byte-stable across runs/cluster sizes.
    Cost: one extra tiny aggregate + broadcast join vs the single-key
    plan; the data-sized shuffle count is unchanged.

    n_shards=1 keeps the original single-window-per-group plan; bins
    are identical to the sharded path's within-shard packing modulo the
    doc→shard interleave (pinned equal at n_shards=1 by tests)."""
    from pyspark.sql import Window

    n_tok = F.size(tokens(F.col(text_col)))
    if n_shards <= 1:
        w = (
            Window.partitionBy(group_col)
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        with_bin = (
            df.select(group_col, id_col, n_tok.alias("n_tokens"))
            .withColumn(
                "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            )
            .withColumn("bin_id", F.floor(F.col("tokens_before") / budget))
        )
        return with_bin.groupBy(group_col, "bin_id").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )

    keyed = F.concat_ws(
        ":", F.lit(f"pack{shard_seed}"), F.col(id_col).cast("string")
    )
    w = (
        Window.partitionBy(group_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = (
        df.select(
            group_col,
            F.col(id_col),
            n_tok.alias("n_tokens"),
            hash_bucket(keyed, n_shards).alias("shard"),
        )
        .withColumn("tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("local_bin", F.floor(F.col("tokens_before") / budget))
    )
    # Materialize the windowed projection once (lazy checkpoint): both
    # the offsets aggregate and the final packing consume it, and
    # without this Spark re-scans + re-tokenizes + re-windows the full
    # corpus for each branch — two 100 TB passes instead of one plus a
    # ~40-byte/doc intermediate. materialize=False keeps the full
    # lineage visible for plan-shape tests.
    if materialize:
        local = local.localCheckpoint(eager=False)
    # Tiny aggregate (≤ groups × n_shards rows): bins used per shard,
    # then the exclusive cumulative offset of lower-numbered shards.
    off_w = (
        Window.partitionBy(group_col)
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy(group_col, "shard")
        .agg((F.max("local_bin") + F.lit(1)).alias("n_bins"))
        .withColumn(
            "bin_offset", F.coalesce(F.sum("n_bins").over(off_w), F.lit(0))
        )
        .select(group_col, "shard", "bin_offset")
    )
    packed = local.join(F.broadcast(offsets), [group_col, "shard"]).withColumn(
        "bin_id", F.col("bin_offset") + F.col("local_bin")
    )
    return packed.groupBy(group_col, "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


# ---------------------------------------------------------------------
# Per-stratum percentile length gating
# ---------------------------------------------------------------------


def length_band_filter(
    df: DataFrame,
    lo: float = 0.1,
    hi: float = 0.95,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    exact_window: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Keep documents whose token count sits inside the
    [lo, hi] percentile band OF THEIR OWN STRATUM (source domain /
    language) — the standard outlier-length gate, computed per stratum
    because a 10-token tweet and a 10-token wiki article mean different
    things.

    Default (two-pass, the 100 TB plan): because percent_rank orders by
    n_tokens alone, membership AND the rank value are tie-atomic — they
    depend only on (stratum, n_tokens). So the exact percentile comes
    from the compact per-(stratum, length) histogram:
        pr(L) = #docs_shorter_than_L / (n_stratum − 1)
    computed with one data-sized partial-agg groupBy, a window over the
    tiny histogram (strata × distinct lengths rows), and a broadcast
    join back. No window partition ever holds more than the histogram
    of one stratum — a single source domain never becomes one task —
    and the result is BIT-IDENTICAL to the window path, not an
    approximation (pinned by tests). The slim (id, stratum, n_tokens)
    projection is checkpointed so the corpus is tokenized once.

    exact_window=True keeps the original single-window-per-stratum
    formulation (percent_rank over the stratum window) as the
    cross-check path; it is one task per stratum at scale.

    Ties: equal lengths share a rank, so the cut keeps or drops a tied
    length class atomically — deterministic membership at any
    parallelism."""
    from pyspark.sql import Window

    n_tok = F.size(tokens(F.col(text_col)))
    if exact_window:
        w = Window.partitionBy(strata_col).orderBy(n_tok.asc())
        pr = F.percent_rank().over(w)
        return (
            df.select(
                F.col(id_col),
                F.col(strata_col),
                n_tok.alias("n_tokens"),
                pr.alias("pr"),
            )
            .where((F.col("pr") >= lo) & (F.col("pr") <= hi))
            .select(
                id_col, strata_col, "n_tokens", F.round("pr", 6).alias("len_pctile")
            )
        )

    slim = df.select(F.col(id_col), F.col(strata_col), n_tok.alias("n_tokens"))
    if materialize:
        slim = slim.localCheckpoint(eager=False)
    hist_w = (
        Window.partitionBy(strata_col)
        .orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot_w = Window.partitionBy(strata_col)
    hist = (
        slim.groupBy(strata_col, "n_tokens")
        .agg(F.count("*").alias("_cnt"))
        .withColumn("_lt", F.coalesce(F.sum("_cnt").over(hist_w), F.lit(0)))
        .withColumn("_n", F.sum("_cnt").over(tot_w))
        # percent_rank = (rank-1)/(n-1); rank of a length class is
        # (#shorter + 1). Single-row stratum: percent_rank defines 0.
        .withColumn(
            "pr",
            F.when(F.col("_n") == 1, F.lit(0.0)).otherwise(
                F.col("_lt").cast("double") / (F.col("_n") - F.lit(1))
            ),
        )
        .where((F.col("pr") >= lo) & (F.col("pr") <= hi))
        .select(strata_col, "n_tokens", "pr")
    )
    return slim.join(F.broadcast(hist), [strata_col, "n_tokens"]).select(
        id_col, strata_col, "n_tokens", F.round("pr", 6).alias("len_pctile")
    )


# ---------------------------------------------------------------------
# Vocabulary statistics (tokenizer-training / heavy-hitter analysis)
# ---------------------------------------------------------------------


def vocab_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 100,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus vocabulary heavy hitters: the k most frequent whitespace
    tokens with occurrence count and document frequency — the first
    statistic of tokenizer training and stop-word/boilerplate analysis.
    Deterministic order: count desc, then token asc.

    Scale shape: explode → partial-agg counts (the shuffle carries
    (token, partial-count) pairs, not documents) →
    TakeOrderedAndProject (per-partition heap of k, driver merges k
    rows — no global sort)."""
    toks = tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, F.lower)
    ex = df.select(F.col(id_col).alias("_doc"), F.explode(toks).alias("token"))
    per = ex.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct("_doc").alias("doc_freq"),
    )
    return per.orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    ).limit(k)


def rarity_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    round_dp: int = 4,
) -> DataFrame:
    """Unigram self-information per document: mean −ln(p(token)) under
    the corpus's own unigram distribution — the cheap perplexity proxy
    used to separate boilerplate (low surprise) from unusual/garbled
    text (high surprise) before model-based scoring. Returns
    (id, n_tokens, rarity).

    Two-pass shape, both linear: (1) corpus unigram counts (partial-agg
    on token), (2) re-join tokens to counts and aggregate per doc. The
    token-keyed join shuffles the exploded relation once — same volume
    as any token-level statistic; per-doc state is one running mean.

    Skew (VERDICT r03 watch item): token frequencies are Zipfian, so
    the probe side of the join is skewed. The freq side is a post-agg
    relation whose runtime size AQE sees — at sf0.1 AQE converts this
    join to BroadcastHashJoin at runtime (verified on the executed
    plan: 1 BHJ, 0 SMJ), which sidesteps probe-side skew entirely; on
    a corpus whose vocabulary exceeds the broadcast threshold, AQE's
    skew-join split applies instead. No static hint is forced so the
    runtime picks whichever holds."""
    toks = tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, F.lower)
    ex = df.select(F.col(id_col).alias("_doc"), F.explode(toks).alias("token"))
    freq = ex.groupBy("token").agg(F.count("*").alias("_c"))
    total = freq.agg(F.sum("_c").alias("_n"))
    return (
        ex.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("_doc")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("_n") / F.col("_c"))), round_dp).alias(
                "rarity"
            ),
        )
        .select(F.col("_doc").alias(id_col), "n_tokens", "rarity")
    )


def mix_to_target(
    df: DataFrame,
    target: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Downsample a corpus so its group mix matches ``target``
    proportions — the domain-reweighting step of assembling a training
    mix (e.g. {web: .6, code: .2, books: .2}). Finds the LARGEST
    achievable corpus honoring the target without upsampling: the
    binding group is the one with the least data relative to its
    weight (T = min over groups of n_g / w_g, then keep-rate
    r_g = w_g·T / n_g, so the binding group keeps everything and
    every other group downsamples to proportion).

    Everything stays in the plan — group counts are a tiny post-agg
    relation, the scalar T folds in via a broadcast one-row join, and
    membership is the engine-portable md5 hash bucket (basis points:
    rates FLOOR to 1/10000ths, so the achieved mix is within 1e-4 of
    target per group and membership is bit-reproducible across engines
    and runs, same auditability contract as ``stratified_sample``).
    Groups absent from ``target`` are dropped (weight 0). One
    broadcast join + a scan-local predicate; no shuffle of the corpus,
    no driver collect."""
    tgt = df.sparkSession.createDataFrame(
        [(g, float(w)) for g, w in target.items()], f"{group_col} string, _w double"
    )
    sw = tgt.agg(F.sum("_w").alias("_sw"))
    # persist (r12): the binding-group scalar T and the rate relation
    # each re-derive `j` (and the corpus count beneath it) — the
    # relation is group-cardinality-sized.
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n")).persist()
    j = (
        counts.join(F.broadcast(tgt), group_col)
        .crossJoin(F.broadcast(sw))
        .select(
            group_col,
            "_n",
            (F.col("_w") / F.col("_sw")).alias("_wn"),
        )
    )
    t = j.agg(F.min(F.col("_n") / F.col("_wn")).alias("_t"))
    # The binding group's rate is exactly 10000 bp in rational
    # arithmetic, but the float expression wn·(n/wn)/n can land at
    # 10000·(1−ε) and floor to 9999, silently dropping ~1/10000 of the
    # binding group. The 1e-9 nudge (mirrored verbatim in the oracle)
    # absorbs that representation error while staying far below the
    # 1-bp granularity that separates genuinely distinct rates.
    rates = (
        j.crossJoin(F.broadcast(t))
        .select(
            group_col,
            F.least(
                F.lit(10000),
                F.floor(
                    F.lit(10000.0) * F.col("_wn") * F.col("_t") / F.col("_n")
                    + F.lit(1e-9)
                ),
            ).alias("_bp"),
        )
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_bucket(F.col(id_col), 10000) < F.col("_bp"))
        .drop("_bp")
    )


def temperature_sampling(
    df: DataFrame,
    alpha: float = 0.3,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature/alpha sampling (Conneau et al. 2020's XLM-R §3.1,
    following Lample & Conneau 2019): target group share
    p_g ∝ n_g^alpha — alpha < 1 flattens the distribution, upweighting
    low-resource languages relative to their natural share without
    upsampling anything. The keep-rate machinery is mix_to_target's
    binding-group rule with the DERIVED weights: T = min_g n_g/p_g (the
    largest corpus achievable without upsampling), r_g = p_g·T/n_g,
    membership via the engine-portable md5 basis-point bucket.

    n_g^alpha is rounded to 9 dp before the rate arithmetic: pow() is
    correctly-rounded to ~1 ulp in both engines, so the 9-dp value is
    identical on both sides and the basis-point floor can't diverge at
    a boundary (the transcendental version of the mix_to_target 1e-9
    nudge, which is also retained). Same plan shape as mix_to_target:
    post-agg counts, two broadcast scalars, one broadcast join, a
    scan-local predicate — zero corpus shuffles."""
    # persist (r12): sw, the binding-group scalar, and the rate
    # relation each re-derive the derived-weight relation (and the
    # corpus count beneath it) — group-cardinality-sized.
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n")).persist()
    w = counts.select(
        group_col, "_n",
        F.round(F.pow(F.col("_n").cast("double"), float(alpha)), 9).alias("_wn"),
    )
    sw = w.agg(F.sum("_wn").alias("_sw"))
    j = w.crossJoin(F.broadcast(sw)).select(
        group_col, "_n", (F.col("_wn") / F.col("_sw")).alias("_p")
    )
    t = j.agg(F.min(F.col("_n") / F.col("_p")).alias("_t"))
    rates = j.crossJoin(F.broadcast(t)).select(
        group_col,
        F.least(
            F.lit(10000),
            F.floor(
                F.lit(10000.0) * F.col("_p") * F.col("_t") / F.col("_n")
                + F.lit(1e-9)
            ),
        ).alias("_bp"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_bucket(F.col(id_col), 10000) < F.col("_bp"))
        .drop("_bp")
    )


def ngram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    round_dp: int | None = 4,
) -> DataFrame:
    """Bigram language-model scoring: train an add-one-smoothed bigram
    LM on the corpus itself in one pass, then score every document by
    its mean negative log-likelihood — the CCNet-style perplexity
    filter (Wenzek et al. 2020) that ranks documents by how "expected"
    their token sequences are, one model grade above ``rarity_score``'s
    unigram surprise. Low nll ≈ fluent/boilerplate, high nll ≈ garbled
    or out-of-domain text. Returns (id, n_bigrams, nll) for documents
    with ≥ 2 tokens; P(w|v) = (c(v,w)+1) / (c(v·)+V) with c(v·) the
    count of bigram occurrences starting with v and V the corpus
    vocabulary size.

    Physical shape: adjacent pairs are built SCAN-SIDE by zipping the
    token array against its own 1-shifted slice (the
    ``bigram_repetition_stats`` / ``with_shingles`` convention) — the
    exploded bigram relation is born without any shuffle; a
    doc-windowed ``lead`` would hash-exchange and sort one row per
    corpus token first, the widest relation in the pipeline. Bigram
    and prefix counts are partial-aggregated on their keys; the
    probe-side re-join is Zipf-skewed exactly like ``rarity_score``'s
    and rides the same AQE broadcast/skew-split behavior (the count
    relations are post-agg, runtime-sized). Vocabulary size joins as a
    broadcast one-row relation."""
    toks = tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, F.lower)
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(
            a.alias("pre"), F.concat_ws(" ", a, b).alias("bg")
        ),
    )
    big = df.select(
        F.col(id_col).alias("_doc"), F.explode(pairs).alias("_p")
    ).select("_doc", F.col("_p.pre").alias("pre"), F.col("_p.bg").alias("bg"))
    c2 = big.groupBy("bg").agg(F.count("*").alias("_c2"))
    c1 = big.groupBy("pre").agg(F.count("*").alias("_c1"))
    vocab = df.select(F.explode(toks).alias("token")).agg(
        F.countDistinct("token").alias("_v")
    )
    nll = F.avg(
        -F.log((F.col("_c2") + F.lit(1.0)) / (F.col("_c1") + F.col("_v")))
    )
    if round_dp is not None:  # None = raw double (downstream binning)
        nll = F.round(nll, round_dp)
    return (
        big.join(c2, "bg")
        .join(c1, "pre")
        .crossJoin(F.broadcast(vocab))
        .groupBy("_doc")
        .agg(F.count("*").alias("n_bigrams"), nll.alias("nll"))
        .select(F.col("_doc").alias(id_col), "n_bigrams", "nll")
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    bin_width: float = 0.002,
    round_dp: int = 4,
    scored: DataFrame | None = None,
) -> DataFrame:
    """CCNet's perplexity-bucket split (Wenzek et al. 2020 §4.3): score
    every document with the corpus bigram LM, then split each language
    into head / middle / tail terciles of the score distribution —
    head being the most-fluent third the CCNet pipeline keeps by
    default. Returns one row per (group, bucket): n_docs and the
    bucket's mean NLL.

    Tercile thresholds are NOT a percent_rank window over raw docs
    (that's one task per language at corpus scale — the
    low-cardinality-window trap); they come from the per-(group, bin)
    HISTOGRAM of fixed-width NLL bins, whose cumulative pass runs over
    ≤ a few hundred bin rows per group (the grouped_quantiles shape).
    Bucket membership compares the doc's integer bin id to the
    threshold bin ids — integer compares, so membership is exactly
    reproducible in the oracle. Docs with < 2 tokens carry no LM
    evidence and are excluded (as in ``ngram_lm_score``).

    ``scored``: optional pre-computed (id, group, nll) relation — a
    persisted score layout; when given, the LM train+score pass is
    skipped entirely (the offline-fit/online-gate posture)."""
    binned = with_perplexity_bucket(
        df, id_col, text_col, group_col, bin_width, scored=scored
    )
    return (
        binned.groupBy(group_col, "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("nll"), round_dp).alias("avg_nll"),
        )
    )


def with_perplexity_bucket(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    bin_width: float = 0.002,
    scored: DataFrame | None = None,
) -> DataFrame:
    """The per-document relation behind ``perplexity_buckets``:
    (id, group, nll, bucket) with bucket ∈ head/middle/tail — exposed
    so pipelines can GATE on the bucket (CCNet keeps head+middle) as
    well as report on it. Same histogram-tercile machinery; same
    scale shape. ``scored``: optional pre-computed (id, group, nll)
    relation (a persisted score layout) replacing the in-plan LM
    train+score — at 100 TB the corpus LM is fitted/scored ONCE and
    every gate reads the artifact."""
    if scored is None:
        scored = ngram_lm_score(df, id_col, text_col, round_dp=None).join(
            df.select(id_col, group_col), id_col
        )
    w = float(bin_width)
    binned = scored.select(
        id_col,
        group_col,
        "nll",
        F.floor(F.col("nll") / w).cast("long").alias("_bin"),
    )
    hist = binned.groupBy(group_col, "_bin").agg(F.count("*").alias("_c"))
    win = (
        W.partitionBy(group_col)
        .orderBy("_bin")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    win_all = (
        W.partitionBy(group_col)
        .orderBy("_bin")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(win)).withColumn(
        "_n", F.sum("_c").over(win_all)
    )
    thr = cum.groupBy(group_col).agg(
        F.min(
            F.when(F.col("_cum") >= F.col("_n") / 3.0, F.col("_bin"))
        ).alias("_t33"),
        F.min(
            F.when(F.col("_cum") >= 2.0 * F.col("_n") / 3.0, F.col("_bin"))
        ).alias("_t67"),
    )
    bucket = (
        F.when(F.col("_bin") <= F.col("_t33"), F.lit("head"))
        .when(F.col("_bin") <= F.col("_t67"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        binned.join(F.broadcast(thr), group_col)
        .select(id_col, group_col, "nll", bucket.alias("bucket"))
    )


def contrastive_negatives(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 4,
    n_buckets: int = 16,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each anchor, pick ``k`` different-label negatives — reproducibly,
    with no RNG state, so the (anchor, negative) pairs are
    bit-identical across runs, engines, and partitionings (the same
    auditability contract as the hash samplers; random .sample() would
    silently reshuffle every epoch's negatives).

    Scale shape: each anchor probes ONE deterministic md5 bucket of
    candidates (its probe bucket is derived from the anchor id, so
    anchors spread uniformly over buckets), giving candidate volume
    |corpus|/n_buckets per anchor — choose n_buckets ∝ corpus size to
    hold per-anchor candidates constant, exactly the SemDeDup cluster
    budget argument. Ranking inside the (anchor, bucket) candidate set
    is by md5 of the pair key (portable, uniform), then row_number
    takes k. Anchors whose probe bucket holds < k different-label
    candidates emit fewer rows (documented; raise n_buckets density or
    re-probe in a second pass if the corpus is label-sparse)."""
    a = df.select(
        F.col(id_col).alias("anchor"),
        F.col(label_col).alias("_al"),
        hash_bucket(
            F.concat(F.col(id_col).cast("string"), F.lit("p")), n_buckets
        ).alias("_pb"),
    )
    c = df.select(
        F.col(id_col).alias("negative"),
        F.col(label_col).alias("_cl"),
        hash_bucket(F.col(id_col), n_buckets).alias("_cb"),
    )
    pairs = a.join(c, (F.col("_pb") == F.col("_cb")) & (F.col("_al") != F.col("_cl")))
    rank_key = F.md5(
        F.concat(
            F.col("anchor").cast("string"), F.lit(":"), F.col("negative").cast("string")
        )
    )
    w = W.partitionBy("anchor").orderBy(rank_key.asc(), F.col("negative").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor", "negative", "rank")
    )


# ---------------------------------------------------------------------
# Embedding normalization / quantization
# ---------------------------------------------------------------------


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out: str = "q8",
) -> DataFrame:
    """L2-normalize each embedding and quantize to int8 (⌊127·v/‖v‖⌉) —
    the standard 4× storage/bandwidth shrink before ANN indexing of a
    100 TB embedding corpus. Pure array expressions (aggregate for the
    norm, transform for the scale): whole-stage codegen, zero shuffles,
    a linear scan at any scale. Zero vectors quantize to zeros (norm
    guarded). Returns (id, q8 array<int>, norm)."""
    v = F.col(vec_col)
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )
    safe = F.greatest(norm, F.lit(1e-30))
    q = F.transform(v, lambda x: F.round(x.cast("double") * 127.0 / safe).cast("int"))
    return df.select(
        F.col(id_col), q.alias(out), F.round(norm, 6).alias("norm")
    )


def winsorize_embeddings(
    df: DataFrame,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 4,
) -> DataFrame:
    """Per-dimension winsorization: clip every embedding coordinate to
    its dimension's [lo_q, hi_q] corpus quantiles — the robust-scaling
    prep that keeps a few exploded activations from dominating cosine/
    L2 geometry before indexing or clustering (Dixon 1960's winsorized
    estimation applied per feature). Returns (id, clipped values as
    FIXED-POINT ints — ⌊x·10^dp⌉ — serialized to a comma string:
    array cells break the driver's canonicalization, and double→string
    rendering itself diverges between engines (Spark emits scientific
    notation for |x| < 1e-3, DuckDB doesn't), so only integer
    serialization is portable).

    Shape: the bounds come from ONE explode → per-dim exact-percentile
    aggregate (dims × quantiles values — kilobytes), re-assembled into
    two position-indexed arrays on a single broadcast row; clipping is
    then a scan-side zip over the original vectors. The corpus is
    never re-shuffled or re-assembled from exploded rows. At 100 TB
    swap the exact percentile for approx_percentile (same plan shape);
    exact is used here so the DuckDB oracle (quantile_cont) matches
    bit-for-bit."""
    v = F.col(vec_col).cast("array<double>")
    ex = df.select(F.posexplode(v).alias("_pos", "_val"))
    bounds = ex.groupBy("_pos").agg(
        F.percentile("_val", F.lit(lo_q)).alias("_lo"),
        F.percentile("_val", F.lit(hi_q)).alias("_hi"),
    )
    packed = F.broadcast(
        bounds.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_lo"))),
                lambda s: s["_lo"],
            ).alias("_los"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_hi"))),
                lambda s: s["_hi"],
            ).alias("_his"),
        )
    )
    scale = float(10 ** round_dp)
    clipped = F.zip_with(
        F.zip_with(v, F.col("_los"), lambda x, lo: F.greatest(x, lo)),
        F.col("_his"),
        lambda x, hi: F.round(F.least(x, hi) * scale).cast("long"),
    )
    return df.crossJoin(packed).select(
        F.col(id_col),
        F.concat_ws(",", F.transform(clipped, lambda x: x.cast("string"))).alias(
            "winsorized"
        ),
    )


# ---------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------

# Dialect-safe patterns: identical semantics in Java regex (Spark) and
# RE2 (DuckDB oracle) — no lookaround, no backreferences, no \b.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\(?[0-9]{3}[-.)][0-9]{3}[-.][0-9]{4}"


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Scrub emails and US-style phone numbers, reporting per-row match
    counts — the mandatory hygiene pass before text enters a training
    mix. Patterns are deliberately lookaround-free so the operator runs
    entirely in whole-stage codegen (regexp_replace / regexp_extract_all
    are JVM intrinsics); a 100 TB redaction pass is a pure scan."""
    t = F.col(text_col)
    return (
        # idx=0 (whole match): Spark's default group index is 1, and
        # these patterns have no capture groups.
        df.withColumn("n_emails", F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)))
        .withColumn("n_phones", F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)))
        .withColumn(
            out_col,
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
            ),
        )
    )


# ---------------------------------------------------------------------
# Approximate vocabulary heavy hitters (SpaceSaving sketch)
# ---------------------------------------------------------------------


def _spacesaving_partition(capacity: int, lowercase: bool):
    """Build the mapInPandas worker: one SpaceSaving summary (Metwally
    et al. 2005) of `capacity` counters per partition, maintained
    across Arrow batches as they stream (no batch is retained), emitted
    once at end-of-partition. Expects columns (_pid, _text).

    Eviction uses a lazy min-heap (stale entries skipped on pop,
    compacted when the heap outgrows 8× capacity) so each token costs
    amortized O(log capacity) — a linear min() scan over the counter
    dict would make the high-churn regime this sketch exists for
    (distinct tokens ≫ capacity) O(n_tokens × capacity).

    Tokenization mirrors the JVM/oracle paths byte-for-byte on the
    split rule: ASCII \\s+ (re.ASCII — Java regex \\s and DuckDB/RE2
    \\s are ASCII-only, while Python str.split() would also break on
    U+00A0 etc.). Lowercasing is str.lower(); for non-ASCII letters
    Unicode lowercasing nuances are shared with the JVM path, not with
    plain ASCII oracles — same caveat as every lower() in the repo."""
    import heapq
    import re

    import pandas as pd

    ws = re.compile(r"\s+", re.ASCII)

    def run(batches):
        counts: dict[str, int] = {}
        errs: dict[str, int] = {}
        heap: list[tuple[int, str]] = []  # (count-at-push, token), lazy

        def push(cnt: int, tok: str) -> None:
            # Compact on EVERY push: the increment path pushes one stale
            # entry per occurrence, so with no evictions (capacity ≥
            # per-partition distinct — the exact-mode config) the heap
            # would otherwise grow O(token occurrences), not O(capacity).
            heapq.heappush(heap, (cnt, tok))
            if len(heap) > 8 * capacity:
                heap[:] = [(c, t) for t, c in counts.items()]
                heapq.heapify(heap)

        pid = -1
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["_pid"].iloc[0])
            for text in pdf["_text"]:
                if text is None:
                    continue
                if lowercase:
                    text = text.lower()
                # No .strip(): Python's strip is Unicode-aware while the
                # ASCII \s+ split mirrors Java/RE2; edge whitespace just
                # yields empty tokens the filter below drops.
                for tok in ws.split(text):
                    if not tok:
                        continue
                    if tok in counts:
                        counts[tok] += 1
                        push(counts[tok], tok)
                    elif len(counts) < capacity:
                        counts[tok] = 1
                        errs[tok] = 0
                        push(1, tok)
                    else:
                        # evict the live min-count entry; its count
                        # bounds the new entry's overestimate
                        while True:
                            cnt, victim = heapq.heappop(heap)
                            if counts.get(victim) == cnt:
                                break
                        floor = counts.pop(victim)
                        errs.pop(victim)
                        counts[tok] = floor + 1
                        errs[tok] = floor
                        push(floor + 1, tok)
        if not counts:
            return
        thr = min(counts.values()) if len(counts) >= capacity else 0
        yield pd.DataFrame(
            {
                "token": list(counts),
                "est": list(counts.values()),
                "err": [errs[t] for t in counts],
                "thr": thr,
                "pid": pid,
            }
        )

    return run


def vocab_topk_sketch(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    capacity: int = 4096,
    lowercase: bool = True,
) -> DataFrame:
    """Approximate vocabulary heavy hitters via per-partition
    SpaceSaving summaries — the 100 TB path where `vocab_topk`'s exact
    token-keyed shuffle (one record per DISTINCT token, trillions on a
    web corpus) stops being viable. Each partition keeps a fixed
    `capacity` counters regardless of input size; the merge shuffles at
    most capacity × n_partitions candidate rows.

    Per token the merge computes:
      lo  = Σ_present (est_i − err_i)     (never overcounts)
      hi  = Σ_present est_i + Σ_absent thr_i  (never undercounts;
            thr_i, a partition's min counter, bounds any token it
            evicted or never saw)
    Every token with true global count > N_tokens / capacity is
    guaranteed present. Ranking is by the merged point estimate
    n_occurrences = Σ_present est (each partition's est is its local
    upper bound; hi additionally adds absent-partition slack and is
    reported for interval use, not ranking) with a token tiebreak, so
    the output order is deterministic.

    With capacity ≥ per-partition distinct tokens no counter is ever
    evicted; est is then the exact count and lo = hi — the
    configuration the oracle-checked catalog query runs, while the
    eviction path is pinned by property tests at small capacity.
    Returns (token, n_occurrences, lo, hi) — n_occurrences = Σ est."""
    src = df.select(
        F.spark_partition_id().alias("_pid"), F.col(text_col).alias("_text")
    )
    sketch = src.mapInPandas(
        _spacesaving_partition(capacity, lowercase),
        schema="token string, est long, err long, thr long, pid int",
    )
    # Materialize once: the per-partition pass is the expensive part and
    # three aggregates below re-read it.
    sketch = sketch.localCheckpoint(eager=False)
    total_thr = sketch.select("pid", "thr").distinct().agg(
        F.coalesce(F.sum("thr"), F.lit(0)).alias("_total_thr")
    )
    merged = (
        sketch.groupBy("token")
        .agg(
            F.sum("est").alias("n_occurrences"),
            F.sum(F.col("est") - F.col("err")).alias("lo"),
            F.sum("thr").alias("_thr_present"),
        )
        .join(F.broadcast(total_thr))
        .select(
            "token",
            "n_occurrences",
            "lo",
            (F.col("n_occurrences") + F.col("_total_thr") - F.col("_thr_present")).alias(
                "hi"
            ),
        )
    )
    return merged.orderBy(F.col("n_occurrences").desc(), F.col("token").asc()).limit(k)


# ---------------------------------------------------------------------
# Deterministic training-order shuffle
# ---------------------------------------------------------------------


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "42",
    n_shards: int = 16,
) -> DataFrame:
    """Assign every row a reproducible training-order position WITHOUT
    a global sort: shard = keyed hash bucket, position = rank of the
    row's md5 key within its shard. Consuming shards in (shard,
    pos_in_shard) order yields a pseudo-random permutation of the
    corpus that is identical across runs, engines, and cluster sizes —
    the property a resumable 100 TB training job needs from its data
    order.

    Scale shape: one hash-partition shuffle on shard + a sort within
    each shard (Window.partitionBy = exactly one exchange; no global
    range exchange, no driver involvement). Changing `seed` produces an
    unrelated permutation, so epoch reshuffles are a constant-cost
    re-run. Returns (id, shard, pos_in_shard)."""
    from pyspark.sql import Window

    keyed = F.concat_ws(":", F.lit(f"shuf{seed}"), F.col(id_col).cast("string"))
    key = F.md5(keyed)
    shard = hash_bucket(keyed, n_shards)
    return (
        df.select(F.col(id_col), shard.alias("shard"), key.alias("_key"))
        .withColumn(
            "pos_in_shard",
            F.row_number().over(
                Window.partitionBy("shard").orderBy(F.col("_key"), F.col(id_col))
            ),
        )
        .drop("_key")
    )


# ---------------------------------------------------------------------
# Count-min sketch (second heavy-hitter/frequency family)
# ---------------------------------------------------------------------


def cms_positions(tok_col: Column, depth: int = 4, width: int = 2048) -> Column:
    """The depth (d, pos) CMS cell coordinates of one token as an
    array<struct> — hash_bucket over a per-row seeded key, so positions
    are engine-portable (the DuckDB oracle and the streaming
    maintainer render the identical formula)."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                hash_bucket(
                    F.concat_ws(":", F.lit(f"cms{d}"), tok_col), width
                ).alias("pos"),
            )
            for d in range(depth)
        ]
    )


def cms_token_estimates(
    df: DataFrame,
    probe_k: int = 20,
    depth: int = 4,
    width: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Count-min sketch token frequency estimation, expressed ENTIRELY
    in relational algebra — no Python in the sketch path, and therefore
    bit-exactly reproducible in any engine with md5 (the DuckDB oracle
    renders the same plan): depth×width cells are `(d, pos)` group
    counts where pos = hash_bucket("cms{d}:" + token, width), and a
    token's estimate is the MIN of its depth cells — the classic CMS
    guarantee (never undercounts; overcount bounded by collisions,
    ~N_tokens/width per row).

    Scale shape: one corpus scan → explode tokens ×depth positions →
    partial-agg groupBy over ≤ depth×width groups (a tiny, MERGEABLE
    shuffle — the cells relation IS the sketch, and two corpora's cells
    merge by summing). Probes (the exact top-`probe_k` tokens, giving
    the oracle a deterministic set) join the broadcast cells relation.
    Complements vocab_topk_sketch: SpaceSaving answers "which tokens
    are frequent", CMS answers "how frequent is THIS token" in O(1)
    cells without storing the vocabulary.

    Returns (token, n_exact, cms_est, never_under) ordered by exact
    count desc, token asc. never_under pins est >= exact row-by-row.
    width must be <= 4096 (the md5-bucket state space)."""
    if width > 4096:
        raise ValueError("width exceeds the 4096-state md5 bucket space")
    toks = tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, F.lower)
    ex = df.select(F.explode(toks).alias("token"))

    def positions(tok_col):
        return cms_positions(tok_col, depth, width)

    # r12 optimization: a cell count is Σ over DISTINCT tokens landing
    # on it of that token's frequency, so hash positions are computed
    # once per distinct token (weighted by its grouped count), not once
    # per corpus token — depth×distinct md5s instead of depth×corpus
    # (the ams_cells discipline). Cell values are bit-identical.
    tok_counts = ex.groupBy("token").agg(F.count("*").alias("_f"))
    cells = (
        tok_counts.select(
            F.explode(positions(F.col("token"))).alias("dp"), "_f"
        )
        .select("dp.d", "dp.pos", "_f")
        .groupBy("d", "pos")
        .agg(F.sum("_f").alias("cell"))
    )
    probes = vocab_topk(df, id_col, text_col, k=probe_k, lowercase=lowercase).select(
        "token", F.col("n_occurrences").alias("n_exact")
    )
    probe_pos = probes.select(
        "token", "n_exact", F.explode(positions(F.col("token"))).alias("dp")
    ).select("token", "n_exact", "dp.d", "dp.pos")
    est = (
        probe_pos.join(F.broadcast(cells), ["d", "pos"])
        .groupBy("token", "n_exact")
        .agg(F.min("cell").alias("cms_est"))
    )
    return est.select(
        "token",
        "n_exact",
        "cms_est",
        (F.col("cms_est") >= F.col("n_exact")).alias("never_under"),
    ).orderBy(F.col("n_exact").desc(), F.col("token").asc())


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 5,
    normalize: bool = True,
    out: str | None = None,
) -> DataFrame:
    """Line-level boilerplate removal (the C4 / RefinedWeb cleanup
    step): drop every line that appears — normalized — in at least
    ``min_docs`` distinct documents (nav menus, cookie banners, footer
    legalese), and stitch each document back together with its
    surviving lines in original order.

    Plan shape, built for corpus scale:

    * posexplode lines once; the per-line document-frequency pass is
      (doc, line-hash) distinct → count per hash — both partial-agg
      hash shuffles keyed on the 64-bit line hash, never on documents,
      so the hottest key is bounded by the most-duplicated LINE, and
      AQE's skew split covers exactly that.
    * the boilerplate filter is a left-anti join on the hash; when the
      flagged set is small (it usually is — few lines clear a high
      ``min_docs`` bar) AQE converts it to a broadcast join at runtime.
    * reassembly is one groupBy(doc) of (pos, line) structs —
      array_sort restores order; per-group state is one document's
      lines, never corpus-sized.

    Documents whose every line is boilerplate come back with empty
    text (kept, not dropped — downstream length filters decide).
    Normalization for the frequency count is trim+lower (the emitted
    lines stay verbatim); empty lines count like any other and will be
    removed as boilerplate once ``min_docs`` documents contain one —
    run before this if blank-line structure matters.

    The synthetic testdata corpus has no newline structure (verified:
    single-line docs), so this operator is pinned by unit tests on
    multi-line fixtures rather than a catalog oracle query."""
    out = out or text_col
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    norm = F.lower(F.trim(F.col("line"))) if normalize else F.col("line")
    keyed = lines.withColumn("_k", F.xxhash64(norm))
    docfreq = (
        keyed.select(id_col, "_k")
        .distinct()
        .groupBy("_k")
        .agg(F.count("*").alias("_df"))
    )
    boiler = docfreq.filter(F.col("_df") >= min_docs).select("_k")
    kept = keyed.join(boiler, "_k", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias(out)
    )
    base = df.select(id_col)
    return base.join(rebuilt, id_col, "left").select(
        F.col(id_col), F.coalesce(F.col(out), F.lit("")).alias(out)
    )


def sample_rank_key(key: Column, seed: int = 42) -> Column:
    """Deterministic, engine-portable 48-bit rank key: the first 12 hex
    chars of md5(seed ':' key) as a bigint. Spark renders it with
    conv(); the DuckDB oracles use CAST('0x' || substring(...) AS
    BIGINT) — identical integers, so sample membership and ORDER are
    reproducible across engines (the auditability contract of
    hash_bucket, extended to ranking)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long")


def per_group_sample(
    df: DataFrame,
    k: int,
    group_cols: tuple[str, ...] = ("lang",),
    key_col: str = "doc_id",
    seed: int = 42,
    margin: float = 4.0,
    exact_window: bool = False,
) -> DataFrame:
    """Deterministic k-per-group sample (eval-set construction, per-
    domain spot-checks): the k rows with the smallest hash rank per
    group — a seeded, reproducible choice, not rand().

    Scale path (default): a per-group window over raw data would put
    one GROUP per task (the low-cardinality-window trap this repo's
    length gate already avoids). Instead: (1) one count-only partial
    aggregate gives each group's size n; (2) because the 48-bit rank
    key is uniform, the k-th smallest sits near (k/n)·2⁴⁸, so a pure
    arithmetic threshold margin·k/n·2⁴⁸ (broadcast, no percentile
    machinery) keeps ~margin·k survivors per group; (3) the exact
    row_number window runs over those survivors only — window
    partitions are O(margin·k) rows regardless of corpus size.
    Threshold undershoot (fewer than k survivors) is a Chernoff-tail
    event at margin 4 (P < exp(−k·9/8·(3/4)²) per group);
    ``exact_window=True`` keeps the direct window form as the
    cross-check path (equality pinned by test and by the catalog
    oracle, which computes the direct form in DuckDB)."""
    hv = sample_rank_key(F.col(key_col), seed).alias("_hv")
    base = df.select(*group_cols, key_col).withColumn("_hv", hv)
    w = W.partitionBy(*group_cols).orderBy("_hv", key_col)
    if exact_window:
        return (
            base.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(*group_cols, key_col)
        )
    full = float(2 ** 48)
    thr = base.groupBy(*group_cols).agg(
        F.least(
            F.lit(full),
            F.lit(float(margin) * k) * full / F.count("*"),
        )
        .cast("long")
        .alias("_thr")
    )
    survivors = base.join(F.broadcast(thr), list(group_cols)).filter(
        F.col("_hv") <= F.col("_thr")
    )
    return (
        survivors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(*group_cols, key_col)
    )


def remove_contaminated_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 5,
) -> DataFrame:
    """SPAN-level benchmark decontamination: instead of dropping whole
    flagged documents (``decontaminate``), mask exactly the tokens
    covered by any ``window``-token run that also occurs in the eval
    corpus — the surgical variant used when training data is too
    valuable to discard per-document (the ExactSubstr removal
    machinery pointed at an external contamination set). Returns one
    row per training document: (id, n_tokens, n_removed, clean_text).

    Scale shape: the eval window-hash set is benchmark-sized and
    BROADCAST, so the corpus side never shuffles to detect
    contamination; only FLAGGED documents (a semi-join against the
    covered-position ids) pay the explode → anti-join → per-document
    re-assembly, while clean documents pass through untouched with
    their original text (no corpus-wide rebuild — unlike duplicate
    removal, contamination is expected to touch a tiny fraction)."""
    from openetl_spark.operators.dedup import token_windows

    ev = token_windows(eval_df, id_col, text_col, window).select("wh").distinct()
    occ = token_windows(train, id_col, text_col, window)
    covered = (
        occ.join(F.broadcast(ev), "wh")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(window - 1))
            ).alias("pos"),
        )
        .distinct()
        # persist (r12): the flagged-id derivation and the rebuild both
        # consume this — left lazy, the corpus-side tokenize+md5 window
        # pass (occ) and the eval-hash build re-executed per consumer.
        # Contamination-sized, small by construction.
        .persist()
    )
    flagged_ids = covered.select(id_col).distinct().persist()
    from openetl_spark.operators.dedup import mask_positions_and_rebuild

    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
    flagged_out = mask_positions_and_rebuild(
        train.join(flagged_ids, id_col, "left_semi"), covered, id_col, text_col
    ).select(
        F.col(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_removed").cast("bigint").alias("n_removed"),
        F.col("clean_text"),
    )
    passthrough = train.join(flagged_ids, id_col, "left_anti").select(
        F.col(id_col),
        F.size(words).cast("bigint").alias("n_tokens"),
        F.lit(0).cast("bigint").alias("n_removed"),
        F.col(text_col).alias("clean_text"),
    )
    return flagged_out.unionByName(passthrough)


def weighted_sample_keys(
    df: DataFrame,
    weight_col: str,
    group_cols: tuple[str, ...] = (),
    key_col: str = "doc_id",
    seed: int = 42,
    max_weight: int = 1 << 24,
) -> DataFrame:
    """The item-key relation behind ``weighted_sample``: per row, the
    MINIMUM of its ``weight`` seeded 48-bit draws, as
    (``group_cols``, key_col, _minh, _w). Deterministic per (seed,
    key, weight) and MIN-MERGEABLE: a corpus split across batches
    yields per-batch key relations whose union is the full relation
    (each item's draws live entirely in its own batch), so streamed
    ingestion appends keys and ranks on read — the KMV cell-log
    posture for weighted sampling (parity-tested in
    tests/test_streaming_curation.py). Rows with NULL/non-positive
    weight are excluded.

    Cost contract (r09, VERDICT r08 #6): each row expands to exactly
    ``weight`` replica rows of two small columns — total cost Σw,
    linear and scale-safe for token-count-magnitude weights — but ONE
    row's replicas are built as a single ``sequence(1, w)`` array in a
    single task, so a mis-wired weight column (bytes instead of
    tokens, a join-produced outlier) would silently build a multi-GB
    array. Weights above ``max_weight`` (default 2^24 ≈ 16.7M — an
    order of magnitude above any real document's token count) FAIL
    the job with an explicit message instead."""
    w = F.col(weight_col).cast("long")
    guarded = F.when(
        w <= int(max_weight), w
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_sample: weight column '{weight_col}' has a "
                    f"row above max_weight={int(max_weight)} (got "
                ),
                w.cast("string"),
                F.lit(
                    ") — weights must be token-count-magnitude; a value "
                    "this large is almost certainly a mis-wired column. "
                    "Raise max_weight explicitly if intentional."
                ),
            )
        ).cast("long")
    )
    base = df.filter(w.isNotNull() & (w > 0)).select(
        *group_cols, F.col(key_col), guarded.alias("_w")
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"),
                    F.col(key_col).cast("string"),
                    F.lit(":"),
                    F.col("_rep").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    draws = base.withColumn(
        "_rep", F.explode(F.sequence(F.lit(1), F.col("_w")))
    ).withColumn("_h", h)
    return draws.groupBy(*group_cols, key_col).agg(
        F.min("_h").alias("_minh"), F.max("_w").alias("_w")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_cols: tuple[str, ...] = (),
    key_col: str = "doc_id",
    seed: int = 42,
    max_weight: int = 1 << 24,
) -> DataFrame:
    """EXACT weighted sampling WITHOUT replacement: per group, k rows
    drawn with inclusion order distributed exactly as successive
    sampling proportional to the INTEGER ``weight_col`` — the
    quality-/token-count-weighted selection step of training-data
    curation, deterministic and engine-reproducible.

    The classic distributed scheme (Efraimidis–Spirakis, IPL 2006)
    ranks items by u^(1/w) — a float key whose ln() differs by an ulp
    across libm implementations, which is fatal to cross-engine
    ranking. This operator uses the REPLICATION equivalence instead:
    give item i one iid uniform draw per weight unit (w_i seeded
    hashes) and rank items by their MINIMUM draw. All Σw draws are
    iid, so the first distinct item in the global draw order wins with
    probability w_i/Σw, and — skipping repeat appearances — the
    second distinct item is j with probability w_j/(Σw − w_winner),
    and so on: EXACTLY successive weighted sampling without
    replacement, with a pure 48-bit INTEGER key (md5 of
    (seed, key, replica)) that renders identically in DuckDB — no
    float anywhere, the sample and its order are FULL-oracle
    checkable.

    Shape: one explode by sequence(1, w) (corpus cost Σw rows of two
    small columns — weights are per-document token-ish counts, so
    this is the token relation the pipeline already materializes
    elsewhere), a (group, key) partial-agg min for the item key, then
    the k smallest per group through grouped_exact_ranks' two-level
    histogram rank — never a whole group in one window partition (the
    kmv_cells shape). Rows with NULL or non-positive weight are
    excluded (a zero-weight item is never sampled, by definition);
    weights above ``max_weight`` (default 2^24) raise — the Σw-linear
    cost contract assumes token-count-magnitude weights, and one
    mis-wired multi-billion weight would otherwise build its whole
    replica array inside a single task (VERDICT r08 #6).

    Returns ``group_cols`` + (key_col, ``weight_col``, pos) — pos =
    1-based inclusion order within the group.
    """
    from openetl_spark.operators.analytics import grouped_exact_ranks

    if k < 1:
        raise ValueError(f"weighted_sample: k must be >= 1, got {k}")
    keys = weighted_sample_keys(
        df, weight_col, group_cols, key_col, seed, max_weight
    )
    if group_cols:
        if len(group_cols) > 1:
            raise ValueError("weighted_sample: at most one group column")
        grp = group_cols[0]
    else:
        keys = keys.withColumn("_g", F.lit(0))
        grp = "_g"
    ranked = grouped_exact_ranks(
        keys.withColumn("_negh", -F.col("_minh")),
        grp,
        "_negh",
        key_col,
        bucket_width=float(1 << 32),
    )
    out_cols = [*group_cols, key_col, F.col("_w").alias(weight_col)]
    return (
        ranked.filter(F.col("pos") <= k)
        .select(*out_cols, F.col("pos").cast("bigint").alias("pos"))
    )


# ------------------------------------------------------------- DSIR

def dsir_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Hashed n-gram feature counts for DSIR-style importance
    weighting (Xie et al., "Data Selection for Language Models via
    Importance Resampling", NeurIPS 2023): word unigram + bigram
    OCCURRENCES (not distinct) hashed into ``n_buckets`` buckets by
    the portable 60-bit md5 integer — (id, b, f) with f the per-doc
    occurrence count. A unigram can never collide with a bigram as a
    string (tokens contain no whitespace), so no feature-type prefix
    is needed. One explode + partial-agg count per doc; the bucketed
    relation is the ONLY thing downstream scoring touches, so the
    vocabulary never leaves the executors.
    """
    if n_buckets < 2:
        raise ValueError(f"dsir_features: n_buckets={n_buckets} < 2")
    # One split, then bigrams by zip_with over two offset views of the
    # SAME materialized token array — measured 2.4-3x faster at sf0.1
    # than tokens(..) + ngrams(.., 2), which re-runs the regex split
    # and builds a slice copy per bigram (3.9 s -> 1.2-1.6 s warm for
    # the feature relation; identical gram strings either way).
    base = df.select(id_col, tokens(F.col(text_col)).alias("_w"))
    n_w = F.size("_w")
    big = F.when(
        n_w >= 2,
        F.zip_with(
            F.slice("_w", 1, n_w - 1),
            F.slice("_w", 2, n_w - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        base.select(id_col, F.explode(F.concat(F.col("_w"), big)).alias("g"))
        .select(
            id_col,
            (
                F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10)
                .cast("bigint")
                % n_buckets
            ).alias("b"),
        )
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("f"))
    )


def dsir_bucket_totals(
    feats: DataFrame,
    target_ids: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-bucket feature mass in the full corpus (source) and in the
    ``target_ids`` subset: (b, s_f, t_f). One groupBy over the
    bucketed feature relation with the target membership attached by
    a broadcast semi-style left join — the distributed half of DSIR's
    unigram-LM fit; the driver-side half (B log-ratios) is
    vocabulary-sized by construction."""
    t_col = target_ids.columns[0]
    flagged = feats.join(
        F.broadcast(
            target_ids.select(F.col(t_col).alias(id_col)).distinct()
        ).withColumn("_t", F.lit(1)),
        id_col,
        "left",
    )
    return flagged.groupBy("b").agg(
        F.sum("f").cast("bigint").alias("s_f"),
        F.sum(F.when(F.col("_t") == 1, F.col("f")).otherwise(0))
        .cast("bigint")
        .alias("t_f"),
    )


def dsir_log_ratios(
    totals_rows,
    n_buckets: int,
    scale: int = 1_000_000,
) -> list[tuple[int, int]]:
    """The driver-side half of DSIR: per-bucket integer micro-nat
    log-ratios r_b = round(scale · ln(p_target(b)/p_source(b))) with
    add-1 smoothing over ALL ``n_buckets`` buckets (zero-count buckets
    included, so scoring needs no absent-bucket default). The float
    ln lives ONLY here, in a B-sized driver computation whose OUTPUT
    is integers persisted as a shared artifact — after that, both
    engines score documents in exact bigint arithmetic (the BPE
    merge-list boundary discipline: the collect is vocabulary-sized,
    never corpus-sized)."""
    import math

    by_b = {int(r["b"]): (int(r["s_f"]), int(r["t_f"])) for r in totals_rows}
    s_tot = sum(s for s, _ in by_b.values())
    t_tot = sum(t for _, t in by_b.values())
    out = []
    for b in range(n_buckets):
        s_f, t_f = by_b.get(b, (0, 0))
        r = math.log((t_f + 1) / (t_tot + n_buckets)) - math.log(
            (s_f + 1) / (s_tot + n_buckets)
        )
        out.append((b, round(r * scale)))
    return out


def dsir_scores(
    feats: DataFrame,
    ratios: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance score: (id, n_feats, score_unats,
    selected) where score_unats = Σ_b f_b·r_b is an exact bigint
    (micro-nats — the log importance weight ln(p_t/p_s) scaled by
    1e6) and ``selected`` flags documents MORE likely under the
    target distribution than the source (score > 0) — the
    deterministic top-importance variant of the paper's Gumbel
    resampling (a seeded-hash weighted resample is available via
    curation.weighted_sample for integer weights; the boolean form
    keeps the whole relation float-free and cross-engine exact).
    ``ratios`` is the (b, r_unats) artifact — B rows, broadcast."""
    return (
        feats.join(F.broadcast(ratios), "b")
        .groupBy(id_col)
        .agg(
            F.sum("f").cast("bigint").alias("n_feats"),
            F.sum(F.col("f") * F.col("r_unats")).cast("bigint").alias("score_unats"),
        )
        .select(
            id_col,
            "n_feats",
            "score_unats",
            (F.col("score_unats") > 0).alias("selected"),
        )
    )


# ------------------------------------------------- privacy auditing

def k_anonymity(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney, IJUFKS 2002; Machanavajjhala
    et al., ICDE 2006) of a relation under the quasi-identifier
    ``qi_cols``: per QI group, ``k`` = group size (how many records an
    attacker's QI knowledge narrows to) and — when ``sensitive_col``
    is given — ``l`` = the count of DISTINCT sensitive values in the
    group (distinct-l-diversity: a group where every record shares one
    sensitive value leaks it even at large k). One partial-agg groupBy
    over the corpus; both columns exact bigints.
    """
    if not qi_cols:
        raise ValueError("k_anonymity: qi_cols must be non-empty")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("k")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col)).cast("bigint").alias("l")
        )
    return df.groupBy(*qi_cols).agg(*aggs)


def suppress_small_groups(
    df: DataFrame,
    qi_cols: Sequence[str],
    k_min: int,
) -> DataFrame:
    """Suppression-based k-anonymity ENFORCEMENT: drop every record
    whose quasi-identifier group holds fewer than ``k_min`` records,
    so the surviving relation is k_min-anonymous under ``qi_cols`` by
    construction (the simplest of the k-anonymization mechanisms —
    generalization hierarchies trade less data loss for more
    machinery; at curation scale suppression is the usual first
    gate). One groupBy to size the groups + one inner join back on
    the QI key — the group relation has QI-cardinality rows, so the
    join is broadcast-sized whenever the QI space is (Catalyst
    decides by its size estimate).
    """
    if k_min < 1:
        raise ValueError(f"suppress_small_groups: k_min={k_min} < 1")
    for c in qi_cols:
        if f"_qi_{c}" in df.columns:
            raise ValueError(
                f"suppress_small_groups reserves the _qi_{c} column"
            )
    big = (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("_k"))
        .filter(F.col("_k") >= k_min)
        .drop("_k")
    )
    # Null-safe equi-join: groupBy above counts a NULL QI value as its
    # own group, so the join back must keep such rows when their
    # NULL-group clears k_min — a plain equi-join would silently drop
    # every NULL-QI row and make audit and enforcement disagree.
    renamed = big.select(
        *[F.col(c).alias(f"_qi_{c}") for c in qi_cols]
    )
    cond = None
    for c in qi_cols:
        clause = F.col(c).eqNullSafe(F.col(f"_qi_{c}"))
        cond = clause if cond is None else cond & clause
    return df.join(renamed, cond).drop(*[f"_qi_{c}" for c in qi_cols])


def mondrian_partition(
    df: DataFrame,
    qi_cols: Sequence[str],
    id_col: str,
    k_min: int,
    depth: int = 3,
    bucket_width: float = 4096.0,
) -> DataFrame:
    """Deterministic multidimensional Mondrian k-anonymization
    (LeFevre, DeWitt & Ramakrishnan, ICDE 2006) — the GENERALIZATION
    mechanism next to suppress_small_groups' suppression: recursively
    split the record space on the widest (range-normalized)
    quasi-identifier at its lower median, but only when BOTH halves
    keep ≥ ``k_min`` records; every final leaf is a k-anonymous
    generalization region by construction, and (unlike suppression)
    NO record is dropped.

    Determinism contract: the canonical greedy picks exactly ONE
    dimension per leaf per level (the widest after normalizing by the
    global range — compared by exact-integer cross-multiplication, so
    no float ever decides a split; ties go to ``qi_cols`` order) and
    freezes the leaf if that dimension admits no k-preserving cut
    (the paper's strict variant); ``depth`` bounds the rounds (the
    bfs_hops/kcore bounded-round discipline). Requires INTEGER QI
    columns (rescale decimals upstream) so medians and ranges are
    exact.

    Scale shape: one partial-agg stats groupBy + one
    grouped_exact_ranks pass (the two-level histogram rank — leaf
    count can reach n/k at scale, so a leaf-partitioned window is the
    exact wall this avoids) + one broadcast-joined relabel per level.
    The split boundary relation is leaf-cardinality, never
    corpus-sized.

    Returns ``df``'s columns plus ``_leaf`` — the generalization
    region id; summarize with a groupBy(_leaf) min/max to read the
    published ranges.
    """
    from openetl_spark.operators.analytics import grouped_exact_ranks

    if not qi_cols or id_col in qi_cols:
        raise ValueError("mondrian_partition: qi_cols must be non-empty and exclude id_col")
    if k_min < 1 or depth < 1:
        raise ValueError("mondrian_partition: k_min and depth must be >= 1")
    if "_leaf" in df.columns:
        raise ValueError("mondrian_partition reserves the _leaf column")
    dims = list(qi_cols)
    g = df.agg(
        *[
            (F.max(d) - F.min(d)).cast("bigint").alias(d)
            for d in dims
        ]
    ).first()
    # Global ranges (two scalars — the pagerank node-count boundary);
    # a zero-range dimension can never be chosen, 1 keeps the integer
    # keys well-defined.
    rng = {d: max(int(g[d] or 0), 1) for d in dims}
    cur = df.withColumn("_leaf", F.lit("r"))
    for _ in range(depth):
        stats = cur.groupBy("_leaf").agg(
            F.count(F.lit(1)).alias("_n"),
            *[x for d in dims for x in (
                F.min(d).alias(f"_mn_{d}"), F.max(d).alias(f"_mx_{d}"))],
        )
        # widest normalized dim: key_d = range_d * prod(other global
        # ranges) — integer-monotone in range_d / R_d.
        keys = []
        for i, d in enumerate(dims):
            others = 1
            for e in dims:
                if e != d:
                    others *= rng[e]
            keys.append(
                ((F.col(f"_mx_{d}") - F.col(f"_mn_{d}")) * F.lit(others))
                .cast("bigint")
                .alias(f"_key_{i}")
            )
        # persist (r12 session 3): picked (leaf-cardinality) feeds the
        # aug join consumed by the rank pipeline, the cnt aggregate AND
        # the relabel — left lazy, the stats groupBy over cur re-ran
        # once per consumer inside the level's checkpoint job (the
        # change-7 shared-subtree discipline; lazy persist keeps
        # Catalyst's size stats).
        picked = stats.select("_leaf", "_n", *keys).select(
            "_leaf",
            "_n",
            F.expr(
                "array_position(array({ks}), array_max(array({ks})))".format(
                    ks=", ".join(f"_key_{i}" for i in range(len(dims)))
                )
            ).cast("int").alias("_dim"),
        ).persist()
        val = F.col(dims[0])
        for i, d in enumerate(dims[1:], start=2):
            val = F.when(F.col("_dim") == i, F.col(d)).otherwise(val)
        aug = (
            cur.join(F.broadcast(picked), "_leaf")
            .withColumn("_val", val.cast("bigint"))
            .withColumn("_negval", -F.col("_val"))
        )
        ranked = grouped_exact_ranks(
            aug, "_leaf", "_negval", id_col, bucket_width,
            pos_col="_pos", n_col="_ngrp",
        )
        # Lower median: the ASC-rank ceil(n/2) element ((n+1) div 2;
        # _negval DESC ≡ _val ASC, so _pos IS the ascending rank).
        # persist: med (leaf-cardinality) is joined by BOTH the cnt
        # aggregate and the relabel — left lazy, the whole rank-window
        # pipeline beneath it executed twice per level.
        med = ranked.filter(
            F.col("_pos") == F.expr("(_ngrp + 1) div 2")
        ).select("_leaf", F.col("_val").alias("_m")).persist()
        cnt = (
            aug.join(F.broadcast(med), "_leaf")
            .groupBy("_leaf")
            .agg(
                F.sum(
                    F.when(F.col("_val") <= F.col("_m"), 1).otherwise(0)
                ).alias("_ln"),
                F.count(F.lit(1)).alias("_nn"),
            )
        )
        cur = (
            aug.join(F.broadcast(med), "_leaf")
            .join(F.broadcast(cnt), "_leaf")
            .withColumn(
                "_leaf",
                F.when(
                    (F.col("_ln") >= k_min)
                    & (F.col("_nn") - F.col("_ln") >= k_min),
                    F.concat(
                        F.col("_leaf"),
                        F.when(F.col("_val") <= F.col("_m"), F.lit("L"))
                        .otherwise(F.lit("R")),
                    ),
                ).otherwise(F.col("_leaf")),
            )
            .drop("_n", "_dim", "_val", "_negval", "_m", "_ln", "_nn")
            .localCheckpoint()
        )
    return cur


def mondrian_hierarchical(
    df: DataFrame,
    num_cols: Sequence[str],
    cat_col: str,
    hierarchy: DataFrame,
    id_col: str,
    k_min: int,
    depth: int = 3,
    bucket_width: float = 4096.0,
) -> DataFrame:
    """Mondrian k-anonymization with a CATEGORICAL generalization
    hierarchy (LeFevre, DeWitt & Ramakrishnan, ICDE 2006 §4 — the
    taxonomy-walk half the numeric splitter can't express): real QI
    sets mix numbers (balance) with categories (nation, segment)
    whose generalization is "publish the REGION instead of the
    nation", not a median cut. ``hierarchy`` encodes the taxonomy as
    a relation (value, level, anc): for every base category value its
    ancestor at each level 1..H, level H being the value itself —
    uniform depth H (ragged taxonomies: pad by repeating the value).

    Per round, each leaf picks its widest dimension by exact-integer
    cross-multiplication: numeric width = (max−min)/R_d (global
    range), categorical width = (H−ℓ)/H with ℓ the leaf's current
    generalization level — both compared over the common denominator
    H·ΠR so no float ever decides a pick; ties go to the CATEGORICAL
    dimension first, then ``num_cols`` order (the determinism
    contract). A categorical split descends ONE taxonomy level: the
    leaf's records partition by their ancestor at level ℓ+1, taken
    only when ≥ 2 distinct children appear and EVERY child group
    keeps ≥ ``k_min`` records (the strict multiway k-guard); a
    numeric split is the mondrian_partition lower-median cut. A leaf
    whose picked dimension admits no k-preserving split freezes (the
    strict variant — identical to the numeric operator's contract).
    All-zero-width leaves (fully specialized AND point-range) freeze
    without a pick, so a specialized leaf can never be dropped by the
    level-ℓ+1 ancestor join.

    Scale shape: the numeric arm is mondrian_partition's
    (grouped_exact_ranks medians — no leaf-partitioned window); the
    categorical arm is one groupBy(leaf, child) partial agg + a
    leaf-cardinality guard broadcast; the hierarchy relation is
    taxonomy-sized and broadcasts. Returns ``df``'s columns plus
    ``_leaf`` (the region id, child ancestors embedded in the path)
    and ``_lvl`` (the categorical generalization level reached —
    publish the ancestor at that level).
    """
    from openetl_spark.operators.analytics import grouped_exact_ranks

    if not num_cols or not cat_col or id_col in (*num_cols, cat_col):
        raise ValueError(
            "mondrian_hierarchical: num_cols and cat_col must be "
            "non-empty and exclude id_col"
        )
    if k_min < 1 or depth < 1:
        raise ValueError(
            "mondrian_hierarchical: k_min and depth must be >= 1"
        )
    for c in ("_leaf", "_lvl"):
        if c in df.columns:
            raise ValueError(f"mondrian_hierarchical reserves {c}")
    dims = list(num_cols)
    h_max = int(hierarchy.agg(F.max("level")).first()[0] or 0)
    if h_max < 1:
        raise ValueError("mondrian_hierarchical: hierarchy is empty")
    g = df.agg(
        *[(F.max(d) - F.min(d)).cast("bigint").alias(d) for d in dims]
    ).first()
    rng = {d: max(int(g[d] or 0), 1) for d in dims}
    prod_all = 1
    for d in dims:
        prod_all *= rng[d]
    cur = df.withColumn("_leaf", F.lit("r")).withColumn(
        "_lvl", F.lit(0).cast("int")
    )
    # The taxonomy must be a FUNCTION of (value, level): a duplicate
    # (value, level) row would silently duplicate records through the
    # descent join below, inflating child counts so the per-child
    # k-guard can pass on fewer real records — the quiet dual of the
    # missing-row failure the guard inside the join already raises on.
    # Validate uniqueness the same way (taxonomy-sized groupBy, raise
    # branch evaluated when the broadcast materializes).
    anc = (
        hierarchy.select(
            F.col("value").alias("_hv"),
            F.col("level").alias("_alvl"),
            F.col("anc").alias("_child"),
        )
        .groupBy("_hv", "_alvl")
        .agg(F.count(F.lit(1)).alias("_hn"), F.min("_child").alias("_child"))
        .withColumn(
            "_child",
            F.when(F.col("_hn") == 1, F.col("_child")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "mondrian_hierarchical: duplicate hierarchy "
                            "rows for (value, level) = ("
                        ),
                        F.col("_hv").cast("string"),
                        F.lit(", "),
                        F.col("_alvl").cast("string"),
                        F.lit(") — the taxonomy must map each (value, "
                              "level) to exactly one ancestor"),
                    )
                )
            ),
        )
        .drop("_hn")
    )
    for _ in range(depth):
        stats = cur.groupBy("_leaf").agg(
            F.count(F.lit(1)).alias("_n"),
            F.max("_lvl").alias("_l"),
            *[x for d in dims for x in (
                F.min(d).alias(f"_mn_{d}"), F.max(d).alias(f"_mx_{d}"))],
        )
        # Common denominator H·ΠR: cat key = (H−ℓ)·ΠR, numeric key_d =
        # (mx−mn)·H·Π_{e≠d}R_e. First-max-index ties to the cat dim.
        keys = [
            ((F.lit(h_max) - F.col("_l")) * F.lit(prod_all))
            .cast("bigint")
            .alias("_key_0")
        ]
        for i, d in enumerate(dims, start=1):
            others = h_max
            for e in dims:
                if e != d:
                    others *= rng[e]
            keys.append(
                ((F.col(f"_mx_{d}") - F.col(f"_mn_{d}")) * F.lit(others))
                .cast("bigint")
                .alias(f"_key_{i}")
            )
        ks = ", ".join(f"_key_{i}" for i in range(len(dims) + 1))
        # persist (r12 session 3): the mondrian_partition discipline —
        # picked fans into frozen/categorical/numeric arms (≥5 subtree
        # occurrences in the level's checkpoint plan).
        picked = stats.select("_leaf", "_l", *keys).select(
            "_leaf",
            "_l",
            F.when(
                F.expr(f"array_max(array({ks}))") <= 0, F.lit(0)
            )
            .otherwise(
                F.expr(f"array_position(array({ks}), array_max(array({ks})))")
            )
            .cast("int")
            .alias("_dim"),
        ).persist()
        tagged = cur.join(F.broadcast(picked), "_leaf").drop("_l")
        frozen = tagged.filter(F.col("_dim") == 0).drop("_dim")
        # --- categorical arm: descend one taxonomy level -------------
        crows = (
            tagged.filter(F.col("_dim") == 1)
            .drop("_dim")
            .join(
                F.broadcast(anc),
                (F.col("_alvl") == F.col("_lvl") + 1)
                & (F.col(cat_col) == F.col("_hv")),
                "left",
            )
            # A category value with no hierarchy row at level ℓ+1
            # (uncovered value, ragged taxonomy) must RAISE, not
            # silently vanish through an inner join — this is a
            # k-anonymization operator; dropped records are the one
            # failure its k-guarantee checks cannot see (review r10).
            .withColumn(
                "_child",
                F.when(F.col("_child").isNotNull(), F.col("_child")).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "mondrian_hierarchical: no hierarchy row at "
                                "level (_lvl+1) for category value "
                            ),
                            F.col(cat_col).cast("string"),
                            F.lit(" — pad ragged taxonomies to uniform depth"),
                        )
                    )
                ),
            )
            .drop("_alvl", "_hv")
        )
        cguard = (
            crows.groupBy("_leaf", "_child")
            .agg(F.count(F.lit(1)).alias("_cn"))
            .groupBy("_leaf")
            .agg(
                F.min("_cn").alias("_cmin"),
                F.count(F.lit(1)).alias("_nch"),
            )
            .select(
                "_leaf",
                ((F.col("_cmin") >= k_min) & (F.col("_nch") >= 2)).alias(
                    "_ok"
                ),
            )
        )
        cdone = (
            crows.join(F.broadcast(cguard), "_leaf")
            .select(
                *df.columns,
                F.when(
                    F.col("_ok"),
                    F.concat(
                        F.col("_leaf"),
                        F.lit("/"),
                        F.col("_child").cast("string"),
                    ),
                )
                .otherwise(F.col("_leaf"))
                .alias("_leaf"),
                F.when(F.col("_ok"), F.col("_lvl") + 1)
                .otherwise(F.col("_lvl"))
                .cast("int")
                .alias("_lvl"),
            )
        )
        # --- numeric arm: the mondrian_partition median cut ----------
        nrows = tagged.filter(F.col("_dim") >= 2)
        val = F.col(dims[0])
        for i, d in enumerate(dims[1:], start=3):
            val = F.when(F.col("_dim") == i, F.col(d)).otherwise(val)
        aug = nrows.withColumn("_val", val.cast("bigint")).withColumn(
            "_negval", -F.col("_val")
        )
        ranked = grouped_exact_ranks(
            aug, "_leaf", "_negval", id_col, bucket_width,
            pos_col="_pos", n_col="_ngrp",
        )
        # persist: med joined by cnt AND ndone (the numeric-arm rank
        # pipeline otherwise executes twice per level).
        med = ranked.filter(
            F.col("_pos") == F.expr("(_ngrp + 1) div 2")
        ).select("_leaf", F.col("_val").alias("_m")).persist()
        cnt = (
            aug.join(F.broadcast(med), "_leaf")
            .groupBy("_leaf")
            .agg(
                F.sum(
                    F.when(F.col("_val") <= F.col("_m"), 1).otherwise(0)
                ).alias("_ln"),
                F.count(F.lit(1)).alias("_nn"),
            )
        )
        ndone = (
            aug.join(F.broadcast(med), "_leaf")
            .join(F.broadcast(cnt), "_leaf")
            .select(
                *df.columns,
                F.when(
                    (F.col("_ln") >= k_min)
                    & (F.col("_nn") - F.col("_ln") >= k_min),
                    F.concat(
                        F.col("_leaf"),
                        F.when(F.col("_val") <= F.col("_m"), F.lit("L"))
                        .otherwise(F.lit("R")),
                    ),
                )
                .otherwise(F.col("_leaf"))
                .alias("_leaf"),
                "_lvl",
            )
        )
        cur = (
            frozen.select(*df.columns, "_leaf", "_lvl")
            .unionByName(cdone)
            .unionByName(ndone)
            .localCheckpoint()
        )
    return cur


def t_closeness(
    df: DataFrame,
    qi_cols: Sequence[str],
    band_col: str,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) of
    an ORDERED-banded sensitive attribute — the third privacy metric
    of the triad: k-anonymity bounds group size, l-diversity bounds
    value variety, t-closeness bounds how far a group's sensitive
    DISTRIBUTION drifts from the global one (a group can be large and
    diverse yet still reveal "these people are all in the top balance
    bands"). Distance = the 1-D Earth Mover's Distance over the band
    order, which for histograms is the mean absolute cumulative
    difference: t = (1/(B−1))·Σ_i |CumP_i − CumQ_i|.

    EXACT-INTEGER form: with p_i = g_i/n and q_i = G_i/N, each
    cumulative difference is |cumg_i·N − cumG_i·n| / (n·N), so the
    relation carries ``emd_num`` = Σ_i |cumg_i·N − cumG_i·n| and
    ``emd_den`` = (B−1)·n·N — exact bigints whose ratio is t; callers
    threshold by cross-multiplication (t ≤ 1/5 ⟺ 5·num ≤ den), so no
    float exists anywhere.

    Shape: one (group, band) partial-agg count + one B-sized
    broadcast of the global histogram; the only windows run over
    B-row partitions (B = distinct bands, a constant), never over
    groups or the corpus. Returns (``*qi_cols``, n, emd_num,
    emd_den).
    """
    if not qi_cols:
        raise ValueError("t_closeness: qi_cols must be non-empty")
    bands = (
        df.groupBy(band_col)
        .agg(F.count(F.lit(1)).alias("_G"))
    )
    w_gl = W.orderBy(band_col).rowsBetween(W.unboundedPreceding, 0)
    # persist (r12): the band-count guard, the dense grid, and the
    # cumulative join all consume this B-row relation — left lazy,
    # each re-ran the global band aggregate (and its corpus scan).
    glob = bands.select(
        band_col,
        F.sum("_G").over(w_gl).cast("bigint").alias("_cum_glob"),
    ).persist()
    n_total = df.count()
    b_count = glob.count()
    if b_count < 2:
        raise ValueError(
            f"t_closeness: need >= 2 distinct bands, got {b_count}"
        )
    # persist (r12): the group totals and the dense-grid left join both
    # consume this cell-grid-sized relation.
    grp = df.groupBy(*qi_cols, band_col).agg(F.count(F.lit(1)).alias("_g")).persist()
    # Dense band grid per group: every group must carry EVERY band's
    # cumulative row (absent bands still accumulate), so cross the
    # group list with the B-sized global band relation.
    groups = grp.groupBy(*qi_cols).agg(F.sum("_g").cast("bigint").alias("n"))
    grid = groups.join(F.broadcast(glob.select(band_col)), how="cross")
    w_cum = W.partitionBy(*qi_cols).orderBy(band_col).rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = (
        grid.join(grp, [*qi_cols, band_col], "left")
        .withColumn("_g", F.coalesce(F.col("_g"), F.lit(0)))
        .withColumn("_cum_grp", F.sum("_g").over(w_cum).cast("bigint"))
        .join(F.broadcast(glob), band_col)
    )
    return (
        cum.groupBy(*qi_cols, "n")
        .agg(
            F.sum(
                F.abs(
                    F.col("_cum_grp") * F.lit(int(n_total))
                    - F.col("_cum_glob") * F.col("n")
                )
            )
            .cast("bigint")
            .alias("emd_num")
        )
        .withColumn(
            "emd_den",
            (F.lit(int(b_count) - 1) * F.col("n") * F.lit(int(n_total)))
            .cast("bigint"),
        )
    )


def l_diversity_recursive(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 3,
    c_num: int = 2,
    c_den: int = 1,
) -> DataFrame:
    """Recursive (c, l)-diversity audit (Machanavajjhala et al., TKDD
    2007 §4.2) — the fourth privacy metric next to the k/l/t triad:
    distinct-l counts varieties but a group can hold l distinct
    sensitive values with one value at 99% and still leak; recursive
    (c, l) bounds the SKEW instead: with the group's sensitive-value
    counts sorted descending r_1 ≥ r_2 ≥ … ≥ r_m, the group
    satisfies it iff r_1 < c·(r_l + r_{l+1} + … + r_m) — the most
    frequent value must not dominate the tail from the l-th value on.

    EXACT-INTEGER form: c carries as the rational c_num/c_den and the
    test cross-multiplies (c_den·r_1 < c_num·tail), so no float
    exists anywhere — the repo's t_closeness discipline. A group with
    fewer than l distinct values has an empty tail (tail_sum = 0) and
    fails for any c — the paper's convention.

    Shape: one (QI, value) partial-agg count, then per-QI-group the
    value counts collapse through sort_array(collect_list(…)) — the
    collected list is bounded by the sensitive DOMAIN size per group
    (bands/segments, not rows), so no corpus-scale window and no
    unbounded state; numeric sort on counts is engine-portable
    (DuckDB's list_sort matches).

    Returns one row per QI group: (*qi_cols, n, n_distinct, r1,
    tail_sum, satisfied).
    """
    if not qi_cols:
        raise ValueError("l_diversity_recursive: qi_cols must be non-empty")
    if l < 2 or c_num < 1 or c_den < 1:
        raise ValueError(
            "l_diversity_recursive: need l >= 2 and positive c_num/c_den"
        )
    counts = df.groupBy(*qi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_rc")
    )
    grp = counts.groupBy(*qi_cols).agg(
        F.sum("_rc").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sort_array(F.collect_list("_rc"), asc=False).alias("_rs"),
    )
    r1 = F.element_at("_rs", 1)
    # tail from the l-th largest on = n − (r_1 + … + r_{l−1});
    # aggregate() over the sliced prefix keeps it one expression.
    head = F.aggregate(
        F.slice("_rs", 1, l - 1), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return grp.select(
        *qi_cols,
        "n",
        "n_distinct",
        r1.alias("r1"),
        F.when(F.col("n_distinct") >= l, F.col("n") - head)
        .otherwise(F.lit(0).cast("bigint"))
        .alias("tail_sum"),
    ).withColumn(
        "satisfied",
        F.lit(c_den) * F.col("r1") < F.lit(c_num) * F.col("tail_sum"),
    )


# ---------------------------------------------------------------------
# C161 — differential privacy: discrete-Laplace histogram release
# ---------------------------------------------------------------------

#: Fixed-point scale for the DP inverse-CDF thresholds: uniforms live
#: in [0, 2^60) — five salted 4096-state hash buckets composed
#: positionally (4096^5 = 2^60), so the uniform inherits hash_bucket's
#: engine portability.
DP_SCALE_BITS = 60


def discrete_laplace_thresholds(
    eps_micro: int = 10**6, bound: int = 64, scale_bits: int = DP_SCALE_BITS
):
    """Inverse-CDF threshold table for the TRUNCATED discrete Laplace
    (two-sided geometric) mechanism — the integer-valued noise
    distribution of the 2020 US Census TopDown system (Canonne,
    Kamath & Steinke 2020, "The discrete Gaussian for differential
    privacy" §2 discusses the geometric mechanism; Ghosh, Roughgarden
    & Sundararajan 2012 prove its optimality for counting queries):
    P(k) ∝ α^|k| with α = exp(-ε/Δ), truncated to |k| ≤ bound and
    renormalized (at bound=64, ε=1 the truncated tail is ≈ e^-64 ≈
    2^-92 — far below the 2^-60 uniform resolution, so truncation is
    unobservable).

    Returns [(k, lo, hi)] with lo/hi exact ints in [0, 2^scale_bits]:
    a uniform u lands on noise k iff lo ≤ u < hi. The float CDF
    accumulation happens HERE, once, driver-side — determinism comes
    from persisting the table (the NMI micro-nat discipline), not
    from cross-engine float reproducibility; both engines range-join
    the same artifact. The endpoint is pinned to 2^scale_bits exactly
    and monotonicity enforced, so the table partitions the uniform
    space whatever float rounding did.
    """
    import math

    if eps_micro <= 0 or bound < 1:
        raise ValueError(
            f"discrete_laplace_thresholds: need eps_micro > 0 and "
            f"bound >= 1, got {eps_micro}, {bound}"
        )
    alpha = math.exp(-eps_micro / 10**6)
    ks = list(range(-bound, bound + 1))
    weights = [alpha ** abs(k) for k in ks]
    z = sum(weights)
    scale = 1 << scale_bits
    out, cum, lo = [], 0.0, 0
    for i, k in enumerate(ks):
        cum += weights[i] / z
        hi = scale if i == len(ks) - 1 else min(scale, max(lo, round(cum * scale)))
        out.append((k, lo, hi))
        lo = hi
    return out


def dp_uniform(key, salt: str = "dp_v1", scale_bits: int = DP_SCALE_BITS):
    """Column: deterministic uniform in [0, 2^scale_bits) from a cell
    key — five salted hash_bucket(·, 4096) draws composed positionally
    (each is an independent md5 of key#salt·i, so the composition has
    the full 2^60 state space while staying bit-portable to any engine
    with md5/ascii). scale_bits must be a multiple of 12."""
    if scale_bits % 12:
        raise ValueError("dp_uniform: scale_bits must be a multiple of 12")
    acc = F.lit(0).cast("long")
    for i in range(scale_bits // 12):
        b = hash_bucket(F.concat(key, F.lit(f"#{salt}{i}")), 4096)
        acc = acc + b.cast("long") * F.lit(4096**i)
    return acc


def dp_uniform_sql(expr: str, salt: str = "dp_v1",
                   scale_bits: int = DP_SCALE_BITS) -> str:
    """The exact DuckDB rendering of dp_uniform() for oracles."""
    terms = []
    for i in range(scale_bits // 12):
        salted = f"concat({expr}, '#{salt}{i}')"
        terms.append(
            f"CAST({hash_bucket_sql(salted, 4096)} AS BIGINT) * {4096**i}"
        )
    return "(" + " + ".join(terms) + ")"


def dp_histogram_release(
    df: DataFrame,
    group_cols: list[str],
    bounds: DataFrame,
    salt: str = "dp_v1",
    scale_bits: int = DP_SCALE_BITS,
) -> DataFrame:
    """ε-differentially-private histogram release with DETERMINISTIC
    seeded noise — the reproducible-noise posture of the Census
    TopDown release (committed seed → auditable, re-runnable noise;
    swap the key-derived uniform for a secret-seeded one in a
    production release and nothing else changes). Unit sensitivity
    Δ=1: adding/removing one input row moves one cell count by 1, so
    discrete-Laplace noise with α = e^-ε gives ε-DP per cell.

    Shape: one partial-agg count per cell, a 2^scale_bits uniform per
    cell from the CELL KEY (not the data — the noise is a pure
    function of the released cell's identity plus the salt), then a
    range join against the broadcast (2·bound+1)-row threshold
    artifact. Output is ALL exact integers — (…group_cols, n, noise_k,
    released, released_nonneg) — the whole relation hashes
    cross-engine. n is emitted for test comparability; a production
    release projects it away (the mechanism's guarantee is about
    released, not the transcript)."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    counts = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    u = dp_uniform(key, salt, scale_bits)
    b = F.broadcast(
        bounds.select(
            F.col("k").cast("bigint").alias("noise_k"),
            F.col("lo").cast("bigint").alias("_lo"),
            F.col("hi").cast("bigint").alias("_hi"),
        )
    )
    # LEFT join, not inner: every uniform lands in exactly one bucket
    # (the table partitions [0, 2^scale_bits)), so the results are
    # identical — but an INNER join lets Catalyst infer isnotnull(_u)
    # and push the five md5 evaluations below the aggregate, paying
    # them per INPUT ROW instead of per cell (measured in the r12 plan
    # audit). The left join blocks that inference.
    return (
        counts.withColumn("_u", u)
        .join(
            b,
            (F.col("_u") >= F.col("_lo")) & (F.col("_u") < F.col("_hi")),
            "left",
        )
        .select(
            *group_cols,
            "n",
            "noise_k",
            (F.col("n") + F.col("noise_k")).cast("bigint").alias("released"),
            F.greatest(
                F.col("n") + F.col("noise_k"), F.lit(0)
            ).cast("bigint").alias("released_nonneg"),
        )
    )
