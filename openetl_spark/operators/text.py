"""Text-analysis operators for training-data pipelines (SURVEY.md §2C
C29): token counting, quality scoring, language ID, fingerprinting.

Everything is built-in Column expressions — these run in whole-stage
codegen at scan speed, which is the difference between "scoring 100 TB
of text" being a linear scan versus a Python bottleneck.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deliberately small and public-knowledge: language ID here demonstrates
# the operator shape (per-language evidence scores → argmax), not SOTA.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "dans", "est"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"],
    "zh": ["的", "了", "在", "是", "我", "有", "和", "就", "不", "人"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty string → empty array, not [''])."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish sub-word splitting: words, numbers, and single
    punctuation as separate tokens (GPT-2-style pre-tokenizer regex,
    simplified)."""
    spaced = F.regexp_replace(text, r"([^\w\s]|_)", r" $1 ")
    return F.filter(F.split(F.trim(spaced), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / punctuation / word-size statistics per document."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    return (
        df.withColumn("n_chars_calc", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn("n_bpe_tokens", F.size(bpe_ish_tokens(t)))
        .withColumn(
            "avg_token_len",
            F.round(
                F.when(
                    n_tok > 0,
                    F.aggregate(
                        F.transform(toks, lambda x: F.length(x).cast("double")),
                        F.lit(0.0),
                        lambda a, v: a + v,
                    )
                    / n_tok,
                ).otherwise(F.lit(0.0)),
                4,
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                F.length(F.regexp_replace(t, r"[\w\s]", "")) / F.greatest(F.length(t), F.lit(1)),
                4,
            ),
        )
        .withColumn(
            "upper_ratio",
            F.round(
                F.length(F.regexp_replace(t, r"[^A-Z]", "")) / F.greatest(F.length(t), F.lit(1)),
                4,
            ),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    """Heuristic quality in [0,1]: penalize too-short/too-long docs,
    high punctuation density, and degenerate repetition (low distinct-
    token ratio) — the standard cheap pre-filters before model-based
    quality scoring."""
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0))
    len_ok = F.when((n >= 5) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.3))
    punct = F.length(F.regexp_replace(t, r"[\w\s]", "")) / F.greatest(F.length(t), F.lit(1))
    punct_ok = F.when(punct < 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    score = F.round(len_ok * punct_ok * (F.lit(0.5) + F.lit(0.5) * distinct_ratio), 4)
    return df.withColumn(out, score)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language evidence: fraction of tokens in that language's
    stopword list."""
    toks = tokens(F.lower(text))
    n = F.greatest(F.size(toks), F.lit(1))

    # One-parameter lambda factory: a two-parameter lambda would receive
    # the array index as its second argument (PySpark HOF convention).
    def _in_list(words: list[str]):
        return lambda x: x.isin(words)

    out = {}
    for lang, words in STOPWORDS.items():
        hits = F.size(F.filter(toks, _in_list(words)))
        out[lang] = hits / n
    return out


def detect_language(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Argmax of per-language stopword evidence; 'und' when no evidence.
    Ties break on language code order (deterministic)."""
    scores = lang_scores(F.col(text_col))
    pairs = F.array(
        *[
            F.struct(score.alias("score"), F.lit(lang).alias("lang"))
            for lang, score in sorted(scores.items())
        ]
    )
    best = F.array_max(pairs)  # struct compare: score first, then lang
    return df.withColumn(
        out, F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def with_fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    """Order-sensitive 64-bit document fingerprint: XOR-fold of each
    token hashed with its position as seed (xxhash64(token, pos)).
    Content-identical docs collide; any token change or reorder
    diverges. XOR-fold (not +/*) so ANSI overflow checking never
    trips on long arithmetic."""
    toks = tokens(F.col(text_col))
    hashed = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
        lambda t, i: F.xxhash64(t, i),
    )
    fp = F.aggregate(
        hashed, F.lit(0).cast("long"), lambda acc, h: acc.bitwiseXOR(h)
    )
    return df.withColumn(out, fp)


def bigram_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 4,
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1's duplicate-n-gram family): per doc, the distinct-bigram
    ratio and the mass of the single most frequent bigram. Degenerate
    machine text repeats phrases; both signals feed the standard
    drop-if-repetitive pre-filter.

    Shape: explode bigrams → count per (doc, bigram) → per-doc agg. Two
    hash shuffles, both carrying bigram hashes not documents; linear in
    corpus size, no per-doc state beyond the aggregation — scan-shaped
    at any corpus size. Docs with <2 tokens have no bigrams and are
    omitted (no repetition signal exists for them)."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    ex = df.select(F.col(id_col), F.explode(bigrams).alias("b"))
    per_bigram = ex.groupBy(id_col, "b").agg(F.count("*").alias("c"))
    return per_bigram.groupBy(id_col).agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.count("*") / F.sum("c"), round_dp).alias("distinct_ratio"),
        F.round(F.max("c") / F.sum("c"), round_dp).alias("top_frac"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Token-window chunking — the retrieval-pipeline step between raw
    documents and embedding/indexing: split each document into
    overlapping windows of ``chunk_tokens`` whitespace tokens starting
    every ``stride`` tokens (stride < chunk_tokens gives the standard
    overlapping-context layout; the final window may be shorter).
    Emits (id, chunk_id, chunk_text, n_tokens); empty documents emit
    nothing; chunk ids are dense per document.

    Scan-side: start offsets come from a per-row ``sequence`` and each
    chunk is a ``slice`` + ``array_join`` — whole-stage codegen, no
    shuffle at all (the explode factor is ~n_tokens/stride per doc).
    Deterministic layout means chunk membership is reproducible across
    engines and runs — re-chunking 100 TB yields byte-identical chunk
    ids, the same auditability contract as the hash samplers."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.when(
        n >= 1, F.sequence(F.lit(1), n, F.lit(int(stride)))
    ).otherwise(F.array().cast("array<int>"))
    ex = df.select(
        F.col(id_col),
        toks.alias("_w"),
        F.explode(starts).alias("_s"),
    )
    piece = F.slice(F.col("_w"), F.col("_s"), int(chunk_tokens))
    return ex.select(
        id_col,
        F.expr(f"CAST((_s - 1) DIV {int(stride)} AS BIGINT)").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def top_terms_tfidf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    lowercase: bool = True,
    round_dp: int = 4,
) -> DataFrame:
    """Per-document keyword extraction: the k most characteristic terms
    by TF-IDF (tf = in-doc count, idf = ln(N/df) over distinct-doc
    frequency) — the classic labeling/routing primitive for corpus
    exploration and topic-targeted mining. Returns one row per
    (id, rank): (id, rank, term, round(tfidf)). Ties break on the term
    string so the selection is engine-deterministic.

    Shape: one token explode → per-(doc, term) counts (partial-agg);
    document frequency re-aggregates the (doc, term) relation (already
    distinct per doc, far smaller than the token stream); N is a
    broadcast scalar. The top-k runs as row_number over the doc key —
    maximally high-cardinality partitions, so no window ever sees more
    than one document's vocabulary."""
    toks = tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, F.lower)
    # persist: the (doc, term) count relation feeds both the document-
    # frequency re-aggregate and the scoring join — left lazy, the
    # token explode + aggregate (the corpus-scale work) ran twice.
    tf = (
        df.select(F.col(id_col).alias("_doc"), F.explode(toks).alias("term"))
        .groupBy("_doc", "term")
        .agg(F.count("*").alias("_tf"))
        .persist()
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    n_docs = df.select(F.col(id_col)).distinct().agg(
        F.count("*").alias("_n")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_doc",
            "term",
            (F.col("_tf") * F.log(F.col("_n") / F.col("_df"))).alias("_s"),
        )
    )
    w = W.partitionBy("_doc").orderBy(F.col("_s").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_doc").alias(id_col),
            "rank",
            "term",
            F.round("_s", round_dp).alias("tfidf"),
        )
    )


def kl_domain_shift(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lowercase: bool = True,
    round_dp: int = 4,
) -> DataFrame:
    """Per-group KL divergence of each group's smoothed unigram
    distribution from the whole-corpus distribution — the standard
    domain-shift / mixture-audit statistic for a training mix (which
    sources look like the aggregate, which are outliers). Add-one
    smoothing over the shared corpus vocabulary makes every group's
    support identical, so KL(p_group ‖ p_corpus) = Σ_vocab p·ln(p/q)
    is finite and exactly reproducible by the DuckDB oracle.

    Shape: one token explode; per-(group, token) and per-token counts
    partial-aggregate on their keys. The full p/q grid is the corpus
    vocabulary CROSS the group list — built by joining the vocab
    relation to a BROADCAST per-group-total relation (groups are few;
    vocab is the big side and never replicates through a shuffle),
    then left-joining the per-group counts (absent → 0 under
    smoothing). Output is one row per group."""
    toks = tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, F.lower)
    ex = df.select(F.col(group_col).alias("g"), F.explode(toks).alias("token"))
    # ONE corpus-token pass: the per-(group, token) counts are the
    # finest grain here, so the corpus-wide and per-group totals are
    # exact bigint RE-AGGREGATES of that (groups × vocab)-sized
    # relation — before, each of the three aggregates re-ran the full
    # token explode (three corpus-token shuffles; now one, plus two
    # cell-scale ones). Lazy persist (not localCheckpoint — the RDD
    # scan would hide size stats and demote the grid join from
    # broadcast; measured 1.1 s → 2.1 s) because all three consumers
    # read it.
    per_group = (
        ex.groupBy("g", "token")
        .agg(F.count("*").alias("_cg"))
        .persist()
    )
    corpus = per_group.groupBy("token").agg(F.sum("_cg").alias("_c"))
    totals = per_group.groupBy("g").agg(F.sum("_cg").alias("_ng"))
    stats = corpus.agg(
        F.count("*").alias("_v"), F.sum("_c").alias("_n")
    )
    grid = (
        corpus.crossJoin(F.broadcast(totals))
        .join(per_group, ["g", "token"], "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "g",
            "_ng",
            (
                (F.coalesce(F.col("_cg"), F.lit(0)) + F.lit(1.0))
                / (F.col("_ng") + F.col("_v"))
            ).alias("_p"),
            ((F.col("_c") + F.lit(1.0)) / (F.col("_n") + F.col("_v"))).alias("_q"),
        )
    )
    return (
        grid.groupBy("g")
        .agg(
            F.first("_ng").alias("n_tokens"),
            F.round(
                F.sum(F.col("_p") * F.log(F.col("_p") / F.col("_q"))), round_dp
            ).alias("kl"),
        )
        .select(F.col("g").alias(group_col), "n_tokens", "kl")
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    round_dp: int = 4,
) -> DataFrame:
    """Least-squares fit of the corpus's rank-frequency law in log-log
    space: slope ≈ −1 is Zipfian natural text, a flat slope flags
    synthetic/templated corpora, a cliff flags vocabulary collapse —
    a one-row corpus-health probe for ingest monitoring. Rank is
    row_number over (count DESC, token) — the token tie-break makes
    equal-frequency ranks deterministic in both engines.

    The global rank is an ORDER BY over the *vocabulary* relation
    (post-agg, orders of magnitude smaller than the corpus), not the
    corpus; Spark runs it as one unpartitioned window over ≤ |vocab|
    rows — acceptable because vocabularies grow ~Heaps-sublinearly,
    and cappable via a frequency floor if a corpus's vocab ever
    outgrows one task."""
    toks = tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, F.lower)
    freq = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("_c"))
    )
    w = W.orderBy(F.col("_c").desc(), F.col("token"))
    ranked = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("_lr"),
        F.log(F.col("_c").cast("double")).alias("_lc"),
    )
    return ranked.agg(
        F.count("*").alias("vocab_size"),
        F.round(F.regr_slope("_lc", "_lr"), round_dp).alias("zipf_slope"),
        F.round(F.regr_intercept("_lc", "_lr"), round_dp).alias("zipf_intercept"),
        F.round(F.regr_r2("_lc", "_lr"), round_dp).alias("r2"),
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 4,
) -> DataFrame:
    """BM25 full-text relevance ranking (Robertson/Spärck Jones;
    Lucene's idf variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``) — the
    standard query-relevance scorer a curation pipeline uses to mine
    topic-targeted training data from a web corpus.

    Shape, built for the 100 TB posture:

    * corpus statistics (doc count, avg doc length, per-term document
      frequency) come from ONE aggregate pass producing a single row —
      conditional counts per query term, no explode, no per-term scan.
      The 1-row relation rides a broadcast cross join into the scoring
      scan (same pattern as the KNN query-vector broadcast). In
      production these statistics are computed once per corpus snapshot
      and persisted, making scoring a single scan.
    * per-document term frequencies are scan-side array expressions
      (``size(filter(tokens, = term))``) — m cheap re-walks of a
      just-split token array per row, linear in document length, no
      shuffle. The only shuffle in the whole plan is the final
      TakeOrderedAndProject top-k (per-partition heaps → driver merge
      of k·partitions rows).
    * docs matching no query term score 0 and are filtered before the
      top-k, so the ordering heap only sees matching docs.

    Ordering is total (rounded score desc, id asc), so the top-k
    membership is engine-reproducible — the catalog oracle recomputes
    the identical formula in DuckDB."""
    toks = F.split(F.col(text_col), " ")
    dl = F.size(toks)

    # NOTE: the lambda must be unary — PySpark passes the element INDEX
    # as a second argument to binary HOF lambdas, so the idiomatic
    # `lambda x, t=t:` closure trick silently binds t to the index.
    def _count_of(term: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf = {t: _count_of(t) for t in terms}

    stats = df.agg(
        F.count("*").alias("_n_docs"),
        F.avg(dl).alias("_avgdl"),
        *[
            F.count(F.when(tf[t] > 0, True)).alias(f"_df_{i}")
            for i, t in enumerate(terms)
        ],
    )

    scored = df.crossJoin(F.broadcast(stats))
    score = None
    for i, t in enumerate(terms):
        idf = F.log(
            1.0
            + (F.col("_n_docs") - F.col(f"_df_{i}") + 0.5)
            / (F.col(f"_df_{i}") + 0.5)
        )
        tfc = tf[t].cast("double")
        term_score = idf * (
            tfc * (k1 + 1.0)
            / (tfc + k1 * (1.0 - b + b * dl.cast("double") / F.col("_avgdl")))
        )
        score = term_score if score is None else score + term_score
    return (
        scored.select(
            F.col(id_col), F.round(score, round_dp).alias("bm25")
        )
        .filter(F.col("bm25") > 0.0)
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _round_fixed(x: Column, dp: int) -> Column:
    """floor(x·10^dp + 0.5)/10^dp for NONNEGATIVE x — bit-deterministic
    half-up rounding across engines. Engine round() diverges at exact
    .5 decimal boundaries (Spark HALF_UPs the decimal rendering, DuckDB
    rounds the binary double), and ratios with 2^a·5^b denominators —
    word counts like 160 — land exactly there, flipping
    round-then-compare flags between engines (review finding r05; the
    gap_fill lesson applied to the quality panels)."""
    s = float(10 ** dp)
    return F.floor(x * s + F.lit(0.5)) / s


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_n: int = 5,
    thresholds: dict | None = None,
    round_dp: int = 4,
) -> DataFrame:
    """Gopher's full repetition-rule panel (Rae et al. 2021 §A1.1,
    arXiv:2112.11446): per document, the fraction of characters covered
    by the single most frequent word n-gram (n ∈ ``top_ns``) and the
    fraction of characters in DUPLICATED ``dup_n``-grams (each
    occurrence beyond the first contributes its characters), plus a
    ``keep`` flag comparing the ROUNDED fractions against the
    thresholds — round-then-compare so a DuckDB oracle can re-derive
    the flag bit-exactly. Character mass of a gram is the length of its
    space-joined form; the denominator is the whitespace-normalized
    document length. Only the numeric mass is aggregated (no top-gram
    string output), so no tie-break rule is needed.

    Shape: tokens are materialized ONCE as a real column (a
    multiply-referenced HOF subtree would re-split the text per gram —
    the simhash lesson, SCALE.md), then a single explode produces
    (doc, n, gram) rows for all four n values, one count, one
    conditional aggregate per doc. Shuffles carry gram-hash keys, not
    documents; linear at any corpus size. Docs with <2 tokens have no
    grams and are omitted (no repetition signal exists)."""
    # per-n defaults extend the paper's 2→0.20 / 3→0.18 / 4→0.16 line
    # linearly so a custom top_ns can't KeyError (review finding r05);
    # explicit thresholds overlay them
    thr = {**{n: 0.20 - 0.02 * (n - 2) for n in top_ns}, "dup": 0.15,
           **(thresholds or {})}
    ns = [*top_ns, dup_n]
    toked = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_w")
    ).withColumn("_nch", F.length(F.concat_ws(" ", F.col("_w"))))
    w = F.col("_w")
    empty = F.array().cast("array<struct<n:int,g:string>>")

    # closure factory, NOT `lambda i, n=n:` — a default argument makes
    # PySpark see a two-parameter HOF lambda and bind n to the array
    # INDEX (the documented second-param-is-index convention)
    def _gram_of(n: int):
        def make(i):
            return F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(w, i, n)).alias("g"),
            )

        return make

    gram_arrays = [
        # guard: Spark sequence(1, 0) DESCENDS ([1, 0]) rather than
        # returning empty — a doc shorter than n must yield no grams
        F.when(
            F.size(w) >= n,
            F.transform(F.sequence(F.lit(1), F.size(w) - n + 1), _gram_of(n)),
        ).otherwise(empty)
        for n in ns
    ]
    ex = (
        toked.filter(F.size(w) >= 2)
        .select(
            F.col(id_col), F.col("_nch"),
            F.explode(F.flatten(F.array(*gram_arrays))).alias("_gr"),
        )
        .select(
            F.col(id_col), F.col("_nch"),
            F.col("_gr.n").alias("_n"), F.col("_gr.g").alias("_g"),
        )
    )
    cnt = ex.groupBy(id_col, "_n", "_g").agg(
        F.count("*").alias("_c"), F.first("_nch").alias("_nch")
    )
    mass_top = F.max(F.col("_c") * F.length("_g"))
    mass_dup = F.sum(
        F.when(F.col("_c") > 1, (F.col("_c") - 1) * F.length("_g")).otherwise(0)
    )
    per_n = cnt.groupBy(id_col, "_n").agg(
        mass_top.alias("_top"), mass_dup.alias("_dup"),
        F.first("_nch").alias("_nch"),
    )
    aggs = []
    for n in top_ns:
        aggs.append(
            _round_fixed(
                F.coalesce(
                    F.max(F.when(F.col("_n") == n, F.col("_top"))), F.lit(0)
                ) / F.first("_nch"),
                round_dp,
            ).alias(f"top{n}_char_frac")
        )
    aggs.append(
        _round_fixed(
            F.coalesce(
                F.max(F.when(F.col("_n") == dup_n, F.col("_dup"))), F.lit(0)
            ) / F.first("_nch"),
            round_dp,
        ).alias(f"dup{dup_n}_char_frac")
    )
    out = per_n.groupBy(id_col).agg(*aggs)
    keep = F.lit(True)
    for n in top_ns:
        keep = keep & (F.col(f"top{n}_char_frac") <= thr[n])
    keep = keep & (F.col(f"dup{dup_n}_char_frac") <= thr["dup"])
    return out.withColumn("keep", keep)


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    mean_len_lo: float = 3.0,
    mean_len_hi: float = 10.0,
    min_stopwords: int = 2,
    min_alpha_frac: float = 0.80,
    round_dp: int = 4,
) -> DataFrame:
    """Gopher's document-quality rule panel (Rae et al. 2021 §A1.1):
    word-count bounds, mean-word-length bounds, a minimum count of
    distinct English stopword hits ("the"/"and"/... — machine-generated
    and boilerplate text lacks them), and a minimum fraction of words
    containing an alphabetic character. Flags compare ROUNDED stats
    (round-then-compare, oracle-exact). Pure Column expressions — the
    whole panel runs in whole-stage codegen at scan speed, zero
    shuffles: the shape you want for a first-pass gate over 100 TB."""
    toked = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_w")
    )
    w = F.col("_w")
    n = F.size(w)
    mean_len = _round_fixed(
        F.length(F.concat_ws("", w)) / F.greatest(n, F.lit(1)).cast("double"),
        round_dp,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(w, lambda x: F.lower(x)),
            F.array(*[F.lit(s) for s in STOPWORDS["en"]]),
        )
    )
    alpha_frac = _round_fixed(
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
        / F.greatest(n, F.lit(1)).cast("double"),
        round_dp,
    )
    out = toked.select(
        F.col(id_col),
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        stop_hits.alias("stopword_hits"),
        alpha_frac.alias("alpha_word_frac"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= mean_len_lo)
        & (F.col("mean_word_len") <= mean_len_hi)
        & (F.col("stopword_hits") >= min_stopwords)
        & (F.col("alpha_word_frac") >= min_alpha_frac)
    )
    return out.withColumn("keep", keep)


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 20,
    k: int = 20,
    round_dp: int = 4,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks 1990): PMI(w1,w2) = log2( P(w1 w2) / (P(w1)·P(w2)) ) with
    bigram probability over adjacent-pair count and unigram
    probabilities over token count. ``min_count`` suppresses the
    low-frequency PMI explosion (rare pairs dominate raw PMI — the
    standard guard). Deterministic order: PMI desc, bigram asc.

    Shape: one corpus pass each for unigram and bigram counts (explode
    → partial-agg), then two vocabulary-sized joins — AQE broadcasts
    the aggregated unigram relation when it fits, and everything after
    the counts is vocabulary-scale, not corpus-scale."""
    toked = df.select(tokens(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    # persist both count relations: `uni` feeds THREE consumers (token
    # total + both join sides) and `bi_all` two (bigram total + the
    # guarded join input) — left lazy, five corpus explode+agg passes
    # ran where two suffice. Lazy persist keeps Catalyst's size stats
    # (a localCheckpoint demoted the vocabulary joins from broadcast
    # to sort-merge — measured 1.3 s → 2.3 s).
    uni = (
        toked.select(F.explode(w).alias("w"))
        .groupBy("w").agg(F.count("*").alias("cw"))
        .persist()
    )
    n1 = uni.agg(F.sum("cw").alias("n_tokens"))
    bigrams = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bi_all = (
        toked.select(F.explode(bigrams).alias("b"))
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2").agg(F.count("*").alias("c12"))
        .persist()
    )
    # n_bigrams BEFORE the min_count filter (r06, ADVICE): normalizing
    # by frequent-bigram mass only uniformly inflated P(w1 w2) — the
    # ranking was unaffected (constant shift) but the reported values
    # weren't true PMI. One extra agg over the already-aggregated
    # bigram relation, not another corpus pass.
    n2 = bi_all.agg(F.sum("c12").alias("n_bigrams"))
    bi = bi_all.filter(F.col("c12") >= min_count)
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    pmi = F.round(
        F.log2(
            (F.col("c12") / F.col("n_bigrams"))
            / ((F.col("c1") / F.col("n_tokens")) * (F.col("c2") / F.col("n_tokens")))
        ),
        round_dp,
    )
    return (
        bi.join(u1, "w1").join(u2, "w2")
        .crossJoin(F.broadcast(n1)).crossJoin(F.broadcast(n2))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("c12").alias("pair_count"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        .limit(k)
    )


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The word-frequency dictionary — BPE training's working set. One
    corpus-scale pass (explode + partial-agg count); everything
    iterative afterwards runs on THIS relation, which is orders of
    magnitude smaller than the corpus (distinct words, not tokens) —
    the standard trick that makes tokenizer training tractable at
    100 TB."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _char_symbols(word: Column) -> Column:
    """Initial BPE symbol sequence: one single-char symbol per char."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1))
    )


def _adjacent_pairs(symbols: Column) -> Column:
    """Adjacent (a, b) struct pairs of a symbol array — slice+zip, NOT
    sequence(1, n-1): Spark's sequence(1, 0) is the DESCENDING [1, 0],
    so single-symbol inputs would fabricate out-of-bounds pairs."""
    n = F.size(symbols)
    return F.zip_with(
        F.slice(symbols, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(symbols, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def char_pair_counts(
    df: DataFrame, text_col: str = "text", top: int = 30
) -> DataFrame:
    """Frequency-weighted adjacent character-pair counts — the
    statistic BPE's first merge selection maximizes (Sennrich et al.
    2016). Runs on the word dictionary: per distinct word, the
    length−1 adjacent pairs, weighted by word frequency, globally
    aggregated. Total ordering (count desc, pair asc) + top-k makes
    the result engine-reproducible."""
    wf = word_frequencies(df, text_col)
    pairs = wf.select(
        F.explode(_adjacent_pairs(_char_symbols(F.col("word")))).alias("p"),
        "freq",
    )
    return (
        pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(top)
    )


def _apply_merge(symbols: Column, a: str, b: str) -> Column:
    """Apply one BPE merge (a, b) → ab to a symbol array: left-to-right
    non-overlapping, as a single JVM fold (no Python in the loop)."""
    merged = F.lit(a + b)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Distributed BPE training: learn ``n_merges`` merge rules from
    the corpus. The corpus is touched ONCE (word_frequencies); each
    iteration then (1) counts frequency-weighted adjacent symbol pairs
    over the dictionary, (2) picks the argmax (count desc, pair asc —
    the deterministic tie-break), (3) rewrites the symbol arrays with
    a JVM fold. One small driver action per merge is inherent to the
    algorithm (the merge choice is global state); the per-iteration
    jobs run over the dictionary relation only. Symbol columns are
    localCheckpointed every ``checkpoint_every`` merges so plan depth
    stays bounded (the dedup_components lineage discipline).

    Pinned by test against a pure-Python reference implementation."""
    wf = word_frequencies(df, text_col).withColumn(
        "syms", _char_symbols(F.col("word"))
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        pairs = wf.select(
            F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq"
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .first()
        )
        if best is None or best["n"] < 1:
            break
        a, b = best["a"], best["b"]
        merges.append((a, b))
        wf = wf.withColumn("syms", _apply_merge(F.col("syms"), a, b))
        if (step + 1) % checkpoint_every == 0:
            wf = wf.localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "bpe_tokens",
) -> DataFrame:
    """Apply learned BPE merges to the corpus — the tokenizer
    APPLICATION step that pairs with ``bpe_train``: adds ``out``
    (array<string> of subword symbols, document order) and
    ``n_{out}``. Merge semantics are exactly the trainer's (each rule
    in learned order, left-to-right non-overlapping), so
    encode(corpus) with train(corpus)'s rules reproduces the trainer's
    final dictionary state — pinned by test against the pure-Python
    reference.

    Scale shape (the dictionary trick, same as training): each
    DISTINCT word is encoded once — a Python loop, but over the
    dictionary relation (distinct words, Zipf-small vs corpus tokens),
    via an Arrow-batched pandas UDF with the merge list in the
    closure. The corpus-scale work is relational: one posexplode and
    one join on the word key (AQE broadcasts the encoded dictionary
    when it fits, the common case), then a per-document ordered
    re-assembly (single-document collect_list, bounded by document
    length). Tokenization matches ``word_frequencies`` (split on ' ',
    empties dropped) so the dictionary join can never miss a token."""
    merge_list = [(str(a), str(b)) for a, b in merges]

    @F.pandas_udf("array<string>")
    def _enc(col: pd.Series) -> pd.Series:
        def one(w):
            s = list(w)
            for a, b in merge_list:
                i, nxt = 0, []
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        nxt.append(a + b)
                        i += 2
                    else:
                        nxt.append(s[i])
                        i += 1
                s = nxt
            return s

        return col.map(one)

    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    dic = (
        df.select(F.explode(words).alias("word"))
        .distinct()
        .withColumn("_syms", _enc(F.col("word")))
    )
    toks = df.select(
        F.col(id_col), F.posexplode(words).alias("_pos", "word")
    )
    agg = (
        toks.join(dic, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_syms"))),
                    lambda s: s["_syms"],
                )
            ).alias(out)
        )
    )
    empty = F.array().cast("array<string>")
    return (
        df.join(agg, id_col, "left")
        .withColumn(out, F.coalesce(F.col(out), empty))
        .withColumn(f"n_{out}", F.size(F.col(out)))
    )


# ------------------------------------------------- unigram LM tokenizer

def unigram_seed_counts(
    df: DataFrame, text_col: str = "text", max_len: int = 4
) -> DataFrame:
    """Seed-vocabulary statistics for unigram-LM tokenizer training
    (Kudo 2018, SentencePiece's unigram model): frequency-weighted
    OCCURRENCE counts of every word substring of length 1..max_len,
    computed over the word dictionary (the bpe_train dictionary trick
    — the corpus is touched once by word_frequencies; the substring
    explosion runs on distinct words, Zipf-small vs corpus tokens).
    Returns (piece, n). Pure array expressions — no Python."""
    wf = word_frequencies(df, text_col)
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_len), F.length("word") - i + 1),
                ),
                lambda L: F.col("word").substr(i, L),
            ),
        )
    )
    return (
        wf.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("n"))
    )


def _viterbi_segment(word: str, logp: dict, max_len: int):
    """Best segmentation of ``word`` into vocabulary pieces under the
    unigram LM: maximize Σ log p(piece); ties broken by FEWER pieces,
    then the lexicographically smallest piece sequence — a total
    order, so the segmentation is a pure function of (word, model).
    Returns the piece list (single chars guarantee coverage)."""
    n = len(word)
    # best[i] = (neg_score, n_pieces, pieces_tuple) for word[:i]
    best = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cands = []
        for L in range(1, min(max_len, i) + 1):
            piece = word[i - L : i]
            lp = logp.get(piece)
            if lp is None or best[i - L] is None:
                continue
            prev = best[i - L]
            cands.append((prev[0] - lp, prev[1] + 1, prev[2] + (piece,)))
        if cands:
            best[i] = min(cands)
    return list(best[n][2]) if best[n] else list(word)


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    max_len: int = 4,
    min_count: int = 2,
    iters: int = 2,
) -> dict[str, int]:
    """Unigram-LM tokenizer training by Viterbi hard-EM (Kudo 2018;
    hard-EM instead of full EM so every statistic is an exact INTEGER
    and the model is cross-implementation checkable — the bpe_train
    pinning discipline):

      seed   — unigram_seed_counts pieces with n ≥ min_count, plus
               ALL single chars regardless of count (coverage: any
               word segments into chars, the SentencePiece
               character-coverage floor).
      E-step — Viterbi-best segmentation of each DISTINCT word under
               p(piece) = count/total (the dictionary trick: an
               Arrow-batched pandas UDF over the word-frequency
               relation, never the corpus), counts weighted by word
               frequency.
      M-step — piece count := Σ viterbi uses; single chars keep a
               floor count of 1 so coverage never dies; other pieces
               with zero uses are pruned.

    One vocabulary-sized driver collect per iteration carries the
    model into the next UDF closure — the same boundary the bpe_train
    merge list crosses (the model IS global state); every heavy step
    is relational. Returns the final {piece: count} model.

    Pinned by test against a pure-Python reference implementation."""
    wf = word_frequencies(df, text_col).localCheckpoint()
    seed = unigram_seed_counts(df, text_col, max_len)
    chars = (
        wf.select(F.explode(_char_symbols(F.col("word"))).alias("piece"))
        .distinct()
    )
    # Every single char IS a seed substring (n >= its word freq), so
    # chars only marks the min_count exemption, never adds pieces.
    model_df = (
        seed.join(chars.withColumn("_c", F.lit(1)), "piece", "left")
        .filter((F.col("n") >= min_count) | F.col("_c").isNotNull())
        .select("piece", "n")
    )
    model = {r["piece"]: int(r["n"]) for r in model_df.collect()}
    import math

    for _ in range(iters):
        total = sum(model.values())
        logp = {p: math.log(c) - math.log(total) for p, c in model.items()}
        ml = max_len

        @F.pandas_udf("array<string>")
        def _seg(col: pd.Series) -> pd.Series:
            return col.map(lambda w: _viterbi_segment(w, logp, ml))

        used = (
            wf.select(F.explode(_seg(F.col("word"))).alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").alias("n"))
        )
        new = {r["piece"]: int(r["n"]) for r in used.collect()}
        model = {
            p: max(new.get(p, 0), 1) if len(p) == 1 else new[p]
            for p in model
            if len(p) == 1 or new.get(p, 0) > 0
        }
    return model


def unigram_encode(
    df: DataFrame,
    model: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 4,
    out: str = "unigram_tokens",
) -> DataFrame:
    """Apply a trained unigram-LM model to the corpus — bpe_encode's
    shape exactly (each DISTINCT word Viterbi-segmented once via an
    Arrow-batched pandas UDF, then one join on the word key and a
    per-document ordered re-assembly): adds ``out`` (array<string>,
    document order) and ``n_{out}``. Segmentation is the trainer's
    _viterbi_segment with the trainer's tie order, so
    encode(corpus) under train(corpus)'s model reproduces the final
    E-step exactly (pinned by test, with a lossless concat
    round-trip)."""
    import math

    total = sum(model.values())
    logp = {p: math.log(c) - math.log(total) for p, c in model.items()}
    ml = max_len

    @F.pandas_udf("array<string>")
    def _enc(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _viterbi_segment(w, logp, ml))

    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    dic = (
        df.select(F.explode(words).alias("word"))
        .distinct()
        .withColumn("_syms", _enc(F.col("word")))
    )
    toks = df.select(F.col(id_col), F.posexplode(words).alias("_pos", "word"))
    agg = (
        toks.join(dic, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_syms"))),
                    lambda s: s["_syms"],
                )
            ).alias(out)
        )
    )
    empty = F.array().cast("array<string>")
    return (
        df.join(agg, id_col, "left")
        .withColumn(out, F.coalesce(F.col(out), empty))
        .withColumn(f"n_{out}", F.size(F.col(out)))
    )


def cooccurrence_edges(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    window: int = 2,
) -> DataFrame:
    """Symmetric word co-occurrence edge list over a document corpus —
    the TextRank graph (Mihalcea & Tarau, EMNLP 2004 §3.1: an
    undirected edge between words within ``window`` tokens). The
    gap-1..gap-w successor pairs are derived SCAN-SIDE from each
    document's token array (two aligned slices + zip_with per gap —
    r12 optimization, guide §2.4: the earlier posexplode + doc-keyed
    lead() window paid a full corpus-token shuffle AND a per-doc sort
    just to look `window` elements ahead inside an array the scan
    already holds; zero shuffles now precede the pair count), then
    the undirected symmetrization (both directions) and a pair count.
    Self-loops (adjacent repeats of the same word) are dropped: they
    only feed a word's rank back to itself. The tokenize lands in its
    own projection so the multi-reference pair expression reads a
    bound attribute, not `window`×2 re-tokenizations (the simhash
    single-reference lesson; SPARK-36718 keeps non-cheap aliases
    uncollapsed). Output (src, dst, w) is bounded by vocabulary²,
    never corpus-sized; the scan is corpus-linear.
    """
    if window < 1:
        raise ValueError(f"cooccurrence_edges: window must be >= 1, got {window}")
    t = df.select(tokens(F.col(text_col)).alias("_tk"))
    n = F.size(F.col("_tk"))

    def gap_pairs(g: int):
        ln = F.greatest(n - F.lit(g), F.lit(0))
        return F.zip_with(
            F.slice(F.col("_tk"), 1, ln),
            F.slice(F.col("_tk"), g + 1, ln),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        )

    pairs = F.filter(
        F.flatten(F.array(*[gap_pairs(g) for g in range(1, window + 1)])),
        lambda p: p["a"] != p["b"],
    )
    dir_counts = (
        t.select(F.explode(pairs).alias("pr"))
        .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    )
    # Symmetrize the COUNTED relation (vocabulary²-bounded), not the
    # corpus-sized pair instances.
    return (
        dir_counts.unionByName(
            dir_counts.select(
                F.col("b").alias("a"), F.col("a").alias("b"), "_n"
            )
        )
        .groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
        .agg(F.sum("_n").cast("bigint").alias("w"))
    )
