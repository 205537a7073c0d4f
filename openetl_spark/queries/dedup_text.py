"""dedup / similarity / text analysis (C26-C29) + the shared jaccard/simhash oracle fragments.

Split out of the monolithic catalog.py (r06, VERDICT r05 #6) —
importing this module REGISTERS its queries into the shared
QUERIES/ORACLE registries (openetl_spark.queries.base). Query names,
oracles, and iteration order are byte-identical to the pre-split
catalog; openetl_spark.catalog re-exports the full public surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from openetl_spark.operators import curation as C
from openetl_spark.operators import dedup as D
from openetl_spark.operators import joins as J
from openetl_spark.operators import similarity as S
from openetl_spark.operators import text as X
from openetl_spark.operators import timeseries as TS
from openetl_spark.plans.compiler import compile_connector
from openetl_spark.queries.base import ORACLE, QUERIES, load, query
from openetl_spark.spec import Connector, Filter, FilterGroup, Sort, Transformation

# =====================================================================
# C26-C29 — dedup / similarity / text analysis
# =====================================================================

@query(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark, sf_dir):
    """C26: exact dedup keyed on md5(text) — 16-byte keys shuffle, not
    document bodies."""
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("text_hash", F.md5(F.col("text").cast("binary")))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("dup_count"))
    )


def shingle_cte(n: int = 5) -> str:
    """``sh(doc_id, s)`` — the distinct word-n-gram shingle relation
    every jaccard-family oracle starts from."""
    k = n - 1  # DuckDB list slice is 1-based INCLUSIVE: w[i:i+k] is n tokens
    return f"""sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+{k}], ' ') AS s
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
            FROM documents),
           UNNEST(generate_series(1, greatest(len(w) - {k}, 1))) AS t(i))"""


def jaccard_ctes(thr: float, n: int = 5) -> str:
    """The shared exact-jaccard CTE chain — shingles → per-doc sizes →
    intersection counts → thresholded pairs carrying the rounded
    jaccard (r06, VERDICT #4 / ROADMAP 0a: this fragment was verbatim-
    triplicated across _JACCARD_ORACLE, _CC_ORACLE/_KEEP_BEST_CTES and
    the minhash_error_report oracle; the r05 round-then-compare change
    had to touch every copy — now there is ONE source of truth, the
    same shape winnow_oracle() uses for winnowing). Callers prepend
    ``WITH`` / ``WITH RECURSIVE`` and append their own CTEs reading
    from ``pairs(a BIGINT, b BIGINT, jaccard)``."""
    return f"""{shingle_cte(n)},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT CAST(inter.a AS BIGINT) AS a, CAST(inter.b AS BIGINT) AS b,
             round(c / (sa.n + sb.n - c), 6) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.a
      JOIN sizes sb ON sb.doc_id = inter.b
      WHERE round(c / (sa.n + sb.n - c), 6) >= {thr})"""


def _jaccard_oracle(thr: float) -> str:
    return f"WITH {jaccard_ctes(thr)}\n    SELECT a, b, jaccard FROM pairs"


@query("jaccard_near_dups", _jaccard_oracle(0.2))
def q_jaccard_near_dups(spark, sf_dir):
    """C27 exact baseline: 5-gram shingle jaccard ≥ 0.2 pairs.

    Runs the df-capped path (stop-shingles excluded from pair mining,
    exact jaccard recomputed on candidates) so the driver gate checks
    the plan that survives 100×: the mining join's input is bounded by
    cap·|shingle rows|. Testdata max shingle df is 4, so cap=50 drops
    nothing and the result equals the uncapped exact oracle."""
    d = D.with_shingles(load(spark, sf_dir, "documents", spread=True), "text", n=5)
    return D.jaccard_similarity_pairs(d, "doc_id", threshold=0.2, max_shingle_df=50)


@query("minhash_near_dups", _jaccard_oracle(0.5))
def q_minhash_near_dups(spark, sf_dir):
    """C27 scale path: MinHash(128) + LSH banding (64 bands × r=2 →
    candidate prob ≈ 1 at jaccard ≥ 0.5) then exact verification on
    candidates only. Oracle = exact jaccard: at these parameters the
    approximate pipeline must find every qualifying pair."""
    d = load(spark, sf_dir, "documents", spread=True)
    return D.minhash_near_duplicates(
        d, "doc_id", "text", n=5, num_hashes=128, bands=64, threshold=0.5
    )


@query(
    "embedding_knn",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS cosine_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def q_embedding_knn(spark, sf_dir):
    """C28: brute-force cosine top-k of one query vector — broadcast the
    one-row query relation, one corpus scan, TakeOrderedAndProject;
    fully lazy (no driver-side .first() fetch)."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    return S.brute_force_knn_lazy(
        e.filter(F.col("vec_id") != 0),
        e.filter(F.col("vec_id") == 0),
        k=10, id_col="vec_id", vec_col="embedding"
    )


@query(
    "text_stats",
    """
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
      FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len(tk) AS INT) AS n_tokens,
           round(coalesce(list_aggregate(list_transform(tk, x -> CAST(length(x) AS DOUBLE)),
                                         'sum'), 0.0)
                 / greatest(len(tk), 1), 4) AS avg_token_len
    FROM toks
    """,
)
def q_text_stats(spark, sf_dir):
    """C29: token/length statistics, all JVM-side array expressions."""
    d = X.with_text_stats(load(spark, sf_dir, "documents", spread=True))
    return d.select(
        "doc_id",
        F.col("n_chars_calc").cast("long").alias("n_chars_calc"),
        "n_tokens",
        "avg_token_len",
    )


@query(
    "doc_fingerprint",
    """
    WITH toks AS (
      SELECT doc_id,
             array_to_string(
               list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''), ' ') AS canon
      FROM documents)
    SELECT doc_id, CAST(min(doc_id) OVER (PARTITION BY canon) AS BIGINT) AS class_rep
    FROM toks
    """,
)
def q_doc_fingerprint(spark, sf_dir):
    """C29: order-sensitive 64-bit fingerprint, oracle-checked through
    its defining invariant — fingerprint equality classes must equal
    token-sequence equality classes. Emitting the class representative
    (min doc_id per fingerprint) instead of the raw xxhash64 value makes
    the result engine-independent: a collision between distinct docs OR
    a fingerprint that varies for identical token sequences would both
    break the match. (This corpus has no duplicate token sequences, so
    the check pins injectivity; duplicate-bearing corpora get the
    grouping behavior too — test_operators.py pins it directly.)

    No ``spread``: the window's own shuffle provides the parallelism,
    and the pre-shuffle hashing is one cheap scan task locally (at
    production scale the scan has file-split parallelism regardless) —
    r02 flagged the extra repartition as this query's 2× regression."""
    d = X.with_fingerprint(load(spark, sf_dir, "documents"))
    w = W.partitionBy("fingerprint")
    return d.select("doc_id", F.min("doc_id").over(w).alias("class_rep"))


# Transitive closure over the shared pair relation (jaccard_ctes) —
# edges → recursive reach → min-label component per node.
_CLOSURE_CTES = """edges AS (SELECT a AS x, b AS y FROM pairs
              UNION ALL SELECT b, a FROM pairs),
    reach AS (
      SELECT x, y FROM edges
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x)"""

_CC_ORACLE = f"""
    WITH RECURSIVE {jaccard_ctes(0.5)},
    {_CLOSURE_CTES}
    SELECT CAST(x AS BIGINT) AS doc_id,
           CAST(least(x, min(y)) AS BIGINT) AS component
    FROM reach GROUP BY x
"""


@query("dedup_components", _CC_ORACLE)
def q_dedup_components(spark, sf_dir):
    """C26/C27 capstone (r03): pairwise near-dups → dedup GROUPS.
    MinHash+LSH finds the jaccard ≥ 0.5 pairs (at these parameters the
    pair set is exactly the all-pairs oracle's), then iterative
    min-label propagation folds them into connected components — each
    doc labeled with the smallest doc_id in its duplicate class, the
    label a keep-one-per-group dedup deletes against. Oracle = DuckDB
    recursive transitive closure over the same exact pair set."""
    d = load(spark, sf_dir, "documents", spread=True)
    pairs = D.minhash_near_duplicates(
        d, "doc_id", "text", n=5, num_hashes=128, bands=64, threshold=0.5
    )
    comps = D.connected_components(pairs.select("a", "b"))
    return comps.select(F.col("node").alias("doc_id"), "component")


# Shared CTE prefix: shingles → exact-jaccard pairs → recursive
# transitive closure → components → quality → labeled docs. Reused by
# the keep-best oracle and the composed curation_pipeline oracle; the
# shingle/pair chain comes from jaccard_ctes() (single source of truth).
_KEEP_BEST_CTES = f"""
    WITH RECURSIVE {jaccard_ctes(0.5)},
    {_CLOSURE_CTES},
    comp AS (SELECT x AS doc_id, least(x, min(y)) AS component
             FROM reach GROUP BY x),
    toks AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
      FROM documents),
    q AS (
      SELECT doc_id,
             round(
               (CASE WHEN len(tk) BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.3 END) *
               (CASE WHEN length(regexp_replace(text, '[\\w\\s]', '', 'g'))
                          / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.5 END) *
               (0.5 + 0.5 * (CASE WHEN len(tk) > 0
                                  THEN len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE)
                                  ELSE 0.0 END)), 4) AS quality
      FROM toks),
    lab AS (
      SELECT q.doc_id, coalesce(comp.component, q.doc_id) AS component, q.quality
      FROM q LEFT JOIN comp ON comp.doc_id = q.doc_id),
    survivors AS (
      SELECT component, doc_id, quality
      FROM (SELECT lab.*,
                   row_number() OVER (PARTITION BY component
                                      ORDER BY quality DESC, doc_id ASC) AS rn
            FROM lab)
      WHERE rn = 1)
"""

_KEEP_BEST_ORACLE = _KEEP_BEST_CTES + """
    SELECT CAST(component AS BIGINT) AS component,
           CAST(doc_id AS BIGINT) AS keep_doc_id, quality
    FROM survivors
"""


def _keep_best_survivors(spark, sf_dir) -> DataFrame:
    """(component, doc_id, quality) of each near-dup group's survivor —
    the shared head of dedup_keep_best and curation_pipeline."""
    d = load(spark, sf_dir, "documents", spread=True)
    pairs = D.minhash_near_duplicates(
        d, "doc_id", "text", n=5, num_hashes=128, bands=64, threshold=0.5
    )
    comps = D.connected_components(pairs.select("a", "b"))
    scored = X.quality_score(d).select("doc_id", "quality")
    lab = scored.join(comps, scored["doc_id"] == comps["node"], "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        "quality",
    )
    w = W.partitionBy("component").orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    return (
        lab.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("component", "doc_id", "quality")
    )


@query("dedup_keep_best", _KEEP_BEST_ORACLE)
def q_dedup_keep_best(spark, sf_dir):
    """The end-to-end dedup decision a training-data pipeline ships
    (r03): near-dup pairs (MinHash+LSH, exact-verified) → connected
    components → per-group survivor = highest quality_score (doc_id
    tiebreak); singleton docs survive as their own group. One row per
    surviving document. Composes three oracle-checked operators and is
    itself oracle-checked end-to-end (recursive closure + the quality
    formula + argmax in DuckDB)."""
    return _keep_best_survivors(spark, sf_dir).select(
        "component", F.col("doc_id").alias("keep_doc_id"), "quality"
    )


@query(
    "pivot_dynamic",
    """
    SELECT o_orderstatus,
           round(avg(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 2) AS "1-URGENT",
           round(avg(o_totalprice) FILTER (o_orderpriority = '2-HIGH'), 2) AS "2-HIGH",
           round(avg(o_totalprice) FILTER (o_orderpriority = '3-MEDIUM'), 2) AS "3-MEDIUM",
           round(avg(o_totalprice) FILTER (o_orderpriority = '4-NOT SPECIFIED'), 2) AS "4-NOT SPECIFIED",
           round(avg(o_totalprice) FILTER (o_orderpriority = '5-LOW'), 2) AS "5-LOW"
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_pivot_dynamic(spark, sf_dir):
    """C9 extension (r03, closes ROADMAP #5's leftover): pivot with
    DYNAMIC value discovery — no values list passed, Spark runs the
    extra distinct pass and derives the columns from the data. The
    oracle names the five discovered priorities explicitly, so a
    discovery mismatch (missing/extra column) fails the schema
    compare."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority")
        .agg(F.round(F.avg("o_totalprice"), 2))
    )


@query(
    "repetition_stats",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
      FROM documents),
    bg AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS b
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2),
    cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           round(count(*) / CAST(sum(c) AS DOUBLE), 4) AS distinct_ratio,
           round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_frac
    FROM cnt GROUP BY doc_id
    """,
)
def q_repetition_stats(spark, sf_dir):
    """C29 extension (r03): Gopher-style within-doc repetition signals
    (distinct-bigram ratio, top-bigram mass) — the standard
    drop-if-repetitive pre-filter for training corpora. Explode →
    count → agg: two shuffles carrying bigram keys, linear at any
    corpus size."""
    d = load(spark, sf_dir, "documents", spread=True)
    return X.bigram_repetition_stats(d, "doc_id", "text")


# simhash_dedup oracle (r06, VERDICT #2/#3): BOTH stages re-derived in
# DuckDB — the portable 64-bit md5 simhash per document (two 32-bit
# halves; DuckDB's overflow-checked << cannot pack the top bit, so the
# oracle compares hamming per-half) and the exact-jaccard verify. The
# mining stage itself is now oracle-covered: the result is
# {pairs: hamming(simhash) ≤ k AND jaccard ≥ thr}, not "hope the
# budget covers the jaccard set" — which is what let r05 ship the
# near-quadratic k=16 configuration.
def _simhash_oracle(max_hamming: int, thr: float) -> str:
    return f"""
    WITH {jaccard_ctes(thr)},
    hb AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) AS hi,
             CAST('0x' || substr(md5(s), 9, 8) AS BIGINT) AS lo
      FROM sh),
    bits AS (
      SELECT doc_id, i.i,
             CASE WHEN sum((CASE WHEN i.i < 32 THEN (lo >> i.i) & 1
                                 ELSE (hi >> (i.i - 32)) & 1 END) * 2 - 1) > 0
                  THEN 1 ELSE 0 END AS bit
      FROM hb, UNNEST(generate_series(0, 63)) AS i(i)
      GROUP BY 1, 2),
    fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN bit = 1 AND i < 32
                           THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS flo,
             CAST(sum(CASE WHEN bit = 1 AND i >= 32
                           THEN (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) AS fhi
      FROM bits GROUP BY 1)
    SELECT p.a, p.b, p.jaccard
    FROM pairs p
    JOIN fp fa ON fa.doc_id = p.a
    JOIN fp fb ON fb.doc_id = p.b
    WHERE bit_count(xor(fa.flo, fb.flo)) + bit_count(xor(fa.fhi, fb.fhi))
          <= {max_hamming}
    """


@query("simhash_dedup", _simhash_oracle(6, 0.9))
def q_simhash_dedup(spark, sf_dir):
    """C27: SimHash as the coarse filter of a verified pipeline —
    pigeonhole candidates at hamming ≤ 6, exact jaccard ≥ 0.9 on
    candidates only. r06 rework (VERDICT #2): the r05 budget of 16 made
    the chunk equi-join near-quadratic (3–4-bit chunks → ≤272 join
    keys, random-pair collision p≈0.9); measured jaccard-0.9 pairs run
    to hamming 8–12 on this corpus, so instead of widening the budget
    the ORACLE now derives the fingerprints too (portable md5 simhash,
    re-derived bit-exactly in DuckDB) and the query's semantics are
    honestly {hamming ≤ 6 ∧ jaccard ≥ 0.9} — 9-bit chunks, ~70× fewer
    enumerated candidates, and the dense-budget guard in
    pigeonhole_candidate_stream now rejects configurations like the
    old one. Wide-radius recall-complete mining is minhash_near_dups'
    job (60-bit banding keys)."""
    d = load(spark, sf_dir, "documents", spread=True)
    return D.simhash_near_duplicates(
        d, "doc_id", "text", max_hamming=6, threshold=0.9, portable=True
    )


def _lsh_oracle_sql(
    threshold: float, dim: int, n_planes: int, n_tables: int, seed: int
) -> str:
    """DuckDB rendering of the EXACT hyperplane-LSH algorithm: the same
    seeded hyperplanes (shared literals — both engines see identical
    doubles, so sign bits agree; min |projection| on this corpus is
    ~4e-5, a million× any summation-order ulp), the same
    (table, bucket) candidate equi-join, the same exact-cosine verify.
    Makes the approximate operator fully hash-checkable, not rows-only."""
    branches = []
    for t in range(n_tables):
        pl = S.hyperplanes(dim, n_planes, seed + t)
        bucket = " + ".join(
            "(CASE WHEN list_dot_product(embedding, ["
            + ", ".join(repr(v) for v in pl[i])
            + f"]) >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(n_planes)
        )
        branches.append(
            f"SELECT vec_id, embedding, {t} AS t, {bucket} AS bucket FROM embeddings"
        )
    bk = " UNION ALL ".join(branches)
    return f"""
    WITH bk AS ({bk}),
    cand AS (
      SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      FROM bk x JOIN bk y ON x.t = y.t AND x.bucket = y.bucket
                         AND x.vec_id < y.vec_id),
    v AS (
      SELECT c.a, c.b,
             round(list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[])))
                   + 1e-9, 4)
               AS cosine_sim
      FROM cand c JOIN embeddings ea ON ea.vec_id = c.a
                  JOIN embeddings eb ON eb.vec_id = c.b)
    SELECT a, b, cosine_sim FROM v WHERE cosine_sim >= {threshold}
    """


@query("lsh_similarity_join", _lsh_oracle_sql(0.35, 64, 3, 12, 42))
def q_lsh_similarity_join(spark, sf_dir):
    """C28: random-hyperplane LSH similarity self-join on embeddings —
    now FULLY oracle-checked (same hyperplane literals both engines, see
    _lsh_oracle_sql) instead of rows-only, and non-vacuous (VERDICT r02:
    threshold 0.8 > corpus max cosine ~0.51 returned 0 rows; 0.35
    matches embedding_near_dup_exact's oracle band).

    Parameter note: 3 planes × 12 tables is the LOW-threshold recall
    configuration this weakly-clustered corpus needs (measured recall
    0.97 vs exact at sf0.01, always a subset). Production near-dup at
    threshold 0.9 uses the opposite corner — n_planes 10-12, a few
    tables — where bucket collision ≈ 2^-planes prunes ~99.9% of pairs;
    sign-LSH's per-bit discrimination shrinks as cos→0, so sweeping low
    thresholds at scale belongs to IVF/brute partitioned paths, not LSH."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    return S.lsh_similarity_join(e, threshold=0.35, n_planes=3, n_tables=12)


@query(
    "quality_score",
    """
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
      FROM documents)
    SELECT doc_id,
           round(
             (CASE WHEN len(tk) BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.3 END) *
             (CASE WHEN length(regexp_replace(text, '[\\w\\s]', '', 'g'))
                        / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.5 END) *
             (0.5 + 0.5 * (CASE WHEN len(tk) > 0
                                THEN len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE)
                                ELSE 0.0 END)), 4) AS quality
    FROM toks
    """,
)
def q_quality_score(spark, sf_dir):
    d = X.quality_score(load(spark, sf_dir, "documents", spread=True))
    return d.select("doc_id", "quality")



