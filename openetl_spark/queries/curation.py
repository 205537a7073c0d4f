"""round-4 dataset-curation operators.

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
from openetl_spark.queries.dedup_text import _KEEP_BEST_CTES, _keep_best_survivors
from openetl_spark.spec import Connector, Filter, FilterGroup, Sort, Transformation

# =====================================================================
# Round 4 — dataset-curation operators (operators/curation.py)
# =====================================================================

@query(
    "decontaminate_ngram",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
      FROM documents),
    ng AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g
      FROM toks, UNNEST(generate_series(1, len(w) - 4)) AS t(i)
      WHERE len(w) >= 5),
    ev AS (SELECT DISTINCT g FROM ng WHERE doc_id % 20 = 0),
    agg AS (
      SELECT n.doc_id,
             count(*) AS n_grams,
             sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS n_shared
      FROM ng n LEFT JOIN ev ON n.g = ev.g
      WHERE n.doc_id % 20 <> 0
      GROUP BY 1)
    SELECT doc_id,
           CAST(n_shared AS BIGINT) AS n_shared,
           round(n_shared / CAST(n_grams AS DOUBLE), 4) AS contamination_frac
    FROM agg WHERE n_shared >= 1
    """,
)
def q_decontaminate_ngram(spark, sf_dir):
    """Curation (r04): benchmark decontamination — flag training docs
    sharing any 5-gram with the eval slice (doc_id % 20 == 0 stands in
    for a benchmark set). Eval n-grams broadcast; the corpus side's
    only shuffle is the per-doc count agg. The handful of flagged docs
    are exactly the planted near-duplicates — the realistic shape of a
    contamination scan (GPT-3 used 13-grams; n=5 scaled to this
    corpus's ~100-token docs)."""
    d = load(spark, sf_dir, "documents", spread=True)
    ev = d.where(F.col("doc_id") % 20 == 0)
    tr = d.where(F.col("doc_id") % 20 != 0)
    return C.decontaminate(tr, ev, "doc_id", "text", n=5, min_shared=1)


@query(
    "stratified_sample",
    f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {C.hash_bucket_sql('doc_id', 100)}
          < (CASE WHEN lang = 'de' THEN 25
                  WHEN lang = 'en' THEN 50
                  WHEN lang = 'zh' THEN 10
                  ELSE 0 END)
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Curation (r04): deterministic domain mixing — per-language
    inclusion rates via an engine-portable md5 bucket on doc_id
    (identical CASE+bucket formula in the oracle). Membership depends
    only on the row id: the training mix is reproducible across runs,
    engines, and cluster sizes. One scan, zero shuffles."""
    d = load(spark, sf_dir, "documents")
    return C.stratified_sample(
        d, {"en": 0.5, "de": 0.25, "zh": 0.1}, "lang", "doc_id"
    ).select("doc_id", "lang", "source")


@query(
    "sequence_packing",
    f"""
    WITH t AS (
      SELECT lang, doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS INT) AS n_tokens,
             {C.hash_bucket_sql("'pack0:' || CAST(doc_id AS VARCHAR)", 8)} AS shard
      FROM documents),
    c AS (
      SELECT lang, shard, doc_id, n_tokens,
             COALESCE(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
      FROM t),
    l AS (
      SELECT *, CAST(floor(tokens_before / 512.0) AS BIGINT) AS local_bin FROM c),
    off AS (
      SELECT lang, shard,
             CAST(COALESCE(sum(max_bin + 1) OVER (PARTITION BY lang ORDER BY shard
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bin_offset
      FROM (SELECT lang, shard, max(local_bin) AS max_bin FROM l GROUP BY 1, 2))
    SELECT l.lang, CAST(l.local_bin + o.bin_offset AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM l JOIN off o ON l.lang = o.lang AND l.shard = o.shard
    GROUP BY 1, 2
    """,
)
def q_sequence_packing(spark, sf_dir):
    """Curation (r04, sharded r06): contiguous sequence packing into
    512-token context bins — the deterministic streaming-concat layout
    used to build fixed-length training examples. The running window is
    keyed (lang, shard) via the deterministic hash sharder, so no
    window partition exceeds 1/8 of a language at any corpus size;
    per-shard bins are offset into globally unique ids by the tiny
    shard-aggregate broadcast."""
    d = load(spark, sf_dir, "documents")
    return C.pack_sequences(
        d, budget=512, group_col="lang", id_col="doc_id", n_shards=8
    )


@query(
    "pii_redaction",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' Contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-867-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{C.EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{C.PHONE_RE}')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(t, '{C.EMAIL_RE}', '[EMAIL]', 'g'),
                          '{C.PHONE_RE}', '[PHONE]', 'g') AS redacted
    FROM aug
    """,
)
def q_pii_redaction(spark, sf_dir):
    """Curation (r04): PII scrub before text enters a training mix —
    emails and US-style phone numbers replaced with placeholder tokens,
    with per-row match counts. The corpus is synthetic, so deterministic
    PII is appended in-query (one email + one phone per doc) to make the
    redaction non-vacuous; patterns are lookaround-free so Java regex
    (Spark) and RE2 (oracle) agree and the whole pass stays in
    whole-stage codegen — a pure scan at 100 TB."""
    d = load(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit("."),
        ).alias("t"),
    )
    return C.redact_pii(aug, "t", "redacted").select(
        "doc_id", "n_emails", "n_phones", "redacted"
    )


@query(
    "vocab_topk",
    """
    WITH toks AS (
      SELECT doc_id,
             list_transform(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''),
                            x -> lower(x)) AS w
      FROM documents),
    ex AS (SELECT doc_id, UNNEST(w) AS token FROM toks)
    SELECT token, count(*) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM ex GROUP BY token
    ORDER BY n_occurrences DESC, token ASC
    LIMIT 100
    """,
)
def q_vocab_topk(spark, sf_dir):
    """Curation (r04): corpus vocabulary heavy hitters (count + doc
    frequency, deterministic top-100) — the statistic that seeds
    tokenizer training and stop-word lists. Partial-agg counts then a
    per-partition top-k heap; no global sort."""
    d = load(spark, sf_dir, "documents", spread=True)
    return C.vocab_topk(d, "doc_id", "text", k=100)


@query(
    "embedding_quantize",
    """
    SELECT vec_id,
           array_to_string(list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 127.0 /
                  greatest(sqrt(list_aggregate(list_transform(embedding,
                            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')),
                           1e-30)) AS INT)), ',') AS q8,
           round(sqrt(list_aggregate(list_transform(embedding,
                 y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')), 6) AS norm
    FROM embeddings
    """,
)
def q_embedding_quantize(spark, sf_dir):
    """Curation (r04): L2-normalize + int8-quantize every embedding —
    the 4× shrink before ANN-indexing an embedding corpus. Pure array
    expressions, zero shuffles; a linear scan at 100 TB.

    The operator returns q8 as array<int> (the API shape); the catalog
    query serializes it to a canonical comma-joined string because the
    driver's canonicalization sorts raw cell values (unhashable-list
    TypeError on array cells, CORRECTNESS_r03)."""
    e = load(spark, sf_dir, "embeddings")
    q = C.quantize_embeddings(e, "embedding", "vec_id", "q8")
    return q.select(
        "vec_id", F.concat_ws(",", F.col("q8")).alias("q8"), "norm"
    )


@query(
    "cms_token_counts",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''),
                            x -> lower(x)) AS w
      FROM documents),
    ex AS (SELECT doc_id, UNNEST(w) AS token FROM toks),
    ds AS (SELECT UNNEST([0, 1, 2, 3]) AS d),
    cells AS (
      SELECT d, {C.hash_bucket_sql("'cms' || CAST(d AS VARCHAR) || ':' || token", 2048)} AS pos,
             count(*) AS cell
      FROM ex CROSS JOIN ds GROUP BY 1, 2),
    probes AS (
      SELECT token, count(*) AS n_exact
      FROM ex GROUP BY token
      ORDER BY n_exact DESC, token ASC LIMIT 20),
    ppos AS (
      SELECT p.token, p.n_exact, ds.d,
             {C.hash_bucket_sql("'cms' || CAST(ds.d AS VARCHAR) || ':' || p.token", 2048)} AS pos
      FROM probes p CROSS JOIN ds),
    est AS (
      SELECT token, n_exact, min(cell) AS cms_est
      FROM ppos JOIN cells USING (d, pos) GROUP BY 1, 2)
    SELECT token, CAST(n_exact AS BIGINT) AS n_exact,
           CAST(cms_est AS BIGINT) AS cms_est,
           cms_est >= n_exact AS never_under
    FROM est
    """,
)
def q_cms_token_counts(spark, sf_dir):
    """Curation (r06): count-min sketch frequency estimation — the
    second mergeable-sketch family next to SpaceSaving. The sketch is
    pure relational algebra (positions via the portable md5 bucket,
    cells via a <= depth*width-group partial agg, estimates via
    min-over-rows on a broadcast join), so the DuckDB oracle reproduces
    every cell count and estimate BIT-EXACTLY — a full hash-checked
    oracle for an approximate data structure. Probes are the exact
    top-20 tokens; never_under pins the CMS no-undercount guarantee
    row-by-row."""
    d = load(spark, sf_dir, "documents", spread=True)
    return C.cms_token_estimates(d, probe_k=20, depth=4, width=2048)


@query(
    "length_band_filter",
    """
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS INT) AS n_tokens
      FROM documents),
    r AS (
      SELECT doc_id, source, n_tokens,
             percent_rank() OVER (PARTITION BY source ORDER BY n_tokens) AS pr
      FROM t)
    SELECT doc_id, source, n_tokens, round(pr, 6) AS len_pctile
    FROM r WHERE pr >= 0.1 AND pr <= 0.95
    """,
)
def q_length_band_filter(spark, sf_dir):
    """Curation (r04, two-pass r06): per-source percentile length gate —
    keep docs in the [p10, p95] token-count band of their own source
    domain. The rank is exact (tie-atomic, engine-portable) but comes
    from the compact per-(source, length) histogram + broadcast join —
    no data-sized window keyed on the stratum, so one source domain
    never becomes one task at corpus scale. The oracle renders the
    equivalent percent_rank window; both are bit-identical."""
    d = load(spark, sf_dir, "documents")
    return C.length_band_filter(d, 0.1, 0.95, "source", "doc_id", "text")


@query(
    "curation_pipeline",
    _KEEP_BEST_CTES + f"""
    , kept AS (
      SELECT d.doc_id, d.lang, d.text
      FROM documents d JOIN survivors s ON d.doc_id = s.doc_id),
    samp AS (
      SELECT * FROM kept
      WHERE {C.hash_bucket_sql('doc_id', 100)}
            < (CASE WHEN lang = 'en' THEN 60 ELSE 40 END)),
    t2 AS (
      SELECT lang, doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS INT) AS n_tokens,
             {C.hash_bucket_sql("'pack0:' || CAST(doc_id AS VARCHAR)", 8)} AS shard
      FROM samp),
    c2 AS (
      SELECT lang, shard, doc_id, n_tokens,
             COALESCE(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
      FROM t2),
    l2 AS (
      SELECT *, CAST(floor(tokens_before / 256.0) AS BIGINT) AS local_bin FROM c2),
    off2 AS (
      SELECT lang, shard,
             CAST(COALESCE(sum(max_bin + 1) OVER (PARTITION BY lang ORDER BY shard
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bin_offset
      FROM (SELECT lang, shard, max(local_bin) AS max_bin FROM l2 GROUP BY 1, 2))
    SELECT l2.lang, CAST(l2.local_bin + o.bin_offset AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM l2 JOIN off2 o ON l2.lang = o.lang AND l2.shard = o.shard
    GROUP BY 1, 2
    """,
)
def q_curation_pipeline(spark, sf_dir):
    """The flagship composed curation DAG (r04) — what a user runs to
    turn a raw corpus into training shards, in ONE lazy plan:
    near-dup groups (MinHash+LSH, exact-verified) → quality-weighted
    survivor per group → deterministic domain mixing (60% en / 40%
    rest) → 256-token sequence packing → per-bin manifest. Every stage
    is an oracle-checked operator and the composition itself is
    oracle-checked end-to-end against a single DuckDB rendering
    (recursive closure + quality argmax + hash sampling + packing
    window). Catalyst sees the whole upstream DAG at once — the dedup
    branch and the packing branch share one scan of the corpus; the
    sharded packing stage materializes its slim windowed projection
    once (lazy checkpoint) so its offsets pass doesn't re-run the
    dedup+sampling pipeline."""
    d = load(spark, sf_dir, "documents")
    keep = _keep_best_survivors(spark, sf_dir).select("doc_id")
    kept = d.join(keep, "doc_id").select("doc_id", "lang", "text")
    sampled = C.stratified_sample(
        kept,
        {"en": 0.6},
        "lang",
        "doc_id",
        default_rate=0.4,
    )
    return C.pack_sequences(sampled, budget=256, group_col="lang", n_shards=8)


@query(
    "rarity_score",
    """
    WITH ex AS (
      SELECT doc_id,
             UNNEST(list_transform(
               list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''),
               x -> lower(x))) AS token
      FROM documents),
    freq AS (SELECT token, count(*) AS c FROM ex GROUP BY token),
    tot AS (SELECT sum(c) AS n FROM freq)
    SELECT ex.doc_id,
           count(*) AS n_tokens,
           round(avg(ln(tot.n / CAST(freq.c AS DOUBLE))), 4) AS rarity
    FROM ex JOIN freq USING (token), tot
    GROUP BY ex.doc_id
    """,
)
def q_rarity_score(spark, sf_dir):
    """Curation (r04): unigram self-information per doc (mean
    −ln p(token) under the corpus's own unigram model) — the cheap
    perplexity proxy separating boilerplate from garbled text. Two
    linear passes; the only token-keyed shuffle carries (token, count)
    pairs."""
    d = load(spark, sf_dir, "documents", spread=True)
    return C.rarity_score(d, "doc_id", "text")




def decontaminate_spans_oracle(window: int = 5, eval_mod: int = 20) -> str:
    k = window - 1
    return f"""
    WITH wt AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
      FROM documents),
    win AS (
      SELECT doc_id, i - 1 AS pos, md5(array_to_string(w[i:i+{k}], ' ')) AS wh
      FROM wt, UNNEST(generate_series(1, len(w) - {k})) AS t(i)),
    ev AS (SELECT DISTINCT wh FROM win WHERE doc_id % {eval_mod} = 0),
    cov AS (
      SELECT DISTINCT w.doc_id, w.pos + g.off AS pos
      FROM win w JOIN ev USING (wh), UNNEST(generate_series(0, {k})) AS g(off)
      WHERE w.doc_id % {eval_mod} <> 0),
    flagged AS (SELECT DISTINCT doc_id FROM cov),
    toks AS (
      SELECT wt.doc_id, i - 1 AS pos, w[i] AS tok
      FROM wt JOIN flagged USING (doc_id),
           UNNEST(generate_series(1, len(w))) AS t(i)),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM toks t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
      WHERE c.doc_id IS NULL),
    ka AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id),
    st AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id)
    SELECT CAST(st.doc_id AS BIGINT) AS doc_id,
           CAST(st.n_tokens AS BIGINT) AS n_tokens,
           CAST(st.n_tokens - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(ka.clean_text, '') AS clean_text
    FROM st LEFT JOIN ka USING (doc_id)
    UNION ALL
    SELECT CAST(doc_id AS BIGINT), CAST(len(w) AS BIGINT), CAST(0 AS BIGINT), text
    FROM wt
    WHERE doc_id % {eval_mod} <> 0
      AND doc_id NOT IN (SELECT doc_id FROM flagged)
    ORDER BY doc_id
    """


@query("decontaminate_spans", decontaminate_spans_oracle(window=5, eval_mod=20))
def q_decontaminate_spans(spark, sf_dir):
    """Curation (r06-s2): SPAN-level decontamination — mask exactly the
    tokens covered by 5-token runs shared with the eval slice
    (doc_id % 20 == 0 stands in for a benchmark set, matching
    decontaminate_ngram), keeping the rest of each document. Eval
    window hashes broadcast; only flagged documents pay the
    explode/rebuild, clean documents pass through with their original
    text. The surgical complement to decontaminate_ngram's
    whole-document flags."""
    d = load(spark, sf_dir, "documents", spread=True)
    ev = d.where(F.col("doc_id") % 20 == 0)
    tr = d.where(F.col("doc_id") % 20 != 0)
    return C.remove_contaminated_spans(tr, ev, "doc_id", "text", window=5)
