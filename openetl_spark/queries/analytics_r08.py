"""r08 analytics queries: PPJoin exact set-similarity join, Louvain
local-move communities, and unigram-LM tokenizer seed statistics —
VERDICT r07 next-round items #4/#5/#7.

Importing this module REGISTERS its queries into the shared
QUERIES/ORACLE registries (openetl_spark.queries.base); it is loaded
LAST by openetl_spark.catalog so all pre-existing names keep their
registration order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openetl_spark.operators import dedup as DD
from openetl_spark.queries.base import load, query
from openetl_spark.queries.dedup_text import shingle_cte

# ---------------------------------------------------------------------
# C121 — PPJoin: exact set-similarity join (Xiao et al., WWW 2008).
# The missing sibling between MinHash (approximate jaccard, C27) and
# Ed-Join (edit distance, C120): exact jaccard ≥ τ pairs, lossless.
# FULL oracle: every stage — shingles, corpus frequencies, the
# rarest-first total order, prefix lengths, the length and positional
# filters, overlap counts — is exact strings/integers, re-derived by
# DuckDB below; the brute-force losslessness differential lives in
# tests/test_analytics_graph.py.
# ---------------------------------------------------------------------

# τ = 3/5 as exact integer arithmetic: prefix p = l − ⌈3l/5⌉ + 1,
# positional threshold t = ⌈3(la+lb)/8⌉ (τ/(1+τ) = 3/8), final test
# 8·overlap ≥ 3·(la+lb). Integer-ceil via (x + d − 1) // d.
_PPJOIN_ORACLE = f"""
    WITH {shingle_cte(5)},
    sh2 AS (SELECT doc_id AS id, s AS tok FROM sh WHERE s <> ''),
    freq AS (SELECT tok, count(*) AS f FROM sh2 GROUP BY 1),
    ranked AS (
      SELECT s.id, s.tok,
             row_number() OVER (PARTITION BY s.id ORDER BY f.f, s.tok) AS rn,
             count(*) OVER (PARTITION BY s.id) AS l
      FROM sh2 s JOIN freq f USING (tok)),
    pre AS (SELECT * FROM ranked WHERE rn <= l - ((3 * l + 4) // 5) + 1),
    cand AS (
      SELECT a.id AS a, b.id AS b, a.l AS la, b.l AS lb
      FROM pre a JOIN pre b ON a.tok = b.tok AND a.id < b.id
      WHERE 5 * least(a.l, b.l) >= 3 * greatest(a.l, b.l)
      GROUP BY 1, 2, 3, 4
      HAVING 1 + least(a.l - min(a.rn), b.l - min(b.rn))
             >= (3 * (a.l + b.l) + 7) // 8),
    ov AS (
      SELECT c.a, c.b, c.la, c.lb, count(*) AS o
      FROM cand c
      JOIN sh2 ta ON ta.id = c.a
      JOIN sh2 tb ON tb.id = c.b AND tb.tok = ta.tok
      GROUP BY 1, 2, 3, 4)
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(o AS BIGINT) AS overlap,
           CAST(la AS BIGINT) AS la, CAST(lb AS BIGINT) AS lb,
           round(o / (la + lb - o), 6) AS jaccard
    FROM ov WHERE 8 * o >= 3 * (la + lb)
    """


@query("ppjoin_pairs", _PPJOIN_ORACLE)
def q_ppjoin_pairs(spark, sf_dir):
    """C121: exact set-similarity self-join over the documents table —
    all pairs whose distinct word-5-gram shingle sets (the jaccard
    family's shingle_cte definition) have jaccard ≥ 3/5, by PPJoin
    (operators/dedup.ppjoin: prefix filtering + positional filter on
    the rarest-first token order, verify via one array_intersect).
    Exact and LOSSLESS where minhash_near_dups is probabilistic — the
    pair each stage is compared against is brute-forced in unit tests.
    τ rational (3/5) so every filter is bigint arithmetic; the only
    float is the output jaccard, one two-integer IEEE division rounded
    6dp on both engines."""
    d = load(spark, sf_dir, "documents")
    r = DD.ppjoin(d, "doc_id", "text", tau_num=3, tau_den=5, n=5)
    return r.select(
        F.col("a").cast("bigint").alias("a"),
        F.col("b").cast("bigint").alias("b"),
        "overlap",
        "la",
        "lb",
        "jaccard",
    )
