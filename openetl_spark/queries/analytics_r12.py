"""Round-12 analytics queries: the betweenness SCALAR off the C150
pair-dependency rationals as a deterministic scaled floor sum (C157),
NMI as hashed exact integers via a persisted micro-nat dictionary
(C158), and frequent triples — the A-priori level-3 extension of the
C156 association rules (C159).

Reference parity note: the reference (OpenETL, TypeScript) has no
analytics engine — these are build-extension components mandated by
the driver brief (LLM-scale curation/graph analytics), implemented
Spark-first with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openetl_spark.operators import graph as G
from openetl_spark.queries.base import query
from openetl_spark.queries.analytics_r09 import (
    _CORE_LM_CTES,
    _core_and_landmarks,
)
from openetl_spark.queries.analytics_r10 import (
    _path_counts_ctes,
    _path_counts_layout,
)


# ---------------------------------------------------------------------
# C157 — the betweenness scalar (VERDICT r11 #3): bc(v) = Σ_pairs
# δ_st(v) rendered as the scaled floor sum Σ (2^20·dep_num) div
# dep_den — exact bigints end to end, no float anywhere, strictly
# tighter than a boolean-pinned estimate.
# ---------------------------------------------------------------------

_BC_K = 1 << 20
_BC_DEN_BOUND = 1 << 43  # 2^(63-20): K·(dep_num mod dep_den) must fit

# The C150 dependency relation as a reusable CTE suffix (the
# landmark_betweenness oracle's SELECT, named).
_DEPS_CTES = f"""{_CORE_LM_CTES},
    {_path_counts_ctes(6)},
    pc AS (SELECT source, node, hop, sigma FROM v6),
    dlm AS (
      SELECT source, node AS target, hop AS d_st, sigma AS sigma_st
      FROM pc WHERE node IN (SELECT node FROM lm) AND source < node),
    deps AS (
      SELECT a.node,
             CAST(a.sigma * b.sigma AS BIGINT) AS dep_num,
             CAST(d.sigma_st AS BIGINT) AS dep_den
      FROM pc a
      JOIN pc b ON a.node = b.node AND a.source < b.source
      JOIN dlm d ON d.source = a.source AND d.target = b.source
                AND a.hop + b.hop = d.d_st
      WHERE a.node <> a.source AND a.node <> b.source)"""


@query(
    "betweenness_report",
    f"""
    WITH {_DEPS_CTES}
    SELECT node,
           CAST(count(*) AS BIGINT) AS n_pairs,
           -- the engine's overflow guard, MIRRORED (the
           -- cluster_agreement discipline): K·(num mod den) must fit
           -- bigint, so den < 2^43 or both engines fail identically
           CAST(sum(
             {_BC_K} * (dep_num //
               CASE WHEN dep_den >= {_BC_DEN_BOUND}
                    THEN CAST(error('landmark_betweenness_scores: '
                              'dep_den exceeds 2^43 — the 2^20-scaled '
                              'floor term overflows bigint') AS BIGINT)
                    ELSE dep_den END)
             + ({_BC_K} * (dep_num % dep_den)) // dep_den
           ) AS BIGINT) AS bc_k
    FROM deps
    GROUP BY node
    """,
)
def q_betweenness_report(spark, sf_dir):
    """C157: the per-node betweenness SCALAR off the persisted σ
    layout (operators/graph.landmark_betweenness_scores — the C150
    completion, VERDICT r11 #3): bc(v) estimated over the w≥2 core's
    16 landmark pairs as Σ δ_st(v), rendered as the deterministic
    scaled floor sum bc_k = Σ (2^20·dep_num) div dep_den — every term
    an exact bigint computed overflow-safely as K·q + (K·r) div den,
    so the whole relation hashes cross-engine with NO float and no
    boolean-pinning: bc(v) = bc_k/2^20 within n_pairs/2^20 ≤ 1.2e-4.
    The pair-grain rationals stay available as landmark_betweenness
    (C150); this is the collapsed scalar a ranking consumer wants.
    Reads the persisted σ layout; the oracle re-derives the 6-round
    frontier-sum sweep from lineitem and mirrors the overflow guard
    via error()."""
    _, lm = _core_and_landmarks(spark, sf_dir)
    pc = _path_counts_layout(spark, sf_dir)
    deps = G.landmark_pair_dependencies(pc, lm)
    return G.landmark_betweenness_scores(deps, scale_bits=20)
