"""Round-11 analytics queries: the betweenness completion of the σ
layout as exact landmark-pair rationals (VERDICT r10 #5, C150), the
clustering-agreement contingency + NMI/ARI report next to purity
(#6, C151), the word2vec negative-sampling training table off the
persisted biased walk corpus (#7, C152), weekly cohort retention
(C153), recursive (c,l)-diversity (C154), and RFM segmentation
(C155).

Reference parity note: the reference (OpenETL, TypeScript) has no
analytics engine — these are build-extension components mandated by
the driver brief (LLM-scale curation/graph analytics), implemented
Spark-first with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openetl_spark.operators import graph as G
from openetl_spark.operators import similarity as S
from openetl_spark.queries.base import query
from openetl_spark.queries.analytics_r09 import (
    _N2V_LEN,
    _N2V_SEED,
    _N2V_WO,
    _N2V_WR,
    _N2V_WS,
    _node2vec_layout,
    _node2vec_walk_ctes,
)
from openetl_spark.queries.analytics_r10 import (
    _FULL_LM_CTES,
    _full_graph_and_landmarks,
    _path_counts_ctes,
    _path_counts_full_layout,
)
from openetl_spark.queries.relational_extra import (
    IVF_ORACLE_CENTROIDS,
    IVF_SIG_SQL,
    _ivf_layout,
)
from openetl_spark.operators.curation import hash_bucket_sql


# ---------------------------------------------------------------------
# C150 — landmark-pair betweenness dependencies (Brandes δ_st(v)) as
# exact bigint rationals off the persisted σ layout: the betweenness
# completion stress (C147b) deliberately left out because the scalar
# sum divides per pair. Per-pair num/den keeps everything integer.
# ---------------------------------------------------------------------


@query(
    "landmark_betweenness",
    f"""
    WITH {_FULL_LM_CTES},
    {_path_counts_ctes(6)},
    pc AS (SELECT source, node, hop, sigma FROM v6),
    dlm AS (
      SELECT source, node AS target, hop AS d_st, sigma AS sigma_st
      FROM pc WHERE node IN (SELECT node FROM lm) AND source < node)
    SELECT a.source, d.target, a.node,
           CAST(d.d_st AS INT) AS d_st,
           CAST(a.sigma * b.sigma AS BIGINT) AS dep_num,
           CAST(d.sigma_st AS BIGINT) AS dep_den
    FROM pc a
    JOIN pc b ON a.node = b.node AND a.source < b.source
    JOIN dlm d ON d.source = a.source AND d.target = b.source
              AND a.hop + b.hop = d.d_st
    WHERE a.node <> a.source AND a.node <> b.source
    """,
)
def q_landmark_betweenness(spark, sf_dir):
    """C150: per-(landmark-pair, node) Brandes pair dependencies
    δ_st(v) = σ_s(v)·σ_t(v)/σ_st over the FULL co-purchase graph's 16
    landmarks (operators/graph.landmark_pair_dependencies; r12 moved
    the substrate off the w≥2 core, which is a fragment forest at
    sf0.1 with zero mutually-reachable landmark pairs — the sf0.1
    sweep caught the vacuation) — the betweenness
    ingredient C147's stress left on the table because betweenness
    proper sums per-pair DIVISIONS (float, engine-unpinned addition
    order). Rendered as the exact bigint rational (dep_num, dep_den)
    at pair grain instead — the t_closeness num/den discipline: fully
    hash-checkable, rankable by cross-multiplication, and carrying
    strictly more information than the collapsed scalar (the pair
    profile separates bridge nodes from locally-central ones).
    Integrity invariant tested per pair: Σ_v dep_num =
    dep_den·(d_st−1). Reads the persisted full-graph σ layout; the
    oracle re-derives the 6-round frontier-sum sweep from lineitem."""
    _, lm = _full_graph_and_landmarks(spark, sf_dir)
    pc = _path_counts_full_layout(spark, sf_dir)
    return G.landmark_pair_dependencies(pc, lm)


# ---------------------------------------------------------------------
# C151 — clustering agreement (contingency + NMI/ARI) over the
# persisted IVF quantizer: purity (C149) rewards shattering into tiny
# clusters; ARI is chance-adjusted and exactly integer-rational.
# ---------------------------------------------------------------------

_IVF_ASSIGN_CTES = f"""cents AS (
      SELECT list_id, centroid
      FROM read_parquet('{IVF_ORACLE_CENTROIDS}')
      WHERE corpus_sig = ({IVF_SIG_SQL})
        AND n_lists = 16 AND seed = 42),
    assign AS (
      SELECT e.vec_id, e.label,
             (SELECT c.list_id FROM cents c
              ORDER BY list_aggregate(list_transform(c.centroid, x -> x*x), 'sum')
                       - 2 * list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid) ASC,
                       c.list_id ASC
              LIMIT 1) AS list_id
      FROM embeddings e),
    cells AS (
      SELECT list_id, label, count(*) AS n_cell FROM assign GROUP BY 1, 2),
    rows_ AS (SELECT list_id, sum(n_cell) AS n_cluster FROM cells GROUP BY 1),
    cols_ AS (SELECT label, sum(n_cell) AS n_label FROM cells GROUP BY 1)"""


@query(
    "cluster_contingency",
    f"""
    WITH {_IVF_ASSIGN_CTES}
    SELECT CAST(c.list_id AS INT) AS list_id,
           CAST(c.label AS INT) AS label,
           CAST(c.n_cell AS BIGINT) AS n_cell,
           CAST(r.n_cluster AS BIGINT) AS n_cluster,
           CAST(l.n_label AS BIGINT) AS n_label
    FROM cells c
    JOIN rows_ r USING (list_id)
    JOIN cols_ l USING (label)
    """,
)
def q_cluster_contingency(spark, sf_dir):
    """C151: the (cluster, label) contingency relation of the
    persisted IVF quantizer against the embeddings ground-truth
    labels (operators/similarity.cluster_contingency) — cell count
    plus both marginals, all exact bigint: the integer substrate
    every agreement statistic (purity, NMI, ARI) derives from, FULL
    oracled so the float metrics downstream stand on hash-pinned
    counts. Engine side reads the assignment off the IVF-partitioned
    corpus layout (zero compute); the oracle re-derives it from the
    centroid parquet."""
    _, data_path = _ivf_layout(spark, sf_dir, n_lists=16, seed=42)
    assigned = spark.read.parquet(data_path).select(
        F.col("ivf_list").cast("int").alias("list_id"),
        F.col("label").cast("int").alias("label"),
    )
    return S.cluster_contingency(assigned, "list_id", "label")


@query(
    "cluster_agreement_report",
    f"""
    WITH {_IVF_ASSIGN_CTES},
    s_ AS (SELECT CAST(sum(n_cell * (n_cell - 1)) // 2 AS BIGINT) AS pairs_both,
                  CAST(sum(n_cell) AS BIGINT) AS n
           FROM cells),
    a_ AS (SELECT CAST(sum(n_cluster * (n_cluster - 1)) // 2 AS BIGINT)
                    AS pairs_pred FROM rows_),
    b_ AS (SELECT CAST(sum(n_label * (n_label - 1)) // 2 AS BIGINT)
                    AS pairs_true FROM cols_),
    mi_ AS (
      SELECT sum((c.n_cell / CAST(s_.n AS DOUBLE))
                 * ln(CAST(s_.n AS DOUBLE) * c.n_cell
                      / (CAST(r.n_cluster AS DOUBLE) * l.n_label))) AS mi
      FROM cells c JOIN rows_ r USING (list_id)
                   JOIN cols_ l USING (label), s_),
    hu_ AS (SELECT -sum((n_cluster / CAST(s_.n AS DOUBLE))
                        * ln(n_cluster / CAST(s_.n AS DOUBLE))) AS hu
            FROM rows_, s_),
    hv_ AS (SELECT -sum((n_label / CAST(s_.n AS DOUBLE))
                        * ln(n_label / CAST(s_.n AS DOUBLE))) AS hv
            FROM cols_, s_)
    SELECT n,
           -- the engine's 128-bit overflow guard, MIRRORED (ADVICE
           -- r11): past n ~ 7e4 dense-agreement BOTH engines now fail
           -- loudly on the same predicate instead of the oracle
           -- silently widening into hugeint while Spark raises.
           CASE WHEN CAST(n * (n - 1) // 2 AS DOUBLE)
                     * CAST(greatest(pairs_both, pairs_pred, pairs_true)
                            AS DOUBLE)
                     >= 9223372036854775807e0 / 4
                THEN CAST(error('cluster_agreement: pair-count products '
                                'exceed the exact-bigint range') AS BIGINT)
                ELSE CAST(n * (n - 1) // 2 AS BIGINT) END AS pairs_total,
           pairs_both, pairs_pred, pairs_true,
           CAST(2 * ((n * (n - 1) // 2) * pairs_both
                     - pairs_pred * pairs_true) AS BIGINT) AS ari_num,
           CAST((n * (n - 1) // 2) * (pairs_pred + pairs_true)
                - 2 * pairs_pred * pairs_true AS BIGINT) AS ari_den,
           mi >= -1e-9 AS mi_nonneg,
           mi <= least(hu, hv) + 1e-9 AS mi_le_min_entropy
    FROM s_, a_, b_, mi_, hu_, hv_
    """,
)
def q_cluster_agreement_report(spark, sf_dir):
    """C151b: the chance-adjusted clustering-agreement report next to
    C149's purity (operators/similarity.cluster_agreement): exact
    bigint pair counts and the Adjusted Rand Index as the exact
    rational ari_num/ari_den (Hubert & Arabie 1985 — ARI is a ratio
    of integer pair counts once the permutation-model expectation is
    cleared to the common denominator C(n,2); no float anywhere in
    the hashed metric). NMI needs logs, so its float path stays out
    of the hashed output and is pinned behind two invariant booleans
    both engines must agree on (0 ≤ MI ≤ min entropy). Purity rewards
    shattering into tiny clusters; ARI is the metric that doesn't —
    the pair that closes the clustering-eval loop. Assignment reads
    the IVF-partitioned layout; the oracle re-derives it from the
    centroid parquet."""
    _, data_path = _ivf_layout(spark, sf_dir, n_lists=16, seed=42)
    assigned = spark.read.parquet(data_path).select(
        F.col("ivf_list").cast("int").alias("list_id"),
        F.col("label").cast("int").alias("label"),
    )
    return S.cluster_agreement(assigned, "list_id", "label")


# ---------------------------------------------------------------------
# C152 — the word2vec negative-sampling training table off the
# persisted biased walk corpus: positives (C144) + k deterministic
# md5-drawn negatives per positive — the complete, bit-reproducible
# embedding training set.
# ---------------------------------------------------------------------

_N2V_NEG_K, _N2V_NEG_DENS = 2, 64
# The auto-scaled bucket count (constant ~density candidates per
# positive at ANY corpus size), rendered for the oracle as a scalar
# subquery over the same walk relation.
_N2V_NEG_B_SQL = (
    f"(SELECT greatest(1, count(DISTINCT node) // {_N2V_NEG_DENS}) "
    "FROM walks)"
)


@query(
    "node2vec_training_pairs",
    _node2vec_walk_ctes(_N2V_LEN, _N2V_SEED, _N2V_WR, _N2V_WS, _N2V_WO)
    + f""",
pairs AS (
  SELECT a.node AS u, b.node AS v, CAST(count(*) AS BIGINT) AS n
  FROM walks a JOIN walks b
    ON a.walker = b.walker AND a.step <> b.step
   AND abs(a.step - b.step) <= 2
  GROUP BY 1, 2),
vocab AS (SELECT DISTINCT node AS negative FROM walks),
cand AS (
  SELECT negative, {hash_bucket_sql('negative', _N2V_NEG_B_SQL)} AS cb
  FROM vocab),
probed AS (
  SELECT u, v, n,
         {hash_bucket_sql(
             "CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR) || ':p'",
             _N2V_NEG_B_SQL,
         )} AS pb
  FROM pairs),
ranked AS (
  SELECT p.u, p.v, p.n, c.negative,
         row_number() OVER (
           PARTITION BY p.u, p.v
           ORDER BY md5(CAST(p.u AS VARCHAR) || ':' || CAST(p.v AS VARCHAR)
                        || ':' || CAST(c.negative AS VARCHAR)),
                    c.negative) AS rnk
  FROM probed p JOIN cand c
    ON p.pb = c.cb AND c.negative <> p.u AND c.negative <> p.v)
SELECT u, v, n, negative, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {_N2V_NEG_K}
""",
)
def q_node2vec_training_pairs(spark, sf_dir):
    """C152: the complete word2vec training table over the persisted
    BIASED walk corpus (operators/graph.skipgram_negative_pairs):
    skip-gram (center, context) positives within a ±2-step window
    (C144's relation) plus k=2 deterministic negatives per positive —
    the contrastive_negatives md5-bucket discipline (each positive
    probes ONE md5-chosen bucket of the walked-node vocabulary, ranks
    by md5(u:v:cand), keeps k) applied to the _node2vec_layout
    corpus, so the ENTIRE training set — walks, positives, negative
    draws — is bit-reproducible across runs, engines, and
    partitionings. Sample once, train forever, audit every epoch. The
    bucket count auto-scales as max(1, |vocab| div {_N2V_NEG_DENS}) —
    constant per-positive candidate volume at any corpus size, the
    modulus rendered in the oracle as the same scalar subquery. The
    oracle re-derives the biased walks from lineitem (every
    replication draw) via the shared CTE fragment, then applies the
    identical draw."""
    walks = spark.read.parquet(_node2vec_layout(spark, sf_dir))
    return G.skipgram_negative_pairs(
        walks, window=2, k=_N2V_NEG_K, density=_N2V_NEG_DENS
    )


# ---------------------------------------------------------------------
# C153 — cohort retention matrix: the product-analytics staple next to
# the C148 funnel, all exact integers + one IEEE division.
# ---------------------------------------------------------------------

from openetl_spark.operators import analytics as A  # noqa: E402
from openetl_spark.operators import curation as C  # noqa: E402
from openetl_spark.queries.base import load  # noqa: E402


@query(
    "cohort_retention",
    """
    WITH f AS (
      SELECT user_id, min(ts) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY 1),
    c AS (
      SELECT user_id,
             strftime(DATE '1970-01-01'
                      + CAST((date_diff('day', DATE '1970-01-01',
                                        CAST(t0 AS DATE)) // 7) * 7 AS INT),
                      '%Y-%m-%d') AS cohort,
             date_diff('day', DATE '1970-01-01', CAST(t0 AS DATE)) // 7
               AS cidx
      FROM f),
    sizes AS (
      SELECT cohort, cidx, CAST(count(*) AS BIGINT) AS n_cohort
      FROM c GROUP BY 1, 2),
    a AS (
      SELECT DISTINCT c.cohort, c.cidx,
             CAST(date_diff('day', DATE '1970-01-01', CAST(e.ts AS DATE))
                  // 7 - c.cidx AS INT) AS period,
             e.user_id
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE date_diff('day', DATE '1970-01-01', CAST(e.ts AS DATE)) // 7
            >= c.cidx),
    r AS (
      SELECT cohort, cidx, period, CAST(count(*) AS BIGINT) AS n_active
      FROM a GROUP BY 1, 2, 3)
    SELECT r.cohort, r.period, s.n_cohort, r.n_active,
           CAST(r.n_active AS DOUBLE) / s.n_cohort AS retention
    FROM r JOIN sizes s USING (cohort, cidx)
    """,
)
def q_cohort_retention(spark, sf_dir):
    """C153: weekly cohort retention over the event stream
    (operators/analytics.cohort_retention, grain_days=7 — the
    standard growth-team grain; the testdata stream spans 30 days, so
    weekly buckets give a real 5×5 triangle where months collapse to
    one cell): users cohorted by the week bucket of their first
    signup, activity tracked per week offset; (cohort, period,
    n_cohort, n_active, retention). Buckets compare as the integer
    epoch-day index div 7 (months_between is a float of fractional
    months), the cohort renders as its bucket-start date string, and
    retention is ONE IEEE division of exact bigints — hash-exact
    cross-engine. No window function, no per-user sort; the widest
    state is one row per (user, active-week)."""
    e = load(spark, sf_dir, "events")
    return A.cohort_retention(e, grain_days=7)


# ---------------------------------------------------------------------
# C154 — recursive (c, l)-diversity: the skew-bounding fourth privacy
# metric next to the k/l/t triad, exact integers end-to-end.
# ---------------------------------------------------------------------

_LDR_L, _LDR_CN, _LDR_CD = 3, 2, 1


@query(
    "l_diversity_recursive",
    f"""
    WITH vc AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS band,
             count(*) AS rc
      FROM customer GROUP BY 1, 2, 3),
    g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(sum(rc) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_distinct,
             list_sort(list(rc), 'DESC') AS rs
      FROM vc GROUP BY 1, 2),
    t AS (
      SELECT c_nationkey, c_mktsegment, n, n_distinct,
             CAST(rs[1] AS BIGINT) AS r1,
             CAST(CASE WHEN n_distinct >= {_LDR_L}
                       THEN n - list_aggregate(rs[1:{_LDR_L - 1}], 'sum')
                       ELSE 0 END AS BIGINT) AS tail_sum
      FROM g)
    SELECT c_nationkey, c_mktsegment, n, n_distinct, r1, tail_sum,
           {_LDR_CD} * r1 < {_LDR_CN} * tail_sum AS satisfied
    FROM t
    """,
)
def q_l_diversity_recursive(spark, sf_dir):
    """C154: recursive (c, l)-diversity audit of the customer relation
    (operators/curation.l_diversity_recursive) under the same QI
    (nation, segment) and sensitive balance band as C138's k/l audit
    — the skew metric: distinct-l counts varieties, but a group with
    l values and one at 99% still leaks; recursive (c, l) requires
    r_1 < c·(r_l + … + r_m) over the DESC-sorted value counts
    (l = {_LDR_L}, c = {_LDR_CN}/{_LDR_CD} cross-multiplied — no
    float anywhere). Per-group counts collapse through
    sort_array(collect_list(…)), bounded by the sensitive DOMAIN per
    group, never a corpus window."""
    d = load(spark, sf_dir, "customer").withColumn(
        "_band", F.floor(F.col("c_acctbal") / 2000).cast("bigint")
    )
    return C.l_diversity_recursive(
        d, ["c_nationkey", "c_mktsegment"], "_band",
        l=_LDR_L, c_num=_LDR_CN, c_den=_LDR_CD,
    )


# ---------------------------------------------------------------------
# C155 — RFM segmentation: the customer-value triage next to cohort
# retention, tiles via the histogram-rank machinery (never an ntile
# window over raw customers).
# ---------------------------------------------------------------------


@query(
    "rfm_segments",
    """
    WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS rd FROM orders),
    per AS (
      SELECT o_custkey AS custkey,
             CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
                            (SELECT rd FROM ref)) AS INT) AS r_days,
             CAST(count(*) AS BIGINT) AS f_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS m_cents
      FROM orders GROUP BY 1),
    t AS (
      SELECT *,
             ntile(3) OVER (ORDER BY r_days ASC, custkey ASC) AS r_tile,
             ntile(3) OVER (ORDER BY f_orders DESC, custkey ASC) AS f_tile,
             ntile(3) OVER (ORDER BY m_cents DESC, custkey ASC) AS m_tile
      FROM per)
    SELECT custkey, r_days, f_orders, m_cents,
           CAST(r_tile AS INT) AS r_tile,
           CAST(f_tile AS INT) AS f_tile,
           CAST(m_tile AS INT) AS m_tile,
           'R' || r_tile || 'F' || f_tile || 'M' || m_tile AS segment
    FROM t
    """,
)
def q_rfm_segments(spark, sf_dir):
    """C155: RFM customer segmentation over the orders relation
    (operators/analytics.rfm_scores): recency days against the corpus
    max date, order frequency, lifetime spend in exact cents (per-row
    round(price·100) — the same double rounds identically in both
    engines; summing first would accumulate float error), each split
    into terciles with tile 1 best and the combined 'R{r}F{f}M{m}'
    label. The tiles are ntile_from_pos arithmetic on
    grouped_exact_ranks' two-level histogram positions — three
    histogram passes, never an ntile window over raw customers (the
    low-cardinality-window trap; the oracle IS that naive window,
    which is exactly the point: same answer, scale-safe plan).
    Total (metric, custkey) ordering makes every tile deterministic
    cross-engine."""
    o = load(spark, sf_dir, "orders")
    return A.rfm_scores(o)


# ---------------------------------------------------------------------
# C156 — market-basket association rules off the persisted weighted
# co-purchase layout: support exact, confidence one IEEE division,
# lift an exact rational.
# ---------------------------------------------------------------------

from openetl_spark.queries.analytics_r07 import (  # noqa: E402
    CO_PURCHASE_W_CTE,
    _graph_layout,
)

_AR_MINSUP = 2


@query(
    "association_rules",
    f"""
    WITH {CO_PURCHASE_W_CTE},
    sup AS (SELECT x, y, w AS n_both FROM cow WHERE w >= {_AR_MINSUP}),
    items AS (
      SELECT l_partkey AS it,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_it
      FROM lineitem GROUP BY 1),
    total AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets
      FROM lineitem),
    directed AS (
      SELECT x AS antecedent, y AS consequent, n_both FROM sup
      UNION ALL
      SELECT y, x, n_both FROM sup)
    SELECT d.antecedent, d.consequent,
           CAST(d.n_both AS BIGINT) AS n_both,
           a.n_it AS n_ante,
           c.n_it AS n_cons,
           t.n_baskets,
           CAST(d.n_both AS DOUBLE) / a.n_it AS confidence,
           CAST(d.n_both * t.n_baskets AS BIGINT) AS lift_num,
           CAST(a.n_it * c.n_it AS BIGINT) AS lift_den
    FROM directed d
    JOIN items a ON a.it = d.antecedent
    JOIN items c ON c.it = d.consequent, total t
    """,
)
def q_association_rules(spark, sf_dir):
    """C156: market-basket association rules over the order baskets
    (operators/analytics.association_rules) — for every part pair
    co-purchased in ≥ {_AR_MINSUP} orders, both directed rules with
    exact support counts, confidence = n_both/n_ante (one IEEE
    division of bigints), and LIFT as the exact rational
    (n_both·n_baskets, n_ante·n_cons) — "lift > 1" decides by
    cross-multiplication, no float in the independence test. The pair
    relation reads the persisted weighted co-purchase layout (the
    basket self-join is paid once per corpus — the same artifact the
    graph family rides); item supports and the basket total are
    partial-agg relations, broadcast-joined. The oracle re-derives
    the pairs from lineitem."""
    _, edges_w_path = _graph_layout(spark, sf_dir)
    pairs = spark.read.parquet(edges_w_path).select(
        F.col("src").alias("x"), F.col("dst").alias("y"),
        F.col("w").alias("n_both"),
    )
    li = load(spark, sf_dir, "lineitem")
    return A.association_rules(
        li, "l_orderkey", "l_partkey", min_support=_AR_MINSUP, pairs=pairs
    )
