"""Query catalog — the engine's public demonstration surface AND the
correctness contract: the driver runs each ``QUERIES[name](spark,
sf_dir)`` against ``ORACLE[name]`` (DuckDB, same parquet) and
hash-matches values with columns sorted by name.

r06 (VERDICT r05 #6): the 6.1k-line monolith is split into per-family
modules under ``openetl_spark/queries/`` — importing THIS module loads
them in the original registration order, so ``QUERIES``/``ORACLE``
iteration order, every query name, and every oracle rendering are
byte-identical to the pre-split catalog. This module remains the only
import surface (``from openetl_spark import catalog``); the family
modules are implementation layout.

Families: queries/relational (A-series, C1-C25), queries/dedup_text
(C26-C29 + shared jaccard/simhash oracle fragments),
queries/relational_extra (B-series, TPC-H depth, IVF layout),
queries/curation (r04 curation), queries/tpch_r05, queries/
warehouse_ann (PQ/declarative/warehouse), queries/lm_dedup (LM stats,
eval harnesses, incremental/semantic dedup), queries/media_mining
(r06 multimodal mining). Shared kernel (registries, @query, load):
queries/base.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from openetl_spark.queries.base import (  # noqa: F401
    ORACLE,
    QUERIES,
    load,
    query,
)

# Importing the family modules REGISTERS their queries; the import
# order below IS the pre-split registration order (dicts preserve it).
from openetl_spark.queries import relational as _relational  # noqa: F401,E402
from openetl_spark.queries import dedup_text as _dedup_text  # noqa: F401,E402
from openetl_spark.queries import relational_extra as _relational_extra  # noqa: F401,E402
from openetl_spark.queries import curation as _curation  # noqa: F401,E402
from openetl_spark.queries import tpch_r05 as _tpch_r05  # noqa: F401,E402
from openetl_spark.queries import warehouse_ann as _warehouse_ann  # noqa: F401,E402
from openetl_spark.queries import lm_dedup as _lm_dedup  # noqa: F401,E402
from openetl_spark.queries import media_mining as _media_mining  # noqa: F401,E402
from openetl_spark.queries import analytics_r06 as _analytics_r06  # noqa: F401,E402
from openetl_spark.queries import analytics_r07 as _analytics_r07  # noqa: F401,E402
from openetl_spark.queries import analytics_r08 as _analytics_r08  # noqa: F401,E402
from openetl_spark.queries import analytics_r09 as _analytics_r09  # noqa: F401,E402

# Re-exports referenced by tests / bench / external callers as
# catalog.<name> (the pre-split public surface).
from openetl_spark.queries.dedup_text import (  # noqa: F401,E402
    jaccard_ctes,
    shingle_cte,
)
from openetl_spark.queries.relational_extra import (  # noqa: F401,E402
    IVF_ORACLE_CENTROIDS,
    IVF_SIG_SQL,
    _corpus_sig,
    _ivf_layout,
)
from openetl_spark.queries.warehouse_ann import (  # noqa: F401,E402
    PQ_ORACLE_CODEBOOKS,
    _ivf_pq_layout,
    _pq_codebooks,
)
from openetl_spark.queries.lm_dedup import (  # noqa: F401,E402
    domain_mix_oracle,
    incremental_dedup_oracle,
    semantic_dedup_oracle,
    winnow_oracle,
)
from openetl_spark.queries.media_mining import (  # noqa: F401,E402
    MEDIA_FP_DIR,
    _media_fp_layout,
)


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Driver smoke query: the regional-revenue star join."""
    return QUERIES["q5_regional_revenue"](spark, sf_dir)


# ---------------------------------------------------------------------
# Driver-facing ordering. The correctness gate checks the first 50
# entries of queries() in iteration order. Round-9 rotation (VERDICT
# r08 #2, staleness burn-down): after r08 every one of the 188
# pre-r09 catalog queries has a green driver row and nothing is older
# than r04-latest. Slots go first to the TWENTY-THREE new r09 queries
# (no driver row anywhere — eight from the first session, fifteen
# from the second), then the four DRIVER_RECHECK entries (code or
# oracle changed since their r08 green), then the complete 10-entry
# r04-latest queue enumerated by the r08 rotation (after this round
# nothing is r04-latest anywhere), then the oldest r05-latest rows
# alphabetically until the window holds exactly 50 — 13 of the 38 r05
# rows fit; the 25 displaced tails are the enumerated r10 queue below.
# Every query, windowed or not, is re-pinned every pytest run by
# tests/test_oracle.py, which mirrors the driver's compare exactly.
# ---------------------------------------------------------------------

# Queries whose CODE or ORACLE changed after their last driver-green
# row — they hold window slots even though a (stale) green row exists,
# and the window-integrity test exempts them from its "wasted slot"
# check. Prune entries from this set once the next CORRECTNESS record
# re-greens them. (All 7 r08 entries re-greened in CORRECTNESS_r08 —
# pruned, per VERDICT r08 #2.)
DRIVER_RECHECK: set[str] = {
    # r09 changes: the graph/LPA layout signature moved to the
    # collision-resistant md5-XOR digest (ADVICE r08), which rewrites
    # the LPA_SIG_SQL fragment inside these three oracles' text:
    "graph_communities",
    "graph_modularity",
    "louvain_communities",
    # weight-magnitude guard added to the operator (VERDICT r08 #6):
    "weighted_sample_docs",
    # NOTE: the other graph-family consumers (triangles/bfs/kcore/
    # sssp/assortativity/ktruss) are NOT rechecked: their oracles are
    # untouched and they read the same persisted edge relation — only
    # the cache-staleness validation around it changed.
}

DRIVER_PRIORITY: list[str] = [
    # --- r09 additions (no driver row yet) ---
    "harmonic_centrality",
    "hyperball_cells",
    "hyperball_report",
    "dsir_scores",
    "walk_skipgram_pairs",
    "local_clustering",
    "link_prediction_features",
    "k_anonymity_report",
    "k_anonymity_enforced",
    "mondrian_regions",
    "t_closeness_report",
    "node2vec_walks",
    "link_prediction_hits",
    "ams_join_size_report",
    "hyperball_harmonic_report",
    "graph_random_walks",
    "trussness_parts",
    "louvain_multilevel",
    "containment_incremental",
    "ams_cells",
    "ams_f2_report",
    "qdigest_cells",
    "qdigest_rank_report",
    # --- changed since their last driver row (DRIVER_RECHECK) ---
    "graph_communities",
    "graph_modularity",
    "louvain_communities",
    "weighted_sample_docs",
    # --- the complete r04-latest burn-down queue (the 10 oldest rows
    # anywhere; after this round nothing has an r04-era latest green) ---
    "pq_knn",
    "pq_rerank_knn",
    "retention_cohorts",
    "rollup_anomalies",
    "salted_join_segments",
    "scd2_history",
    "sequence_packing",
    "training_shuffle",
    "vocab_sketch_topk",
    "zipf_fit",
    # --- the oldest r05-latest rows, alphabetically (13 of 38) ---
    "agg_distinct",
    "asof_join_events",
    "connector_slice",
    "cube_flags",
    "declarative_star_join",
    "declarative_window_topn",
    "embedding_winsorize",
    "filter_group_or",
    "gap_fill_interpolate",
    "gopher_quality",
    "gopher_repetition",
    "grouped_quantiles",
    "grouping_sets",
    # r10 queue, in order: the 25 displaced r05-latest tails
    # (join_anti, join_broadcast, join_cross, join_inner,
    # join_left_agg, join_semi, length_bias_audit, pivot_linestatus,
    # pq_recall_report, q1_pricing, q20_dominant_supplier,
    # q22_global_sales, q3_top_orders, q5_regional_revenue,
    # range_join_events — displaced late-r09 by the second-session
    # additions above — then rollup_flags, seasonal_anomalies,
    # semantic_dedup, temperature_sampling, topk_orders,
    # transform_chain, window_frame, window_lag, window_rank,
    # winnow_overlap), then the r06-latest rows alphabetically. All
    # locally re-pinned every pytest run.
]


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """QUERIES with DRIVER_PRIORITY names first, then the rest in
    registration order."""
    out = {n: QUERIES[n] for n in DRIVER_PRIORITY if n in QUERIES}
    out.update({n: f for n, f in QUERIES.items() if n not in out})
    return out


def ordered_oracle() -> dict[str, str]:
    """ORACLE in the same iteration order as ordered_queries()."""
    q = ordered_queries()
    return {n: ORACLE[n] for n in q if n in ORACLE}
