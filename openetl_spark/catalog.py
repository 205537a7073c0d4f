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
from openetl_spark.queries import analytics_r10 as _analytics_r10  # noqa: F401,E402
from openetl_spark.queries import analytics_r11 as _analytics_r11  # noqa: F401,E402

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
# entries of queries() in iteration order. Round-10 rotation (VERDICT
# r09 #2, staleness burn-down): CORRECTNESS_r09 re-greened all 50 of
# its window (incl. the four r09 rechecks — pruned). Slots go first to
# the FIFTEEN new r10 queries (no driver row anywhere), then the
# TEN DRIVER_RECHECK entries (code or oracle changed this round:
# the triangle/hyperball/landmark-hops/node2vec layouts and their
# consumers, the kcore round-1 shortcut, the ADVICE fixes), then the
# COMPLETE 25-entry r05-latest queue enumerated by the r09 rotation
# (after this round nothing anywhere is r05-latest) — exactly 50;
# the 44 r06-latest rows (alphabetical) are the r11 queue head.
# Every query, windowed or not, is re-pinned every pytest run by
# tests/test_oracle.py, which mirrors the driver's compare exactly.
# ---------------------------------------------------------------------

# Queries whose CODE or ORACLE changed after their last driver-green
# row — they hold window slots even though a (stale) green row exists,
# and the window-integrity test exempts them from its "wasted slot"
# check. Prune entries from this set once the next CORRECTNESS record
# re-greens them. (All 4 r09 entries re-greened in CORRECTNESS_r09 —
# pruned, per VERDICT r09 #2.)
DRIVER_RECHECK: set[str] = {
    # r10: consumers of the new persisted layouts (_triangle_layout,
    # _hyperball_layout, _landmark_hops_layout, _node2vec_layout) —
    # plans changed; node2vec_walks' oracle text also moved into the
    # shared _node2vec_walk_ctes fragment:
    "graph_triangles",
    "local_clustering",
    "trussness_parts",
    "harmonic_centrality",
    "hyperball_cells",
    "hyperball_report",
    "hyperball_harmonic_report",
    "node2vec_walks",
    # kcore round-1 degree shortcut (BASELINE r10 notes):
    "kcore_parts",
    # ADVICE r09 fix: the suppression oracle is now null-safe
    # (IS NOT DISTINCT FROM) — oracle text changed:
    "k_anonymity_enforced",
    # NOT rechecked: dsir_scores (the r10 layout-builder change is
    # write-path-only — atomic temp+replace upsert; persisted integers
    # and compare path bit-identical) and ams_f2_report /
    # ams_join_size_report (the undersized-sketch guard adds a
    # raise-only branch on the per-key count relation that cannot fire
    # at catalog regimes — emitted values bit-identical). All three
    # are re-pinned locally every pytest run.
}

DRIVER_PRIORITY: list[str] = [
    # --- r10 additions (no driver row yet) ---
    "effective_diameter_report",
    "dsir_retarget",
    "dsir_mixture_report",
    "mondrian_hierarchical",
    "node2vec_skipgram_pairs",
    "bipartite_stats",
    "part_butterflies",
    "core_numbers_parts",
    "dsir_mixture_sample",
    "landmark_path_counts",
    "landmark_stress",
    "funnel_steps",
    "cluster_purity_report",
    "funnel_time_to_convert",
    "funnel_by_segment",
    # --- changed since their last driver row (DRIVER_RECHECK) ---
    "graph_triangles",
    "local_clustering",
    "trussness_parts",
    "harmonic_centrality",
    "hyperball_cells",
    "hyperball_report",
    "hyperball_harmonic_report",
    "node2vec_walks",
    "kcore_parts",
    "k_anonymity_enforced",
    # --- the complete r05-latest burn-down queue (the 25 oldest rows
    # anywhere; after this round nothing has an r05-era latest green) ---
    "join_anti",
    "join_broadcast",
    "join_cross",
    "join_inner",
    "join_left_agg",
    "join_semi",
    "length_bias_audit",
    "pivot_linestatus",
    "pq_recall_report",
    "q1_pricing",
    "q20_dominant_supplier",
    "q22_global_sales",
    "q3_top_orders",
    "q5_regional_revenue",
    "range_join_events",
    "rollup_flags",
    "seasonal_anomalies",
    "semantic_dedup",
    "temperature_sampling",
    "topk_orders",
    "transform_chain",
    "window_frame",
    "window_lag",
    "window_rank",
    "winnow_overlap",
    # r11 queue, in order: the 44 r06-latest rows alphabetically
    # (ann_recall_report, approx_sketches, array_funcs, audio_near_duplicates,
    # curation_pipeline, date_funcs, decontaminate_spans, dedup_components,
    # dedup_exact, dedup_keep_best, doc_fingerprint,
    # duplication_report, embedding_knn, exact_substring_dedup,
    # exact_substring_incremental, exact_substring_spans,
    # image_near_duplicates, incremental_dedup, jaccard_near_dups,
    # langid_confusion, lateral_join_topn, lsh_recall_report,
    # lsh_similarity_join, math_funcs, minhash_error_report,
    # minhash_near_dups, ngram_novelty, pagerank_nations,
    # personalized_pagerank, pmi_collocations, q11_important_value,
    # quality_score, recursive_cte_tree, schema_introspect,
    # session_windows, set_except, simhash_dedup, skyline_parts,
    # sliding_counts, sql_passthrough, string_funcs, text_stats,
    # time_weighted_avg, tumbling_hourly), then r07-latest
    # alphabetically. All locally re-pinned every pytest run.
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
