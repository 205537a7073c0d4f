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
# entries of queries() in iteration order. Round-8 rotation (VERDICT
# r07 #1, staleness burn-down): after r07 every one of the 180 catalog
# queries has a green driver row and nothing is older than r03-latest.
# Slots go first to the new r08 queries (no driver row anywhere) and
# any DRIVER_RECHECK entries (code/oracle changed since their last
# green), then the complete 7-entry r03-latest queue — after this
# round nothing is r03-latest — then the 38-entry r04-latest queue,
# then the oldest r05-latest rows until the window holds exactly 50.
# Each new r08 query added at the head pops one entry off the r05
# tail into the enumerated r09 queue below. Every query, windowed or
# not, is re-pinned every pytest run by tests/test_oracle.py, which
# mirrors the driver's compare exactly.
# ---------------------------------------------------------------------

# Queries whose CODE or ORACLE changed after their last driver-green
# row — they hold window slots even though a (stale) green row exists,
# and the window-integrity test exempts them from its "wasted slot"
# check. Prune entries from this set once the next CORRECTNESS record
# re-greens them. (All 4 r07 entries re-greened in CORRECTNESS_r07 —
# pruned, per VERDICT r07 #1.)
DRIVER_RECHECK: set[str] = {
    # r08 changes (code or oracle text differs from what the r07
    # driver rows greened):
    "graph_communities",   # LPA labeling now persisted as a layout artifact; oracle re-derives from the parquet
    "graph_modularity",    # scores the persisted LPA partition instead of recomputing the rounds inline
    # the remaining graph family now reads the persisted corpus-wide
    # edge layout (_graph_layout) instead of re-deriving the lineitem
    # self-join per query — oracles unchanged (still derive co/cow
    # from lineitem), code changed:
    "graph_triangles",
    "bfs_hops_parts",
    "graph_assortativity",
    "kcore_parts",
    "sssp_parts",
}

DRIVER_PRIORITY: list[str] = [
    # --- r08 additions (no driver row yet) ---
    "ppjoin_pairs",
    "louvain_communities",
    "unigram_lm_stats",
    "kmv_cells",
    "kmv_intersection_report",
    "ktruss_core",
    "containment_pairs",
    "weighted_sample_docs",
    # --- changed since their last driver row (DRIVER_RECHECK) ---
    "graph_communities",
    "graph_modularity",
    "graph_triangles",
    "bfs_hops_parts",
    "graph_assortativity",
    "kcore_parts",
    "sssp_parts",
    # --- the complete r03-latest refresh queue (the 7 oldest rows
    # anywhere; after this round nothing has an r03-era latest green) ---
    "scalar_subquery",
    "stats_agg",
    "stratified_sample",
    "string_agg_nations",
    "unpivot_measures",
    "value_histogram",
    "vocab_topk",
    # --- the complete r04-latest burn-down (38 rows) ---
    "bm25_topk",
    "bpe_pair_counts",
    "chunk_bm25_topk",
    "cluster_profile",
    "cms_token_counts",
    "contrastive_negatives",
    "corpus_report",
    "declarative_setops",
    "document_chunks",
    "domain_mix_sample",
    "dq_report",
    "embedding_quantize",
    "event_transitions",
    "funnel_conversion",
    "histogram_quantiles",
    "hot_keys_report",
    "hybrid_search_rrf",
    "ivf_knn",
    "ivf_pq_knn",
    "keyword_extraction",
    "kl_domain_shift",
    "length_band_filter",
    "llm_data_pipeline",
    "multires_rollup",
    "ngram_lm_score",
    "pandas_normalize",
    "per_group_sample",
    "perplexity_buckets",
    # r09 queue, in order: the ten r04-latest tails displaced by the
    # KMV/ktruss/containment/weighted-sample additions and the five
    # graph-layout rechecks (pq_knn, pq_rerank_knn, retention_cohorts,
    # rollup_anomalies, salted_join_segments, scd2_history,
    # sequence_packing, training_shuffle, vocab_sketch_topk,
    # zipf_fit), then the r05-latest
    # rows alphabetically — agg_distinct (displaced by ppjoin_pairs),
    # asof_join_events (displaced by louvain_communities),
    # connector_slice (displaced by unigram_lm_stats), cube_flags
    # (displaced by the graph_communities recheck),
    # declarative_star_join (displaced by the graph_modularity
    # recheck), then the remaining 33 r05 rows. All locally re-pinned
    # every pytest run.
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
