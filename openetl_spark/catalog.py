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
from openetl_spark.queries import analytics_r12 as _analytics_r12  # noqa: F401,E402

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
# entries of queries() in iteration order. Round-11 rotation (VERDICT
# r10 #2, staleness burn-down): CORRECTNESS_r10 re-greened all 50 of
# its window (incl. all ten r10 rechecks — pruned). Slots go first to
# the EIGHT new r11 queries (no driver row anywhere), then the EIGHT
# DRIVER_RECHECK entries (code or oracle changed this round: the
# LM-score and IVF-assignment layout consumers, the two advice-fix
# plan changes), then the first 34 of the 44-entry r06-latest queue
# enumerated by the r10 rotation — exactly 50; the 10 displaced r06
# tails are the r12 queue head.
# Every query, windowed or not, is re-pinned every pytest run by
# tests/test_oracle.py, which mirrors the driver's compare exactly.
# ---------------------------------------------------------------------

# Queries whose CODE or ORACLE changed after their last driver-green
# row — they hold window slots even though a (stale) green row exists,
# and the window-integrity test exempts them from its "wasted slot"
# check. Prune entries from this set once the next CORRECTNESS record
# re-greens them.
DRIVER_RECHECK: set[str] = {
    # r11 (all 10 r10 entries re-greened in CORRECTNESS_r10 — pruned):
    # consumers of the new _lm_scores_layout (plans changed — the LM
    # train+score pass moved offline):
    "ngram_lm_score",
    "perplexity_buckets",
    "llm_data_pipeline",
    # consumers now reading the IVF assignment off the partitioned
    # corpus layout (plans changed — the Arrow matmul pass is gone):
    "semantic_dedup",
    "cluster_profile",
    "cluster_purity_report",
    # ADVICE r10 fixes that changed plans: the ungrouped funnel's
    # global-agg zero-row arm; the Mondrian taxonomy now validated
    # through a groupBy+raise relation before the descent join:
    "funnel_steps",
    "mondrian_hierarchical",
    # NOT rechecked: node2vec_walks / node2vec_skipgram_pairs /
    # node2vec_training_pairs over the layout's absent-meta rebuild
    # (write-path-only — the artifact and compare path are
    # bit-identical when no crash window occurred), and
    # funnel_by_segment / funnel_time_to_convert (the funnel refactor
    # only touched the ungrouped aggregate arm; grouped plan and
    # funnel_user_times are bit-identical). All re-pinned locally
    # every pytest run.
}

DRIVER_PRIORITY: list[str] = [
    # --- r11 additions (no driver row yet) ---
    "landmark_betweenness",
    "cluster_contingency",
    "cluster_agreement_report",
    "node2vec_training_pairs",
    "cohort_retention",
    "l_diversity_recursive",
    "rfm_segments",
    "association_rules",
    # --- changed since their last driver row (DRIVER_RECHECK) ---
    "ngram_lm_score",
    "perplexity_buckets",
    "llm_data_pipeline",
    "semantic_dedup",
    "cluster_profile",
    "cluster_purity_report",
    "funnel_steps",
    "mondrian_hierarchical",
    # --- the r06-latest burn-down queue (VERDICT r10 #2; the 44 rows
    # enumerated by the r10 rotation, alphabetical — the first 34 fit
    # this window; the remaining 10 are the r12 queue head) ---
    "ann_recall_report",
    "approx_sketches",
    "array_funcs",
    "audio_near_duplicates",
    "curation_pipeline",
    "date_funcs",
    "decontaminate_spans",
    "dedup_components",
    "dedup_exact",
    "dedup_keep_best",
    "doc_fingerprint",
    "duplication_report",
    "embedding_knn",
    "exact_substring_dedup",
    "exact_substring_incremental",
    "exact_substring_spans",
    "image_near_duplicates",
    "incremental_dedup",
    "jaccard_near_dups",
    "langid_confusion",
    "lateral_join_topn",
    "lsh_recall_report",
    "lsh_similarity_join",
    "math_funcs",
    "minhash_error_report",
    "minhash_near_dups",
    "ngram_novelty",
    "pagerank_nations",
    "personalized_pagerank",
    "pmi_collocations",
    "q11_important_value",
    "quality_score",
    "recursive_cte_tree",
    "schema_introspect",
    # r12 queue, in order: the 10 r06-latest tails displaced by this
    # window (session_windows, set_except, simhash_dedup,
    # skyline_parts, sliding_counts, sql_passthrough, string_funcs,
    # text_stats, time_weighted_avg, tumbling_hourly), then
    # r07-latest alphabetically. All locally re-pinned every pytest
    # run.
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
