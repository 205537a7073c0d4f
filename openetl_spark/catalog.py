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
# entries of queries() in iteration order. Round-6 rotation (VERDICT
# r05 #1): slots go first to the two new r06 queries (no driver row
# anywhere), then every query whose code or oracle changed after its
# r05 green (DRIVER_RECHECK), then the complete 21-entry r02 refresh
# queue (after this round nothing has an r02-era latest green), then
# the oldest r03 rows (TPC-H batch + extended function sweeps); the
# remaining 26 r03 entries queue for r07 and are enumerated below.
# Every query, windowed or not, is pinned every run by
# tests/test_oracle.py, which mirrors the driver's compare exactly.
# ---------------------------------------------------------------------

# Queries whose CODE or ORACLE changed after their last driver-green
# row — they hold window slots even though a (stale) green row exists,
# and the window-integrity test exempts them from its "wasted slot"
# check. Prune entries from this set once the next CORRECTNESS record
# re-greens them.
DRIVER_RECHECK: set[str] = {
    # r06 changes (code or oracle text differs from what the r05 driver
    # run greened):
    "simhash_dedup",        # k=16→6 + portable fingerprints + NEW two-stage oracle
    "pmi_collocations",     # n_bigrams normalized pre-min_count (true PMI), both engines
    "langid_confusion",     # floor-fixed frac_of_lang rounding, both engines
    "ann_recall_report",    # probe distances rounded to 6dp pre-argsort, both engines
    "ngram_novelty",        # first-seen re-agg rewrite (result-identical plan change)
    "approx_sketches",      # countDistinct split from imperative aggs (12.7s->0.9s, result-identical)
    # oracle TEXT rewritten onto the consolidated jaccard_ctes() /
    # _CLOSURE_CTES fragments (semantically identical renderings, but
    # the r05 green rows checked the old SQL text):
    "jaccard_near_dups",
    "minhash_near_dups",
    "dedup_components",
    "dedup_keep_best",
    "curation_pipeline",
    "incremental_dedup",
    "minhash_error_report",
    # r06-s2: the sf0.1 oracle sweep found both vacuous at scale —
    # thresholds rewritten to SF-invariant forms (code + oracle)
    "q11_important_value",
    "set_except",
    "lsh_similarity_join",  # float64-cast oracle + symmetric pre-round epsilon
}

DRIVER_PRIORITY: list[str] = [
    # --- r06 additions (no driver row yet) ---
    "image_near_duplicates",
    "audio_near_duplicates",
    "exact_substring_spans",
    "exact_substring_dedup",
    "duplication_report",
    "decontaminate_spans",
    "lsh_recall_report",
    "exact_substring_incremental",
    "recursive_cte_tree",
    "variant_funcs",
    "lateral_join_topn",
    # r06 third session: graph / skyline / interval analytics. These
    # four displace the two r03 TPC-H tail refreshes (q2/q4) and the
    # two simplest r02 join refreshes (join_right, join_full_outer) —
    # never-checked new queries outrank refreshes of locally-pinned
    # stable rows; the displaced four lead the r07 refresh queue.
    "pagerank_nations",
    "skyline_parts",
    "time_weighted_avg",
    "attribution_last_touch",
    "graph_triangles",      # displaces union_all_counts (r02 → r07 queue)
    "bfs_hops_parts",       # displaces set_union (r02 → r07 queue)
    "graph_assortativity",  # displaces set_intersect (r02 → r07 queue)
    "personalized_pagerank",  # displaces decimal_agg (r02 → r07 queue)
    "kcore_parts",          # displaces json_funcs (r02 → r07 queue)
    # --- changed since their r05 driver row (DRIVER_RECHECK) ---
    "simhash_dedup",
    "pmi_collocations",
    "langid_confusion",
    "ann_recall_report",
    "ngram_novelty",
    "jaccard_near_dups",
    "minhash_near_dups",
    "dedup_components",
    "dedup_keep_best",
    "curation_pipeline",
    "incremental_dedup",
    "minhash_error_report",
    "approx_sketches",
    "q11_important_value",
    "set_except",
    "lsh_similarity_join",
    # --- refresh queue: ALL 21 queries whose latest driver green is
    # r02 (the oldest rows anywhere) — after this round nothing has an
    # r02-era latest green ---
    "array_funcs",
    "date_funcs",
    "dedup_exact",
    "doc_fingerprint",
    "embedding_knn",
    "math_funcs",
    "quality_score",
    "schema_introspect",
    "session_windows",
    "sliding_counts",
    "sql_passthrough",
    "string_funcs",
    "text_stats",
    "tumbling_hourly",
    # --- then the oldest r03 rows: the TPC-H r03 batch. Remaining
    # refresh pool queued for r07 — first the four rows displaced by
    # the third-session additions: join_right + join_full_outer +
    # union_all_counts + set_union + set_intersect + decimal_agg +
    # json_funcs (r02; the only r02-era rows left after this round) and
    # q2_min_cost_supplier + q4_order_priority (r03); then the r03
    # remainder (38):
    # pivot_dynamic + array_funcs_extended (displaced by the
    # exact_substring_spans/_dedup additions),
    # q15_top_supplier (displaced by duplication_report),
    # q14_promo_share (displaced by decontaminate_spans),
    # q13_order_distribution (displaced by lsh_recall_report),
    # q12_shipping_delay (displaced by the set_except recheck; q11's
    # tail slot moved up into the recheck block),
    # q10_returned_items (displaced by the lsh_similarity_join recheck),
    # q9_product_profit (displaced by exact_substring_incremental),
    # q8_market_share (displaced by recursive_cte_tree),
    # q7_volume_shipping (displaced by variant_funcs),
    # q6_forecast_revenue (displaced by lateral_join_topn),
    # date_funcs_extended (displaced by the approx_sketches recheck),
    # decontaminate_ngram, edit_distance, embedding_near_dup_exact,
    # filtered_agg, lang_id_oracle, map_funcs, null_safe_join,
    # percentile_exact, pii_redaction, q16_supplier_cnt,
    # q17_small_quantity, q18_large_orders, q19_discounted_revenue,
    # q21_waiting_supplier, rarity_score, regression_aggs,
    # repetition_stats, scalar_subquery, stats_agg, stratified_sample,
    # string_agg_nations, string_funcs_extended, unpivot_measures,
    # value_histogram, vocab_topk, window_ranking_extras.
    # Every query is pinned locally every pytest run regardless. ---
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
