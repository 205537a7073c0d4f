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
# entries of queries() in iteration order. Round-7 rotation (VERDICT
# r06 #1, staleness burn-down): slots go first to the SEVEN new r07
# queries (no driver row anywhere), then every query whose code or
# oracle changed after its last green (DRIVER_RECHECK, 4), then ALL 7
# queries whose latest driver green is r02 (after this round nothing
# is r02-latest), then 32 of the 39 remaining r03-latest rows
# (window_ranking_extras moved into the recheck block); the final 7
# r03 rows — each displaced by a never-checked r07 addition, all
# simple single-table shapes locally pinned every pytest run — are
# the enumerated r08 queue at the list's tail. Every query, windowed
# or not, is re-pinned every run by tests/test_oracle.py, which
# mirrors the driver's compare exactly.
# ---------------------------------------------------------------------

# Queries whose CODE or ORACLE changed after their last driver-green
# row — they hold window slots even though a (stale) green row exists,
# and the window-integrity test exempts them from its "wasted slot"
# check. Prune entries from this set once the next CORRECTNESS record
# re-greens them. (All 16 r06 entries re-greened in CORRECTNESS_r06 —
# pruned.)
DRIVER_RECHECK: set[str] = {
    # r07 changes (code or oracle text differs from what the r06/r03
    # driver rows greened):
    "window_ranking_extras",   # histogram-rank rewrite, no 5-partition window (r03 green was the window form)
    "attribution_last_touch",  # revenue rounding -> _round_fixed on both engines
    "variant_funcs",           # parse_json -> try_parse_json (leniency on malformed docs)
    "kcore_parts",             # non-convergence RuntimeWarning added (result-identical; defensive recheck)
}

DRIVER_PRIORITY: list[str] = [
    # --- r07 additions (no driver row yet) ---
    "graph_communities",
    "sssp_parts",
    "hll_cells",
    "bloom_decontaminate",
    "graph_modularity",
    "hll_distinct_report",
    "edit_similarity_pairs",
    # --- changed since their last driver row (DRIVER_RECHECK) ---
    "window_ranking_extras",
    "attribution_last_touch",
    "variant_funcs",
    "kcore_parts",
    # --- the complete r02-latest refresh queue (the 7 oldest rows
    # anywhere; after this round nothing has an r02-era latest green) ---
    "set_union",
    "set_intersect",
    "json_funcs",
    "join_right",
    "join_full_outer",
    "union_all_counts",
    "decimal_agg",
    # --- r03-latest burn-down (36 of 39; window_ranking_extras is in
    # the recheck block above). First the two TPC-H tails displaced in
    # r06, then the sweeps, then the TPC-H r03 batch, then the rest. ---
    "q2_min_cost_supplier",
    "q4_order_priority",
    "pivot_dynamic",
    "array_funcs_extended",
    "date_funcs_extended",
    "string_funcs_extended",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_shipping_delay",
    "q13_order_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q21_waiting_supplier",
    "decontaminate_ngram",
    "edit_distance",
    "embedding_near_dup_exact",
    "filtered_agg",
    "lang_id_oracle",
    "map_funcs",
    "null_safe_join",
    "percentile_exact",
    "pii_redaction",
    "rarity_score",
    "regression_aggs",
    "repetition_stats",
    # r08 queue (r03-latest, locally pinned every run):
    # scalar_subquery (displaced by edit_similarity_pairs),
    # stats_agg (displaced by hll_distinct_report),
    # stratified_sample (displaced by graph_modularity),
    # string_agg_nations (displaced by the bloom_decontaminate
    # addition), unpivot_measures, value_histogram, vocab_topk.
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
