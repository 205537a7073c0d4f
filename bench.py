"""Benchmark: headline catalog queries at $SPARK_GRAFT_SF_DIR (default
sf0.1), local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full plan runs, nothing
collects to the driver) — measuring engine throughput, not toPandas
serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openetl_spark import catalog  # noqa: E402
from openetl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward the
# shuffle/join-heavy shapes that dominate at scale.
HEADLINE = [
    "q1_pricing",
    "q3_top_orders",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_share",
    "q18_large_orders",
    "q4_order_priority",
    "q13_order_distribution",
    "q22_global_sales",
    "decimal_agg",
    "join_broadcast",
    "join_left_agg",
    "agg_distinct",
    "window_rank",
    "window_frame",
    "topk_orders",
    "range_join_events",
    "asof_join_events",
    "session_windows",
    "tumbling_hourly",
    "json_funcs",
    "pandas_normalize",
    "filtered_agg",
    "percentile_exact",
    "stats_agg",
    "dedup_exact",
    "jaccard_near_dups",
    "minhash_near_dups",
    "simhash_dedup",
    "embedding_knn",
    "embedding_near_dup_exact",
    "ivf_knn",
    "lsh_similarity_join",
    "text_stats",
    "quality_score",
    "lang_id_oracle",
    "doc_fingerprint",
    "transform_chain",
    "connector_slice",
]


def main() -> None:
    spark = get_spark("openetl_spark_bench")
    # warm the JVM + file listing with a trivial action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = catalog.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "catalog_headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
