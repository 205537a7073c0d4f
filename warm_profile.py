"""5-run warm protocol (BASELINE.md r06/r07 discipline): run each
named query 5 consecutive times at sf0.1 with the noop sink and print
all five timings — first run is the cold/JIT placement, runs 2-5 are
the warm steady state. Used to attribute bench-drift readings to
cold-compile placement vs real plan regressions.

Usage: python warm_profile.py q1 q2 ...   (default: the r08 drift set)
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

R08_DRIFT_SET = [
    "schema_introspect",
    "pivot_dynamic",
    "map_funcs",
    "repetition_stats",
    "lsh_recall_report",
    "exact_substring_incremental",
]


def main() -> None:
    names = sys.argv[1:] or R08_DRIFT_SET
    spark = get_spark("openetl_spark_warm_profile")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    results: dict[str, list[float]] = {}
    for name in names:
        fn = catalog.QUERIES[name]
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        results[name] = runs
        warm = sorted(runs[1:])[1]  # median of the 4 warm runs' low-mid
        print(
            json.dumps({"query": name, "runs": runs, "warm_median": warm}),
            flush=True,
        )
    print(json.dumps({"metric": "warm_profile", "results": results}), flush=True)


if __name__ == "__main__":
    main()
