"""Head-to-head throughput: OUR engine running the same workload as
reference_bench.js — 600k rows through the same 3-step transform chain
(uppercase / concat / toNumber, strict JS-compat mode), plus the same
projection, via the declarative pipeline.

Two source variants:
* memory  — rows generated driver-side exactly like the reference's
  in-memory adapter (apples-to-apples on transform throughput);
* parquet — the sf0.1 lineitem table (600k rows) with the analogous
  chain, i.e. the engine ALSO paying real columnar IO and still
  expected to win.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openetl_spark.functions.transforms import apply_transforms
from openetl_spark.session import get_spark
from openetl_spark.spec import Transformation

N = int(os.environ.get("REF_BENCH_ROWS", "600000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CHAIN = [
    Transformation("uppercase", {"field": "flag", "to": "flag_up"}),
    Transformation("concat", {"properties": ["flag", "status"], "glue": "|", "to": "tag"}),
    Transformation("toNumber", {"field": "qty", "to": "qty_num"}),
]


def bench_memory(spark) -> dict:
    df = (
        spark.range(N)
        .select(
            F.col("id"),
            F.element_at(F.array(F.lit("a"), F.lit("n"), F.lit("r")), (F.col("id") % 3 + 1).cast("int")).alias("flag"),
            F.when(F.col("id") % 2 == 0, "o").otherwise("f").alias("status"),
            ((F.col("id") % 50) + 0.5).cast("string").alias("qty"),
            (F.lit(900.0) + (F.col("id") % 100000) / 7.0).alias("price"),
        )
    )
    t0 = time.perf_counter()
    out = apply_transforms(df, CHAIN, strict_js_compat=True)
    out.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    return {"engine": "openetl_spark-memory", "rows": N, "sec": round(sec, 3),
            "rows_per_sec": int(N / sec)}


def bench_parquet(spark) -> dict:
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").alias("id"),
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        F.col("l_quantity").cast("string").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )
    n = df.count()
    t0 = time.perf_counter()
    out = apply_transforms(df, CHAIN, strict_js_compat=True)
    out.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    return {"engine": "openetl_spark-parquet", "rows": n, "sec": round(sec, 3),
            "rows_per_sec": int(n / sec)}


if __name__ == "__main__":
    spark = get_spark("bench_vs_reference")
    spark.range(1).count()  # JVM warm
    for fn in (bench_memory, bench_parquet):
        print(json.dumps(fn(spark)))
