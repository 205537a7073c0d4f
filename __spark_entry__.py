"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship star-join at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for EVERY query (since r06 none is omitted —
approximate ops check as inequalities rendered as data, IVF against
its persisted quantizer parquet, count-min bit-exactly).

Implementations live in openetl_spark/catalog.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openetl_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Priority-ordered: queries without a prior driver-green row first
    # (the correctness gate samples a bounded prefix per round).
    return catalog.ordered_queries()


def oracle_sql() -> dict[str, str]:
    return catalog.ordered_oracle()
