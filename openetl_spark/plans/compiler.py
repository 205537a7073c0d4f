"""Connector spec → DataFrame compiler (the engine's thin "planner").

The reference compiles its Connector into each backend's query dialect
per page fetch (`/root/reference/adapters/postgresql/src/index.ts:147-190`
builds SELECT/WHERE/ORDER BY/LIMIT strings; SURVEY.md §3.2). Here the
compile target is a *lazy DataFrame lineage*: project → filter → sort →
offset/limit → transform chain. Catalyst then performs the pushdown the
reference hand-rolled per adapter — column pruning and predicate
pushdown reach the parquet/JDBC scan, LIMIT becomes
CollectLimit/TakeOrderedAndProject — plus everything the reference
never had (constant folding, join reordering, whole-stage codegen).

Scale note: nothing here materializes rows on the driver. A compiled
connector over a 100 TB table is just a plan; filters prune row groups
and partitions before any I/O happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openetl_spark.functions.filters import compile_filters
from openetl_spark.functions.transforms import apply_transforms
from openetl_spark.registry import get_source
from openetl_spark.spec import Connector


def compile_connector(
    spark: SparkSession,
    connector: Connector,
    strict_js_compat: bool = True,
) -> DataFrame:
    """Resolve the source adapter, then layer the declarative query ops."""
    source = get_source(connector.adapter_id)
    df = source.read(spark, connector)

    pred = compile_filters(connector.filters)
    if pred is not None:
        df = df.filter(pred)

    if connector.fields:
        # Projection AFTER filter: predicates may reference non-projected
        # columns (the reference pushes both into one SELECT; Catalyst
        # prunes to the union of needed columns either way).
        fields = list(connector.fields)
        # keep the explicit partial-extract marker (the documented
        # divergence from the reference's silent deadline truncation)
        # visible through user projections
        if "_ingest_partial" in df.columns and "_ingest_partial" not in fields:
            fields.append("_ingest_partial")
        df = df.select(*[F.col(f) for f in fields])

    if connector.sort:
        df = df.orderBy(
            *[
                F.col(s.field).asc() if s.type == "asc" else F.col(s.field).desc()
                for s in connector.sort
            ]
        )

    if connector.offset:
        df = df.offset(int(connector.offset))
    if connector.limit is not None:
        # With a sort above, Catalyst plans TakeOrderedAndProject (top-k
        # without a global sort) — the right plan at any scale.
        df = df.limit(int(connector.limit))

    if connector.transform:
        df = apply_transforms(df, connector.transform, strict_js_compat)

    return df
