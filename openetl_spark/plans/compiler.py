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

    # Sources that push filters server-side expose residual_filters();
    # the compiler re-applies exactly those (r05 — re-applying PUSHED
    # filters broke over real HTTP: the response carries only requested
    # properties, so the pushed column may be absent). Sources without
    # the protocol (parquet/JDBC/file) get the whole spec — for them
    # the "re-apply" IS the filter, and Catalyst pushes it to the scan.
    residual_fn = getattr(source, "residual_filters", None)
    filters = connector.filters if residual_fn is None else residual_fn(connector)
    pred = compile_filters(filters)
    if pred is not None:
        df = df.filter(pred)

    # Staged REST ingest carries _ingest_seq (driver arrival order).
    # offset/limit without a user sort mean "the first k fetched" — a
    # bare df.offset over a multi-file scan would skip an arbitrary
    # scheduling-ordered window instead (review finding r08). Order by
    # the sequence exactly when those semantics apply; the column is
    # dropped from the final output below.
    if (
        "_ingest_seq" in df.columns
        and not connector.sort
        and (connector.offset or connector.limit is not None)
    ):
        df = df.orderBy(F.col("_ingest_seq").asc())

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

    if "_ingest_seq" in df.columns:
        df = df.drop("_ingest_seq")  # internal arrival counter, never user-visible

    if connector.transform:
        df = apply_transforms(df, connector.transform, strict_js_compat)

    return df


def compile_query(spec, resolve) -> DataFrame:
    """QuerySpec → one lazy DataFrame lineage (the analytic companion
    to compile_connector). ``resolve(table_name) -> DataFrame`` supplies
    base relations (a path reader, the catalog loader, temp views, a
    versioned-table reader — anything). No engine-side planning: joins
    are declared, Catalyst picks broadcast/SMJ/shuffled-hash (the
    ``broadcast`` flag is the standard dim hint), filters/projections
    push down to the scans, aggregates get map-side partials."""
    from functools import reduce

    from openetl_spark.spec import QuerySpec, SetOp, spec_from_dict

    spec = spec_from_dict(spec)

    if isinstance(spec, SetOp):
        dfs = [compile_query(i, resolve) for i in spec.inputs]
        combine = {
            "union_all": lambda a, b: a.union(b),
            "union": lambda a, b: a.union(b),
            "intersect": lambda a, b: a.intersect(b),
            "except": lambda a, b: a.subtract(b),
        }[spec.op]
        df = reduce(combine, dfs)
        if spec.op == "union":
            df = df.distinct()
        if spec.sort:
            df = df.orderBy(
                *[
                    F.col(s.field).asc() if s.type == "asc" else F.col(s.field).desc()
                    for s in spec.sort
                ]
            )
        if spec.limit is not None:
            df = df.limit(spec.limit)
        return df

    def _resolve(t):
        return (
            compile_query(t, resolve)
            if isinstance(t, (QuerySpec, SetOp))
            else resolve(t)
        )

    df = _resolve(spec.table)
    for j in spec.joins:
        right = _resolve(j.table)
        if j.broadcast:
            right = F.broadcast(right)
        on = list(j.on)
        if on and isinstance(on[0], (list, tuple)):
            cond = reduce(
                lambda a, b: a & b,
                [df[l] == right[r] for l, r in on],
            )
            df = df.join(right, cond, j.how)
        else:
            df = df.join(right, on, j.how)

    pred = compile_filters(spec.filters)
    if pred is not None:
        df = df.filter(pred)
    for alias, expr in spec.derived.items():
        df = df.withColumn(alias, F.expr(expr))

    if spec.aggregates:
        fns = {
            "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
            "count": F.count, "count_distinct": F.countDistinct,
        }
        aggs = []
        for a in spec.aggregates:
            e = (
                F.count(F.lit(1))
                if a.fn == "count" and a.expr is None
                else fns[a.fn](F.expr(a.expr))
            )
            if a.round_dp is not None:
                e = F.round(e, a.round_dp)
            aggs.append(e.alias(a.alias))
        df = df.groupBy(*spec.group_by).agg(*aggs)

    if spec.windows:
        from pyspark.sql import Window as W

        ranking = {
            "row_number": F.row_number, "rank": F.rank,
            "dense_rank": F.dense_rank,
        }
        fns = {
            "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
            "count": F.count,
        }
        for wf in spec.windows:
            win = W.partitionBy(*wf.partition_by)
            if wf.order_by:
                win = win.orderBy(
                    *[
                        F.col(s.field).asc() if s.type == "asc"
                        else F.col(s.field).desc()
                        for s in wf.order_by
                    ]
                )
            if wf.fn in ranking:
                e = ranking[wf.fn]()
            elif wf.fn in ("lag", "lead"):
                e = getattr(F, wf.fn)(F.expr(wf.expr), wf.offset)
            else:
                e = fns[wf.fn](F.expr(wf.expr))
                if getattr(wf, "frame", None) is not None:
                    lo, hi = wf.frame

                    def _bound(b, side):
                        if b == "unbounded":
                            return (
                                W.unboundedPreceding
                                if side == "lo"
                                else W.unboundedFollowing
                            )
                        return int(b)

                    win = win.rowsBetween(_bound(lo, "lo"), _bound(hi, "hi"))
            df = df.withColumn(wf.alias, e.over(win))

    # HAVING runs after aggregates AND windows, so it filters on
    # either's outputs (the top-n-per-group rn <= k shape included)
    hpred = compile_filters(spec.having)
    if hpred is not None:
        df = df.filter(hpred)
    if spec.select:
        df = df.select(*spec.select)
    if spec.distinct:
        df = df.distinct()
    if spec.sort:
        df = df.orderBy(
            *[
                F.col(s.field).asc() if s.type == "asc" else F.col(s.field).desc()
                for s in spec.sort
            ]
        )
    if spec.limit is not None:
        df = df.limit(spec.limit)
    return df
