"""Declarative data-quality constraints (the dbt-tests /
Great-Expectations surface, Spark-native): a constraint spec compiles
to ONE aggregate pass of conditional counts — never one job per rule —
plus an optional quarantine split that reuses the same predicates
scan-side.

The reference has no validation surface at all (rows are whatever the
backend returns, `/root/reference/src/types.ts:303-308`); a 100 TB
training pipeline gates every ingest on exactly these checks, so they
are first-class here:

* ``not_null(col)`` — null count
* ``unique(cols)`` — duplicate-key row count (count − distinct count)
* ``in_range(col, lo, hi)`` — out-of-band count (nulls don't count;
  pair with not_null to forbid them)
* ``in_set(col, values)`` — out-of-vocabulary count
* ``matches(col, regex)`` — non-matching count
* ``foreign_key(cols, ref_df, ref_cols)`` — orphan count via a
  left_anti join against the (deduplicated) reference keys — the one
  rule that is a join, not a scan predicate; all scan rules still fold
  into the single aggregate

``check`` returns the violation-count report as a 1-row DataFrame (lazy
— compose it into larger plans or collect it); ``quarantine`` splits
the input into (clean, violating) DataFrames using the same predicate
expressions, so the gate and the split cannot drift apart.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str
    kind: str
    cols: tuple[str, ...]
    params: dict = field(default_factory=dict)


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"not_null_{col}", "not_null", (col,))


def unique(*cols: str, name: str | None = None) -> Rule:
    return Rule(name or "unique_" + "_".join(cols), "unique", tuple(cols))


def in_range(col: str, lo, hi, name: str | None = None) -> Rule:
    return Rule(
        name or f"in_range_{col}", "in_range", (col,), {"lo": lo, "hi": hi}
    )


def in_set(col: str, values: Sequence, name: str | None = None) -> Rule:
    return Rule(
        name or f"in_set_{col}", "in_set", (col,), {"values": list(values)}
    )


def matches(col: str, pattern: str, name: str | None = None) -> Rule:
    return Rule(
        name or f"matches_{col}", "matches", (col,), {"pattern": pattern}
    )


def foreign_key(
    cols: Sequence[str],
    ref_df: DataFrame,
    ref_cols: Sequence[str],
    name: str | None = None,
) -> Rule:
    return Rule(
        name or "fk_" + "_".join(cols),
        "foreign_key",
        tuple(cols),
        {"ref_df": ref_df, "ref_cols": list(ref_cols)},
    )


def _violation_pred(rule: Rule) -> Column | None:
    """Row-level violation predicate for scan rules; None for rules
    that are not row-local (unique, foreign_key handled separately)."""
    c = F.col(rule.cols[0]) if rule.cols else None
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        return c.isNotNull() & ~c.between(rule.params["lo"], rule.params["hi"])
    if rule.kind == "in_set":
        return c.isNotNull() & ~c.isin(rule.params["values"])
    if rule.kind == "matches":
        return c.isNotNull() & ~c.rlike(rule.params["pattern"])
    return None


def check(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """One-row violation report: a column per rule holding its
    violation count. Scan rules fold into ONE aggregate over one pass;
    `unique` adds countDistinct terms to the same aggregate; each
    `foreign_key` contributes a left_anti-join count subplan joined
    back as a 1-row cross (broadcast both ways — every term is a
    scalar)."""
    aggs = []
    fk_counts = []
    for r in rules:
        pred = _violation_pred(r)
        if pred is not None:
            aggs.append(F.count(F.when(pred, True)).cast("long").alias(r.name))
        elif r.kind == "unique":
            # distinct over a STRUCT of the key columns: multi-arg
            # countDistinct drops any row with a NULL key column, which
            # counted every NULL-keyed row as a duplicate (review
            # finding r08); the struct value is non-null even when its
            # fields are, matching SQL's count(DISTINCT (a, b)) tuple
            # semantics the dq_report oracle uses.
            aggs.append(
                (
                    F.count("*")
                    - F.countDistinct(F.struct(*[F.col(c) for c in r.cols]))
                )
                .cast("long")
                .alias(r.name)
            )
        elif r.kind == "foreign_key":
            ref = (
                r.params["ref_df"]
                .select(
                    *[
                        F.col(rc).alias(c)
                        for c, rc in zip(r.cols, r.params["ref_cols"])
                    ]
                )
                .distinct()
            )
            # SQL FK semantics: rows with any NULL key column are exempt
            all_set = F.lit(True)
            for c in r.cols:
                all_set = all_set & F.col(c).isNotNull()
            orphans = (
                df.select(*r.cols)
                .filter(all_set)
                .join(ref, list(r.cols), "left_anti")
                .agg(F.count("*").cast("long").alias(r.name))
            )
            fk_counts.append(orphans)
        else:
            raise ValueError(f"unknown rule kind {r.kind!r}")
    report = df.agg(*aggs) if aggs else None
    for fk in fk_counts:
        report = fk if report is None else report.crossJoin(F.broadcast(fk))
    if report is None:
        raise ValueError("no rules given")
    return report


def quarantine(
    df: DataFrame, rules: Sequence[Rule]
) -> tuple[DataFrame, DataFrame]:
    """Split into (clean, violating) on the row-local rules (unique /
    foreign_key violations are not row-local predicates; gate on the
    `check` report for those). Both halves share one scan in the plan."""
    preds = [p for p in (_violation_pred(r) for r in rules) if p is not None]
    if not preds:
        raise ValueError("no row-local rules to quarantine on")
    bad = preds[0]
    for p in preds[1:]:
        bad = bad | p
    return df.filter(~bad), df.filter(bad)
