"""Analytic operators without a direct Spark built-in: skyline
(Pareto frontier).

Reference parity note: the reference's query surface has no skyline
(filters are per-row predicates, `src/filters.ts`); this is
Spark-native extension surface, the multi-criteria companion to top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _local_skyline(pdf: pd.DataFrame, crit: list[str]) -> pd.DataFrame:
    """Non-dominated subset of ``pdf`` under maximize-all criteria
    ``crit``. Dominance: q dominates p iff q ≥ p on every criterion
    and q > p on at least one — exact ties on ALL criteria dominate
    nothing, so full duplicates are both kept (the textbook SKYLINE OF
    semantics, Börzsönyi et al., ICDE 2001).

    Sort-first block-nested-loop: rows sorted lexicographically
    descending can only be dominated by EARLIER rows, so one pass with
    a running frontier suffices; the frontier comparison is a numpy
    broadcast against the (small) current frontier.
    """
    if len(pdf) == 0:
        return pdf
    srt = pdf.sort_values(crit, ascending=False, kind="mergesort")
    vals = srt[crit].to_numpy(dtype="float64")
    frontier: list[np.ndarray] = []
    keep = np.zeros(len(srt), dtype=bool)
    for i, row in enumerate(vals):
        if frontier:
            fr = np.asarray(frontier)
            dominated = ((fr >= row).all(axis=1) & (fr > row).any(axis=1)).any()
        else:
            dominated = False
        if not dominated:
            keep[i] = True
            frontier.append(row)
    return srt[keep]


def skyline(
    df: DataFrame,
    maximize: list[str] | None = None,
    minimize: list[str] | None = None,
) -> DataFrame:
    """Distributed skyline (Pareto frontier): the rows not dominated by
    any other row, maximizing ``maximize`` columns and minimizing
    ``minimize`` columns simultaneously.

    Two-phase distributed plan (the MR-BNL shape, Börzsönyi-style BNL
    per slice):
      1. LOCAL PRUNE — ``mapInPandas`` computes a local skyline per
         Arrow batch, in place on the scan partitions: NO shuffle, no
         cap on parallelism, and per-task memory bounded by the Arrow
         batch size regardless of corpus size (review r06 replaced a
         fixed-64-bucket groupBy that both shuffled the whole input
         and funneled it into 64 tasks). Pruning any SUBSET is safe:
         every global skyline row is undominated in its batch too, so
         phase 1 loses nothing and discards the overwhelming bulk
         (expected frontier of a d-dim random slice is O(log^{d-1} n)
         rows).
      2. MERGE — the surviving candidates (union of batch frontiers,
         small by construction) collapse to one group for an exact
         skyline pass. Worst case (fully anti-correlated data) the
         skyline IS O(n) and no algorithm returns a small answer; for
         that data shape the result itself is corpus-sized and callers
         want the phase-1 per-slice form anyway.

    Internally all criteria are maximize-form (minimized columns join
    negated), so one kernel serves both phases. A NULL criterion value
    becomes NaN in the kernel, where every comparison is false: such a
    row neither dominates nor is dominated — it is always kept
    (incomparable), mirroring SQL's NULL comparison semantics under
    the NOT EXISTS dominance definition.
    """
    maximize = list(maximize or [])
    minimize = list(minimize or [])
    if not maximize and not minimize:
        raise ValueError("skyline needs at least one criterion")
    crit = [f"__sk{i}" for i in range(len(maximize) + len(minimize))]
    clash = [c for c in df.columns if c in crit or c == "__sk_g"]
    if clash:
        raise ValueError(f"skyline reserves column names {clash}")
    aug = df
    for c, name in zip(maximize, crit):
        aug = aug.withColumn(name, F.col(c).cast("double"))
    for c, name in zip(minimize, crit[len(maximize):]):
        aug = aug.withColumn(name, -F.col(c).cast("double"))
    schema: StructType = aug.schema

    def prune(batches):
        for pdf in batches:
            yield _local_skyline(pdf, crit)

    local = aug.mapInPandas(prune, schema)
    # A bare groupBy(lit(0)) trips Spark 4's ordinal resolution inside
    # flatMapGroupsInPandas — group on an explicit constant column.
    merged = (
        local.withColumn("__sk_g", F.lit(0))
        .groupBy("__sk_g")
        .applyInPandas(
            lambda _, pdf: _local_skyline(pdf.drop(columns="__sk_g"), crit),
            schema,
        )
    )
    return merged.drop(*crit)
