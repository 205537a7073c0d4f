"""Data-layout optimization for scan pruning: z-order (Morton-curve)
file clustering, the OPTIMIZE ZORDER analog of Delta/Iceberg table
services.

Why it matters at 100 TB: parquet readers skip whole files/row-groups
whose footer min/max stats exclude a predicate. Sorting by ONE column
gives perfect skipping on that column and none on any other; bit-
interleaving the rank-quantized values of SEVERAL columns gives every
interleaved column locality ~2^(bits/k) — the standard multi-
dimensional clustering trade (Morton 1966; Delta's OPTIMIZE ZORDER
works the same way).

Physical shape: per-column (min, max) come from ONE tiny aggregate
(collected as literals — kilobytes); quantization + bit interleaving
are pure Column expressions in the scan projection (whole-stage
codegen, no UDFs); the write is repartitionByRange + in-partition sort
on the z-value, i.e. exactly one range shuffle — the same cost as a
plain global sort, buying locality on k columns instead of one."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], mins: list, maxs: list, bits: int = 16) -> Column:
    """Morton z-value: each column linearly quantized to ``bits``-bit
    rank space over its [min, max], then bit-interleaved (column 0
    owns the most significant position of each round). Pure integer
    Column arithmetic — evaluates in codegen at scan speed."""
    k = len(cols)
    if not (1 <= k <= 4):
        raise ValueError("zorder_value supports 1-4 columns")
    if k * bits > 63:
        raise ValueError("k*bits must fit a signed 64-bit z-value")
    top = (1 << bits) - 1
    quantized = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi) - float(lo)
        if span <= 0:
            q = F.lit(0).cast("bigint")
        else:
            q = F.least(
                F.greatest(
                    F.floor(
                        (c.cast("double") - F.lit(float(lo)))
                        / F.lit(span)
                        * F.lit(float(top + 1))
                    ),
                    F.lit(0),
                ),
                F.lit(top),
            ).cast("bigint")
        quantized.append(q)
    z = F.lit(0).cast("bigint")
    for b in range(bits - 1, -1, -1):  # MSB first
        for ci, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = F.shiftleft(z, 1).bitwiseOR(bit)
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str] | str,
    n_files: int = 8,
    bits: int = 16,
    options: dict | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``cols``:
    one small min/max aggregate, one range shuffle on the z-value,
    ``n_files`` output files each covering a compact hyper-rectangle
    of the key space (verified by the per-file min/max locality test).
    The z-value itself is not persisted — it exists only in the write
    plan. An empty input (or an all-NULL layout column) degrades to a
    constant z-value — the write still succeeds, it just has nothing
    to cluster. NULL values in a layout column quantize to rank 0
    (they carry no range information for min/max skipping either
    way)."""
    if isinstance(cols, str):  # the natural single-column spelling
        cols = [cols]
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).first()
    mins = [row[f"_lo_{c}"] if row[f"_lo_{c}"] is not None else 0 for c in cols]
    maxs = [row[f"_hi_{c}"] if row[f"_hi_{c}"] is not None else 0 for c in cols]
    z = zorder_value([F.coalesce(F.col(c), F.lit(0)) for c in cols], mins, maxs, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.options(**(options or {}))
        .mode("overwrite")
        .parquet(path)
    )


def file_locality_report(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file (min, max) of each layout column plus its normalized
    span — the measurable locality a z-order (or any clustering) buys.
    ``avg(span_frac)`` ≈ 1/n_files for a perfectly sorted single
    column, ~ (1/n_files)^(1/k) per column for a k-column z-order, and
    ≈ 1 for random layout. Used by the layout tests; at scale this is
    the audit you run before trusting a table's pruning behavior."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    per_file = df.groupBy("_f").agg(*aggs)
    glo = df.agg(*aggs).first()
    out_cols = [F.col("_f").alias("file")]
    for c in cols:
        span = float(glo[f"hi_{c}"]) - float(glo[f"lo_{c}"]) or 1.0
        out_cols.append(
            (
                (F.col(f"hi_{c}").cast("double") - F.col(f"lo_{c}").cast("double"))
                / F.lit(span)
            ).alias(f"span_frac_{c}")
        )
    return per_file.select(*out_cols)


def rowgroup_stats_report(path: str, cols: list[str]):
    """Parquet-footer pruning audit WITHOUT scanning data: per
    (file, row_group), each layout column's footer min/max and row
    count, straight from the metadata pyarrow exposes — exactly the
    statistics a reader's predicate-pushdown consults when it skips
    row groups. ``file_locality_report`` measures locality by scanning
    the data through Spark; this one is metadata-only (kilobytes read
    for a 100 TB table), which is what a production layout audit runs.
    Returns a list of dicts (driver-side — footer metadata is tiny by
    construction)."""
    import os

    import pyarrow.parquet as pq

    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        if os.path.isdir(path)
        else [path]
    )
    out = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        name_to_idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            row = {"file": os.path.basename(f), "row_group": rg, "n_rows": g.num_rows}
            for c in cols:
                st = g.column(name_to_idx[c]).statistics
                row[f"min_{c}"] = None if st is None else st.min
                row[f"max_{c}"] = None if st is None else st.max
            out.append(row)
    return out
