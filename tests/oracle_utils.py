"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet, sort columns by name,
compare row count, column names, and values order-insensitively."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _driver_canon_guard(df: pd.DataFrame) -> str | None:
    """The driver canonicalizes by sorting RAW cell values before
    stringifying (CORRECTNESS_r03 `embedding_quantize` err: pandas
    factorize → `unhashable type: 'list'` on array cells). Mirror that
    step so a query whose cells the driver cannot sort fails locally
    too instead of being masked by our stringify-first compare."""
    try:
        df.reindex(sorted(df.columns), axis=1).sort_values(by=sorted(df.columns))
    except TypeError as exc:
        return f"driver-canon failure (raw-value sort): {exc}"
    return None


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Stringify for an order-insensitive, type-tolerant compare.
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.6g}"
        return str(v)

    out = df.apply(lambda col: col.map(cell))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def compare(
    spark_df,
    con: duckdb.DuckDBPyConnection,
    sql: str,
    *,
    allow_empty: bool = False,
) -> tuple[bool, str]:
    actual = spark_df.toPandas()
    expected = con.sql(sql).df()
    if len(actual) != len(expected):
        return False, f"row count: spark={len(actual)} duckdb={len(expected)}"
    if len(actual) == 0 and not allow_empty:
        # VERDICT r04: q20/join_anti/set_except were 0-row "greens" —
        # both engines agreeing on the empty set proves nothing about
        # the operator. Emptiness must be opted into explicitly.
        return False, "vacuous match: both sides empty on testdata"
    a_cols, e_cols = sorted(actual.columns), sorted(expected.columns)
    if a_cols != e_cols:
        return False, f"columns: spark={a_cols} duckdb={e_cols}"
    for side, frame in (("spark", actual), ("duckdb", expected)):
        err = _driver_canon_guard(frame)
        if err:
            return False, f"{side}: {err}"
    a, e = _normalize(actual), _normalize(expected)
    if not a.equals(e):
        diff_mask = (a != e).any(axis=1)
        sample = pd.concat(
            [a[diff_mask].head(3).assign(_side="spark"), e[diff_mask].head(3).assign(_side="duckdb")]
        )
        return False, f"value mismatch ({int(diff_mask.sum())} rows):\n{sample}"
    return True, "ok"
