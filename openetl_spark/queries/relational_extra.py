"""B-series escape hatches, remaining relational coverage, TPC-H bench depth, the persisted IVF layout.

Split out of the monolithic catalog.py (r06, VERDICT r05 #6) —
importing this module REGISTERS its queries into the shared
QUERIES/ORACLE registries (openetl_spark.queries.base). Query names,
oracles, and iteration order are byte-identical to the pre-split
catalog; openetl_spark.catalog re-exports the full public surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from openetl_spark.operators import analytics as AN
from openetl_spark.operators import curation as C
from openetl_spark.operators import dedup as D
from openetl_spark.operators import joins as J
from openetl_spark.operators import similarity as S
from openetl_spark.operators import text as X
from openetl_spark.operators import timeseries as TS
from openetl_spark.plans.compiler import compile_connector
from openetl_spark.queries.base import ORACLE, QUERIES, load, query
from openetl_spark.spec import Connector, Filter, FilterGroup, Sort, Transformation

# =====================================================================
# B-series escape hatches + remaining relational coverage
# =====================================================================

@query(
    "sql_passthrough",
    """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_sql_passthrough(spark, sf_dir):
    """B1/B2: raw-SQL escape hatch (reference custom_query endpoint,
    `/root/reference/adapters/postgresql/src/index.ts:139-145`) — here
    spark.sql over registered views; same Catalyst plan as DataFrame."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("sql_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM sql_orders GROUP BY o_orderstatus
        """
    )


@query(
    "schema_introspect",
    """
    SELECT column_name FROM information_schema.columns
    WHERE table_name = 'customer'
    """,
)
def q_schema_introspect(spark, sf_dir):
    """A29: the reference's `table_columns` endpoint
    (`/root/reference/adapters/postgresql/src/index.ts:131-137`) —
    schema-as-data from df.schema (no information_schema needed: the
    DataFrame carries its own schema)."""
    df = load(spark, sf_dir, "customer")
    return spark.createDataFrame(
        [(f.name,) for f in df.schema.fields], "column_name string"
    )


@query(
    "join_right",
    """
    SELECT n.n_name, c.c_custkey
    FROM customer c RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def q_join_right(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return c.join(n, c.c_nationkey == n.n_nationkey, "right").select("n_name", "c_custkey")


@query(
    "join_full_outer",
    """
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey, c.nc, s.ns FROM
      (SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS nc
       FROM customer GROUP BY 1) c
    FULL OUTER JOIN
      (SELECT s_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS ns
       FROM supplier GROUP BY 1) s
    ON c.nationkey = s.nationkey
    """,
)
def q_join_full_outer(spark, sf_dir):
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("nc"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("ns"))
    )
    # join on the column name (USING semantics): Spark emits ONE
    # coalesced nationkey column for full outer joins
    return c.join(s, "nationkey", "full_outer").select("nationkey", "nc", "ns")


@query(
    "union_all_counts",
    """
    SELECT src, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT 'cust' AS src, c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT 'supp' AS src, s_nationkey AS nationkey FROM supplier) t
    GROUP BY src
    """,
)
def q_union_all_counts(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(
        F.lit("cust").alias("src"), F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supp").alias("src"), F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("src").agg(F.count("*").alias("n"))


@query(
    "decimal_agg",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price_dec,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE), 4) AS revenue_dec
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_decimal_agg(spark, sf_dir):
    """C17: DecimalType arithmetic — exact fixed-point aggregation (no
    float rounding games needed for the oracle: decimal sums are
    bit-exact across engines)."""
    l = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    # Aggregation is exact fixed-point; only the FINAL cast goes to
    # double so the comparison layer sees one numeric type.
    return l.groupBy("l_returnflag").agg(
        F.sum(price).cast("double").alias("sum_price_dec"),
        F.round(F.sum(price * disc).cast("double"), 4).alias("revenue_dec"),
    )


@query(
    "map_funcs",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_with_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def q_map_funcs(spark, sf_dir):
    """C18+C19: from_json into MapType, map_contains_key/element_at —
    the dynamic-properties pattern for semi-structured event payloads."""
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        e.withColumn("pm", m)
        .filter(F.map_contains_key("pm", "k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_with_k"),
            F.sum(F.element_at("pm", "k")).alias("sum_k"),
        )
    )


@query(
    "approx_sketches",
    """
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           TRUE AS custs_ok, TRUE AS median_ok, TRUE AS p95_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_approx_sketches(spark, sf_dir):
    """C8: approximate sketches (HLL distinct, quantile sketch) — the
    100 TB substitutes for exact distinct/percentile. The sketch values
    can't hash-match an exact engine, so the oracle is an INEQUALITY
    rendered as data: Spark emits the exact distinct count (oracle
    checks it verbatim) plus booleans asserting each sketch lies within
    its documented error of the exact statistic (HLL++ rsd 5% → 3σ
    band; percentile_approx bounded in RANK space — the sketch returns
    an order statistic, so the check is that it lies between the exact
    percentiles at q ± 1%, a bound that holds at any value spacing,
    unlike a relative-value tolerance on sparse tails). The oracle
    expects all-true — a sketch drifting out of bounds is a red driver
    row, not an unverifiable 'rows-only'."""
    o = load(spark, sf_dir, "orders")
    # countDistinct in its OWN aggregate (r06): mixing a DISTINCT
    # aggregate (planned via Expand + multi-phase) with the imperative
    # percentile/sketch aggregates forces a degenerate combined plan —
    # measured 10.7 s at sf0.1 for the one-agg form vs 0.5 + 0.7 s for
    # the pieces. Two aggs + a 5-row group-key join compute identical
    # values.
    exact_d = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_custs")
    )
    sketches = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey").alias("ac"),
        F.percentile_approx("o_totalprice", 0.5).alias("am"),
        F.percentile_approx("o_totalprice", 0.95).alias("a95"),
        F.expr("percentile(o_totalprice, 0.49)").alias("em_lo"),
        F.expr("percentile(o_totalprice, 0.51)").alias("em_hi"),
        F.expr("percentile(o_totalprice, 0.94)").alias("e95_lo"),
        F.expr("percentile(o_totalprice, 0.96)").alias("e95_hi"),
    )
    agg = sketches.join(exact_d, "o_orderpriority")
    rel = lambda a, e: F.abs(F.col(a) - F.col(e)) / F.col(e)  # noqa: E731
    return agg.select(
        "o_orderpriority",
        "exact_custs",
        (rel("ac", "exact_custs") <= 0.15).alias("custs_ok"),
        F.col("am").between(F.col("em_lo"), F.col("em_hi")).alias("median_ok"),
        F.col("a95").between(F.col("e95_lo"), F.col("e95_hi")).alias("p95_ok"),
    )



# =====================================================================
# Additional TPC-H-shape workloads (bench depth)
# =====================================================================

@query(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan+filter+agg — the pushdown showcase
    (all four predicates reach the parquet reader)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "q14_promo_share",
    """
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q_q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a broadcast join."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


@query(
    "q18_large_orders",
    """
    SELECT o.o_orderkey, o.o_totalprice, round(t.sum_qty, 2) AS sum_qty
    FROM orders o
    JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 150) t
      ON o.o_orderkey = t.l_orderkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: agg-then-join (HAVING pre-filters the fact agg
    before the join — the aggregate side shrinks to qualifying keys)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    t = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(t, o.o_orderkey == t.l_orderkey)
        .select("o_orderkey", "o_totalprice", F.round("sum_qty", 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue ranking."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )



@query(
    "embedding_near_dup_exact",
    """
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cosine_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 4) >= 0.35
    """,
)
def q_embedding_near_dup_exact(spark, sf_dir):
    """C28 oracle-checked: exact embedding-cosine near-dup pairs
    (threshold 0.35 — this synthetic corpus tops out at ~0.51), computed
    as a BLOCKED matmul all-pairs join (r03): vectors hash into blocks,
    each block pair is one numpy matmul inside applyInPandas — identical
    results to the naive n² fold join (equality tested) at ~30× less
    cost, and the physical shape (bounded per-group memory, shuffle
    carries each vector B times instead of n times) is the one that
    survives scale-up. The exact baseline the LSH path is measured
    against."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    return S.blocked_similarity_join(e, threshold=0.35)


@query(
    "lang_id_oracle",
    """
    WITH scored AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS tk
      FROM documents),
    hits AS (
      SELECT doc_id,
        len(list_filter(tk, x -> x IN ('the','and','of','to','a','in','is','it','that','for')))
          / greatest(len(tk), 1) AS s_en,
        len(list_filter(tk, x -> x IN ('el','la','de','que','y','en','un','por','con','los')))
          / greatest(len(tk), 1) AS s_es,
        len(list_filter(tk, x -> x IN ('le','la','de','et','les','des','un','une','dans','est')))
          / greatest(len(tk), 1) AS s_fr,
        len(list_filter(tk, x -> x IN ('der','die','das','und','in','den','von','zu','mit','ist')))
          / greatest(len(tk), 1) AS s_de,
        len(list_filter(tk, x -> x IN ('的','了','在','是','我','有','和','就','不','人')))
          / greatest(len(tk), 1) AS s_zh
      FROM scored)
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_es, s_fr, s_de, s_zh) = 0 THEN 'und'
                WHEN s_zh = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'zh'
                WHEN s_fr = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'fr'
                WHEN s_es = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'es'
                WHEN s_en = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'en'
                ELSE 'de' END AS lang_pred
    FROM hits
    """,
)
def q_lang_id_oracle(spark, sf_dir):
    """C29 oracle-checked: the stopword-evidence language ID. Tie-break
    = lexicographically largest language code (matches the engine's
    array_max-over-struct argmax), mirrored by the CASE cascade order
    zh > fr > es > en > de."""
    d = X.detect_language(load(spark, sf_dir, "documents", spread=True))
    return d.select("doc_id", "lang_pred")



@query(
    "percentile_exact",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 2)  AS median_price,
           round(quantile_cont(o_totalprice, 0.95), 2) AS p95_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_percentile_exact(spark, sf_dir):
    """C8/C17: exact interpolated percentiles (the non-sketch path;
    approx_sketches is the 100 TB variant)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 2).alias("p95_price"),
    )


@query(
    "stats_agg",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_discount), 6) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark, sf_dir):
    """C7/C17: statistical aggregates (sample stddev/variance,
    correlation, covariance)."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
    )



@query(
    "window_ranking_extras",
    """
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           first_value(o_orderkey) OVER w AS first_in_seg,
           nth_value(o_orderkey, 2) OVER w AS second_in_seg
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_ranking_extras(spark, sf_dir):
    """C10 extras: ntile / percent_rank / cume_dist / first_value /
    nth_value semantics over one named window — computed WITHOUT the
    window (r07, VERDICT r06 #2). o_orderpriority has 5 values, so
    ``PARTITION BY o_orderpriority`` funnels the whole orders table
    through 5 window tasks — a skew wall at 100× scale. Instead,
    ``grouped_exact_ranks`` derives each row's exact position and group
    size from a coarse price-bucket histogram (cumulative offsets over
    the bounded BIN relation + row_number within high-cardinality
    (priority, bucket) partitions), and the five window functions
    become arithmetic over (pos, n):

      ntile(4)        = big-tiles-first tile of pos among n
      percent_rank()  = (pos-1)/(n-1)   [sort key unique → rank = pos]
      cume_dist()     = pos/n           [no peers under the tiebreak]
      first/nth_value = broadcast join of the pos ≤ 2 heads; nth_value
                        stays NULL for pos 1 (the default RANGE frame
                        ends at the current row).

    The DuckDB oracle keeps the literal window form — same hash as the
    r03 green — and tests/test_analytics_graph.py cross-checks this
    plan against Spark's own window form and pins the plan shape (no
    ntile/percent_rank/cume_dist window nodes; the only row-scale
    window is row_number over the compound key)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    ranked = AN.grouped_exact_ranks(
        o, "o_orderpriority", "o_totalprice", "o_orderkey", bucket_width=1000.0
    )
    pos, n = F.col("pos"), F.col("n_group")
    heads = (
        ranked.filter(pos <= 2)
        .groupBy("o_orderpriority")
        .agg(
            F.max(F.when(pos == 1, F.col("o_orderkey"))).alias("first_in_seg"),
            F.max(F.when(pos == 2, F.col("o_orderkey"))).alias("_second"),
        )
    )
    return (
        ranked.join(F.broadcast(heads), ["o_orderpriority"])
        .select(
            "o_orderkey",
            AN.ntile_from_pos(pos, n, 4).cast("int").alias("quartile"),
            F.round(
                F.when(n > 1, (pos - 1) / (n - 1)).otherwise(F.lit(0.0)), 6
            ).alias("pct_rank"),
            F.round(pos / n, 6).alias("cdist"),
            "first_in_seg",
            F.when(pos >= 2, F.col("_second")).alias("second_in_seg"),
        )
    )


@query(
    "unpivot_measures",
    """
    WITH wide AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2) AS qty,
             round(sum(l_extendedprice), 2) AS price,
             round(sum(l_discount), 2) AS disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'qty' AS measure, qty AS val FROM wide
    UNION ALL SELECT l_returnflag, 'price', price FROM wide
    UNION ALL SELECT l_returnflag, 'disc', disc FROM wide
    """,
)
def q_unpivot_measures(spark, sf_dir):
    """C-series adjacent: unpivot/melt — wide aggregate to long form."""
    wide = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("price"),
            F.round(F.sum("l_discount"), 2).alias("disc"),
        )
    )
    # oracle is a NULL-keeping UNION ALL: DuckDB's UNPIVOT drops NULL
    # cells while Spark's unpivot keeps them — the UNION form matches
    # Spark's semantics for any data
    return wide.unpivot(
        ids=["l_returnflag"], values=["qty", "price", "disc"],
        variableColumnName="measure", valueColumnName="val",
    )


@query(
    "scalar_subquery",
    """
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice - (SELECT round(avg(o_totalprice), 2) FROM orders), 2) AS vs_avg
    FROM orders
    WHERE o_totalprice > (SELECT round(avg(o_totalprice) * 1.8, 2) FROM orders)
    """,
)
def q_scalar_subquery(spark, sf_dir):
    """Scalar subqueries via the SQL surface (Catalyst plans the
    subquery once as a broadcast scalar)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("ss_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               round(o_totalprice - (SELECT round(avg(o_totalprice), 2) FROM ss_orders), 2) AS vs_avg
        FROM ss_orders
        WHERE o_totalprice > (SELECT round(avg(o_totalprice) * 1.8, 2) FROM ss_orders)
        """
    )


@query(
    "date_funcs_extended",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(month(o_orderdate) AS INT)) AS INT) AS first_month,
           min(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP)) AS min_plus_3m,
           min(CAST(last_day(o_orderdate) AS TIMESTAMP)) AS min_month_end
    FROM orders GROUP BY 1, 2
    """,
)
def q_date_funcs_extended(spark, sf_dir):
    """C16 extended: quarter buckets, interval arithmetic, last_day."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    ).agg(
        F.count("*").alias("n"),
        F.min(F.month("o_orderdate")).cast("int").alias("first_month"),
        # dates → timestamps on both sides: pandas/hash layers represent
        # DATE and TIMESTAMP differently even when values agree
        F.min(F.add_months("o_orderdate", 3)).cast("timestamp_ntz").alias("min_plus_3m"),
        F.min(F.last_day("o_orderdate")).cast("timestamp_ntz").alias("min_month_end"),
    )



@query(
    "filtered_agg",
    """
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_disc,
           CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS n_bulk,
           round(sum(l_extendedprice) FILTER (WHERE l_linestatus = 'O'), 2) AS open_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_filtered_agg(spark, sf_dir):
    """C7: FILTER-clause conditional aggregation (one pass, no self
    joins — at scale this replaces N filtered subqueries with one scan)."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_disc"),
        F.count(F.when(F.col("l_quantity") >= 25, 1)).alias("n_bulk"),
        F.round(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_extendedprice"))), 2).alias("open_price"),
    )


@query(
    "null_safe_join",
    """
    WITH c AS (SELECT c_custkey, nullif(c_nationkey, 0) AS nk FROM customer),
         s AS (SELECT s_suppkey, nullif(s_nationkey, 0) AS nk FROM supplier)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) FILTER (WHERE c.nk IS NULL) AS BIGINT) AS null_pairs
    FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
    """,
)
def q_null_safe_join(spark, sf_dir):
    """C1 variant: null-safe equality join (<=> / IS NOT DISTINCT FROM)
    — NULL keys match each other instead of disappearing."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk")
    )
    sup = load(spark, sf_dir, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey"), F.lit(0)).alias("s_nk")
    )
    j = c.join(sup, c["nk"].eqNullSafe(sup["s_nk"]))
    return j.agg(
        F.count("*").alias("n_pairs"),
        F.count(F.when(F.col("nk").isNull(), 1)).alias("null_pairs"),
    )


@query(
    "string_funcs_extended",
    """
    SELECT p_partkey,
           translate(p_brand, '#', '-')                    AS brand_tr,
           split_part(p_name, ' ', 1)                      AS first_word,
           reverse(p_type)                                 AS type_rev,
           repeat(substr(p_brand, 1, 2), 2)                AS brand2,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|') AS lower_runs
    FROM part
    """,
)
def q_string_funcs_extended(spark, sf_dir):
    """C15 extended: translate/split_part/reverse/repeat/
    regexp_extract_all."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_brand", "#", "-").alias("brand_tr"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.reverse(F.col("p_type")).alias("type_rev"),
        F.repeat(F.substring("p_brand", 1, 2), 2).alias("brand2"),
        # explicit group 0: Spark's regexp_extract_all defaults to group 1
        # (errors on group-less patterns); DuckDB defaults to 0
        F.array_join(F.regexp_extract_all(F.col("p_name"), F.lit("[a-z]+"), 0), "|").alias("lower_runs"),
    )


@query(
    "array_funcs_extended",
    """
    WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS words FROM documents)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(len(list_intersect(a.words, b.words)) AS INT) AS n_common,
           array_to_string(list_sort(list_intersect(a.words, b.words)), ',') AS common_sorted
    FROM w a JOIN w b ON a.doc_id + 1 = b.doc_id
    WHERE a.doc_id < 20
    """,
)
def q_array_funcs_extended(spark, sf_dir):
    """C18 extended: array_distinct/intersect/sort on adjacent-doc word
    sets (sorted + joined so output order is engine-independent)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("words")
    )
    a = d.alias("a")
    b = d.select(F.col("doc_id").alias("b_doc"), F.col("words").alias("b_words"))
    j = a.join(b, F.col("doc_id") + 1 == F.col("b_doc")).filter(F.col("doc_id") < 20)
    inter = F.array_intersect(F.col("words"), F.col("b_words"))
    return j.select(
        F.col("doc_id").alias("a_id"),
        F.col("b_doc").alias("b_id"),
        F.size(inter).cast("int").alias("n_common"),
        F.array_join(F.array_sort(inter), ",").alias("common_sorted"),
    )



IVF_ORACLE_CENTROIDS = "/root/repo/spark-warehouse/ivf_cache/centroids_oracle.parquet"


def _ivf_layout(spark, sf_dir: str, n_lists: int = 16, seed: int = 42):
    """Get-or-build the persisted IVF layout for one testdata corpus:
    train the KMeans quantizer ONCE, write the corpus partitioned by
    list id, save centroids next to it. Every later query loads
    centroids (kilobytes) and scans only probed partitions — the
    production posture (offline build, online probe); VERDICT r02 #3
    flagged the previous in-query training as the scale-killer.

    Also maintains the ORACLE-readable centroid parquet (ROADMAP r03
    #5): one consolidated file holding every trained quantizer keyed by
    a corpus content signature, so the static DuckDB oracle can pick
    its centroid set regardless of which scale factor it runs at. The
    signature is SUM(FLOOR(embedding[1]·1e6)) — exact, order
    independent, and bit-deterministic in both engines (each row is the
    same float32→double multiply; the sum is over integers), unlike a
    row count (sf0.001 and sf0.01 both hold 500 embeddings). The file
    is written on the Spark side of the compare (the query runs before
    its oracle), which is the explicit materialization hook for fresh
    clones."""
    import json
    import os

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    key = f"{os.path.basename(os.path.normpath(sf_dir))}_l{n_lists}_s{seed}"
    root = os.path.join(repo, "spark-warehouse", "ivf_cache", key)
    cents_path = os.path.join(root, "centroids.npy")
    meta_path = os.path.join(root, "meta.json")
    data_path = os.path.join(root, "corpus")
    if not os.path.exists(cents_path):
        e = load(spark, sf_dir, "embeddings", spread=True)
        cents = S.train_ivf_centroids(e, n_lists=n_lists, seed=seed)
        S.write_ivf_partitioned(e, data_path, centroids=cents)
        os.makedirs(root, exist_ok=True)
        np.save(cents_path, cents)
        json.dump({"corpus_sig": _corpus_sig(spark, sf_dir)}, open(meta_path, "w"))
    cents = np.load(cents_path)
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    if "corpus_sig" not in meta:  # cache from a pre-oracle round
        meta["corpus_sig"] = _corpus_sig(spark, sf_dir)
        json.dump(meta, open(meta_path, "w"))
    _upsert_oracle_centroids(cents, meta["corpus_sig"], n_lists, seed)
    return cents, data_path


IVF_SIG_SQL = (
    "SELECT CAST(SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000.0) "
    "AS BIGINT)) AS BIGINT) FROM embeddings"
)


def _corpus_sig(spark, sf_dir: str) -> int:
    """Spark rendering of IVF_SIG_SQL (element_at is 1-based, matching
    DuckDB's [1])."""
    e = load(spark, sf_dir, "embeddings")
    return int(
        e.agg(
            F.sum(
                F.floor(
                    F.element_at("embedding", 1).cast("double") * 1000000.0
                ).cast("bigint")
            )
        ).first()[0]
    )


def _upsert_oracle_centroids(
    cents, corpus_sig: int, n_lists: int, seed: int
) -> None:
    """Idempotently merge one quantizer's centroids into the
    consolidated oracle parquet (columns: corpus_sig, n_lists, seed,
    list_id, centroid double[])."""
    import os

    import pandas as pd

    rows = pd.DataFrame(
        {
            "corpus_sig": int(corpus_sig),
            "n_lists": int(n_lists),
            "seed": int(seed),
            "list_id": range(len(cents)),
            "centroid": [[float(x) for x in c] for c in cents],
        }
    )
    path = IVF_ORACLE_CENTROIDS
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.exists(path):
        old = pd.read_parquet(path)
        same = (
            (old["corpus_sig"] == corpus_sig)
            & (old["n_lists"] == n_lists)
            & (old["seed"] == seed)
        )
        if same.sum() == n_lists:
            return
        rows = pd.concat([old[~same], rows], ignore_index=True)
    rows.to_parquet(path, index=False)


@query(
    "ivf_knn",
    f"""
    WITH cents AS (
      SELECT list_id, centroid
      FROM read_parquet('{IVF_ORACLE_CENTROIDS}')
      WHERE corpus_sig = ({IVF_SIG_SQL})
        AND n_lists = 16 AND seed = 42),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    assign AS (
      SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
             (SELECT c.list_id FROM cents c
              ORDER BY list_aggregate(list_transform(c.centroid, x -> x*x), 'sum')
                       - 2 * list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid) ASC,
                       c.list_id ASC
              LIMIT 1) AS list_id
      FROM embeddings e WHERE e.vec_id <> 0),
    probe AS (
      SELECT c.list_id FROM cents c, q
      ORDER BY list_aggregate(list_transform(c.centroid, x -> x*x), 'sum')
               - 2 * list_dot_product(q.qv, c.centroid) ASC, c.list_id ASC
      LIMIT 8)
    SELECT a.vec_id,
           round(list_cosine_similarity(a.v, q.qv), 4) AS cosine_sim
    FROM assign a JOIN probe p ON a.list_id = p.list_id, q
    ORDER BY cosine_sim DESC, a.vec_id ASC
    LIMIT 10
    """,
)
def q_ivf_knn(spark, sf_dir):
    """C28 scale path #2: IVF over a train-once, partition-pruned
    layout. The quantizer is persisted (built on first touch per
    corpus); the query reads the ivf_list-partitioned parquet, joins a
    broadcast one-row probe relation on the partition column (dynamic
    partition pruning → only n_probe directories scanned) and broadcasts
    the query vector — zero driver-side materialization in the query
    path.

    Oracle (r06, closes the last no_oracle): KMeans training isn't
    DuckDB-expressible, but the TRAINED quantizer is data — the layout
    builder persists centroids to a consolidated parquet keyed by
    corpus size, and the oracle re-derives assignment (argmin of
    ||c||² − 2·v·c, list-id tiebreak — the exact Spark formula), probe
    selection, and the pruned cosine top-k from it. Recall vs brute
    force additionally asserted in tests."""
    cents, data_path = _ivf_layout(spark, sf_dir, n_lists=16, seed=42)
    corpus = spark.read.parquet(data_path)
    # query vector from the flat source table (1-row broadcast side);
    # the partitioned layout is scanned only on the pruned corpus side
    qdf = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0)
    return S.ivf_knn_pruned(
        corpus.filter(F.col("vec_id") != 0), qdf, cents, k=10, n_probe=8
    )



@query(
    "edit_distance",
    """
    SELECT n.n_name, r.r_name,
           CAST(levenshtein(n.n_name, r.r_name) AS INT) AS dist
    FROM nation n CROSS JOIN region r
    """,
)
def q_edit_distance(spark, sf_dir):
    """C15: Levenshtein edit distance (fuzzy matching primitive)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.crossJoin(r).select(
        "n_name", "r_name", F.levenshtein("n_name", "r_name").cast("int").alias("dist")
    )


@query(
    "value_histogram",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def q_value_histogram(spark, sf_dir):
    """C17: fixed-width histogram by floor-bucketing — the
    oracle-checkable form of width_bucket."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )



@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS-correlated subquery → left-semi join."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    l = load(spark, sf_dir, "lineitem")
    sem = o.join(
        l, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi"
    )
    return sem.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q13_order_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def q_q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: two-level aggregation — per-customer order
    counts, then the distribution of those counts."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def q_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: derived view + scalar-max filter (ties kept)."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    sup = load(spark, sf_dir, "supplier")
    revenue = l.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("m"))
    return (
        sup.join(revenue, sup.s_suppkey == revenue.l_suppkey)
        .join(F.broadcast(mx), F.col("total_rev") == F.col("m"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q17_small_quantity",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
          FROM lineitem GROUP BY l_partkey) t
      ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.half_avg
    """,
)
def q_q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-part average → pre-aggregated
    join (the decorrelated plan Spark/Catalyst would produce)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    halves = l.groupBy(F.col("l_partkey").alias("hp")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(halves, l.l_partkey == F.col("hp"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q22_global_sales",
    """
    WITH eligible AS (
      SELECT c_custkey, c_acctbal, substr(c_name, 16, 1) AS cntry
      FROM customer
      WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer WHERE c_acctbal > 0.0)),
    no_orders AS (
      SELECT e.* FROM eligible e
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = e.c_custkey AND o.o_totalprice > 300000))
    SELECT cntry, CAST(count(*) AS BIGINT) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM no_orders GROUP BY cntry
    """,
)
def q_q22_global_sales(spark, sf_dir):
    """TPC-H Q22 shape: scalar-subquery threshold + anti join + group.
    Threshold rounded on both sides so float noise can't flip
    membership. cntry is name digit 16 (names are Customer#%09d, so
    chars 10-11 are constant '00' at test SFs) and the price threshold
    sits at 300000 — the 250000 variant was empty at sf0.001 (caught
    by the r05 non-empty oracle guard)."""
    c = load(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 2).alias("t"))
    )
    eligible = (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("t"))
        .select("c_custkey", "c_acctbal", F.substring("c_name", 16, 1).alias("cntry"))
    )
    # anti join against LARGE orders only (a bare no-orders variant is
    # degenerate on this data: every high-balance customer has orders)
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    no_orders = eligible.join(o, eligible.c_custkey == o.o_custkey, "left_anti")
    return no_orders.groupBy("cntry").agg(
        F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal")
    )



@query(
    "string_agg_nations",
    """
    SELECT r.r_name,
           array_to_string(list_sort(list(n.n_name)), ',') AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_string_agg_nations(spark, sf_dir):
    """C7/C15: ordered string aggregation — sort_array(collect_list)
    forces a deterministic order (bare collect_list/string_agg order is
    engine-dependent)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"))
    )


@query(
    "regression_aggs",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_regression_aggs(spark, sf_dir):
    """C7/C17: linear-regression aggregates (price ~ quantity per
    return flag)."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )




_RECURSIVE_TREE_SQL = """
    WITH RECURSIVE tree(s_suppkey, depth, root) AS (
      SELECT s_suppkey, 0, s_suppkey FROM {supplier} WHERE s_suppkey <= 1
      UNION ALL
      SELECT s.s_suppkey, t.depth + 1, t.root
      FROM {supplier} s JOIN tree t
        ON CAST(floor(s.s_suppkey / 2) AS BIGINT) = t.s_suppkey
      WHERE s.s_suppkey > 1
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(s_suppkey) AS BIGINT) AS first_key,
           CAST(max(s_suppkey) AS BIGINT) AS last_key,
           CAST(count(DISTINCT root) AS BIGINT) AS n_roots
    FROM tree GROUP BY depth ORDER BY depth
    """


@query("recursive_cte_tree", _RECURSIVE_TREE_SQL.format(supplier="supplier"))
def q_recursive_cte_tree(spark, sf_dir):
    """B-series extension (r06-s2): WITH RECURSIVE through Spark SQL —
    new engine surface in Spark 4, hash-checked against DuckDB running
    the SAME query text (one fragment, two dialects — the
    declarative_setops contract). The hierarchy is the synthetic
    binary tree parent = floor(suppkey/2) over the supplier table
    (testdata carries no natural hierarchy): strictly acyclic (child >
    parent for every key > 1), so recursion depth is log2(max key) and
    UNION ALL terminates — Spark does not yet support distinct-UNION
    recursion, so cyclic closures stay on the iterative
    connected-components operator (dedup_components), which converges
    on any graph. Per-level rollup keeps the result
    depth-cardinality-sized."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("rec_supplier")
    return spark.sql(_RECURSIVE_TREE_SQL.format(supplier="rec_supplier"))


@query(
    "variant_funcs",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(min(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS k_min,
           CAST(max(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS k_max,
           CAST(count(CASE WHEN CAST(props::JSON ->> 'k' AS BIGINT) IS NULL
                      THEN 1 END) AS BIGINT) AS k_null
    FROM events GROUP BY event_type
    """,
)
def q_variant_funcs(spark, sf_dir):
    """C19 extension (r06-s2): Spark 4's VARIANT type as the
    semi-structured hot path — ``try_parse_json`` ingests the props
    JSON into the binary variant encoding once in the scan projection
    (NULL, not job failure, on a malformed document — ADVICE r06: plain
    ``parse_json`` would fail the job, contradicting the leniency
    claim), ``try_variant_get`` extracts typed fields without a schema
    declaration (the shredded-JSON pattern replacing per-row
    get_json_object string re-parsing), so both malformed documents and
    missing/mistyped fields yield NULL instead of failing the job. The
    oracle extracts the same field through DuckDB's JSON operators
    (strict ``::JSON`` — testdata props are all well-formed, which the
    k_null column pins) — engine-level agreement on extraction +
    typing + NULL semantics, not just on one string parser."""
    e = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("_k").alias("k_sum"),
            F.min("_k").alias("k_min"),
            F.max("_k").alias("k_max"),
            F.count(F.when(F.col("_k").isNull(), 1)).alias("k_null"),
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("k_sum").cast("bigint").alias("k_sum"),
            F.col("k_min").cast("bigint").alias("k_min"),
            F.col("k_max").cast("bigint").alias("k_max"),
            F.col("k_null").cast("bigint").alias("k_null"),
        )
    )


_LATERAL_TOPN_SQL = """
    SELECT r.r_name, l.c_name, l.c_acctbal
    FROM {region} r, LATERAL (
      SELECT c.c_name, round(c.c_acctbal, 2) AS c_acctbal
      FROM {customer} c JOIN {nation} n ON n.n_nationkey = c.c_nationkey
      WHERE n.n_regionkey = r.r_regionkey
      ORDER BY c.c_acctbal DESC, c.c_name
      LIMIT 2) l
    """


@query(
    "lateral_join_topn",
    _LATERAL_TOPN_SQL.format(region="region", customer="customer", nation="nation"),
)
def q_lateral_join_topn(spark, sf_dir):
    """C-series extension (r06-s2): correlated LATERAL subquery with
    per-row ORDER BY + LIMIT — top-2 customers by balance for EACH
    region, the top-N-per-group idiom in its declarative join form
    (the window row_number form is `declarative_window_topn`; this
    driver-checks the LATERAL decorrelation path itself). Same SQL
    fragment runs on both engines (the recursive_cte_tree contract);
    ordering is made deterministic by the (acctbal DESC, name)
    tiebreak so the LIMIT picks one engine-independent set."""
    for t in ("region", "nation", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView("lat_" + t)
    return spark.sql(
        _LATERAL_TOPN_SQL.format(
            region="lat_region", customer="lat_customer", nation="lat_nation"
        )
    )
