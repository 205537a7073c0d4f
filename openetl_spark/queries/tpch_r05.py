"""remaining TPC-H shapes (r05) + curation/warehouse additions.

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

from openetl_spark.operators import curation as C
from openetl_spark.operators import dedup as D
from openetl_spark.operators import joins as J
from openetl_spark.operators import similarity as S
from openetl_spark.operators import text as X
from openetl_spark.operators import timeseries as TS
from openetl_spark.plans.compiler import compile_connector
from openetl_spark.queries.base import ORACLE, QUERIES, load, query
from openetl_spark.queries.relational_extra import IVF_ORACLE_CENTROIDS, IVF_SIG_SQL, _corpus_sig, _ivf_layout
from openetl_spark.spec import Connector, Filter, FilterGroup, Sort, Transformation

# ---------------------------------------------------------------------
# Remaining TPC-H shapes (r05). The testdata schema omits partsupp and
# the lineitem receipt/commit/shipmode columns, so each query keeps the
# reference shape's *operator structure* (the part the planner sees)
# with predicates adapted to the columns that exist; the DuckDB oracle
# mirrors the adaptation exactly.
# ---------------------------------------------------------------------


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') t
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: the nation table joined twice under different
    roles (supplier side / customer side) with a symmetric pair
    predicate, then a 3-key aggregation. Both nation relations
    broadcast; the only shuffles are the orders equi-join and the
    final group-by."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n2.n_regionkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') t
    GROUP BY o_year
    """,
)
def q_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: 7-relation star join with a conditional
    numerator over the full denominator (one nation's share of
    regional volume per year). part is filtered before the join and
    broadcast; region restricts the customer side via two broadcast
    hops."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(0.0)) / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    """
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%red%') t
    GROUP BY nation, o_year
    """,
)
def q_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit per supplier-nation per year over a
    part-name pattern filter. The testdata has no partsupp, so supply
    cost is proxied as 0.6 * p_retailprice (the oracle mirrors the
    proxy); the plan shape — substring-pattern dim filter broadcast
    into a fact join, expression agg over a derived column — is the
    reference's."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


@query(
    "q12_shipping_delay",
    """
    SELECT delay_band,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                  THEN 'FAST' ELSE 'SLOW' END AS delay_band,
             o.o_orderpriority
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00') t
    GROUP BY delay_band
    """,
)
def q_q12_shipping_delay(spark, sf_dir):
    """TPC-H Q12 shape: join + dual conditional counts per band. The
    testdata has no l_shipmode/receipt/commit columns, so the band is
    derived from shipping delay (≤30 days = FAST) instead of ship
    mode; the CASE-sum structure the reference exercises is
    unchanged."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    band = F.when(
        F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "FAST"
    ).otherwise("SLOW")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(band.alias("delay_band"), F.col("o_orderpriority"))
        .groupBy("delay_band")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q19_discounted_revenue",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q_q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    bands evaluated across the join boundary. The part side of each
    disjunct (brand+size) is pushable; the mixed part×lineitem residual
    stays a post-join filter — exactly what Catalyst does with the
    reference predicate (container/shipmode swapped for columns the
    testdata has)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    d1 = (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & qty.between(1, 20)
    d2 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & qty.between(10, 40)
    d3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & qty.between(20, 50)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(d1 | d2 | d3)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q21_waiting_supplier",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
    multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1),
    solo_late AS (
      SELECT l_orderkey FROM late
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) = 1)
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late
    JOIN multi     USING (l_orderkey)
    JOIN solo_late USING (l_orderkey)
    JOIN supplier s ON s.s_suppkey = late.l_suppkey
    GROUP BY s.s_name
    """,
)
def q_q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers solely responsible for late
    multi-supplier orders. The reference's correlated EXISTS /
    NOT EXISTS pair decorrelates to two per-order aggregates (any
    other supplier on the order; no other LATE supplier on the order)
    — written directly in that decorrelated form so the same plan
    runs on both engines. Late = shipped >60 days after the order
    date (testdata has no receipt/commit columns)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    multi = (
        l.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    solo_late = (
        late.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_late"))
        .filter(F.col("n_late") == 1)
        .select("l_orderkey")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        late.join(multi, "l_orderkey")
        .join(solo_late, "l_orderkey")
        .join(F.broadcast(s), late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
      SELECT s.s_suppkey, s.s_name, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'),
    best AS (
      SELECT c.l_partkey, min(c.unit_price) AS best_price
      FROM cost c JOIN eu ON eu.s_suppkey = c.l_suppkey
      GROUP BY c.l_partkey)
    SELECT p.p_partkey, p.p_brand, eu.s_name, eu.n_name AS nation,
           round(c.unit_price, 2) AS unit_price
    FROM cost c
    JOIN eu   ON eu.s_suppkey = c.l_suppkey
    JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_price = b.best_price
    JOIN part p ON p.p_partkey = c.l_partkey
    WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
    """,
)
def q_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per-part minimum over a restricted supplier set,
    re-joined by value equality (ties kept). partsupp's supply cost is
    proxied by the observed minimum unit price in lineitem — raw IEEE
    division and min only, so the equality join compares bit-identical
    doubles on both engines; rounding happens on output alone."""
    l = load(spark, sf_dir, "lineitem")
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )
    eu_cost = cost.join(F.broadcast(eu), cost.l_suppkey == F.col("s_suppkey"))
    best = eu_cost.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("unit_price").alias("best_price")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    return (
        eu_cost.join(
            best,
            (eu_cost.l_partkey == F.col("bp"))
            & (F.col("unit_price") == F.col("best_price")),
        )
        .join(F.broadcast(p), eu_cost.l_partkey == p.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "nation",
            F.round("unit_price", 2).alias("unit_price"),
        )
    )


@query(
    "q11_important_value",
    """
    WITH val AS (
      SELECT l.l_partkey,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey)
    SELECT l_partkey, round(value, 2) AS value
    FROM val
    WHERE round(value, 2) > (SELECT round(avg(value) * 2, 2) FROM val)
    """,
)
def q_q11_important_value(spark, sf_dir):
    """TPC-H Q11 shape: grouped value with a HAVING threshold that is
    itself a scalar aggregate over the same grouped view (decorrelated
    to a broadcast of the one-row total). Both sides of the comparison
    are rounded to cents so an order-of-summation ulp can't flip
    membership. The threshold is 2× the MEAN per-part value (TPC-H's
    spec fraction scales as 1/SF precisely because a fixed share of
    the TOTAL empties out as the part population grows — the sf0.1
    oracle sweep caught exactly that vacuation; a mean-relative cut is
    non-empty at every SF)."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    threshold = val.agg(F.round(F.avg("value") * 2, 2).alias("t"))
    return (
        val.join(F.broadcast(threshold))
        .filter(F.round(F.col("value"), 2) > F.col("t"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


@query(
    "q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_size, CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    """,
)
def q_q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    group, with a NOT IN exclusion subquery (suppliers in arrears).
    s_suppkey is non-null so NOT IN is exactly a broadcast anti
    join; the part relationship comes from lineitem (no partsupp in
    the testdata)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "vocab_sketch_topk",
    """
    WITH ex AS (
      SELECT UNNEST(list_transform(
               list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''),
               x -> lower(x))) AS token
      FROM documents),
    cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
            FROM ex GROUP BY token)
    SELECT token, n_occurrences, n_occurrences AS lo, n_occurrences AS hi
    FROM cnt ORDER BY n_occurrences DESC, token ASC LIMIT 60
    """,
)
def q_vocab_sketch_topk(spark, sf_dir):
    """Curation (r05): approximate vocabulary heavy hitters via
    per-partition SpaceSaving summaries — the sketch path that replaces
    `vocab_topk`'s exact one-row-per-distinct-token shuffle when the
    distinct-token count itself is web-scale. Run here with capacity
    (64k) far above the per-partition distinct count, where SpaceSaving
    is provably exact (no counter is ever evicted, lo = hi = count), so
    the full pipeline — streamed sketch build, threshold bookkeeping,
    bound-merging shuffle, top-k — oracle-checks against DuckDB's exact
    counts; the eviction/bound path is pinned by property tests at
    small capacity (tests/test_curation.py)."""
    d = load(spark, sf_dir, "documents", spread=True)
    return C.vocab_topk_sketch(d, "text", k=60, capacity=65536)


@query(
    "training_shuffle",
    f"""
    WITH keyed AS (
      SELECT doc_id,
             md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS k,
             CAST(({C.hash_bucket_sql("'shuf42:' || CAST(doc_id AS VARCHAR)", 16)})
                  AS INTEGER) AS shard
      FROM documents)
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS INTEGER) AS pos_in_shard
    FROM keyed
    """,
)
def q_training_shuffle(spark, sf_dir):
    """Curation (r05): deterministic training-order shuffle — a
    reproducible pseudo-random permutation of the corpus as (shard,
    pos_in_shard), built from one hash shuffle + per-shard sort (no
    global range exchange). The oracle recomputes the identical md5
    key and bucket mix in DuckDB, so the full permutation — not just
    its shape — is hash-checked."""
    d = load(spark, sf_dir, "documents", spread=True)
    return C.deterministic_shuffle(d, "doc_id", seed="42", n_shards=16)


@query(
    "funnel_conversion",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS tv FROM events WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.tv GROUP BY 1),
    p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.tc GROUP BY 1)
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase,
           round(CAST((SELECT count(*) FROM c) AS DOUBLE) /
                 (SELECT count(*) FROM v), 4) AS view_to_click,
           round(CAST((SELECT count(*) FROM p) AS DOUBLE) /
                 (SELECT count(*) FROM c), 4) AS click_to_purchase
    """,
)
def q_funnel_conversion(spark, sf_dir):
    """Event-analytics breadth: ordered funnel view → click → purchase.
    Each stage is a user-keyed aggregate joined to the next stage's
    events with a time-ordering predicate (the click must FOLLOW the
    user's first view, the purchase that click) — the standard
    decorrelated funnel, three user-keyed shuffles, no window over the
    event stream. At 100 TB each stage's per-user relation is a
    fraction of the previous, so the joins shrink monotonically."""
    e = load(spark, sf_dir, "events")
    # persist (r12): each stage relation feeds BOTH the next stage's
    # join and its own count — left lazy, the event scan re-executed 6×
    # per invocation (the funnel_steps frontier discipline; p has a
    # single consumer and stays lazy).
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
        .persist()
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
        .persist()
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    counts = (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase")))
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        F.round(F.col("n_click").cast("double") / F.col("n_view"), 4).alias(
            "view_to_click"
        ),
        F.round(
            F.col("n_purchase").cast("double") / F.col("n_click"), 4
        ).alias("click_to_purchase"),
    )


@query(
    "retention_cohorts",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY 1),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week,
                  CAST(date_trunc('week', e.ts) AS DATE)) / 7) AS BIGINT) AS week_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_offset, CAST(count(*) AS BIGINT) AS n_active
    FROM activity
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark, sf_dir):
    """Event-analytics breadth: weekly retention cohorts — users
    grouped by first-seen week, counted as active per later week
    offset (the triangle every growth dashboard draws). One user-keyed
    aggregate for cohort assignment, one join back (user-keyed), one
    distinct + count per (cohort, offset). Week truncation is ISO
    Monday in both engines."""
    e = load(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    act = (
        e.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            ).alias("week_offset"),
        )
        .distinct()
    )
    # string cohort key: a DATE cell round-trips differently through
    # pandas in the two engines (datetime64 vs date) — the same class
    # of canonicalization hazard as array cells
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
        )
    )


@query(
    "histogram_quantiles",
    """
    WITH b AS (
      SELECT CAST(floor(l_extendedprice / 525.0) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1),
    cum AS (
      SELECT bin, c,
             sum(c) OVER (ORDER BY bin) AS cum,
             sum(c) OVER () AS n
      FROM b)
    SELECT round(525.0 * min(CASE WHEN cum >= 0.50 * n THEN bin END), 2) AS p50_est,
           round(525.0 * min(CASE WHEN cum >= 0.90 * n THEN bin END), 2) AS p90_est,
           round(525.0 * min(CASE WHEN cum >= 0.99 * n THEN bin END), 2) AS p99_est
    FROM cum
    """,
)
def q_histogram_quantiles(spark, sf_dir):
    """C7/C17 scale path (r05): percentiles from a fixed-width 200-bin
    histogram — the mergeable, fixed-memory alternative to
    percentile_exact's global sort. One scan produces ≤200 (bin,count)
    rows (partial-agg map-side), the cumulative pass runs over those
    rows alone, and estimates are the lower edge of the first bin whose
    cumulative count crosses q·n — deterministic by construction, so
    unlike t-digest/GK sketches the whole path oracle-checks exactly.
    Error is bounded by one bin width (pinned in
    tests/test_scale_helpers.py); at 100 TB the same 200-row merge
    serves any partition count."""
    l = load(spark, sf_dir, "lineitem")
    w = 525.0
    b = (
        l.select(F.floor(F.col("l_extendedprice") / w).cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("c"))
    )
    # Both windows run over the same ≤200-row single partition (that's
    # the point of the sketch: post-scan state is bin-count-sized) —
    # computing n as a window total instead of a separate aggregate
    # keeps the plan to ONE scan of the fact table.
    win = W.orderBy("bin").rangeBetween(W.unboundedPreceding, W.currentRow)
    win_all = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cum = b.withColumn("cum", F.sum("c").over(win)).withColumn(
        "n", F.sum("c").over(win_all)
    )

    def est(q, alias):
        return F.round(
            w * F.min(F.when(F.col("cum") >= q * F.col("n"), F.col("bin"))), 2
        ).alias(alias)

    return cum.agg(est(0.50, "p50_est"), est(0.90, "p90_est"), est(0.99, "p99_est"))


@query(
    "multires_rollup",
    """
    WITH lvl AS (
      SELECT '15m' AS resolution, time_bucket(INTERVAL '15 minutes', ts) AS bucket_start,
             event_type, value FROM events
      UNION ALL
      SELECT '1h', date_trunc('hour', ts), event_type, value FROM events
      UNION ALL
      SELECT '1d', date_trunc('day', ts), event_type, value FROM events)
    SELECT resolution, bucket_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           floor(round(sum(value), 2) * 10000.0 / count(*)) / 10000.0 AS avg_value
    FROM lvl GROUP BY 1, 2, 3
    """,
)
def q_multires_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate (TimescaleDB/Druid rollup
    pattern; no counterpart in the reference, which has no time-series
    surface at all): 15-minute mergeable partial cells from ONE raw
    scan, hourly and daily levels RE-AGGREGATED from those cells —
    counts/sums re-add, min/max re-min/max, avg derived at read time
    (it is not mergeable, so it is never stored). At 100 TB each coarse
    resolution costs a pass over the next-finer CELL relation (a few
    thousand rows per key-day), not the raw corpus; the cells are
    exactly what a Structured Streaming aggregation would maintain
    incrementally. The oracle computes every level DIRECTLY from raw
    events in DuckDB, so this query proves re-aggregation ≡ re-scan,
    not merely that both engines ran the same two-step plan. See
    operators/timeseries.py."""
    e = load(spark, sf_dir, "events")
    return TS.multi_resolution(e, keys=("event_type",))


@query(
    "bm25_topk",
    """
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    st AS (
      SELECT count(*) AS n_docs, avg(CAST(len(toks) AS DOUBLE)) AS avgdl,
             count(*) FILTER (len(list_filter(toks, x -> x = 'spark')) > 0) AS df0,
             count(*) FILTER (len(list_filter(toks, x -> x = 'vector')) > 0) AS df1,
             count(*) FILTER (len(list_filter(toks, x -> x = 'dup')) > 0) AS df2
      FROM tk),
    pc AS (
      SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
             CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) AS tf0,
             CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf1,
             CAST(len(list_filter(toks, x -> x = 'dup')) AS DOUBLE) AS tf2
      FROM tk),
    scored AS (
      SELECT doc_id,
             round(
               ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5))
                 * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5))
                 * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5))
                 * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS bm25
      FROM pc, st)
    SELECT doc_id, bm25 FROM scored
    WHERE bm25 > 0.0
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 25
    """,
)
def q_bm25_topk(spark, sf_dir):
    """BM25 relevance top-k over documents (k1=1.2, b=0.75, Lucene idf)
    — the query-targeted corpus-mining scorer. Corpus stats (N, avgdl,
    per-term df) come from one aggregate pass producing a 1-row
    broadcast relation; term frequencies are scan-side array
    expressions; the only shuffle is the final TakeOrdered top-k. The
    oracle recomputes the identical formula (same literal folding, same
    association order) in DuckDB. See operators/text.py::bm25_topk."""
    d = load(spark, sf_dir, "documents", spread=True)
    return X.bm25_topk(d, ["spark", "vector", "dup"], k=25)


