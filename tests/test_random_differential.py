"""Randomized groupBy/agg differential sweep (ROADMAP #5, generalizing
the hand-written oracle catalog): seeded random (filter, group-keys,
aggregates) specs over lineitem are rendered BOTH as a Spark DataFrame
query and as DuckDB SQL, then compared with the same order-insensitive
value check the driver gate uses. 30 seeds × up to 4 aggregates each —
a few hundred engine-vs-engine agreement points per run, all
reproducible from the seed.

Every compare here passes ``allow_empty=True``: an individual RANDOM
draw may legitimately select zero rows (e.g. an anti-join whose random
threshold excludes everyone) — ensemble coverage comes from the seed
sweep, unlike catalog queries where a fixed spec matching empty is
vacuous and rejected (the r05 non-empty guard).

Rounding conventions follow the catalog's proven-stable forms
(`q1_pricing`): sums→2dp, avgs→4dp, counts→BIGINT; min/max compare raw
(identical doubles from the same parquet)."""

import random

import pytest
from pyspark.sql import functions as F

from openetl_spark import catalog
from tests.oracle_utils import compare, duckdb_con

CATS = ["l_returnflag", "l_linestatus"]
NUMS = {
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (900.0, 105000.0),
    "l_discount": (0.0, 0.1),
    "l_tax": (0.0, 0.08),
}

AGG_KINDS = ["sum", "avg", "min", "max", "cnt", "cntd"]


def gen_spec(seed: int):
    rng = random.Random(seed)
    keys = rng.sample(CATS, rng.randint(0, len(CATS)))
    aggs = []
    for i in range(rng.randint(1, 4)):
        aggs.append((rng.choice(AGG_KINDS), rng.choice(sorted(NUMS)), f"a{i}"))
    filt = None
    if rng.random() < 0.7:
        col = rng.choice(sorted(NUMS))
        lo, hi = NUMS[col]
        filt = (col, rng.choice(["<", "<=", ">", ">="]), round(rng.uniform(lo, hi), 2))
    return keys, aggs, filt


def spark_query(spark, sf_dir, spec):
    keys, aggs, filt = spec
    df = catalog.load(spark, sf_dir, "lineitem")
    if filt:
        col, op, val = filt
        cond = {"<": F.col(col) < val, "<=": F.col(col) <= val,
                ">": F.col(col) > val, ">=": F.col(col) >= val}[op]
        df = df.filter(cond)
    exprs = []
    for kind, col, alias in aggs:
        e = {
            "sum": lambda: F.round(F.sum(col), 2),
            "avg": lambda: F.round(F.avg(col), 4),
            "min": lambda: F.min(col),
            "max": lambda: F.max(col),
            "cnt": lambda: F.count(col),
            "cntd": lambda: F.countDistinct(col),
        }[kind]()
        exprs.append(e.alias(alias))
    return df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)


def duckdb_sql(spec) -> str:
    keys, aggs, filt = spec
    sel = list(keys)
    for kind, col, alias in aggs:
        expr = {
            "sum": f"round(sum({col}), 2)",
            "avg": f"round(avg({col}), 4)",
            "min": f"min({col})",
            "max": f"max({col})",
            "cnt": f"CAST(count({col}) AS BIGINT)",
            "cntd": f"CAST(count(DISTINCT {col}) AS BIGINT)",
        }[kind]
        sel.append(f"{expr} AS {alias}")
    sql = f"SELECT {', '.join(sel)} FROM lineitem"
    if filt:
        col, op, val = filt
        sql += f" WHERE {col} {op} {val}"
    if keys:
        sql += f" GROUP BY {', '.join(keys)}"
    return sql


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("seed", range(30))
def test_random_agg_spec_matches_duckdb(spark, sf_dir, con, seed):
    spec = gen_spec(seed)
    ok, msg = compare(spark_query(spark, sf_dir, spec), con, duckdb_sql(spec), allow_empty=True)
    assert ok, f"seed={seed} spec={spec}: {msg}"


# ------------------------------------------------- random join + agg

JOIN_KEYS = ["c_mktsegment", "o_orderpriority", "o_orderstatus"]
JOIN_NUMS = {"o_totalprice": (1000.0, 400000.0), "c_acctbal": (-999.0, 9999.0)}


def gen_join_spec(seed: int):
    rng = random.Random(10_000 + seed)
    keys = rng.sample(JOIN_KEYS, rng.randint(1, 2))
    agg_col = rng.choice(sorted(JOIN_NUMS))
    kinds = rng.sample(["sum", "avg", "cnt"], rng.randint(1, 3))
    filt = None
    if rng.random() < 0.7:
        col = rng.choice(sorted(JOIN_NUMS))
        lo, hi = JOIN_NUMS[col]
        filt = (col, rng.choice(["<", ">"]), round(rng.uniform(lo, hi), 2))
    return keys, agg_col, kinds, filt


@pytest.mark.parametrize("seed", range(20))
def test_random_join_agg_matches_duckdb(spark, sf_dir, con, seed):
    keys, agg_col, kinds, filt = gen_join_spec(seed)
    o = catalog.load(spark, sf_dir, "orders")
    c = catalog.load(spark, sf_dir, "customer")
    df = o.join(c, o["o_custkey"] == c["c_custkey"])
    cond_sql = ""
    if filt:
        col, op, val = filt
        df = df.filter(F.col(col) < val if op == "<" else F.col(col) > val)
        cond_sql = f" AND {col} {op} {val}"
    exprs = {
        "sum": F.round(F.sum(agg_col), 2).alias("s"),
        "avg": F.round(F.avg(agg_col), 4).alias("m"),
        "cnt": F.count(F.lit(1)).alias("n"),
    }
    sqls = {
        "sum": f"round(sum({agg_col}), 2) AS s",
        "avg": f"round(avg({agg_col}), 4) AS m",
        "cnt": "CAST(count(*) AS BIGINT) AS n",
    }
    spark_df = df.groupBy(*keys).agg(*[exprs[k] for k in kinds])
    sql = (
        f"SELECT {', '.join(keys)}, {', '.join(sqls[k] for k in kinds)} "
        f"FROM orders JOIN customer ON o_custkey = c_custkey"
        f" WHERE 1=1{cond_sql} GROUP BY {', '.join(keys)}"
    )
    ok, msg = compare(spark_df, con, sql, allow_empty=True)
    assert ok, f"seed={seed}: {msg}"


# ----------------------------------------------- random window functions

WIN_FUNCS = ["row_number", "rank", "dense_rank", "lag", "lead", "frame_sum", "frame_avg"]


@pytest.mark.parametrize("seed", range(15))
def test_random_window_spec_matches_duckdb(spark, sf_dir, con, seed):
    """Windows over a UNIQUE total ordering (value, l_orderkey,
    l_linenumber) so every analytic function is deterministic; frame
    aggregates use short ROWS frames so double rounding stays stable."""
    from pyspark.sql import Window as W

    rng = random.Random(30_000 + seed)
    part = rng.choice(CATS)
    val = rng.choice(sorted(NUMS))
    desc = rng.random() < 0.5
    fns = rng.sample(WIN_FUNCS, rng.randint(1, 3))

    order_cols = [F.col(val).desc() if desc else F.col(val).asc(),
                  F.col("l_orderkey").asc(), F.col("l_linenumber").asc()]
    sql_order = (f"{val} {'DESC' if desc else 'ASC'}, "
                 f"l_orderkey ASC, l_linenumber ASC")
    w = W.partitionBy(part).orderBy(*order_cols)
    wf = w.rowsBetween(-3, 0)

    exprs, sqls = [], []
    for i, fn in enumerate(fns):
        a = f"w{i}"
        if fn in ("row_number", "rank", "dense_rank"):
            exprs.append(getattr(F, fn)().over(w).cast("long").alias(a))
            sqls.append(f"CAST({fn}() OVER win AS BIGINT) AS {a}")
        elif fn in ("lag", "lead"):
            exprs.append(getattr(F, fn)(val, 1).over(w).alias(a))
            sqls.append(f"{fn}({val}, 1) OVER win AS {a}")
        elif fn == "frame_sum":
            exprs.append(F.round(F.sum(val).over(wf), 2).alias(a))
            sqls.append(f"round(sum({val}) OVER winf, 2) AS {a}")
        else:
            exprs.append(F.round(F.avg(val).over(wf), 4).alias(a))
            sqls.append(f"round(avg({val}) OVER winf, 4) AS {a}")

    l = catalog.load(spark, sf_dir, "lineitem")
    spark_df = l.select("l_orderkey", "l_linenumber", F.col(part), *exprs)
    sql = (
        f"SELECT l_orderkey, l_linenumber, {part}, {', '.join(sqls)} "
        f"FROM lineitem "
        f"WINDOW win AS (PARTITION BY {part} ORDER BY {sql_order}), "
        f"winf AS (PARTITION BY {part} ORDER BY {sql_order} "
        f"ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
    )
    ok, msg = compare(spark_df, con, sql, allow_empty=True)
    assert ok, f"seed={seed} part={part} val={val} fns={fns}: {msg}"


# --------------------------------------------- random deterministic top-k

@pytest.mark.parametrize("seed", range(15))
def test_random_topk_matches_duckdb(spark, sf_dir, con, seed):
    """Sort + limit with a unique tiebreak key (o_orderkey) so the
    result SET is deterministic across engines."""
    rng = random.Random(20_000 + seed)
    val = rng.choice(["o_totalprice", "o_orderdate"])
    desc = rng.random() < 0.5
    k = rng.randint(1, 40)
    o = catalog.load(spark, sf_dir, "orders")
    order = [F.col(val).desc() if desc else F.col(val).asc(), F.col("o_orderkey").asc()]
    spark_df = o.select("o_orderkey", val).orderBy(*order).limit(k)
    sql = (
        f"SELECT o_orderkey, {val} FROM orders "
        f"ORDER BY {val} {'DESC' if desc else 'ASC'}, o_orderkey ASC LIMIT {k}"
    )
    ok, msg = compare(spark_df, con, sql, allow_empty=True)
    assert ok, f"seed={seed} val={val} desc={desc} k={k}: {msg}"


# ---------------------------------------------------------------- curation

LANGS = ["de", "en", "es", "fr", "zh"]


def gen_sample_spec(seed: int):
    rng = random.Random(1000 + seed)
    strata = rng.sample(LANGS, rng.randint(1, len(LANGS)))
    rates = {s: rng.randint(1, 99) / 100 for s in strata}
    default = rng.choice([0.0, rng.randint(0, 50) / 100])
    return rates, default


@pytest.mark.parametrize("seed", range(12))
def test_random_stratified_sample_matches_duckdb(spark, sf_dir, con, seed):
    """Engine-portable sampling: ANY whole-percent rate map must yield
    byte-identical membership in Spark and DuckDB (the float-cast
    divergence class is pinned out by integer percent literals)."""
    from openetl_spark.operators import curation as C

    rates, default = gen_sample_spec(seed)
    d = catalog.load(spark, sf_dir, "documents")
    df = C.stratified_sample(d, rates, "lang", "doc_id", default).select(
        "doc_id", "lang"
    )
    case = " ".join(
        f"WHEN lang = '{s}' THEN {int(round(r * 100))}" for s, r in sorted(rates.items())
    )
    sql = f"""
    SELECT doc_id, lang FROM documents
    WHERE {C.hash_bucket_sql('doc_id', 100)}
          < (CASE {case} ELSE {int(round(default * 100))} END)
    """
    ok, msg = compare(df, con, sql, allow_empty=True)
    assert ok, f"seed {seed} rates {rates} default {default}: {msg}"


@pytest.mark.parametrize("seed", range(8))
def test_random_sequence_packing_matches_duckdb(spark, sf_dir, con, seed):
    from openetl_spark.operators import curation as C

    rng = random.Random(2000 + seed)
    budget = rng.choice([64, 128, 256, 384, 512, 768, 1024])
    group = rng.choice(["lang", "source"])
    d = catalog.load(spark, sf_dir, "documents")
    df = C.pack_sequences(d, budget=budget, group_col=group)
    sql = f"""
    WITH t AS (
      SELECT {group}, doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS INT) AS n_tokens
      FROM documents),
    c AS (
      SELECT {group}, doc_id, n_tokens,
             COALESCE(sum(n_tokens) OVER (PARTITION BY {group} ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
      FROM t)
    SELECT {group}, CAST(floor(tokens_before / {budget}.0) AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY 1, 2
    """
    ok, msg = compare(df, con, sql, allow_empty=True)
    assert ok, f"seed {seed} budget {budget} group {group}: {msg}"


# ------------------------------------------------------------------
# EXISTS / NOT EXISTS + scalar-subquery threshold sweep (r05 — the
# decorrelated shapes q21/q22/q11 exercise, randomized)
# ------------------------------------------------------------------


def gen_exists_spec(seed: int):
    rng = random.Random(10_000 + seed)
    mode = rng.choice(["semi", "anti"])
    order_thr = round(rng.uniform(50_000, 350_000), 2)
    bal_frac = round(rng.uniform(0.5, 1.5), 2)
    return mode, order_thr, bal_frac


@pytest.mark.parametrize("seed", range(12))
def test_random_exists_threshold_matches_duckdb(spark, sf_dir, con, seed):
    mode, order_thr, bal_frac = gen_exists_spec(seed)
    c = catalog.load(spark, sf_dir, "customer")
    thr = c.agg(F.round(F.avg("c_acctbal") * bal_frac, 2).alias("t"))
    eligible = c.join(F.broadcast(thr)).filter(F.col("c_acctbal") > F.col("t"))
    o = catalog.load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > order_thr)
    joined = eligible.join(
        o, eligible.c_custkey == o.o_custkey, "left_semi" if mode == "semi" else "left_anti"
    )
    df = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("bal")
    )
    neg = "" if mode == "semi" else "NOT "
    sql = f"""
    WITH thr AS (SELECT round(avg(c_acctbal) * {bal_frac}, 2) AS t FROM customer)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           round(sum(c_acctbal), 2) AS bal
    FROM customer c, thr
    WHERE c.c_acctbal > thr.t
      AND {neg}EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > {order_thr})
    GROUP BY c_mktsegment
    """
    ok, msg = compare(df, con, sql, allow_empty=True)
    assert ok, f"seed {seed} spec {(mode, order_thr, bal_frac)}: {msg}"


# ------------------------------------------------------------------
# Custom-join sweeps (r05): bucketed range join and as-of join across
# randomized windows / directions / event-type pairs
# ------------------------------------------------------------------

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def gen_range_spec(seed: int):
    rng = random.Random(20_000 + seed)
    minutes = rng.choice([10, 30, 45, 90, 150])
    # bucket width around the interval span: the operator must be
    # correct for any width (coarser/finer only changes candidates)
    width = minutes * 60 * rng.choice([0.5, 1.0, 2.0])
    return minutes, int(width)


@pytest.mark.parametrize("seed", range(8))
def test_random_range_join_matches_duckdb(spark, sf_dir, con, seed):
    from openetl_spark.operators import joins as J

    minutes, width = gen_range_spec(seed)
    e = catalog.load(spark, sf_dir, "events")
    a = e.select("user_id", F.col("ts").alias("a_ts"))
    b = e.select(
        "user_id",
        F.col("ts").alias("b_ts"),
        (F.col("ts") - F.expr(f"INTERVAL {minutes} MINUTES")).alias("b_lo"),
    )
    joined = J.range_join(
        a, b, on=["user_id"], left_point="a_ts", right_lo="b_lo",
        right_hi="b_ts", bucket_width=width,
    ).filter(F.col("b_ts") > F.col("a_ts"))
    df = joined.groupBy(a["user_id"]).agg(F.count("*").alias("pair_count"))
    sql = f"""
    SELECT a.user_id, CAST(count(*) AS BIGINT) AS pair_count
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL {minutes} MINUTE
    GROUP BY a.user_id
    """
    ok, msg = compare(df, con, sql, allow_empty=True)
    assert ok, f"seed {seed} minutes={minutes} width={width}: {msg}"


def gen_asof_spec(seed: int):
    rng = random.Random(30_000 + seed)
    lt, rt = rng.sample(EVENT_TYPES, 2)
    direction = rng.choice(["backward", "forward"])
    return lt, rt, direction


@pytest.mark.parametrize("seed", range(8))
def test_random_asof_join_matches_duckdb(spark, sf_dir, con, seed):
    from openetl_spark.operators import joins as J

    lt, rt, direction = gen_asof_spec(seed)
    e = catalog.load(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == lt).select("event_id", "user_id", "ts")
    right = e.filter(F.col("event_type") == rt).select("user_id", "ts")
    out = J.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=[], direction=direction,
    ).select("event_id", F.date_trunc("second", F.col("ts_asof")).alias("ts_asof"))
    agg, cmp = ("max", "<=") if direction == "backward" else ("min", ">=")
    sql = f"""
    SELECT p.event_id,
           date_trunc('second',
             (SELECT {agg}(b.ts) FROM events b
              WHERE b.user_id = p.user_id AND b.event_type = '{rt}'
                AND b.ts {cmp} p.ts)) AS ts_asof
    FROM events p WHERE p.event_type = '{lt}'
    """
    ok, msg = compare(out, con, sql, allow_empty=True)
    assert ok, f"seed {seed} spec {(lt, rt, direction)}: {msg}"


# ------------------------------------------------------------------
# Rollup / cube sweep (r05): grouping-set shapes with grouping_id
# ------------------------------------------------------------------


def gen_rollup_spec(seed: int):
    rng = random.Random(40_000 + seed)
    kind = rng.choice(["rollup", "cube"])
    keys = rng.sample(CATS, 2) if rng.random() < 0.5 else [rng.choice(CATS)]
    col = rng.choice(sorted(NUMS))
    return kind, keys, col


@pytest.mark.parametrize("seed", range(10))
def test_random_rollup_cube_matches_duckdb(spark, sf_dir, con, seed):
    kind, keys, col = gen_rollup_spec(seed)
    df = catalog.load(spark, sf_dir, "lineitem")
    grouped = df.rollup(*keys) if kind == "rollup" else df.cube(*keys)
    out = grouped.agg(
        F.round(F.sum(col), 2).alias("s"),
        F.count("*").alias("n"),
        F.grouping_id().alias("gid"),
    )
    key_list = ", ".join(keys)
    sql = f"""
    SELECT {key_list},
           round(sum({col}), 2) AS s,
           CAST(count(*) AS BIGINT) AS n,
           CAST(GROUPING({key_list}) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY {kind.upper()} ({key_list})
    """
    ok, msg = compare(out, con, sql, allow_empty=True)
    assert ok, f"seed {seed} spec {(kind, keys, col)}: {msg}"


@pytest.mark.parametrize("seed", range(8))
def test_random_sharded_packing_matches_duckdb(spark, sf_dir, con, seed):
    """r06 scale path randomized: for ANY (budget, group, n_shards) the
    (group, shard)-keyed packing with per-shard bin offsets must match
    the full DuckDB rendering of the same algorithm."""
    from openetl_spark.operators import curation as C

    rng = random.Random(3000 + seed)
    budget = rng.choice([64, 128, 256, 384, 512, 768, 1024])
    group = rng.choice(["lang", "source"])
    n_shards = rng.choice([2, 4, 8, 16])
    d = catalog.load(spark, sf_dir, "documents")
    df = C.pack_sequences(d, budget=budget, group_col=group, n_shards=n_shards)
    shard_expr = C.hash_bucket_sql("'pack0:' || CAST(doc_id AS VARCHAR)", n_shards)
    sql = f"""
    WITH t AS (
      SELECT {group}, doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS INT) AS n_tokens,
             {shard_expr} AS shard
      FROM documents),
    c AS (
      SELECT {group}, shard, doc_id, n_tokens,
             COALESCE(sum(n_tokens) OVER (PARTITION BY {group}, shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
      FROM t),
    l AS (
      SELECT *, CAST(floor(tokens_before / {budget}.0) AS BIGINT) AS local_bin FROM c),
    off AS (
      SELECT {group}, shard,
             CAST(COALESCE(sum(max_bin + 1) OVER (PARTITION BY {group} ORDER BY shard
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bin_offset
      FROM (SELECT {group}, shard, max(local_bin) AS max_bin FROM l GROUP BY 1, 2))
    SELECT l.{group}, CAST(l.local_bin + o.bin_offset AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM l JOIN off o ON l.{group} = o.{group} AND l.shard = o.shard
    GROUP BY 1, 2
    """
    ok, msg = compare(df, con, sql, allow_empty=True)
    assert ok, f"seed {seed} budget {budget} group {group} shards {n_shards}: {msg}"


@pytest.mark.parametrize("seed", range(8))
def test_random_length_band_matches_duckdb(spark, sf_dir, con, seed):
    """r06 two-pass gate randomized: for ANY (lo, hi, stratum) the
    histogram-derived exact rank must match DuckDB's percent_rank
    window rendering (the two formulations are provably equal on
    tie-atomic ranks)."""
    from openetl_spark.operators import curation as C

    rng = random.Random(4000 + seed)
    lo = round(rng.uniform(0.0, 0.4), 2)
    hi = round(rng.uniform(lo + 0.1, 1.0), 2)
    strata = rng.choice(["lang", "source"])
    d = catalog.load(spark, sf_dir, "documents")
    df = C.length_band_filter(d, lo, hi, strata, "doc_id", "text")
    sql = f"""
    WITH t AS (
      SELECT doc_id, {strata},
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS INT) AS n_tokens
      FROM documents),
    r AS (
      SELECT doc_id, {strata}, n_tokens,
             percent_rank() OVER (PARTITION BY {strata} ORDER BY n_tokens) AS pr
      FROM t)
    SELECT doc_id, {strata}, n_tokens, round(pr, 6) AS len_pctile
    FROM r WHERE pr >= {lo} AND pr <= {hi}
    """
    ok, msg = compare(df, con, sql, allow_empty=True)
    assert ok, f"seed {seed} lo {lo} hi {hi} strata {strata}: {msg}"


@pytest.mark.parametrize("seed", range(6))
def test_random_cms_matches_duckdb(spark, sf_dir, con, seed):
    """r06 CMS randomized: ANY (depth, width, probe_k) must reproduce
    bit-exactly in DuckDB — cells and min-estimates are pure relational
    algebra over the portable md5 bucket."""
    from openetl_spark.operators import curation as C

    rng = random.Random(5000 + seed)
    depth = rng.choice([2, 3, 4, 6])
    width = rng.choice([64, 256, 1024, 2048, 4096])
    probe_k = rng.choice([5, 10, 20])
    d = catalog.load(spark, sf_dir, "documents")
    df = C.cms_token_estimates(d, probe_k=probe_k, depth=depth, width=width)
    ds = ", ".join(str(i) for i in range(depth))
    sql = f"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''),
                            x -> lower(x)) AS w
      FROM documents),
    ex AS (SELECT doc_id, UNNEST(w) AS token FROM toks),
    ds AS (SELECT UNNEST([{ds}]) AS d),
    cells AS (
      SELECT d, {C.hash_bucket_sql("'cms' || CAST(d AS VARCHAR) || ':' || token", width)} AS pos,
             count(*) AS cell
      FROM ex CROSS JOIN ds GROUP BY 1, 2),
    probes AS (
      SELECT token, count(*) AS n_exact
      FROM ex GROUP BY token
      ORDER BY n_exact DESC, token ASC LIMIT {probe_k}),
    ppos AS (
      SELECT p.token, p.n_exact, ds.d,
             {C.hash_bucket_sql("'cms' || CAST(ds.d AS VARCHAR) || ':' || p.token", width)} AS pos
      FROM probes p CROSS JOIN ds),
    est AS (
      SELECT token, n_exact, min(cell) AS cms_est
      FROM ppos JOIN cells USING (d, pos) GROUP BY 1, 2)
    SELECT token, CAST(n_exact AS BIGINT) AS n_exact,
           CAST(cms_est AS BIGINT) AS cms_est,
           cms_est >= n_exact AS never_under
    FROM est
    """
    ok, msg = compare(df, con, sql, allow_empty=True)
    assert ok, f"seed {seed} depth {depth} width {width} k {probe_k}: {msg}"


VOCAB = ["spark", "query", "window", "join", "stream", "vector", "dup",
         "hash", "merge", "batch", "customer"]


@pytest.mark.parametrize("seed", range(8))
def test_random_bm25_matches_duckdb(spark, sf_dir, con, seed):
    """Randomized BM25 sweep: random term sets, k1/b, and k against the
    formula rendered in DuckDB (same literal folding and association
    order as the catalog query)."""
    from openetl_spark.operators.text import bm25_topk

    rng = random.Random(1000 + seed)
    terms = rng.sample(VOCAB, rng.randint(1, 4))
    k1 = round(rng.uniform(0.8, 2.0), 2)
    b = round(rng.uniform(0.0, 1.0), 2)
    k = rng.randint(5, 40)

    df = bm25_topk(
        catalog.load(spark, sf_dir, "documents"), terms, k=k, k1=k1, b=b
    )
    dfs = ", ".join(
        f"count(*) FILTER (len(list_filter(toks, x -> x = '{t}')) > 0) AS df{i}"
        for i, t in enumerate(terms)
    )
    tfs = ", ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(terms)
    )
    score = " + ".join(
        f"ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * {k1 + 1.0}) / (tf{i} + {k1} * ({1.0 - b} + {b} * dl / avgdl))"
        for i in range(len(terms))
    )
    sql = f"""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    st AS (SELECT count(*) AS n_docs, avg(CAST(len(toks) AS DOUBLE)) AS avgdl,
                  {dfs} FROM tk),
    pc AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, {tfs} FROM tk),
    scored AS (SELECT doc_id, round({score}, 4) AS bm25 FROM pc, st)
    SELECT doc_id, bm25 FROM scored WHERE bm25 > 0.0
    ORDER BY bm25 DESC, doc_id ASC LIMIT {k}
    """
    ok, msg = compare(df, con, sql, allow_empty=True)
    assert ok, f"seed {seed} terms {terms} k1={k1} b={b}: {msg}"


@pytest.mark.parametrize("seed", range(6))
def test_random_multires_rollup_matches_duckdb(spark, sf_dir, con, seed):
    """Randomized continuous-aggregate sweep: random fine widths whose
    minutes divide the hour, re-aggregated to hour/day, vs DuckDB
    computing each level directly from raw events."""
    from openetl_spark.operators import timeseries as TS

    rng = random.Random(2000 + seed)
    mins = rng.choice([5, 10, 12, 20, 30])
    keys = rng.choice([(), ("event_type",)])
    df = TS.multi_resolution(
        catalog.load(spark, sf_dir, "events"),
        levels=((f"{mins}m", None), ("1h", "hour"), ("1d", "day")),
        fine_width=f"{mins} minutes",
        keys=keys,
    )
    kcols = "".join(f", {c}" for c in keys)
    sql = f"""
    WITH lvl AS (
      SELECT '{mins}m' AS resolution,
             time_bucket(INTERVAL '{mins} minutes', ts) AS bucket_start{kcols}, value
      FROM events
      UNION ALL
      SELECT '1h', date_trunc('hour', ts){kcols}, value FROM events
      UNION ALL
      SELECT '1d', date_trunc('day', ts){kcols}, value FROM events)
    SELECT resolution, bucket_start{kcols},
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           floor(round(sum(value), 2) * 10000.0 / count(*)) / 10000.0 AS avg_value
    FROM lvl GROUP BY ALL
    """
    ok, msg = compare(df, con, sql, allow_empty=True)
    assert ok, f"seed {seed} mins={mins} keys={keys}: {msg}"


# -------------------------------------------- declarative QuerySpec fuzz

def gen_queryspec(seed: int) -> dict:
    rng = random.Random(3000 + seed)
    spec: dict = {"table": "lineitem", "joins": [], "filters": []}
    joined = rng.random() < 0.6
    if joined:
        spec["joins"].append(
            {"table": "orders", "on": [["l_orderkey", "o_orderkey"]],
             "broadcast": rng.random() < 0.5}
        )
    if rng.random() < 0.8:
        col = rng.choice(sorted(NUMS))
        lo, hi = NUMS[col]
        spec["filters"].append(
            {"field": col, "operator": rng.choice(["<", "<=", ">", ">="]),
             "value": round(rng.uniform(lo, hi), 2)}
        )
    if rng.random() < 0.4:
        spec["filters"].append(
            {"field": "l_returnflag", "operator": rng.choice(["in", "not_in"]),
             "value": rng.sample(["A", "N", "R"], rng.randint(1, 2))}
        )
    if rng.random() < 0.5:
        spec["derived"] = {"rev": "l_extendedprice * (1 - l_discount)"}
    group_pool = ["l_returnflag", "l_linestatus"] + (
        ["o_orderpriority"] if joined else []
    )
    spec["group_by"] = rng.sample(group_pool, rng.randint(0, len(group_pool)))
    num_pool = sorted(NUMS) + (["rev"] if "derived" in spec else [])
    spec["aggregates"] = []
    for i in range(rng.randint(1, 3)):
        fn = rng.choice(["sum", "avg", "min", "max", "count", "count_distinct"])
        spec["aggregates"].append(
            {"fn": fn,
             "expr": None if (fn == "count" and rng.random() < 0.3)
             else rng.choice(num_pool),
             "alias": f"a{i}",
             "round_dp": {"sum": 2, "avg": 4}.get(fn)}
        )
    if spec["group_by"] and rng.random() < 0.4:
        spec["aggregates"].append(
            {"fn": "count", "expr": None, "alias": "n"})
        spec["having"] = [{"field": "n", "operator": ">", "value": 10}]
    return spec


@pytest.mark.parametrize("seed", range(15))
def test_random_queryspec_matches_duckdb(spark, sf_dir, con, seed):
    """The declarative layer fuzzed end-to-end: one random QuerySpec
    dict, compiled by plans.compiler.compile_query on Spark and
    rendered by functions.spec_sql.render_query for DuckDB."""
    from openetl_spark.functions.spec_sql import render_query
    from openetl_spark.plans.compiler import compile_query

    spec = gen_queryspec(seed)
    df = compile_query(spec, lambda t: catalog.load(spark, sf_dir, t))
    ok, msg = compare(df, con, render_query(spec), allow_empty=True)
    assert ok, f"seed {seed} spec {spec}: {msg}"


@pytest.mark.parametrize("seed", range(6))
def test_random_queryspec_window_matches_duckdb(spark, sf_dir, con, seed):
    """Window terms through both paths: deterministic orderings
    (unique key tiebreaks), post-window HAVING on rank."""
    from openetl_spark.functions.spec_sql import render_query
    from openetl_spark.plans.compiler import compile_query

    rng = random.Random(4000 + seed)
    fn = rng.choice(["row_number", "rank", "dense_rank", "lag", "lead"])
    spec = {
        "table": "lineitem",
        "filters": [{"field": "l_orderkey", "operator": "<=",
                     "value": rng.randint(500, 2000)}],
        "windows": [{
            "fn": fn, "alias": "w",
            "partition_by": ["l_returnflag"],
            # (l_orderkey, l_linenumber) is NOT unique in the synthetic
            # data; widening the ordering with the lagged/selected
            # columns makes tie rows value-identical, so every window
            # output is engine-deterministic despite the ties
            "order_by": [{"field": "l_orderkey"}, {"field": "l_linenumber"},
                         {"field": "l_quantity"},
                         {"field": "l_extendedprice"}],
            **({"expr": "l_quantity", "offset": rng.randint(1, 3)}
               if fn in ("lag", "lead") else {}),
        }],
        "select": ["l_orderkey", "l_linenumber", "l_returnflag", "w"],
    }
    if fn in ("row_number", "rank", "dense_rank"):
        spec["having"] = [{"field": "w", "operator": "<=",
                           "value": rng.randint(3, 30)}]
        # rank outputs are int on Spark, bigint in DuckDB — normalize
        # by casting in a derived select? compare() checks schema;
        # cast via an extra window-alias select is overkill: assert on
        # the cast DataFrame instead
    df = compile_query(spec, lambda t: catalog.load(spark, sf_dir, t))
    from pyspark.sql import functions as F
    if fn in ("row_number", "rank", "dense_rank"):
        df = df.withColumn("w", F.col("w").cast("long"))
    ok, msg = compare(df, con, render_query(spec), allow_empty=True)
    assert ok, f"seed {seed} spec {spec}: {msg}"


@pytest.mark.parametrize("seed", range(8))
def test_random_setop_spec_matches_duckdb(spark, sf_dir, con, seed):
    """SetOp specs fuzzed through both paths: two random filtered
    projections over orders combined by a random set operation —
    UNION/INTERSECT/EXCEPT carry SQL dedup semantics on both engines."""
    from openetl_spark.functions.spec_sql import render_query
    from openetl_spark.plans.compiler import compile_query

    rng = random.Random(5000 + seed)

    def leg():
        f = rng.choice([
            {"field": "o_totalprice", "operator": rng.choice([">", "<="]),
             "value": round(rng.uniform(50000, 400000), 2)},
            {"field": "o_orderpriority", "operator": "=",
             "value": rng.choice(["1-URGENT", "2-HIGH", "5-LOW"])},
        ])
        return {"table": "orders", "filters": [f],
                "select": ["o_custkey"], "distinct": rng.random() < 0.7}

    spec = {
        "set_op": rng.choice(["union_all", "union", "intersect", "except"]),
        "inputs": [leg(), leg()],
    }
    df = compile_query(spec, lambda t: catalog.load(spark, sf_dir, t))
    ok, msg = compare(df, con, render_query(spec), allow_empty=True)
    assert ok, f"seed {seed} spec {spec}: {msg}"


@pytest.mark.parametrize("seed", range(6))
def test_random_derived_table_spec_matches_duckdb(spark, sf_dir, con, seed):
    """Derived-table joins fuzzed: a random per-customer aggregate
    subquery joined (USING semantics) to a projected customer relation,
    re-aggregated by segment."""
    from openetl_spark.functions.spec_sql import render_query
    from openetl_spark.plans.compiler import compile_query

    rng = random.Random(6000 + seed)
    inner_fn = rng.choice(["count", "sum", "max"])
    agg = (
        {"fn": "count", "expr": None, "alias": "m"}
        if inner_fn == "count"
        else {"fn": inner_fn, "expr": "o_totalprice", "alias": "m",
              "round_dp": 2}
    )
    oc = {"table": "orders",
          "filters": [{"field": "o_totalprice", "operator": ">",
                       "value": round(rng.uniform(0, 200000), 2)}],
          "group_by": ["o_custkey"], "aggregates": [agg],
          "select": ["o_custkey", "m"], "alias": "oc"}
    spec = {
        "table": {"table": "customer", "derived": {"o_custkey": "c_custkey"},
                  "select": ["o_custkey", "c_mktsegment"], "alias": "cc"},
        "joins": [{"table": oc, "on": ["o_custkey"],
                   "how": rng.choice(["inner", "left"])}],
        "group_by": ["c_mktsegment"],
        "aggregates": [
            {"fn": "sum", "expr": "m", "alias": "total"},
            {"fn": "count", "expr": None, "alias": "n"},
        ],
    }
    df = compile_query(spec, lambda t: catalog.load(spark, sf_dir, t))
    ok, msg = compare(df, con, render_query(spec), allow_empty=True)
    assert ok, f"seed {seed} spec {spec}: {msg}"


@pytest.mark.parametrize("seed", range(4))
def test_random_incremental_dedup_matches_duckdb(spark, sf_dir, con, seed):
    """Incremental dedup fuzzed over the parameter plane: random
    index/new split point and jaccard threshold, Spark's
    LSH-candidates-then-exact-verify vs DuckDB's restricted exact
    jaccard. Thresholds stay ≥ 0.45 where 64-band/r=2 candidate recall
    is ≈ 1 (per-pair miss ≤ ~2e-5), so the exact oracle is the full
    answer."""
    from openetl_spark.operators import curation as C
    from openetl_spark.operators import dedup as D

    rng = random.Random(7000 + seed)
    cut = rng.choice([25, 40, 60, 75])
    thr = rng.choice([0.45, 0.5, 0.6])
    d = catalog.load(spark, sf_dir, "documents")
    bucket = C.hash_bucket(F.col("doc_id"), 100)
    out = D.incremental_near_duplicates(
        d.filter(bucket >= cut), d.filter(bucket < cut),
        "doc_id", "text", threshold=thr,
    )
    ok, msg = compare(out, con, catalog.incremental_dedup_oracle(cut, thr), allow_empty=True)
    assert ok, f"seed {seed} cut {cut} thr {thr}: {msg}"


@pytest.mark.parametrize("seed", range(4))
def test_random_domain_mix_matches_duckdb(spark, sf_dir, con, seed):
    """mix_to_target fuzzed over random language targets (random
    subsets, random weights): basis-point rates and md5 membership must
    reproduce bit-identically in DuckDB for every mix."""
    from openetl_spark.operators import curation as C

    rng = random.Random(8000 + seed)
    langs = rng.sample(["en", "de", "es", "fr", "zh"], rng.randint(2, 4))
    target = {g: round(rng.uniform(0.1, 1.0), 2) for g in langs}
    d = catalog.load(spark, sf_dir, "documents")
    out = C.mix_to_target(d, target, "lang", "doc_id").select(
        "doc_id", "lang", "source"
    )
    ok, msg = compare(out, con, catalog.domain_mix_oracle(target), allow_empty=True)
    assert ok, f"seed {seed} target {target}: {msg}"


@pytest.mark.parametrize("seed", range(3))
def test_random_semantic_dedup_matches_duckdb(spark, sf_dir, con, seed):
    """semantic_dedup fuzzed over the cosine threshold (the corpus
    tops out ~0.51, so thresholds stay below that for non-vacuous
    results): cluster assignment, rounded-cosine gate, and min-id
    survivor must all reproduce from the persisted centroid parquet."""
    from openetl_spark.operators import similarity as S

    rng = random.Random(9000 + seed)
    thr = rng.choice([0.35, 0.38, 0.42, 0.45])
    cents, _ = catalog._ivf_layout(spark, sf_dir, n_lists=16, seed=42)
    e = catalog.load(spark, sf_dir, "embeddings")
    out = S.semantic_dedup(e, cents, threshold=thr)
    ok, msg = compare(out, con, catalog.semantic_dedup_oracle(thr), allow_empty=True)
    assert ok, f"seed {seed} thr {thr}: {msg}"


def test_setop_as_derived_table_both_ways(spark, sf_dir, con):
    """A nested SetOp used as a join target compiles and renders
    consistently (regression: QuerySpec.from_dict used to reject
    {"set_op": ...} table dicts with KeyError)."""
    from openetl_spark.functions.spec_sql import render_query
    from openetl_spark.plans.compiler import compile_query

    interesting = {
        "set_op": "union",
        "inputs": [
            {"table": "orders",
             "filters": [{"field": "o_totalprice", "operator": ">",
                          "value": 350000}],
             "select": ["o_custkey"], "distinct": True},
            {"table": "orders",
             "filters": [{"field": "o_orderpriority", "operator": "=",
                          "value": "1-URGENT"}],
             "select": ["o_custkey"], "distinct": True},
        ],
    }
    spec = {
        "table": {"table": "customer", "derived": {"o_custkey": "c_custkey"},
                  "select": ["o_custkey", "c_mktsegment"], "alias": "cc"},
        "joins": [{"table": interesting, "on": ["o_custkey"]}],
        "group_by": ["c_mktsegment"],
        "aggregates": [{"fn": "count", "expr": None, "alias": "n"}],
    }
    df = compile_query(spec, lambda t: catalog.load(spark, sf_dir, t))
    ok, msg = compare(df, con, render_query(spec), allow_empty=True)
    assert ok, msg


@pytest.mark.parametrize("seed", range(5))
def test_random_window_frame_spec_matches_duckdb(spark, sf_dir, con, seed):
    """Explicit ROWS frames through both paths: random (start, end)
    bounds (offsets and unbounded) on a running aggregate over a
    value-deterministic total ordering."""
    from openetl_spark.functions.spec_sql import render_query
    from openetl_spark.plans.compiler import compile_query

    rng = random.Random(10_000 + seed)
    lo = rng.choice(["unbounded", -3, -1, 0])
    hi = rng.choice(["unbounded", 0, 1, 2])
    if lo == 0 and hi == "unbounded":
        hi = 2
    spec = {
        "table": "lineitem",
        "filters": [{"field": "l_orderkey", "operator": "<=", "value": 1500}],
        "windows": [{
            "fn": rng.choice(["sum", "min", "max", "count"]),
            "alias": "wv", "expr": "l_quantity",
            "partition_by": ["l_returnflag"],
            "order_by": [{"field": "l_orderkey"}, {"field": "l_linenumber"},
                         {"field": "l_quantity"}, {"field": "l_extendedprice"}],
            "frame": [lo, hi],
        }],
        "select": ["l_orderkey", "l_linenumber", "l_returnflag", "wv"],
    }
    df = compile_query(spec, lambda t: catalog.load(spark, sf_dir, t))
    ok, msg = compare(df, con, render_query(spec), allow_empty=True)
    assert ok, f"seed {seed} frame ({lo}, {hi}): {msg}"


@pytest.mark.parametrize("seed", range(4))
def test_random_winnow_params_match_duckdb(spark, sf_dir, con, seed):
    """Winnowing fuzzed over the (k, window, df-cap, min_shared)
    parameter plane: the sliding-min selection rule, the portable
    fingerprint hash, and the df-capped pair mining must agree between
    engines at every point, not just the shipped (8, 4, 10, 5)."""
    rng = random.Random(4500 + seed)
    k = rng.choice([6, 8, 10])
    window = rng.choice([3, 4, 6])
    cap = rng.choice([5, 10, 20])
    min_shared = rng.choice([1, 2, 5])
    d = catalog.load(spark, sf_dir, "documents")
    from openetl_spark.operators import dedup as D

    out = D.winnow_overlap_pairs(
        d, "doc_id", "text", k=k, window=window,
        min_shared=min_shared, max_fp_df=cap,
    )
    ok, msg = compare(
        out, con, catalog.winnow_oracle(k, window, cap, min_shared),
        allow_empty=True,
    )
    assert ok, f"seed {seed} (k={k}, w={window}, cap={cap}, ms={min_shared}): {msg}"


# ------------------------------------------------------------------
# ExactSubstr sweep (r06): the window width and occurrence floor must
# agree between engines at EVERY parameter point, not just (8, 2)
# ------------------------------------------------------------------


@pytest.mark.parametrize("window,min_occ", [(3, 2), (5, 2), (8, 3), (12, 2)])
def test_exactsubstr_sweep_matches_duckdb(spark, sf_dir, con, window, min_occ):
    from openetl_spark.operators import dedup as D
    from openetl_spark.queries.lm_dedup import (
        exactsubstr_dedup_oracle,
        exactsubstr_spans_oracle,
    )

    d = catalog.load(spark, sf_dir, "documents")
    spans = D.duplicate_spans(d, window=window, min_occurrences=min_occ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("span_tokens").cast("bigint").alias("span_tokens"),
        F.col("n_windows").cast("bigint").alias("n_windows"),
    )
    ok, msg = compare(spans, con, exactsubstr_spans_oracle(window, min_occ),
                      allow_empty=True)
    assert ok, f"spans window={window} min_occ={min_occ}: {msg}"
    cleaned = D.remove_duplicate_spans(
        d, window=window, min_occurrences=min_occ
    ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_removed").cast("bigint").alias("n_removed"),
        F.col("clean_text"),
    )
    ok, msg = compare(cleaned, con, exactsubstr_dedup_oracle(window, min_occ))
    assert ok, f"dedup window={window} min_occ={min_occ}: {msg}"


# ------------------------------------------------------------------
# LSH banding recall sweep (r06-s2): band shape must agree between
# engines at every (rows_per_band, threshold) point
# ------------------------------------------------------------------


@pytest.mark.parametrize("rows_per_band,thr", [(1, 0.2), (4, 0.2), (8, 0.3), (2, 0.5)])
def test_lsh_recall_sweep_matches_duckdb(spark, sf_dir, con, rows_per_band, thr):
    from openetl_spark.operators import dedup as D
    from openetl_spark.queries.lm_dedup import lsh_recall_oracle

    d = catalog.load(spark, sf_dir, "documents")
    df = D.lsh_banding_recall_report(
        d, "doc_id", "text", n=5, num_hashes=32,
        rows_per_band=rows_per_band, threshold=thr,
    )
    ok, msg = compare(df, con, lsh_recall_oracle(32, rows_per_band, thr, 5),
                      allow_empty=True)
    assert ok, f"r={rows_per_band} thr={thr}: {msg}"


# ----------------------------------------------- r08 similarity sweeps

@pytest.mark.parametrize("num,den,n", [(1, 2, 5), (2, 3, 5), (4, 5, 3)])
def test_ppjoin_param_sweep_matches_duckdb(spark, sf_dir, con, num, den, n):
    """The ppjoin_pairs oracle re-rendered at other (τ, n) points must
    agree with the operator on the real documents table — the
    catalog's fixed (3/5, 5) point is not special."""
    from openetl_spark.operators import dedup as DD
    from openetl_spark.queries.analytics_r08 import ppjoin_oracle

    d = catalog.load(spark, sf_dir, "documents")
    got = DD.ppjoin(d, "doc_id", "text", num, den, n).selectExpr(
        "cast(a as bigint) a", "cast(b as bigint) b", "overlap", "la", "lb", "jaccard"
    )
    ok, msg = compare(got, con, ppjoin_oracle(num, den, n), allow_empty=True)
    assert ok, msg


@pytest.mark.parametrize("num,den,n", [(1, 2, 5), (9, 10, 5), (1, 1, 3)])
def test_containment_param_sweep_matches_duckdb(spark, sf_dir, con, num, den, n):
    from openetl_spark.operators import dedup as DD
    from openetl_spark.queries.analytics_r08 import containment_oracle

    d = catalog.load(spark, sf_dir, "documents")
    got = DD.containment_join(d, "doc_id", "text", num, den, n).selectExpr(
        "cast(a as bigint) a", "cast(b as bigint) b", "overlap", "la", "lb", "containment"
    )
    ok, msg = compare(got, con, containment_oracle(num, den, n), allow_empty=True)
    assert ok, msg


@pytest.mark.parametrize("k", [16, 64])
def test_kmv_param_sweep_matches_duckdb(spark, sf_dir, con, k):
    """kmv_cells at other k values vs the direct row_number rendering
    over the same md5 arithmetic."""
    from openetl_spark.operators import sketches as SK

    o = catalog.load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    got = SK.kmv_cells(o, "o_custkey", k=k, keys=["o_orderpriority"])
    sql = f"""
    WITH h AS (
      SELECT DISTINCT o_orderpriority,
             CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM orders)
    SELECT o_orderpriority, h FROM (
      SELECT o_orderpriority, h,
             row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
      FROM h) t
    WHERE rn <= {k}
    """
    ok, msg = compare(got, con, sql)
    assert ok, msg


@pytest.mark.parametrize("k,rounds", [(3, 2), (4, 3)])
def test_ktruss_param_sweep_matches_duckdb(spark, sf_dir, con, k, rounds):
    """Bounded-round k-truss parity holds at every (k, rounds) — even
    mid-peel, before the fixpoint (the bounded-round contract)."""
    import warnings

    from openetl_spark.operators import graph as G
    from openetl_spark.queries.analytics_r07 import _graph_layout
    from openetl_spark.queries.analytics_r08 import ktruss_oracle

    _, edges_w_path = _graph_layout(spark, sf_dir)
    e2 = (
        spark.read.parquet(edges_w_path)
        .filter("w >= 2")
        .select("src", "dst")
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # mid-peel is legal here
        got = G.ktruss(e2, k=k, max_rounds=rounds)
    ok, msg = compare(got, con, ktruss_oracle(k=k, rounds=rounds), allow_empty=True)
    assert ok, msg
