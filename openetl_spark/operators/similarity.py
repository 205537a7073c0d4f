"""Vector similarity search over an embedding column (SURVEY.md §2C C28).

Baseline: brute-force cosine — pure array expressions (``zip_with`` +
``aggregate``), JVM-side, no UDFs. Scale path: random-hyperplane LSH
bucketing so candidate generation is an equi-join on bucket keys
instead of an n² cross product; multi-table probing recovers recall.

Embedding-cosine near-dup (the training-data use case) =
``lsh_similarity_join`` with a high threshold.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision — deterministic sequential fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pairs_vectorized(a: Column, b: Column, round_dp: int = 4) -> Column:
    """Rounded cosine over PAIRED vector columns as one numpy einsum per
    Arrow batch. For pair-verification workloads (millions of candidate
    rows) this is ~10-50× the JVM fold-expression `cosine` — the fold
    evaluates 3·dim lambda steps per row, the pandas UDF amortizes to a
    few BLAS ops per batch. Use `cosine` for one-off expressions inside
    codegen'd plans; use this on the candidate-verify hot path."""

    @F.pandas_udf(T.DoubleType())
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = np.asarray(va.tolist(), dtype=np.float64)
        mb = np.asarray(vb.tolist(), dtype=np.float64)
        sims = np.einsum("ij,ij->i", ma, mb) / (
            np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        )
        return pd.Series(np.round(sims, round_dp))

    return _cos(a, b)


def brute_force_knn(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Top-k cosine neighbors of one query vector. One scan, no shuffle:
    Catalyst plans TakeOrderedAndProject. Rounded similarity + id
    tiebreak make the result set deterministic across engines."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = F.round(cosine(F.col(vec_col), q), round_dp)
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def brute_force_knn_lazy(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """`brute_force_knn` with the query vector as a one-row DataFrame
    instead of a driver-side literal: broadcast cross-join keeps the
    whole plan lazy (no `.first()` materialization between building and
    running the query) — the right shape when the query vector itself
    comes from a filter over the corpus."""
    q = F.broadcast(query_df.select(F.col(query_vec_col).alias("_qv")).limit(1))
    sim = F.round(cosine(F.col(vec_col), F.col("_qv")), round_dp)
    return (
        df.crossJoin(q)
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _id_schema(df: DataFrame, id_col: str) -> tuple[str, str]:
    """(spark DDL type, pandas dtype) for the id column — pair-emitting
    UDFs carry ids through verbatim, so string/int ids both work
    instead of a hardcoded long."""
    t = df.schema[id_col].dataType.simpleString()
    integral = t in ("tinyint", "smallint", "int", "bigint", "long")
    return t, ("int64" if integral else "object")


def hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Seeded random hyperplanes for sign-LSH. Public: the catalog's
    DuckDB oracle embeds these exact values as SQL literals so both
    engines compute identical sign bits."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


_hyperplanes = hyperplanes  # back-compat alias


def with_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    out: str = "lsh_buckets",
) -> DataFrame:
    """Random-hyperplane (sign) LSH: per table, bucket = the n_planes
    sign bits of the projections.

    Projections run as ONE numpy matmul per Arrow batch in a pandas UDF
    ((batch×dim) @ (dim×(tables·planes))) — the matrix form is ~50×
    faster than n_tables·n_planes fold expressions, whose generated
    code also blows past JIT method limits. Hyperplanes are
    deterministic from the seed and re-materialized per executor
    (kilobytes — no broadcast needed)."""
    planes = np.vstack([_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)])
    weights = planes.T  # dim × (tables·planes)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)  # batch × dim
        bits = (m @ weights) >= 0  # batch × tables·planes
        bits = bits.reshape(len(m), n_tables, n_planes)
        vals = (bits * powers).sum(axis=2)  # batch × tables
        return pd.Series(list(vals))

    return df.withColumn(out, buckets(F.col(vec_col)))


def lsh_similarity_join(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """All pairs with cosine ≥ threshold, approximately: explode bucket
    tables, then verify exact cosine INSIDE each (table, bucket) group
    with one chunked BLAS matmul per group, emitting only
    above-threshold pairs. Returns (a, b, cosine_sim), a < b.

    Physical shape: one shuffle replicating each (id, vector) row
    n_tables times (≈ tables·corpus bytes — linear), one applyInPandas
    per bucket, then a distinct over the (tiny) qualifying pair set.
    The former plan — candidate equi-join, id-pair distinct, vector
    re-attach, per-pair verify — materialized Σ_buckets n_b² join rows
    BEFORE any filtering; at few-planes configs (big buckets, the
    low-threshold recall corner) that was ~20M pair rows at sf0.1 and
    2.8× the bench baseline. In-bucket verification never surfaces a
    sub-threshold pair; the chunked matmul bounds the verify buffer to
    chunk·|bucket| entries.

    Scale note: per-group state holds one bucket's vectors, ≈
    corpus/2^n_planes per table — fine for production many-planes
    near-dup configs (buckets prune to ~2^-planes); a few-planes sweep
    over a 100 TB corpus should raise n_planes/n_tables together or use
    blocked_similarity_join, whose replication factor bounds per-group
    memory independent of data skew."""
    b = with_lsh_buckets(df, vec_col, dim, n_planes, n_tables, seed)
    e = b.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.posexplode("lsh_buckets").alias("t", "bucket"),
    )
    thr = float(threshold)
    chunk = 2048
    id_type, id_dtype = _id_schema(df, id_col)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": [], "b": [], "cosine_sim": []}).astype(
            {"a": id_dtype, "b": id_dtype, "cosine_sim": "float64"}
        )
        n = len(pdf)
        if n < 2:
            return empty
        m = np.asarray(pdf["_v"].tolist(), dtype=np.float64)
        ids = pdf["_id"].to_numpy()
        norms = np.linalg.norm(m, axis=1)
        frames = []
        for s in range(0, n, chunk):
            # +1e-9 before rounding, mirrored in the DuckDB oracle: the
            # BLAS matmul and DuckDB's sequential list_dot_product can
            # differ by an ulp, and a cosine sitting ON a 4dp rounding
            # boundary then rounds to different sides (one pair at
            # sf0.1 — the r06 full-scale oracle sweep). The symmetric
            # epsilon moves the decision point off the boundary for
            # both engines.
            rows = np.round(
                (m[s : s + chunk] @ m.T) / np.outer(norms[s : s + chunk], norms)
                + 1e-9,
                4,
            )
            ii, jj = np.where(rows >= thr)
            gi = ii + s
            keep = ids[gi] < ids[jj]  # drops self-pairs and halves dups
            if keep.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "a": ids[gi][keep],
                            "b": ids[jj][keep],
                            "cosine_sim": rows[ii, jj][keep],
                        }
                    )
                )
        return pd.concat(frames) if frames else empty

    out = e.groupBy("t", "bucket").applyInPandas(
        bucket_pairs, f"a {id_type}, b {id_type}, cosine_sim double"
    )
    # a pair colliding in k tables surfaces k times with an identical
    # (deterministically rounded) value — one distinct over winners only
    return out.dropDuplicates(["a", "b"])


def brute_force_similarity_join(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact all-pairs baseline (n² — test/verification scale only;
    production uses blocked_similarity_join or lsh_similarity_join)."""
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cosine_sim", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cosine_sim") >= threshold)
        .select("a", "b", "cosine_sim")
    )


def blocked_similarity_join(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_blocks: int = 8,
    round_dp: int = 4,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via BLOCKED matrix multiply —
    same results as brute_force_similarity_join, different physical
    shape: vectors are hashed into ``n_blocks`` blocks, each of the
    B·(B+1)/2 unordered block pairs becomes one ``applyInPandas`` group
    computing a numpy (nᵢ×d)@(d×nⱼ) matmul. The JVM fold-expression
    cosine costs ~100× a BLAS matmul per pair, and the n² row join it
    rides on materializes every pair as a shuffle row; here the shuffle
    carries each vector ~B times (replication factor B, tunable), pair
    enumeration happens inside numpy, and only pairs above threshold
    surface. This is the canonical distributed all-pairs layout: at
    fixed per-group memory, n_blocks grows as n/√mem so any corpus fits
    executor memory."""
    tagged = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_b"),
    )
    # one row per (vector, block-pair it participates in): vector in
    # block b joins pair (i, j) when b == i or b == j, i <= j
    pairs = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    pair_df = F.broadcast(
        df.sparkSession.createDataFrame(pairs, "pi int, pj int")
    )
    replicated = tagged.join(
        pair_df, (tagged["_b"] == pair_df["pi"]) | (tagged["_b"] == pair_df["pj"])
    )

    thr = float(threshold)
    dp = int(round_dp)
    id_type, id_dtype = _id_schema(df, id_col)

    def block_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pi, pj = key
        left = pdf[pdf["_b"] == pi]
        right = pdf[pdf["_b"] == pj]
        if left.empty or right.empty:
            return pd.DataFrame({"a": [], "b": [], "cosine_sim": []}).astype(
                {"a": id_dtype, "b": id_dtype, "cosine_sim": "float64"}
            )
        la = np.asarray(left["_v"].tolist(), dtype=np.float64)
        ra = np.asarray(right["_v"].tolist(), dtype=np.float64)
        lid = left["_id"].to_numpy()
        rid = right["_id"].to_numpy()
        ln = np.linalg.norm(la, axis=1)
        rn = np.linalg.norm(ra, axis=1)
        sims = np.round((la @ ra.T) / np.outer(ln, rn), dp)
        ii, jj = np.where(sims >= thr)
        aa, bb, vv = lid[ii], rid[jj], sims[ii, jj]
        if pi == pj:
            # intra-block: the square matrix holds every unordered pair
            # twice (and the diagonal) — keep the a < b half once
            keep = aa < bb
            aa, bb, vv = aa[keep], bb[keep], vv[keep]
        else:
            # cross-block: each unordered pair appears exactly once, but
            # id order can oppose block order — normalize, don't filter
            aa, bb = np.minimum(aa, bb), np.maximum(aa, bb)
        return pd.DataFrame({"a": aa, "b": bb, "cosine_sim": vv})

    out = replicated.groupBy("pi", "pj").applyInPandas(
        block_pairs, f"a {id_type}, b {id_type}, cosine_sim double"
    )
    # intra-block pairs (pi == pj) appear once; a<b already enforced
    return out


# ----------------------------------------------------------------- IVF

def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    max_iter: int = 10,
):
    """Train IVF coarse quantizer centroids with MLlib KMeans (seeded,
    deterministic given fixed input partitioning). Returns a plain
    numpy array (n_lists × dim) — small enough to fold into plans as
    literals/closures, no model object needed at query time."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    km = KMeans(k=n_lists, seed=seed, maxIter=max_iter, featuresCol="features")
    model = km.fit(train)
    return np.array([np.asarray(c) for c in model.clusterCenters()])


def with_ivf_assignment(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out: str = "ivf_list",
) -> DataFrame:
    """Assign each vector to its nearest centroid (the IVF inverted
    list id) — one numpy matmul per Arrow batch, same pattern as the
    LSH projections."""
    cents = np.asarray(centroids, dtype=np.float64)  # n_lists × dim
    cent_sq = (cents ** 2).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        # argmin ||v - c||² = argmin (||c||² - 2 v·c)
        d = cent_sq[None, :] - 2.0 * (m @ cents.T)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return df.withColumn(out, assign(F.col(vec_col)))


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    centroids: np.ndarray | None = None,
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
    mode: str = "overwrite",
) -> None:
    """Materialize the corpus partitioned by IVF list id — the layout
    that turns ``ivf_knn``'s list filter into *partition pruning*: the
    scan reads only the ``n_probe`` list directories, so a 100 TB corpus
    probes ~n_probe/n_lists of its files instead of all of them. Pass
    ``centroids`` to assign lists on the way out (skipped if ``list_col``
    already present)."""
    if list_col not in df.columns:
        if centroids is None:
            raise ValueError(f"df lacks {list_col!r} and no centroids given")
        df = with_ivf_assignment(df, centroids, vec_col, list_col)
    df.write.partitionBy(list_col).mode(mode).parquet(path)


def ivf_probe_lists(
    query_df: DataFrame,
    centroids: np.ndarray,
    n_probe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """The ``n_probe`` inverted-list ids nearest to the query vector, as
    a DataFrame (one row per probed list) — keeps probe selection inside
    the plan (no driver ``.first()``). Stable argsort: deterministic on
    distance ties."""
    cents = np.asarray(centroids, dtype=np.float64)
    cent_sq = (cents ** 2).sum(axis=1)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        d = cent_sq[None, :] - 2.0 * (m @ cents.T)
        idx = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return query_df.limit(1).select(
        F.explode(probes(F.col(vec_col))).alias("probe_list")
    )


def ivf_knn_pruned(
    corpus: DataFrame,
    query_df: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
    query_vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Fully-lazy IVF top-k over a PRE-PARTITIONED corpus (see
    write_ivf_partitioned): probe lists come from a broadcast one-row
    join on the partition column, so Spark's dynamic partition pruning
    reads only the ``n_probe`` list directories — no in-query quantizer
    training, no driver-side ``.first()``. Centroids are the persisted
    train-once quantizer (kilobytes, folded into the probe UDF closure).
    The query vector rides a second broadcast one-row relation, as in
    brute_force_knn_lazy."""
    probes = F.broadcast(ivf_probe_lists(query_df, centroids, n_probe, query_vec_col))
    qv = F.broadcast(
        query_df.limit(1).select(F.col(query_vec_col).alias("_qv"))
    )
    sim = F.round(cosine(F.col(vec_col), F.col("_qv")), round_dp)
    return (
        corpus.join(probes, corpus[list_col] == probes["probe_list"])
        .crossJoin(qv)
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_knn(
    df: DataFrame,
    centroids: np.ndarray,
    query_vec,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
    round_dp: int = 4,
) -> DataFrame:
    """IVF top-k: probe only the ``n_probe`` inverted lists whose
    centroids are closest to the query, brute-force cosine inside them.
    The scan prunes to ~n_probe/n_lists of the corpus — with the list
    id as a partition/cluster key on disk, Spark prunes entire files.
    ``df`` must already carry ``list_col`` (see with_ivf_assignment)."""
    q = np.asarray(query_vec, dtype=np.float64)
    cents = np.asarray(centroids, dtype=np.float64)
    d = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in d.argsort()[:n_probe]]

    qcol = F.array(*[F.lit(float(x)) for x in q])
    sim = F.round(cosine(F.col(vec_col), qcol), round_dp)
    return (
        df.filter(F.col(list_col).isin(probe))
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str | None = None,
    threshold: float = 0.95,
    round_dp: int = 4,
    block_rows: int = 1024,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with a coarse
    quantizer, then search for near-duplicate pairs ONLY within each
    cluster — the standard trick that turns all-pairs cosine dedup
    from O(n²) into O(Σ clusterᵢ²), with cluster count chosen ∝ √n so
    per-cluster work stays bounded as the corpus grows.

    Physical shape: one shuffle keyed on the cluster id, then a
    ROW-BLOCKED numpy matmul per cluster inside ``applyInPandas`` (the
    same chunked kernel idea as ``blocked_similarity_join`` — a JVM
    fold-expression cosine per pair would cost ~100× BLAS). Each step
    multiplies a ``block_rows``-row slab against the cluster, so the
    similarity buffer is O(block_rows · cluster), never the full
    O(cluster²) matrix — hot clusters (embedding spaces have them far
    above the mean size) can't blow out task memory (VERDICT r04 #3;
    the cluster's own vectors, O(cluster · dim), are materialized by
    applyInPandas regardless and bound by the coarse-quantizer k ∝ √n
    sizing rule). A vector
    is flagged as a semantic duplicate when a SMALLER-id vector in its
    cluster has rounded cosine ≥ threshold; output is one row per
    flagged vector (id, dup_of = smallest such partner, its cosine).
    Deterministic end-to-end: assignment is argmin ‖c‖²−2v·c with
    lowest-list-id tie-break, survivor choice is min-id — so a DuckDB
    oracle can re-derive the whole operator from the persisted
    centroid parquet.

    Pass ``list_col`` when ``df`` already carries the assignment (e.g.
    read from the IVF-partitioned layout) to skip re-assigning."""
    if list_col is None:
        assigned = with_ivf_assignment(df, centroids, vec_col, "_l")
        list_col = "_l"
    else:
        assigned = df
    tagged = assigned.select(
        F.col(list_col).alias("_l"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
    )
    thr, dp = float(threshold), int(round_dp)
    blk = max(1, int(block_rows))
    id_type, id_dtype = _id_schema(df, id_col)

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.asarray(pdf["_v"].tolist(), dtype=np.float64)
        ids = pdf["_id"].to_numpy()
        nrm = np.linalg.norm(m, axis=1)
        out_a, out_b, out_v = [], [], []
        for i0 in range(0, len(ids), blk):
            i1 = min(i0 + blk, len(ids))
            # slab × cluster: O(blk·c) similarity buffer per step
            sims = np.round((m[i0:i1] @ m.T) / np.outer(nrm[i0:i1], nrm), dp)
            ii, jj = np.where(sims >= thr)
            vv = sims[ii, jj]
            keep = ids[ii + i0] < ids[jj]
            out_a.append(ids[ii + i0][keep])
            out_b.append(ids[jj][keep])
            out_v.append(vv[keep])
        aa = np.concatenate(out_a) if out_a else np.array([], dtype=ids.dtype)
        bb = np.concatenate(out_b) if out_b else np.array([], dtype=ids.dtype)
        vv = np.concatenate(out_v) if out_v else np.array([], dtype="float64")
        return pd.DataFrame({"a": aa, "b": bb, "cosine_sim": vv}).astype(
            {"a": id_dtype, "b": id_dtype, "cosine_sim": "float64"}
        )

    pairs = tagged.groupBy("_l").applyInPandas(
        lambda _k, pdf: cluster_pairs(pdf),
        f"a {id_type}, b {id_type}, cosine_sim double",
    )
    return (
        pairs.groupBy("b")
        .agg(F.min(F.struct("a", "cosine_sim")).alias("_m"))
        .select(
            F.col("b").alias(id_col),
            F.col("_m.a").alias("dup_of"),
            F.col("_m.cosine_sim").alias("cosine_sim"),
        )
    )


def _panel_topk(scored: DataFrame, k: int, ascending: bool) -> DataFrame:
    """Two-phase top-k per panel query over (_qid, _id, _sim) rows:
    per-(query, input-partition) k via a window whose partitions are
    input-split-sized, then a global k over ≤ k·partitions candidates —
    no window partition is ever corpus-sized. Ordering is total
    (score, id asc) so membership is engine-reproducible."""
    from pyspark.sql import Window as W

    score = F.col("_sim").asc() if ascending else F.col("_sim").desc()
    local = scored.withColumn("_p", F.spark_partition_id())
    w1 = W.partitionBy("_qid", "_p").orderBy(score, F.col("_id").asc())
    cand = (
        local.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_p")
    )
    w2 = W.partitionBy("_qid").orderBy(score, F.col("_id").asc())
    return (
        cand.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_sim")
    )


def ann_recall_report(
    corpus: DataFrame,
    query_panel: Sequence[tuple],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
    round_dp: int = 4,
) -> DataFrame:
    """Recall@k evaluation harness for the IVF index: for each query in
    a small fixed panel, compare the IVF top-k (``n_probe`` lists) to
    the exact brute-force cosine top-k over the full corpus and report
    the overlap fraction — the measurement that tells you whether your
    n_probe/n_lists setting is costing answer quality before you ship
    it (Jégou et al. 2011 report exactly this curve). ``query_panel``
    is a list of (qid, vector) tuples — an eval panel is kilobytes BY
    DEFINITION, so it folds into UDF closures like the centroids
    themselves; the corpus is never collected.

    Physical shape: the exact arm fans the corpus panel-wide by
    exploding a qid-array literal in the scan projection (no join, no
    nested loop); the IVF arm pairs the corpus with each query's probe
    lists through a BROADCAST HASH equi-join on the list id (a
    |panel|·n_probe-row relation) — never a cross product.
    Cosines run one numpy batch per Arrow page (panel matrix in the
    closure); top-k is two-phase (per-input-partition k via a
    (query, partition)-keyed window, then a global k over ≤ k·partitions
    candidates), so no window partition is ever corpus-sized. Ranking
    compares the ROUNDED cosine with an id tie-break, making the order
    — and therefore recall — bit-reproducible in a DuckDB oracle."""
    qids = [q for q, _ in query_panel]
    qmat = {q: np.asarray(v, dtype=np.float64) for q, v in query_panel}
    cents = np.asarray(centroids, dtype=np.float64)
    n_lists = len(cents)
    spark = corpus.sparkSession
    dp = int(round_dp)

    @F.pandas_udf(T.DoubleType())
    def sim_to(vecs: pd.Series, qs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        qm = np.asarray([qmat[q] for q in qs], dtype=np.float64)
        s = (m * qm).sum(axis=1) / (
            np.linalg.norm(m, axis=1) * np.linalg.norm(qm, axis=1)
        )
        return pd.Series(np.round(s, dp))

    base = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(list_col).alias("_l"),
    )

    def topk(pairs: DataFrame) -> DataFrame:
        scored = pairs.withColumn(
            "_sim", sim_to(F.col("_v"), F.col("_qid"))
        ).filter(F.col("_id") != F.col("_qid")).select("_qid", "_id", "_sim")
        return _panel_topk(scored, k, ascending=False)

    # exact arm: fan the corpus panel-wide by EXPLODING a qid-array
    # literal in the scan projection — no join at all, so no silent
    # row loss if a join key set ever disagreed with the layout
    # (review finding r05 on the pq harness; applied to both)
    qid_array = F.array(*[F.lit(int(q)) for q in qids])
    exact = topk(base.withColumn("_qid", F.explode(qid_array)))

    # IVF arm: only each query's n_probe nearest lists (stable argsort =
    # lowest-list-id tie-break, the same rule the oracle re-derives)
    cent_sq = (cents ** 2).sum(axis=1)
    probe_pairs = []
    for q in qids:
        # round before argsort (r06, ADVICE): the oracle recomputes
        # these distances with a different summation order; near-equal
        # centroid distances can order differently across engines, and
        # the list-id tie-break only triggers on EXACT equality — the
        # same fixed-dp treatment the cosine scores already get.
        d = np.round(cent_sq - 2.0 * (cents @ qmat[q]), 6)
        for l in np.argsort(d, kind="stable")[:n_probe]:
            probe_pairs.append((q, int(l)))
    probes = F.broadcast(
        spark.createDataFrame(probe_pairs, "_qid long, _jl int")
    )
    approx = topk(base.join(probes, base["_l"] == F.col("_jl")))

    hits = exact.join(approx, ["_qid", "_id"]).groupBy("_qid").agg(
        F.count("*").alias("_hits")
    )
    panel = spark.createDataFrame([(q,) for q in qids], "_qid long")
    return (
        F.broadcast(panel)
        .join(hits, "_qid", "left")
        .select(
            F.col("_qid").alias("qid"),
            F.round(
                F.coalesce(F.col("_hits"), F.lit(0)) / float(k), dp
            ).alias("recall_at_k"),
        )
    )


def pq_recall_report(
    corpus: DataFrame,
    query_panel: Sequence[tuple],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    round_dp: int = 4,
) -> DataFrame:
    """Recall@k of PQ asymmetric distance vs EXACT squared-L2 — the
    compression-loss curve point (Jégou et al. 2011 Fig. 4): how much
    answer quality m-byte codes give up against the full float vectors,
    measured per panel query. The exact arm ranks by
    ‖v‖²−2·v·q+‖q‖² (what ADC approximates — cosine would conflate
    metric mismatch with quantization loss); the PQ arm ranks by the
    summed per-subspace distance-table lookups. Same physical posture
    as ann_recall_report: panel and distance tables fold into UDF
    closures (kilobytes), the corpus fans out panel-wide via a
    scan-side qid-array explode (both arms are exhaustive — nothing to
    prune on), two-phase top-k, rounded scores with id tie-breaks for
    engine-reproducible membership."""
    qids = [q for q, _ in query_panel]
    qmat = {q: np.asarray(v, dtype=np.float64) for q, v in query_panel}
    books = np.asarray(codebooks, dtype=np.float64)  # (m, n_codes, sub)
    m, n_codes, sub = books.shape
    spark = corpus.sparkSession
    dp = int(round_dp)

    # Panel closures, stacked for vectorized per-batch lookups: row i of
    # Q_all / T_all belongs to panel query qids[i].
    qpos = {q: i for i, q in enumerate(qids)}
    Q_all = np.stack([qmat[q] for q in qids])  # |panel| × dim
    T_all = np.zeros((len(qids), m, n_codes))
    book_sq = (books ** 2).sum(axis=2)  # m × n_codes
    for q in qids:
        for j in range(m):
            qs = qmat[q][j * sub : (j + 1) * sub]
            T_all[qpos[q], j] = (
                book_sq[j] - 2.0 * (books[j] @ qs) + (qs ** 2).sum()
            )

    # r12 restructure (§4 "how many columns cross" / §1.2 "don't compute
    # things you throw away"): the original shape ran THREE corpus-scale
    # ArrowEvalPython passes per invocation — with_pq_codes' encode UDF
    # plus one scoring UDF per arm, each arm separately re-executing the
    # panel fan-out (and the encode pass under it). Both distances are
    # pure functions of (_v, _c, _qid), so they now evaluate side by
    # side in ONE projection over ONE fan-out (Catalyst batches
    # independent Python UDFs of a single Project into one
    # ArrowEvalPython node); the encode pass still runs exactly once per
    # CORPUS ROW, before the fan-out. Every emitted value is
    # bit-identical to the three-pass form and the DuckDB oracle.

    @F.pandas_udf(T.DoubleType())
    def l2_to(vecs: pd.Series, qs: pd.Series) -> pd.Series:
        mm = np.asarray(vecs.tolist(), dtype=np.float64)
        qm = Q_all[qs.map(qpos).to_numpy()]
        d = (mm * mm).sum(axis=1) - 2.0 * (mm * qm).sum(axis=1) + (
            qm * qm
        ).sum(axis=1)
        return pd.Series(np.round(d, dp))

    @F.pandas_udf(T.DoubleType())
    def adc_to(codes: pd.Series, qs: pd.Series) -> pd.Series:
        cm = np.asarray(codes.tolist(), dtype=np.int64)
        qidx = qs.map(qpos).to_numpy()
        out = T_all[qidx[:, None], np.arange(m)[None, :], cm].sum(axis=1)
        return pd.Series(np.round(out, dp))

    # both arms are exhaustive (no pruning), so the panel fan-out is a
    # scan-side explode of a qid-array literal — the earlier
    # (qid × n_lists) equi-join silently DROPPED rows whose list id
    # fell outside a mis-passed n_lists (review finding r05)
    encoded = with_pq_codes(corpus, books, vec_col, code_col)
    qid_array = F.array(*[F.lit(int(q)) for q in qids])
    fanned = encoded.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(code_col).alias("_c"),
    ).withColumn("_qid", F.explode(qid_array))
    scored = (
        fanned.select(
            "_qid",
            "_id",
            l2_to(F.col("_v"), F.col("_qid")).alias("_se"),
            adc_to(F.col("_c"), F.col("_qid")).alias("_sa"),
        )
        .filter(F.col("_id") != F.col("_qid"))
        # persist: both top-k arms consume the scored fan-out — left
        # lazy, the whole UDF pass would still run twice (lazy persist
        # keeps Catalyst's size stats, the change-7 discipline).
        .persist()
    )
    exact = _panel_topk(
        scored.select("_qid", "_id", F.col("_se").alias("_sim")),
        k, ascending=True,
    )
    approx = _panel_topk(
        scored.select("_qid", "_id", F.col("_sa").alias("_sim")),
        k, ascending=True,
    )
    hits = exact.join(approx, ["_qid", "_id"]).groupBy("_qid").agg(
        F.count("*").alias("_hits")
    )
    panel = spark.createDataFrame([(q,) for q in qids], "_qid long")
    return (
        F.broadcast(panel)
        .join(hits, "_qid", "left")
        .select(
            F.col("_qid").alias("qid"),
            F.round(
                F.coalesce(F.col("_hits"), F.lit(0)) / float(k), dp
            ).alias("recall_at_k"),
        )
    )


# ------------------------------------------------------------------ PQ

def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    n_codes: int = 16,
    seed: int = 42,
    max_iter: int = 10,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou, Douze, Schmid,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    split the vector into ``m`` contiguous subspaces and run one seeded
    KMeans per subspace over the corpus slice. Returns a plain numpy
    array ``(m, n_codes, dim/m)`` — kilobytes, persisted like the IVF
    quantizer (train once offline, fold into query closures)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = []
    for j in range(m):
        sl = F.slice(F.col(vec_col).cast("array<double>"), j * sub + 1, sub)
        train = df.select(array_to_vector(sl).alias("features"))
        km = KMeans(k=n_codes, seed=seed + j, maxIter=max_iter, featuresCol="features")
        model = km.fit(train)
        books.append(np.array([np.asarray(c) for c in model.clusterCenters()]))
    return np.stack(books)


def with_pq_codes(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out: str = "pq_codes",
) -> DataFrame:
    """Encode each vector as ``m`` one-byte codes (nearest codebook
    entry per subspace) — a 64-float embedding becomes 4 ints, a 64×
    compression of the scan payload. One numpy matmul per subspace per
    Arrow batch; assignment formula ``argmin(||c||² − 2·v_j·c)`` with
    lowest-code tiebreak, identical to the DuckDB oracle's rendering
    (matches the IVF assignment convention)."""
    books = np.asarray(codebooks, dtype=np.float64)  # m × n_codes × sub
    m, _, sub = books.shape
    book_sq = (books ** 2).sum(axis=2)  # m × n_codes

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        vm = np.asarray(vecs.tolist(), dtype=np.float64)
        codes = np.empty((len(vm), m), dtype=np.int32)
        for j in range(m):
            vj = vm[:, j * sub : (j + 1) * sub]
            d = book_sq[j][None, :] - 2.0 * (vj @ books[j].T)
            codes[:, j] = d.argmin(axis=1)
        return pd.Series([row.tolist() for row in codes])

    return df.withColumn(out, encode(F.col(vec_col)))


def pq_query_table(
    query_df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out: str = "_qtab",
) -> DataFrame:
    """Per-query ADC distance table: ``tab[j][c] = ||q_j − c||²``
    (expanded as ``||c||² − 2·q_j·c + ||q_j||²`` so the oracle can
    reproduce it term-by-term). One row, m×n_codes doubles — broadcast
    into the scoring scan."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, sub = books.shape
    book_sq = (books ** 2).sum(axis=2)

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.DoubleType())))
    def table(vecs: pd.Series) -> pd.Series:
        rows = []
        for v in vecs.tolist():
            q = np.asarray(v, dtype=np.float64)
            tab = np.empty((m, n_codes))
            for j in range(m):
                qj = q[j * sub : (j + 1) * sub]
                tab[j] = book_sq[j] - 2.0 * (books[j] @ qj) + (qj ** 2).sum()
            rows.append(tab.tolist())
        return pd.Series(rows)

    return query_df.limit(1).select(table(F.col(vec_col)).alias(out))


def pq_adc_knn(
    corpus: DataFrame,
    query_df: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_codes",
    query_vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: the
    query's per-subspace distance table rides a broadcast 1-row cross
    join; each corpus row's approximate distance is ``Σ_j tab[j][code_j]``
    — a pure JVM array-lookup fold over the m-byte codes, no vector
    math in the scan. At 100 TB this is the payoff: the hot scan reads
    m ints per row instead of the full float vector (the embeddings
    stay in cold storage for optional exact re-ranking of the
    shortlist), and the only shuffle is the final top-k heap merge.
    Ordering is total (rounded distance asc, id asc) for
    engine-reproducible membership."""
    qtab = F.broadcast(pq_query_table(query_df, codebooks, query_vec_col))
    adc = F.aggregate(
        F.transform(
            F.col(code_col),
            lambda c, j: F.element_at(F.element_at(F.col("_qtab"), j + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        corpus.crossJoin(qtab)
        .select(F.col(id_col), F.round(adc, round_dp).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_rerank_knn(
    corpus: DataFrame,
    query_df: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    query_vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Two-stage ANN (the production PQ pattern): stage 1 scans only
    the m-byte PQ codes and keeps an ADC ``shortlist`` (cheap, whole
    corpus); stage 2 joins the shortlist ids back to the float vectors
    and re-ranks the survivors by EXACT cosine. At 100 TB stage 2
    touches ``shortlist`` rows instead of the corpus — the float
    vectors stay cold except for a point-lookup-sized semi join. With
    ``shortlist → corpus size`` the result converges to the exact
    brute-force top-k (pinned by test)."""
    cand = pq_adc_knn(
        corpus, query_df, codebooks, k=shortlist,
        id_col=id_col, code_col=code_col, query_vec_col=query_vec_col,
        round_dp=round_dp,
    ).select(id_col)
    qv = F.broadcast(query_df.limit(1).select(F.col(query_vec_col).alias("_qv")))
    sim = F.round(cosine(F.col(vec_col), F.col("_qv")), round_dp)
    return (
        corpus.join(F.broadcast(cand), id_col, "left_semi")
        .crossJoin(qv)
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_pq_adc_knn(
    corpus: DataFrame,
    query_df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    code_col: str = "pq_codes",
    list_col: str = "ivf_list",
    query_vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """The composed billion-vector layout: IVF partition pruning
    decides WHICH rows are scanned (broadcast probe-list join on the
    partition column → dynamic partition pruning reads n_probe of
    n_lists directories), PQ decides WHAT each row costs (the pruned
    directories store only m one-byte codes — no float vectors on the
    hot path; ADC distance is the same JVM lookup fold as pq_adc_knn).
    ``corpus`` is the pre-built layout from the offline builder
    (vec_id, pq_codes, ivf_list — note: no embedding column at all);
    centroids and codebooks are the persisted train-once artifacts."""
    probes = F.broadcast(
        ivf_probe_lists(query_df, centroids, n_probe, query_vec_col)
    )
    qtab = F.broadcast(pq_query_table(query_df, codebooks, query_vec_col))
    adc = F.aggregate(
        F.transform(
            F.col(code_col),
            lambda c, j: F.element_at(F.element_at(F.col("_qtab"), j + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        corpus.join(probes, corpus[list_col] == probes["probe_list"])
        .crossJoin(qtab)
        .select(F.col(id_col), F.round(adc, round_dp).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 20,
    c: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    out: str = "rrf_score",
    round_dp: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke, Buettcher 2009): fuse
    any number of ranked candidate lists by ``Σ 1/(c + rank)``, the
    standard score-free way to combine lexical and semantic retrieval
    (ranks are comparable across systems; raw scores are not). Inputs
    are (id, rank) DataFrames — candidate-list-sized, never
    corpus-sized, so every join here is a broadcast of top-k rows; the
    missing-list contribution is 0 via outer joins. Total ordering
    (rounded score desc, id asc) keeps the fused top-k
    engine-reproducible."""
    from functools import reduce

    prepared = [
        df.select(F.col(id_col), (1.0 / (F.col(rank_col) + F.lit(c))).alias(f"_r{i}"))
        for i, df in enumerate(ranked)
    ]
    joined = reduce(
        lambda a, b: a.join(b, id_col, "full_outer"), prepared
    )
    score = reduce(
        lambda acc, i: acc + F.coalesce(F.col(f"_r{i}"), F.lit(0.0)),
        range(1, len(prepared)),
        F.coalesce(F.col("_r0"), F.lit(0.0)),
    )
    return (
        joined.select(F.col(id_col), F.round(score, round_dp).alias(out))
        .orderBy(F.col(out).desc(), F.col(id_col).asc())
        .limit(k)
    )


def cluster_contingency(
    assigned: DataFrame,
    cluster_col: str = "list_id",
    label_col: str = "label",
) -> DataFrame:
    """The (cluster, label) CONTINGENCY relation under every external
    clustering-agreement metric (purity, NMI, ARI — Hubert & Arabie,
    J. Classification 1985): one row per observed cell with the cell
    count and BOTH marginals attached, all exact bigint, so the
    entire relation is hash-checkable cross-engine and any agreement
    statistic derives from it without touching the corpus again.

    Shape: one partial-agg groupBy on (cluster, label) — cells are
    ≤ n_clusters·n_labels rows — then two cell-sized marginal
    aggregates joined back (broadcast-sized at any corpus scale,
    since the grain left the corpus at the first groupBy).

    Returns (cluster_col, label_col, n_cell, n_cluster, n_label).
    """
    # persist (r12): the marginal aggregates AND the final join all
    # consume this cell-grid-sized relation — left lazy, the corpus
    # groupBy beneath it executed three times per invocation.
    cells = assigned.groupBy(cluster_col, label_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cell")
    ).persist()
    rows = cells.groupBy(cluster_col).agg(
        F.sum("n_cell").cast("bigint").alias("n_cluster")
    )
    cols = cells.groupBy(label_col).agg(
        F.sum("n_cell").cast("bigint").alias("n_label")
    )
    return (
        cells.join(F.broadcast(rows), cluster_col)
        .join(F.broadcast(cols), label_col)
        .select(cluster_col, label_col, "n_cell", "n_cluster", "n_label")
    )


def contingency_micronat_dict(
    cells: Sequence[tuple],
    scale: int = 10**6,
) -> list[tuple]:
    """Fit the INTEGER MICRO-NAT dictionary that renders mutual
    information as exact bigint sums (the DSIR dictionary trick,
    VERDICT r11 #4, applied to the contingency logs): MI and the
    marginal entropies are Σ-of-float with engine-unpinned addition
    order, but each SUMMAND's log factor depends only on the bounded
    (cluster × label) CELL GRID — never the corpus — so it is fitted
    ONCE driver-side in pure Python, persisted, and both engines
    derive the scalar as an exact integer sum over the artifact:

        n·MI·scale  ≈ mi_micro = Σ_ij n_ij · round(scale·ln(n·n_ij/(a_i·b_j)))
        n·H_u·scale ≈ hu_micro = Σ_i  a_i  · round(scale·ln(n/a_i))
        n·H_v·scale ≈ hv_micro = Σ_j  b_j  · round(scale·ln(n/b_j))

    (so NMI ≈ 2·mi_micro/(hu_micro+hv_micro), one reader-side
    division). Rounding error is ≤ n/(2·scale) per aggregate —
    ≤ 0.5 micro-nat per count — and the integer sums themselves are
    bit-identical everywhere, which is what lets the scalar into the
    HASHED columns (the boolean-pinned posture tolerates ulp; this
    eliminates it).

    ``cells``: the collected (cluster, label, n_cell) grid — bounded
    by clusters × labels, the DSIR-dictionary driver-side-fit class,
    never a corpus collect. Returns rows (kind, a, b, micronats):
    kind 'cell' (a=cluster, b=label), 'row' (a=cluster, b=-1), 'col'
    (a=label, b=-1). Python's round() half-to-even is the pinned
    deterministic rule.
    """
    import math

    if scale < 1:
        raise ValueError(f"contingency_micronat_dict: scale={scale} must be >= 1")
    rows_m: dict = {}
    cols_m: dict = {}
    for c, l, n_cell in cells:
        if n_cell < 1:
            raise ValueError(
                f"contingency_micronat_dict: empty cell ({c}, {l})"
            )
        rows_m[c] = rows_m.get(c, 0) + int(n_cell)
        cols_m[l] = cols_m.get(l, 0) + int(n_cell)
    n = sum(rows_m.values())
    out = [
        (
            "cell",
            int(c),
            int(l),
            round(scale * math.log(n * int(n_cell) / (rows_m[c] * cols_m[l]))),
        )
        for c, l, n_cell in cells
    ]
    out += [
        ("row", int(c), -1, round(scale * math.log(n / a)))
        for c, a in rows_m.items()
    ]
    out += [
        ("col", int(l), -1, round(scale * math.log(n / b)))
        for l, b in cols_m.items()
    ]
    return out


def cluster_agreement(
    assigned: DataFrame,
    cluster_col: str = "list_id",
    label_col: str = "label",
) -> DataFrame:
    """One-row clustering-agreement report: the exact-integer pair
    counts + the ADJUSTED RAND INDEX as an exact bigint rational, and
    the float NMI path pinned behind its mathematical invariants —
    the companion purity (which rewards shattering into tiny
    clusters) needs next to it.

    With S = Σ_ij C(n_ij,2), A = Σ_i C(a_i,2), B = Σ_j C(b_j,2),
    N = C(n,2):  ARI = (S − AB/N) / ((A+B)/2 − AB/N)
              = (2·(N·S − A·B)) / (N·(A+B) − 2·A·B)
    — a ratio of integer pair counts, NO float anywhere (Hubert &
    Arabie's permutation-model expectation clears to the common
    denominator N): ari_num / ari_den as exact bigints; threshold or
    rank by cross-multiplication. Overflow contract: the products
    stay inside bigint while N·S < 2^63 (n ≲ 7·10⁴ dense-agreement
    worst case) — an execution-time guard raises past it (at larger
    n the report needs a 128-bit rendering; ANSI mode would throw
    regardless, this raise says why). The DuckDB oracle mirrors the
    SAME predicate via error() (ADVICE r11), so past the boundary
    both engines fail identically instead of the oracle silently
    widening into hugeint while Spark raises.

    NMI itself needs logs — Σ-of-float with engine-unpinned addition
    order, so the scalar stays OUT of the hashed output; instead the
    report carries two invariant booleans each engine must agree on:
    0 ≤ MI (within 1e-9) and MI ≤ min(H_cluster, H_label) + 1e-9 —
    a broken MI computation fails them, a correct one can't.

    Returns one row: (n, pairs_total, pairs_both, pairs_pred,
    pairs_true, ari_num, ari_den, mi_nonneg, mi_le_min_entropy).
    """
    # persist (r12): cells feeds rows/cols/s_/mi_, rows feeds
    # a_/mi_/hu_, cols feeds b_/mi_/hv_ — left lazy, the corpus
    # groupBy under `cells` re-executed once per consumer chain (11
    # corpus scans in the captured plan). All three relations are
    # bounded by the (cluster × label) grid, never corpus-sized.
    cells = assigned.groupBy(cluster_col, label_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_nc")
    ).persist()
    rows = cells.groupBy(cluster_col).agg(F.sum("_nc").alias("_na")).persist()
    cols = cells.groupBy(label_col).agg(F.sum("_nc").alias("_nb")).persist()

    # x·(x−1) is always even, so the shiftright halving is exact —
    # and stays in bigint (Spark's / returns double, losing exactness
    # past 2^53).
    s_ = cells.agg(
        F.shiftright(
            F.sum(F.col("_nc") * (F.col("_nc") - 1)).cast("bigint"), 1
        ).alias("pairs_both"),
        F.sum("_nc").cast("bigint").alias("n"),
    )
    a_ = rows.agg(
        F.shiftright(
            F.sum(F.col("_na") * (F.col("_na") - 1)).cast("bigint"), 1
        ).alias("pairs_pred")
    )
    b_ = cols.agg(
        F.shiftright(
            F.sum(F.col("_nb") * (F.col("_nb") - 1)).cast("bigint"), 1
        ).alias("pairs_true")
    )
    # MI and the entropies (float path — invariant booleans only).
    # MI = Σ_ij (n_ij/n)·ln(n·n_ij/(a_i·b_j)); H = −Σ (m/n)·ln(m/n).
    mi_ = (
        cells.join(F.broadcast(rows), cluster_col)
        .join(F.broadcast(cols), label_col)
        .crossJoin(F.broadcast(s_.select(F.col("n").alias("_n"))))
        .agg(
            F.sum(
                (F.col("_nc") / F.col("_n"))
                * F.log(
                    (F.col("_n") * F.col("_nc"))
                    / (F.col("_na") * F.col("_nb"))
                )
            ).alias("_mi")
        )
    )
    hu_ = (
        rows.crossJoin(F.broadcast(s_.select(F.col("n").alias("_n"))))
        .agg(
            (-F.sum((F.col("_na") / F.col("_n"))
                    * F.log(F.col("_na") / F.col("_n")))).alias("_hu")
        )
    )
    hv_ = (
        cols.crossJoin(F.broadcast(s_.select(F.col("n").alias("_n"))))
        .agg(
            (-F.sum((F.col("_nb") / F.col("_n"))
                    * F.log(F.col("_nb") / F.col("_n")))).alias("_hv")
        )
    )
    n_pairs = F.shiftright(
        (F.col("n") * (F.col("n") - 1)).cast("bigint"), 1
    )
    guard_bound = F.lit(2**63 - 1).cast("double")
    joined = (
        s_.crossJoin(F.broadcast(a_))
        .crossJoin(F.broadcast(b_))
        .crossJoin(F.broadcast(mi_))
        .crossJoin(F.broadcast(hu_))
        .crossJoin(F.broadcast(hv_))
        .withColumn("pairs_total", n_pairs)
    )
    overflow = (
        F.col("pairs_total").cast("double")
        * F.greatest(
            F.col("pairs_both"), F.col("pairs_pred"), F.col("pairs_true")
        ).cast("double")
        >= guard_bound / 4
    )
    checked = joined.withColumn(
        "pairs_total",
        F.when(
            overflow,
            F.raise_error(
                F.lit(
                    "cluster_agreement: pair-count products exceed the "
                    "exact-bigint range — the ARI rational needs a "
                    "128-bit rendering at this corpus size"
                )
            ),
        ).otherwise(F.col("pairs_total")),
    )
    ab = F.col("pairs_pred") * F.col("pairs_true")
    return checked.select(
        "n",
        "pairs_total",
        "pairs_both",
        "pairs_pred",
        "pairs_true",
        (2 * (F.col("pairs_total") * F.col("pairs_both") - ab))
        .cast("bigint")
        .alias("ari_num"),
        (
            F.col("pairs_total")
            * (F.col("pairs_pred") + F.col("pairs_true"))
            - 2 * ab
        )
        .cast("bigint")
        .alias("ari_den"),
        (F.col("_mi") >= -1e-9).alias("mi_nonneg"),
        (F.col("_mi") <= F.least(F.col("_hu"), F.col("_hv")) + 1e-9).alias(
            "mi_le_min_entropy"
        ),
    )
