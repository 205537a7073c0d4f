"""Tests for the training-shard writer (sinks/shards.py): directory
partitioning, per-file record bounds, deterministic order, round-trip."""

import glob
import os

import pyarrow.parquet as pq

from openetl_spark.sinks.shards import write_training_shards


def test_shard_layout_bounds_and_order(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, partition_by=("lang",), order_by=("doc_id",), max_records_per_file=40
    )
    # directory partitioning on the mix key
    langs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    expect = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert langs == expect
    # per-file record bound + deterministic within-file order
    files = glob.glob(f"{out}/lang=*/*.parquet")
    assert files
    for f in files:
        t = pq.read_table(f)
        assert t.num_rows <= 40
        ids = t.column("doc_id").to_pylist()
        assert ids == sorted(ids)
    # lossless round-trip (partition column restored from the path)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.select("doc_id", "lang", "source").collect()}
    b = {tuple(r) for r in back.select("doc_id", "lang", "source").collect()}
    assert a == b


def test_shard_writer_multi_key_partitioning(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards2")
    write_training_shards(docs, out, partition_by=("lang", "source"), max_records_per_file=1000)
    nested = glob.glob(f"{out}/lang=*/source=*/*.parquet")
    assert nested  # two-level directory pruning layout


# ------------------------------------------------------- idempotent sink

def test_write_idempotent_skips_committed_replay(spark, tmp_path):
    from openetl_spark.sinks import idempotent as I

    p = str(tmp_path / "sink")
    df1 = spark.range(5).withColumnRenamed("id", "v")
    assert I.write_idempotent(df1, p, 0) is True
    # a replay of the SAME batch id with different data must be a no-op
    df2 = spark.range(100).withColumnRenamed("id", "v")
    assert I.write_idempotent(df2, p, 0) is False
    got = sorted(r["v"] for r in I.read_committed(spark, p).collect())
    assert got == [0, 1, 2, 3, 4]


def test_uncommitted_partial_write_is_invisible_then_replayable(spark, tmp_path):
    import os

    from openetl_spark.sinks import idempotent as I

    p = str(tmp_path / "sink")
    I.write_idempotent(spark.range(3).withColumnRenamed("id", "v"), p, 0)
    # simulate a crash mid-batch-1: data directory exists, no marker
    spark.range(10, 13).withColumnRenamed("id", "v").write.parquet(
        os.path.join(p, "batch=1")
    )
    assert I.committed_ids(p) == ["0"]
    assert {r["v"] for r in I.read_committed(spark, p).collect()} == {0, 1, 2}
    # the replay overwrites the partial output and commits it
    assert I.write_idempotent(
        spark.range(20, 22).withColumnRenamed("id", "v"), p, 1
    ) is True
    assert {r["v"] for r in I.read_committed(spark, p).collect()} == {0, 1, 2, 20, 21}


def test_streaming_foreach_batch_restart_is_exactly_once(spark, tmp_path):
    """Restarting a foreachBatch stream from its checkpoint replays the
    last epoch; the manifest sink must still emit each input row once."""
    import glob
    import json
    import os

    from openetl_spark.sinks import idempotent as I

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(n_files):
        for i in range(n_files):
            f = src / f"f{i}.json"
            if not f.exists():
                f.write_text(json.dumps({"v": i}) + "\n")
        stream = (
            spark.readStream.schema("v long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(I.idempotent_foreach_batch(out))
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run(2)
    first = sorted(r["v"] for r in I.read_committed(spark, out).collect())
    assert first == [0, 1]
    run(4)  # restart same checkpoint with two new files
    got = sorted(r["v"] for r in I.read_committed(spark, out).collect())
    assert got == [0, 1, 2, 3]


# ------------------------------------------------------ versioned table

def test_versioned_merge_upsert_and_delete(spark, tmp_path):
    from openetl_spark.sinks import versioned as V

    p = str(tmp_path / "tbl")
    v0 = V.merge_upsert(
        spark, p,
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"),
        key_cols=["k"],
    )
    assert v0 == 0
    # update k=2, insert k=4, delete k=3
    upd = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "k long, v string, _del boolean",
    )
    v1 = V.merge_upsert(spark, p, upd, key_cols=["k"], delete_col="_del")
    assert v1 == 1
    got = {r["k"]: r["v"] for r in V.read_latest(spark, p).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}
    # time travel: v0 unchanged
    old = {r["k"]: r["v"] for r in V.read_version(spark, p, 0).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_versioned_crash_partial_invisible_and_conflict_detected(spark, tmp_path):
    import os

    import pytest as _pytest

    from openetl_spark.sinks import versioned as V

    p = str(tmp_path / "tbl")
    V.write_snapshot(spark.createDataFrame([(1, "a")], "k long, v string"), p)
    # crashed writer: v=1 data exists, no marker → invisible
    spark.createDataFrame([(9, "z")], "k long, v string").write.parquet(
        os.path.join(p, "v=1")
    )
    assert V.latest_version(p) == 0
    assert {r["k"] for r in V.read_latest(spark, p).collect()} == {1}
    # optimistic concurrency: a merge computed from a stale base fails
    with _pytest.raises(V.ConcurrentWriteError):
        V.write_snapshot(
            spark.createDataFrame([(5, "e")], "k long, v string"),
            p, expected_base=-1,
        )
    # the dead partial blocks v=1 — a writer must NOT reclaim it inline
    # (ADVICE r04: between a racer's rename and commit, its directory
    # is indistinguishable from crash garbage); the explicit janitor
    # clears it, then the retry lands
    with _pytest.raises(V.ConcurrentWriteError):
        V.write_snapshot(
            spark.createDataFrame([(5, "e")], "k long, v string"), p,
            expected_base=0,
        )
    removed = V.reclaim_orphans(p)
    assert any(r.endswith("v=1") for r in removed)
    v = V.write_snapshot(
        spark.createDataFrame([(5, "e")], "k long, v string"), p,
        expected_base=0,
    )
    assert v == 1
    assert {r["k"] for r in V.read_version(spark, p, 1).collect()} == {5}
    # racing commit to the same version: second marker create fails
    with _pytest.raises(V.ConcurrentWriteError):
        V._commit(p, 1)


def test_streaming_cdc_apply_via_foreach_batch_merge(spark, tmp_path):
    """Streaming upsert apply: a change stream applied through
    foreachBatch + merge_upsert must land at the same final state as
    one batch merge of all changes (last-writer-wins per key arrives
    naturally because later micro-batches merge over earlier ones).
    Copy-on-write rewrites the snapshot per epoch — the right cost
    model for slowly-updating reference tables; high-rate CDC would
    batch epochs coarser or use the partition-scoped variant noted in
    the module docstring."""
    import json

    from openetl_spark.sinks import versioned as V

    src = tmp_path / "cdc"
    src.mkdir()
    batches = [
        [{"k": 1, "v": "a", "_del": False}, {"k": 2, "v": "b", "_del": False}],
        [{"k": 2, "v": "B", "_del": False}, {"k": 3, "v": "c", "_del": False}],
        [{"k": 1, "v": None, "_del": True}, {"k": 4, "v": "d", "_del": False}],
    ]
    for i, rows in enumerate(batches):
        f = src / f"b{i}.json"
        f.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        # file-stream ingestion order follows modification time; all
        # three files land within one mtime tick, so pin ascending
        # mtimes to make the change ORDER deterministic (same trick as
        # the events stream fixture)
        import os

        os.utime(f, (1000000000 + i * 60,) * 2)
    tbl = str(tmp_path / "tbl")

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        V.merge_upsert(spark, tbl, df, key_cols=["k"], delete_col="_del")

    stream = (
        spark.readStream.schema("k long, v string, _del boolean")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["k"]: r["v"] for r in V.read_latest(spark, tbl).collect()}
    assert got == {2: "B", 3: "c", 4: "d"}


def test_versioned_compact_preserves_data_reduces_files(spark, tmp_path):
    import glob
    import os

    from openetl_spark.sinks import versioned as V

    p = str(tmp_path / "tbl")
    # many tiny merges → fragmented snapshot
    V.write_snapshot(
        spark.range(100).withColumnRenamed("id", "k").repartition(8), p
    )
    before = glob.glob(os.path.join(p, "v=0", "*.parquet"))
    assert len(before) > 1
    v = V.compact(spark, p, target_files=1)
    after = glob.glob(os.path.join(p, f"v={v}", "*.parquet"))
    assert len(after) == 1
    got = sorted(r["k"] for r in V.read_latest(spark, p).collect())
    assert got == list(range(100))
    # time travel to the fragmented version still works
    assert V.read_version(spark, p, 0).count() == 100


def test_versioned_adapter_through_pipeline(spark, tmp_path):
    """The lakehouse table as a declarative Pipeline target AND source:
    parquet → versioned MERGE sink, then versioned source with the
    compiled spec (filter/sort) on top, including time travel."""
    from openetl_spark.spec import Connector, Filter, Pipeline, Sort
    from openetl_spark.pipeline import Orchestrator

    src_path = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 500.0)], "k long, v double"
    ).write.parquet(src_path)
    tbl = str(tmp_path / "tbl")
    orch = Orchestrator(spark=spark)

    orch.run_pipeline(Pipeline(
        id="p1",
        source=Connector(adapter_id="parquet", endpoint_id=src_path),
        target=Connector(
            adapter_id="versioned", endpoint_id=tbl,
            config={"key_cols": ["k"]},
        ),
    ))
    # second run: update k=2, insert k=4
    src2 = str(tmp_path / "in2.parquet")
    spark.createDataFrame(
        [(2, 77.0), (4, 4.0)], "k long, v double"
    ).write.parquet(src2)
    orch.run_pipeline(Pipeline(
        id="p2",
        source=Connector(adapter_id="parquet", endpoint_id=src2),
        target=Connector(
            adapter_id="versioned", endpoint_id=tbl,
            config={"key_cols": ["k"]},
        ),
    ))

    res = orch.run_pipeline(Pipeline(
        id="p3",
        source=Connector(
            adapter_id="versioned", endpoint_id=tbl,
            filters=[Filter("v", ">", 10)],
            sort=[Sort("k", "desc")],
        ),
    ))
    assert [(r["k"], r["v"]) for r in res.collect()] == [(3, 500.0), (2, 77.0)]
    # time travel through the source adapter
    res0 = orch.run_pipeline(Pipeline(
        id="p4",
        source=Connector(
            adapter_id="versioned", endpoint_id=tbl, config={"version": 0},
        ),
    ))
    assert {r["k"] for r in res0.collect()} == {1, 2, 3}


def test_partition_scoped_merge_rewrites_only_touched_partitions(spark, tmp_path):
    import glob
    import os

    from openetl_spark.sinks import versioned as V

    p = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("en", 1, "a"), ("en", 2, "b"), ("de", 3, "c"), ("fr", 4, "d")],
        "lang string, k long, v string",
    )
    v0 = V.merge_upsert_partitioned(spark, p, base, ["k"], "lang")
    assert v0 == 0
    # touch ONLY 'en': update k=2, insert k=5; delete de's k=3 too
    upd = spark.createDataFrame(
        [("en", 2, "B", False), ("en", 5, "e", False), ("de", 3, None, True)],
        "lang string, k long, v string, _del boolean",
    )
    v1 = V.merge_upsert_partitioned(spark, p, upd, ["k"], "lang", delete_col="_del")
    assert v1 == 1
    # fr was untouched: its data must still live ONLY under v=0
    assert not os.path.exists(os.path.join(p, "v=1", "lang=fr"))
    assert glob.glob(os.path.join(p, "v=0", "lang=fr", "*.parquet"))
    # de lost its only row → vanished from the manifest and the read
    got = {(r["lang"], r["k"]): r["v"]
           for r in V.read_latest_partitioned(spark, p, "lang").collect()}
    assert got == {("en", 1): "a", ("en", 2): "B", ("en", 5): "e",
                   ("fr", 4): "d"}
    manifest = V._read_manifest(p, 1)
    assert manifest == {"en": 1, "fr": 0}
    # new partition value in a later merge
    v2 = V.merge_upsert_partitioned(
        spark, p,
        spark.createDataFrame([("zh", 9, "z")], "lang string, k long, v string"),
        ["k"], "lang",
    )
    m2 = V._read_manifest(p, v2)
    assert m2 == {"en": 1, "fr": 0, "zh": 2}
    got2 = {r["lang"] for r in V.read_latest_partitioned(spark, p, "lang").collect()}
    assert got2 == {"en", "fr", "zh"}


def test_versioned_schema_evolution(spark, tmp_path):
    import pytest as _pytest

    from openetl_spark.sinks import versioned as V

    p = str(tmp_path / "tbl")
    V.write_snapshot(spark.createDataFrame([(1, "a")], "k long, v string"), p)
    upd = spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double")
    # drift is an explicit decision: strict mode refuses
    with _pytest.raises(Exception):
        V.merge_upsert(spark, p, upd, ["k"])
    v = V.merge_upsert(spark, p, upd, ["k"], schema_evolution=True)
    got = {r["k"]: (r["v"], r["score"])
           for r in V.read_version(spark, p, v).collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_read_version_resolves_manifest_carried_partitions(spark, tmp_path):
    """Regression (r08 review): reading a partition-merged table
    through read_latest/read_version must union carried-forward
    partitions, not just the last version's rewritten directory."""
    from openetl_spark.sinks import versioned as V

    p = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "en", "a"), (2, "de", "b"), (3, "fr", "c")],
        "k long, lang string, v string",
    )
    V.merge_upsert_partitioned(spark, p, base, ["k"], "lang")
    V.merge_upsert_partitioned(
        spark, p,
        spark.createDataFrame([(1, "en", "A")], "k long, lang string, v string"),
        ["k"], "lang",
    )
    got = {(r["k"], r["lang"], r["v"]) for r in V.read_latest(spark, p).collect()}
    assert got == {(1, "en", "A"), (2, "de", "b"), (3, "fr", "c")}
    # compact() must also see the full logical table
    V.compact(spark, p)
    got2 = {(r["k"], r["lang"], r["v"]) for r in V.read_latest(spark, p).collect()}
    assert got2 == got


def test_partitioned_merge_converts_plain_snapshot_base(spark, tmp_path):
    """Regression (r08 review): a partitioned merge over a plain
    write_snapshot base must keep every base row (full conversion),
    not silently drop the table."""
    from openetl_spark.sinks import versioned as V

    p = str(tmp_path / "tbl")
    V.write_snapshot(
        spark.createDataFrame(
            [(1, "en", "a"), (2, "de", "b")], "k long, lang string, v string"
        ),
        p,
    )
    V.merge_upsert_partitioned(
        spark, p,
        spark.createDataFrame([(3, "fr", "c"), (1, "en", "A")],
                              "k long, lang string, v string"),
        ["k"], "lang",
    )
    got = {(r["k"], r["v"]) for r in V.read_latest(spark, p).collect()}
    assert got == {(1, "A"), (2, "b"), (3, "c")}


def test_partitioned_merge_escaped_partition_values(spark, tmp_path):
    """Regression (r08 review): partition values containing characters
    Hive escapes in directory names (':') must survive merge, carry-
    forward, and read."""
    from openetl_spark.sinks import versioned as V

    p = str(tmp_path / "tbl")
    rows = [(1, "a:b", "x"), (2, "c/d", "y")]
    V.merge_upsert_partitioned(
        spark, p,
        spark.createDataFrame(rows, "k long, src string, v string"),
        ["k"], "src",
    )
    V.merge_upsert_partitioned(
        spark, p,
        spark.createDataFrame([(1, "a:b", "X")], "k long, src string, v string"),
        ["k"], "src",
    )
    got = {(r["k"], r["src"], r["v"]) for r in V.read_latest(spark, p).collect()}
    assert got == {(1, "a:b", "X"), (2, "c/d", "y")}


def test_publish_refuses_to_clobber_committed_version(spark, tmp_path):
    """Regression (r08 review): a losing writer must fail WITHOUT
    touching the winner's committed data directory."""
    import pytest as _pytest

    from openetl_spark.sinks import versioned as V

    p = str(tmp_path / "tbl")
    V.write_snapshot(spark.createDataFrame([(1, "a")], "k long, v string"), p)
    V.write_snapshot(
        spark.createDataFrame([(2, "b")], "k long, v string"), p, expected_base=0
    )
    # a racer that computed version 1 from the stale base: its publish
    # must raise and v=1's committed data must be intact afterwards
    with _pytest.raises(V.ConcurrentWriteError):
        V._publish(
            spark.createDataFrame([(9, "z")], "k long, v string")
            .write.mode("overwrite"),
            p, 1,
        )
    assert {r["k"] for r in V.read_version(spark, p, 1).collect()} == {2}


def test_publish_never_reclaims_a_racers_uncommitted_rename(spark, tmp_path):
    """ADVICE r04 (medium): racer A renamed v=1 in but hasn't committed
    yet; racer B's publish must fail WITHOUT touching A's directory —
    the old reclaim-and-retry rmtree'd A's data, renamed B's in, and
    A's subsequent commit landed A's marker over B's rows."""
    import pytest as _pytest

    from openetl_spark.sinks import versioned as V

    p = str(tmp_path / "tbl")
    V.write_snapshot(spark.createDataFrame([(1, "a")], "k long, v string"), p)
    # racer A: publish (rename in) v=1, commit NOT yet done
    V._publish(
        spark.createDataFrame([(2, "A")], "k long, v string")
        .write.mode("overwrite"),
        p, 1,
    )
    # racer B: must lose without touching A's data
    with _pytest.raises(V.ConcurrentWriteError):
        V._publish(
            spark.createDataFrame([(9, "B")], "k long, v string")
            .write.mode("overwrite"),
            p, 1,
        )
    # A's commit succeeds and A's data is what version 1 holds
    V._commit(p, 1)
    assert {(r["k"], r["v"]) for r in V.read_version(spark, p, 1).collect()} == {
        (2, "A")
    }


def test_partitioned_merge_numeric_looking_string_partitions(spark, tmp_path):
    """ADVICE r04 (low): string partition values that LOOK numeric
    ('01') must survive the manifest round-trip — bare read-back
    inference coerced '01'→1 and orphaned the partition on later
    merges."""
    from openetl_spark.sinks import versioned as V

    p = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [("01", 1, "a"), ("2", 2, "b")], "pt string, k long, v string"
    )
    V.merge_upsert_partitioned(spark, p, df, key_cols=["k"], partition_col="pt")
    m1 = V._read_manifest(p, 0)
    assert set(m1) == {"01", "2"}
    # second merge touches only '2'; '01' must carry forward by
    # reference, stay readable, and keep its exact key
    up = spark.createDataFrame([("2", 2, "B")], "pt string, k long, v string")
    V.merge_upsert_partitioned(spark, p, up, key_cols=["k"], partition_col="pt")
    m2 = V._read_manifest(p, 1)
    assert m2 == {"01": 0, "2": 1}
    out = {
        (r["pt"], r["k"], r["v"])
        for r in V.read_latest_partitioned(spark, p, "pt").collect()
    }
    assert out == {("01", 1, "a"), ("2", 2, "B")}


# ------------------------------------------------------------------
# z-order layout (r06-s2): multi-column file-skipping locality
# ------------------------------------------------------------------

def test_zorder_value_interleaves_bits(spark):
    from openetl_spark.sinks.layout import zorder_value
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(0, 0), (3, 0), (0, 3), (3, 3)], "x int, y int")
    z = df.select(
        "x", "y",
        zorder_value([F.col("x"), F.col("y")], [0, 0], [3, 3], bits=2).alias("z"),
    )
    got = {(r["x"], r["y"]): r["z"] for r in z.collect()}
    # 2-bit morton: (x1 y1 x0 y0); corners of the 4x4 grid
    assert got[(0, 0)] == 0b0000
    assert got[(3, 0)] == 0b1010
    assert got[(0, 3)] == 0b0101
    assert got[(3, 3)] == 0b1111


def test_zorder_layout_buys_multi_column_locality(spark, tmp_path):
    """Z-ordering (user_id, value) must give BOTH columns compact
    per-file ranges, while a single-column sort gives locality on that
    column only — the measurable property parquet min/max skipping
    prunes on."""
    import pyspark.sql.functions as F

    from openetl_spark.sinks.layout import file_locality_report, write_zorder

    n = 4096
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 1000).alias("user_id"),
        (F.col("id") * 40503 % 997).cast("double").alias("value"),
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zorder(df, zpath, ["user_id", "value"], n_files=16)
    # baseline: range-sorted by user_id alone, same file count
    df.repartitionByRange(16, "user_id").sortWithinPartitions(
        "user_id"
    ).write.parquet(spath)

    def avg_spans(path):
        rep = file_locality_report(spark, path, ["user_id", "value"]).agg(
            F.avg("span_frac_user_id"), F.avg("span_frac_value")
        ).first()
        return rep[0], rep[1]

    z_user, z_value = avg_spans(zpath)
    s_user, s_value = avg_spans(spath)
    # single-column sort: near-perfect on user_id, none on value
    assert s_user < 0.2 and s_value > 0.8
    # z-order: compact on BOTH (16 files, 2 cols -> ~1/4 per column)
    assert z_user < 0.5 and z_value < 0.5, (z_user, z_value)
    # and round-trips the data intact
    assert spark.read.parquet(zpath).count() == n


def test_rowgroup_stats_report_reads_footers_only(spark, tmp_path):
    """The metadata-only audit must agree with the scanned locality
    report: on a z-ordered table every row group's footer min/max spans
    a compact slice of both layout columns."""
    import pyspark.sql.functions as F

    from openetl_spark.sinks.layout import rowgroup_stats_report, write_zorder

    n = 4096
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 1000).alias("user_id"),
        (F.col("id") * 40503 % 997).cast("double").alias("value"),
    )
    path = str(tmp_path / "z")
    write_zorder(df, path, ["user_id", "value"], n_files=16)
    rows = rowgroup_stats_report(path, ["user_id", "value"])
    assert sum(r["n_rows"] for r in rows) == n
    spans_u = [
        (r["max_user_id"] - r["min_user_id"]) / 1000.0
        for r in rows
        if r["min_user_id"] is not None
    ]
    spans_v = [
        (r["max_value"] - r["min_value"]) / 997.0
        for r in rows
        if r["min_value"] is not None
    ]
    assert spans_u and spans_v
    # footer stats must show the same compactness the scan measured
    assert sum(spans_u) / len(spans_u) < 0.5
    assert sum(spans_v) / len(spans_v) < 0.5


def test_versioned_compact_zorder_layout(spark, tmp_path):
    """OPTIMIZE ZORDER on a versioned table: compact(zorder_by=...)
    commits a new version with identical rows whose files are
    z-clustered — both layout columns show compact footer ranges, and
    time travel to the pre-compaction version still works."""
    import pyspark.sql.functions as F

    from openetl_spark.sinks import versioned as V
    from openetl_spark.sinks.layout import rowgroup_stats_report

    path = str(tmp_path / "tbl")
    n = 4096
    df = spark.range(n).select(
        "id",
        (F.col("id") * 2654435761 % 1000).alias("user_id"),
        (F.col("id") * 40503 % 997).cast("double").alias("value"),
    )
    v0 = V.write_snapshot(df.repartition(13), path)
    v1 = V.compact(spark, path, target_files=8, zorder_by=["user_id", "value"])
    assert v1 == v0 + 1
    after = V.read_version(spark, path, v1)
    assert after.count() == n
    assert {r["id"] for r in after.select("id").collect()} == set(range(n))
    # time travel intact
    assert V.read_version(spark, path, v0).count() == n
    # the new version's parquet footers show locality on BOTH columns
    import glob
    import os

    vdir = os.path.join(path, f"v={v1}")
    assert os.path.isdir(vdir), sorted(glob.glob(os.path.join(path, "*")))
    rows = rowgroup_stats_report(vdir, ["user_id", "value"])
    assert sum(r["n_rows"] for r in rows) == n
    for col, span in (("user_id", 1000.0), ("value", 997.0)):
        fracs = [
            (r[f"max_{col}"] - r[f"min_{col}"]) / span
            for r in rows
            if r[f"min_{col}"] is not None
        ]
        assert fracs and sum(fracs) / len(fracs) < 0.6, (col, fracs)
