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
