"""E2E tests for the Kafka-shaped source (sources/kafka.py) over the
injected fake consumer (tests/fake_kafka.py): batch offset-range
reads, partition fan-out, bounded offsets, streaming micro-batches
with maxOffsetsPerTrigger, and schema parity with spark-sql-kafka."""

import json

import pytest
from pyspark.sql import functions as F

from openetl_spark.sources import kafka as K
from tests import fake_kafka


@pytest.fixture(scope="module")
def log_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("kafka") / "log.jsonl"
    fake_kafka.write_log(str(p), "events", {0: 7, 1: 5, 2: 0})
    return str(p)


def _reader(spark, log_path, **opts):
    K.register(spark)
    r = (
        spark.read.format("openetl_kafka")
        .option("topic", "events")
        .option("client_factory", "tests.fake_kafka:consumer_factory")
        .option("factory_arg", log_path)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_reads_all_partitions(spark, log_path):
    df = _reader(spark, log_path)
    assert [f.name for f in df.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType",
    ]  # spark-sql-kafka column parity
    rows = df.collect()
    assert len(rows) == 12  # 7 + 5 + 0
    assert {r["partition"] for r in rows} == {0, 1}
    r0 = {r["offset"]: r for r in rows if r["partition"] == 0}
    assert sorted(r0) == list(range(7))
    assert r0[3]["key"] == b"k0-3"
    assert json.loads(bytes(r0[3]["value"]).decode()) == {"p": 0, "o": 3, "v": 30}
    assert r0[3]["timestamp"].year == 2023


def test_batch_task_per_partition(spark, log_path):
    df = _reader(spark, log_path)
    # one input partition per Kafka partition with data (the fake's
    # empty partition 2 is invisible to partitions_for_topic, as a real
    # topic-partition with no segments would not be)
    assert df.rdd.getNumPartitions() == 2


def test_batch_bounded_offsets(spark, log_path):
    df = _reader(
        spark,
        log_path,
        starting_offsets=json.dumps({"0": 2, "1": 1, "2": 0}),
        ending_offsets=json.dumps({"0": 5, "1": 2, "2": 0}),
    )
    rows = df.collect()
    got = sorted((r["partition"], r["offset"]) for r in rows)
    assert got == [(0, 2), (0, 3), (0, 4), (1, 1)]


def test_value_decodes_to_columns(spark, log_path):
    df = _reader(spark, log_path).select(
        F.from_json(F.col("value").cast("string"), "p int, o int, v int").alias("j")
    )
    assert df.select(F.sum("j.v")).first()[0] == sum(o * 10 for o in range(7)) + sum(
        o * 10 for o in range(5)
    )


def test_stream_micro_batches_with_trigger_cap(spark, log_path, tmp_path):
    K.register(spark)
    batches = []
    q = (
        spark.readStream.format("openetl_kafka")
        .option("topic", "events")
        .option("client_factory", "tests.fake_kafka:consumer_factory")
        .option("factory_arg", log_path)
        .option("max_offsets_per_trigger", "5")
        .load()
        .writeStream.foreachBatch(
            lambda df, bid: batches.append(
                sorted((r["partition"], r["offset"]) for r in df.collect())
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    all_rows = [x for b in batches for x in b]
    assert sorted(all_rows) == sorted(
        [(0, o) for o in range(7)] + [(1, o) for o in range(5)]
    )  # exactly-once across micro-batches
    nonempty = [b for b in batches if b]
    assert len(nonempty) >= 2  # the 5-offset cap forced multiple batches
    assert all(len(b) <= 5 for b in nonempty)


def test_batch_explicit_offsets_omitting_a_partition(spark, log_path):
    """Partitions missing from a user-supplied offsets map (e.g. added
    to the topic later) fall back to their natural bounds instead of
    failing the scan."""
    df = _reader(
        spark,
        log_path,
        starting_offsets=json.dumps({"0": 5}),  # partition 1 omitted
        ending_offsets="latest",
    )
    got = sorted((r["partition"], r["offset"]) for r in df.collect())
    assert got == [(0, 5), (0, 6)] + [(1, o) for o in range(5)]
