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


def test_stream_micro_batches_with_trigger_cap(spark, tmp_path):
    """First trigger is deliberately unrationed (no trusted start yet —
    see latestOffset); data arriving AFTER it drains under the
    max_offsets_per_trigger cap across several micro-batches."""
    log = str(tmp_path / "stream.jsonl")
    fake_kafka.write_log(log, "events", {0: 3})
    K.register(spark)
    batches = []
    q = (
        spark.readStream.format("openetl_kafka")
        .option("topic", "events")
        .option("client_factory", "tests.fake_kafka:consumer_factory")
        .option("factory_arg", log)
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
        fake_kafka.write_log(log, "events", {0: 20, 1: 4})  # 21 new offsets
        q.processAllAvailable()
    finally:
        q.stop()
    all_rows = [x for b in batches for x in b]
    assert sorted(all_rows) == sorted(
        [(0, o) for o in range(20)] + [(1, o) for o in range(4)]
    )  # exactly-once across micro-batches
    nonempty = [b for b in batches if b]
    assert len(nonempty) >= 4  # 3 unrationed + ~21/5 capped batches
    assert all(len(b) <= 5 for b in nonempty[1:])  # cap holds post-seed


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


def test_batch_empty_topic_returns_zero_rows(spark, tmp_path):
    """An unknown/empty topic must scan as 0 rows, not crash — pyspark
    substitutes [None] for an empty partition list."""
    empty_log = str(tmp_path / "empty.jsonl")
    open(empty_log, "w").close()
    K.register(spark)
    df = (
        spark.read.format("openetl_kafka")
        .option("topic", "nothing")
        .option("client_factory", "tests.fake_kafka:consumer_factory")
        .option("factory_arg", empty_log)
        .load()
    )
    assert df.count() == 0


def test_batch_data_loss_raises_and_opt_out(spark, log_path):
    """A planned offset range past the log's end is data loss: raise by
    default, deliver-what-exists with fail_on_data_loss=false."""
    import pytest as _pytest

    bad = dict(
        starting_offsets=json.dumps({"0": 0, "1": 0}),
        ending_offsets=json.dumps({"0": 9, "1": 5}),  # partition 0 only has 7
    )
    with _pytest.raises(Exception, match="data loss"):
        _reader(spark, log_path, **bad).collect()
    rows = _reader(spark, log_path, fail_on_data_loss="false", **bad).collect()
    assert len(rows) == 12  # the 7 + 5 that actually exist


def test_stream_restart_does_not_ration_below_checkpoint():
    """After a restart (initialOffset never called on the new reader
    instance), the first latestOffset must return the full log end —
    a rationed end computed from the log beginning could regress below
    the checkpoint and re-deliver committed records."""
    import tests.fake_kafka as fk
    import tempfile, os

    d = tempfile.mkdtemp()
    lp = os.path.join(d, "log.jsonl")
    fk.write_log(lp, "t", {0: 100})
    from openetl_spark.sources.kafka import KafkaStreamReader

    r = KafkaStreamReader(
        {
            "topic": "t",
            "client_factory": "tests.fake_kafka:consumer_factory",
            "factory_arg": lp,
            "max_offsets_per_trigger": "10",
        }
    )
    # restart: Spark restores offsets from the checkpoint, never calls
    # initialOffset on the new instance — full latest, never a rationed
    # value that could sit below the committed position
    assert r.latestOffset() == {"0": 100}
    # the batch runs [60, 100); partitions() reveals the true start and
    # the reader's own plan advances to 100 — new data rations normally
    r.partitions({"0": 60}, {"0": 100})
    fk.write_log(lp, "t", {0: 160})
    assert r.latestOffset() == {"0": 110}  # 100 + 10-budget


def test_stream_rationing_always_progresses():
    """floor() rationing with many tiny lags must still advance every
    lagging partition (min 1 offset) instead of stalling forever."""
    import tests.fake_kafka as fk
    import tempfile, os

    d = tempfile.mkdtemp()
    lp = os.path.join(d, "log.jsonl")
    fk.write_log(lp, "t", {p: 1 for p in range(6)})  # 6 partitions, lag 1 each
    from openetl_spark.sources.kafka import KafkaStreamReader

    r = KafkaStreamReader(
        {
            "topic": "t",
            "client_factory": "tests.fake_kafka:consumer_factory",
            "factory_arg": lp,
            "max_offsets_per_trigger": "5",
        }
    )
    start = r.initialOffset()
    assert start == {str(p): 0 for p in range(6)}
    planned = r.latestOffset()
    moved = sum(planned[p] - start[p] for p in planned)
    assert moved >= 6  # every lagging partition advanced (min-1 rule)
