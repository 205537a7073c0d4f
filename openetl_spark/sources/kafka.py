"""Kafka-shaped log source without the JVM connector jar (Python Data
Source API) — ``spark.read.format("openetl_kafka")`` and
``spark.readStream.format("openetl_kafka")``.

The container ships no spark-sql-kafka jar and no broker, so the
transport is an injected *consumer factory* (same philosophy as the
pymongo-compatible client in ``sources/mongo.py`` and the GAQL
transport in ``sources/gads.py``): a dotted-path
``module:callable`` resolved ON EXECUTORS (pickle-free, cluster-safe)
that receives the reader options and returns a kafka-python-compatible
consumer. Against a real cluster the factory returns
``kafka.KafkaConsumer(...)`` wrapped to speak (topic, partition)
tuples; tests inject a deterministic fake (``tests/fake_kafka.py``).

Consumer contract (kafka-python subset, topic-partitions as plain
``(topic, int)`` tuples):

* ``partitions_for_topic(topic) -> set[int]``
* ``beginning_offsets(tps) / end_offsets(tps) -> dict[tp, int]``
* ``assign(tps)``, ``seek(tp, offset)``
* ``poll(timeout_ms=..., max_records=...) -> dict[tp, list[record]]``
  where records expose ``offset key value timestamp timestamp_type``
  (timestamp in epoch millis, key/value bytes or None)
* ``close()``

Output schema mirrors the real Spark Kafka source column-for-column
(key/value binary, topic, partition, offset, timestamp,
timestampType), so downstream code ports between this source and
spark-sql-kafka unchanged.

Scale shape: batch reads fan out one ``InputPartition`` per Kafka
topic-partition — the same 1:1 task mapping the JVM connector uses, so
parallelism equals log partitioning and each task reads one
broker-sequential offset range. Streaming uses the full (non-simple)
``DataSourceStreamReader`` API: offset ranges are planned on the
driver from ``end_offsets`` (a metadata call), but record fetching
happens in ``read()`` ON EXECUTORS, partition-parallel per
micro-batch, with ``maxOffsetsPerTrigger`` rationing a trigger's rows
across partitions proportionally to their backlog (the JVM
connector's policy).
"""

from __future__ import annotations

import datetime as _dt
import importlib
import math
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KAFKA_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def _resolve_factory(options: dict[str, str]):
    mod, _, attr = options["client_factory"].partition(":")
    return getattr(importlib.import_module(mod), attr)


def _consumer(options: dict[str, str]):
    return _resolve_factory(options)(dict(options))


def _ts(ms) -> _dt.datetime | None:
    if ms is None:
        return None
    return _dt.datetime.fromtimestamp(ms / 1000.0, tz=_dt.timezone.utc).replace(
        tzinfo=None
    )


def _read_range(
    consumer,
    topic: str,
    part: int,
    start: int,
    end: int,
    empty_polls: int = 5,
    fail_on_data_loss: bool = True,
):
    """Yield schema-shaped tuples for offsets [start, end) of one
    topic-partition. An empty poll() is NOT end-of-data — real
    consumers return {} transiently (fetch in flight, rebalance); only
    after ``empty_polls`` consecutive empty polls does the reader
    consult the log's natural end. A planned range the log no longer
    holds (retention truncation between planning and read) is DATA
    LOSS: raise unless ``fail_on_data_loss`` is False (mirrors
    spark-sql-kafka's failOnDataLoss), never silently under-deliver."""
    tp = (topic, part)
    if start >= end:
        return
    consumer.assign([tp])
    consumer.seek(tp, start)
    nxt = start
    empties = 0
    while nxt < end:
        batches = consumer.poll(timeout_ms=1000, max_records=end - nxt)
        recs = batches.get(tp, [])
        if not recs:
            empties += 1
            if empties < empty_polls:
                continue
            natural_end = consumer.end_offsets([tp]).get(tp, 0)
            if nxt < min(natural_end, end):
                # offsets in [nxt, natural_end) exist but aren't
                # arriving — fail loudly rather than checkpoint past
                # unread data
                raise RuntimeError(
                    f"kafka source: {empty_polls} empty polls with "
                    f"{min(natural_end, end) - nxt} live offsets "
                    f"outstanding on {tp} — transport stalled"
                )
            if natural_end < end and fail_on_data_loss:
                raise RuntimeError(
                    f"kafka source: offsets [{natural_end}, {end}) on "
                    f"{tp} no longer exist — data loss "
                    "(set fail_on_data_loss=false to skip)"
                )
            return  # fail_on_data_loss=false: yield what existed
        empties = 0
        for r in recs:
            if r.offset >= end:
                return
            nxt = r.offset + 1
            yield (
                r.key,
                r.value,
                topic,
                part,
                r.offset,
                _ts(r.timestamp),
                getattr(r, "timestamp_type", 0),
            )


@dataclass
class OffsetRange(InputPartition):
    topic: str
    partition: int
    start: int
    end: int


class KafkaBatchReader(DataSourceReader):
    def __init__(self, options: dict[str, str]):
        self.options = options
        self.topic = options["topic"]

    def partitions(self):
        import json

        c = _consumer(self.options)
        try:
            parts = sorted(c.partitions_for_topic(self.topic) or [])
            tps = [(self.topic, p) for p in parts]
            nat_begin = c.beginning_offsets(tps)
            nat_end = c.end_offsets(tps)
            # Explicit JSON offsets override per partition; partitions a
            # user-supplied map omits (e.g. added to the topic after the
            # offsets were recorded) fall back to their natural bound
            # rather than failing the scan.
            so = self.options.get("starting_offsets", "earliest")
            eo = self.options.get("ending_offsets", "latest")
            ex_begin = {} if so == "earliest" else {int(k): int(v) for k, v in json.loads(so).items()}
            ex_end = {} if eo == "latest" else {int(k): int(v) for k, v in json.loads(eo).items()}
            return [
                OffsetRange(
                    self.topic,
                    p,
                    ex_begin.get(p, nat_begin[(self.topic, p)]),
                    ex_end.get(p, nat_end[(self.topic, p)]),
                )
                for p in parts
            ] or [OffsetRange(self.topic, -1, 0, 0)]
            # sentinel: pyspark substitutes [None] for an empty
            # partition list and read(None) would crash — an empty or
            # unknown topic must scan as 0 rows instead
        finally:
            c.close()

    def read(self, partition: OffsetRange):
        if partition is None or partition.partition < 0:
            return
        c = _consumer(self.options)
        try:
            yield from _read_range(
                c,
                partition.topic,
                partition.partition,
                partition.start,
                partition.end,
                empty_polls=int(self.options.get("empty_polls", "5")),
                fail_on_data_loss=self.options.get("fail_on_data_loss", "true")
                != "false",
            )
        finally:
            c.close()


class KafkaStreamReader(DataSourceStreamReader):
    """Micro-batch planning on the driver (offset metadata only);
    record reads on executors, one task per topic-partition slice."""

    def __init__(self, options: dict[str, str]):
        self.options = options
        self.topic = options["topic"]
        self.max_per_trigger = int(options.get("max_offsets_per_trigger", "0"))

    def _offsets(self, which: str) -> dict[str, int]:
        c = _consumer(self.options)
        try:
            parts = sorted(c.partitions_for_topic(self.topic) or [])
            tps = [(self.topic, p) for p in parts]
            got = c.beginning_offsets(tps) if which == "begin" else c.end_offsets(tps)
            return {str(p): int(got[(self.topic, p)]) for p in parts}
        finally:
            c.close()

    def initialOffset(self) -> dict:
        natural = self._offsets("begin")
        if self.options.get("starting_offsets", "earliest") == "earliest":
            return natural
        import json

        # explicit offsets override per partition; partitions the map
        # omits start at their natural beginning (a retention-truncated
        # partition must not be planned from offset 0)
        explicit = {k: int(v) for k, v in json.loads(self.options["starting_offsets"]).items()}
        return {p: explicit.get(p, v) for p, v in natural.items()} | {
            p: v for p, v in explicit.items() if p not in natural
        }

    def latestOffset(self) -> dict:
        latest = self._offsets("end")
        if not self.max_per_trigger:
            return latest
        # Ration the trigger budget across partitions proportionally to
        # backlog (spark-sql-kafka's maxOffsetsPerTrigger policy). The
        # committed start isn't passed to latestOffset in this API (and
        # initialOffset is NOT reliably invoked on this instance before
        # the first trigger), so rationing only ever measures lag
        # against a TRUSTED start: the reader's own previous plan,
        # refined by the true batch starts partitions() reveals. With
        # no trusted start — first trigger of a fresh query OR of a
        # checkpoint restart — return the full log end: a rationed end
        # derived from any guessed start could regress below the
        # checkpoint and re-deliver committed records. One unrationed
        # trigger is the correct price for exactly-once.
        planned_prev = getattr(self, "_planned", None)
        seen = getattr(self, "_seen_start", None)
        if planned_prev is None and seen is None:
            self._planned = latest
            return latest
        start = {
            p: max(
                int((planned_prev or {}).get(p, 0)), int((seen or {}).get(p, 0))
            )
            for p in latest
        }
        lags = {p: max(0, latest[p] - start.get(p, 0)) for p in latest}
        total = sum(lags.values())
        if total <= self.max_per_trigger:
            self._planned = latest
            return latest
        scale = self.max_per_trigger / total
        # floor() alone can assign every partition 0 (many partitions,
        # tiny lags) and stall the stream; guarantee ≥1 offset of
        # progress per lagging partition — overshoot is bounded by the
        # partition count
        planned = {
            p: start.get(p, 0)
            + (max(1, math.floor(lags[p] * scale)) if lags[p] else 0)
            for p in latest
        }
        self._planned = planned
        return planned

    def partitions(self, start: dict, end: dict):
        # record the true committed start — after a restart this is the
        # only place the checkpoint position is visible to the reader
        seen = getattr(self, "_seen_start", {})
        self._seen_start = {
            p: max(int(v), int(seen.get(p, 0))) for p, v in start.items()
        } | {p: int(v) for p, v in seen.items() if p not in start}
        return [
            OffsetRange(self.topic, int(p), int(start.get(p, 0)), int(end[p]))
            for p in sorted(end, key=int)
            if int(end[p]) > int(start.get(p, 0))
        ] or [OffsetRange(self.topic, -1, 0, 0)]  # planner requires ≥1

    def read(self, partition: OffsetRange):
        if partition is None or partition.partition < 0:
            return iter([])
        c = _consumer(self.options)
        try:
            yield from _read_range(
                c,
                partition.topic,
                partition.partition,
                partition.start,
                partition.end,
                empty_polls=int(self.options.get("empty_polls", "5")),
                fail_on_data_loss=self.options.get("fail_on_data_loss", "true")
                != "false",
            )
        finally:
            c.close()

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint, as with the JVM source

    def stop(self) -> None:
        pass


class KafkaDataSource(DataSource):
    """``spark.read.format("openetl_kafka")`` /
    ``spark.readStream.format("openetl_kafka")`` with options
    ``topic``, ``client_factory`` ("pkg.mod:fn"), ``starting_offsets``
    (earliest | JSON {"0": n}), ``ending_offsets`` (batch: latest |
    JSON), ``max_offsets_per_trigger`` (stream)."""

    @classmethod
    def name(cls) -> str:
        return "openetl_kafka"

    def schema(self):
        return KAFKA_SCHEMA

    def reader(self, schema: StructType) -> KafkaBatchReader:
        return KafkaBatchReader(dict(self.options))

    def streamReader(self, schema: StructType) -> KafkaStreamReader:
        return KafkaStreamReader(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(KafkaDataSource)
