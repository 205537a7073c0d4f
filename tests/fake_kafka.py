"""Deterministic kafka-python-compatible fake for sources/kafka.py.

Executors import this module in their own worker processes, so the
fake broker's log is (re)built deterministically from a JSONL file
whose path travels in the reader options (``factory_arg``) — the same
trick a real deployment uses for bootstrap servers. Records are
(topic, partition, offset, key, value, timestamp_ms) rows.
"""

from __future__ import annotations

import json
from dataclasses import dataclass


@dataclass
class FakeRecord:
    topic: str
    partition: int
    offset: int
    key: bytes | None
    value: bytes | None
    timestamp: int
    timestamp_type: int = 0


class FakeConsumer:
    """kafka-python surface subset over an in-memory log, with
    (topic, int) tuples standing in for TopicPartition."""

    def __init__(self, log: dict[tuple[str, int], list[FakeRecord]]):
        self._log = log
        self._positions: dict[tuple[str, int], int] = {}
        self._assigned: list[tuple[str, int]] = []
        self.closed = False

    def partitions_for_topic(self, topic: str):
        return {p for (t, p) in self._log if t == topic} or None

    def beginning_offsets(self, tps):
        return {tp: (self._log[tp][0].offset if self._log.get(tp) else 0) for tp in tps}

    def end_offsets(self, tps):
        return {
            tp: (self._log[tp][-1].offset + 1 if self._log.get(tp) else 0) for tp in tps
        }

    def assign(self, tps):
        self._assigned = list(tps)

    def seek(self, tp, offset: int):
        self._positions[tp] = offset

    def poll(self, timeout_ms: int = 1000, max_records: int | None = None):
        out = {}
        budget = max_records if max_records is not None else 500
        for tp in self._assigned:
            pos = self._positions.get(tp, 0)
            recs = [r for r in self._log.get(tp, []) if r.offset >= pos][:budget]
            if recs:
                out[tp] = recs
                self._positions[tp] = recs[-1].offset + 1
        return out

    def close(self):
        self.closed = True


def _load_log(path: str) -> dict[tuple[str, int], list[FakeRecord]]:
    log: dict[tuple[str, int], list[FakeRecord]] = {}
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            rec = FakeRecord(
                topic=row["topic"],
                partition=row["partition"],
                offset=row["offset"],
                key=row["key"].encode() if row.get("key") is not None else None,
                value=row["value"].encode() if row.get("value") is not None else None,
                timestamp=row["timestamp"],
            )
            log.setdefault((rec.topic, rec.partition), []).append(rec)
    for recs in log.values():
        recs.sort(key=lambda r: r.offset)
    return log


def consumer_factory(options: dict[str, str]) -> FakeConsumer:
    """The injected ``client_factory``: reads the log JSONL named by
    options['factory_arg'] — deterministic in every worker process."""
    return FakeConsumer(_load_log(options["factory_arg"]))


def write_log(path: str, topic: str, per_partition: dict[int, int]) -> int:
    """Test helper: synthesize `per_partition[p]` messages per partition
    into the JSONL the factory reads. Returns total messages."""
    total = 0
    with open(path, "w") as f:
        for p, n in per_partition.items():
            for o in range(n):
                f.write(
                    json.dumps(
                        {
                            "topic": topic,
                            "partition": p,
                            "offset": o,
                            "key": f"k{p}-{o}",
                            "value": json.dumps({"p": p, "o": o, "v": o * 10}),
                            "timestamp": 1700000000000 + o * 1000,
                        }
                    )
                    + "\n"
                )
                total += 1
    return total
