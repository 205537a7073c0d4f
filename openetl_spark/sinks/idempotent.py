"""Exactly-once file sink via a commit manifest (the Delta-less
pattern; same idea as Structured Streaming's file-sink _spark_metadata
log, made explicit and format-agnostic).

The problem: a batch job rerun after a mid-write crash — or a
Structured Streaming `foreachBatch` replay after a restart — writes
its output twice, and plain `mode=append` duplicates rows. Table
formats solve this with transactional commits; this container has no
Delta/Iceberg jars (`sinks/table_format.py` gates on that), so the
sink implements the minimal two-phase protocol directly:

1. data lands in a batch-scoped directory ``path/batch=<id>`` (mode
   overwrite — a replay of an UNcommitted batch clobbers the partial
   output rather than appending to it);
2. only after the write succeeds is a marker created under
   ``path/_commits/<id>`` — the atomic commit point;
3. replays of a committed id are skipped entirely;
4. readers go through ``read_committed``, which lists the manifest and
   reads exactly the committed batch directories — a crashed write's
   partial directory is invisible.

Scale posture: the data write is a normal distributed parquet write
(partitioned by the batch column on disk, any ``partition_by`` keys
below it); the manifest is one driver-side touch per batch — O(1)
metadata, no coordination beyond what the storage layer's atomic
file-create gives. On HDFS/S3 the marker create maps onto the
FileSystem API / an S3 PUT (both atomic per object); the stdlib
implementation here is the local-mode rendering of the same protocol.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def _commit_dir(path: str) -> str:
    return os.path.join(path, "_commits")


def is_committed(path: str, batch_id: int | str) -> bool:
    return os.path.exists(os.path.join(_commit_dir(path), str(batch_id)))


def committed_ids(path: str) -> list[str]:
    d = _commit_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(os.listdir(d))


def write_idempotent(
    df: DataFrame,
    path: str,
    batch_id: int | str,
    partition_by: Sequence[str] = (),
) -> bool:
    """Write one batch exactly once. Returns True if this call wrote,
    False if the batch was already committed (replay skipped)."""
    if is_committed(path, batch_id):
        return False
    target = os.path.join(path, f"batch={batch_id}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
    os.makedirs(_commit_dir(path), exist_ok=True)
    # atomic commit point: create-then-rename is unnecessary for a
    # zero-byte marker — the create itself is the atom
    with open(os.path.join(_commit_dir(path), str(batch_id)), "x"):
        pass
    return True


def read_committed(spark: SparkSession, path: str) -> DataFrame:
    """Read exactly the committed batches (partial directories from
    crashed writes are never visible). Returns an empty-schema-free
    error if nothing is committed yet — callers decide what an empty
    sink means."""
    ids = committed_ids(path)
    if not ids:
        raise FileNotFoundError(f"no committed batches under {path}")
    dirs = [os.path.join(path, f"batch={i}") for i in ids]
    return spark.read.parquet(*dirs)


def idempotent_foreach_batch(
    path: str, partition_by: Sequence[str] = ()
) -> Callable[[DataFrame, int], None]:
    """`writeStream.foreachBatch` adapter: after a restart, Structured
    Streaming replays the last possibly-uncommitted epoch with the SAME
    batch_id — the manifest turns that at-least-once replay into
    exactly-once output."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        write_idempotent(batch_df, path, batch_id, partition_by)

    return fn
