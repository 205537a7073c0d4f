"""Copy-on-write versioned table with MERGE semantics — the minimal
lakehouse protocol (snapshot isolation, atomic commits, optimistic
concurrency) on plain parquet, for environments without Delta/Iceberg
jars (`sinks/table_format.py` gates on their absence).

Layout:

    path/v=3/…parquet        immutable snapshot data
    path/_versions/3         commit marker (the atomic unit)

* Readers resolve max(committed version) and read exactly that
  directory — a crashed writer's partial ``v=N`` directory has no
  marker and is invisible (snapshot isolation for free).
* Writers build the next snapshot OFF the current one (copy-on-write)
  and commit by atomically creating the marker. Two concurrent
  writers racing to the same version: exactly one marker create
  succeeds (``open(…, "x")``); the loser's data directory is garbage
  to collect, its commit raises ``ConcurrentWriteError`` and the
  caller re-runs the merge on the new latest — optimistic concurrency,
  the same loop Delta runs.
* ``merge_upsert`` is the MERGE INTO shape: survivors = base rows
  whose key misses the updates (left_anti), new snapshot = survivors ∪
  upserts (minus rows flagged deleted). One shuffle on the merge keys.

At 100 TB: copy-on-write rewrites the whole table per commit, which is
right for snapshot-sized batch merges (training-corpus refreshes);
partition-scoped merges (rewrite only touched partitions) are the
next increment and compose with this exact manifest protocol — noted
rather than built because nothing in the driver corpus exercises
multi-partition selective rewrite.

The stdlib marker create maps onto an atomic HDFS create / S3 PUT in
production, as in `sinks/idempotent.py`.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first; re-run the merge."""


def _versions_dir(path: str) -> str:
    return os.path.join(path, "_versions")


def committed_versions(path: str) -> list[int]:
    d = _versions_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(int(v) for v in os.listdir(d))


def latest_version(path: str) -> int | None:
    vs = committed_versions(path)
    return vs[-1] if vs else None


def read_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    if version not in committed_versions(path):
        raise FileNotFoundError(f"version {version} not committed under {path}")
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def read_latest(spark: SparkSession, path: str) -> DataFrame:
    v = latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    return read_version(spark, path, v)


def _commit(path: str, version: int) -> None:
    os.makedirs(_versions_dir(path), exist_ok=True)
    try:
        with open(os.path.join(_versions_dir(path), str(version)), "x"):
            pass
    except FileExistsError as e:
        raise ConcurrentWriteError(
            f"version {version} already committed under {path}"
        ) from e


def write_snapshot(df: DataFrame, path: str, expected_base: int | None = None) -> int:
    """Write a full snapshot as the next version and commit it.
    ``expected_base`` is the optimistic-concurrency token: pass the
    version the snapshot was computed FROM; if someone else committed
    meanwhile, the commit fails and the caller recomputes."""
    base = latest_version(path)
    if expected_base is not None and base != expected_base:
        raise ConcurrentWriteError(
            f"base moved: expected {expected_base}, latest is {base}"
        )
    version = 0 if base is None else base + 1
    df.write.mode("overwrite").parquet(os.path.join(path, f"v={version}"))
    _commit(path, version)
    return version


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
) -> int:
    """MERGE INTO: rows in ``updates`` replace base rows with the same
    key, new keys insert, and (with ``delete_col``) rows flagged true
    delete their key from the table. Returns the committed version.
    The plan is one left_anti shuffle on the keys plus a union — no
    driver-side materialization."""
    base_v = latest_version(path)
    if delete_col is not None:
        deletes = updates.filter(updates[delete_col])
        upserts = updates.filter(~updates[delete_col]).drop(delete_col)
        tomb = deletes.select(*key_cols)
    else:
        upserts = updates
        tomb = None
    if base_v is None:
        return write_snapshot(upserts, path, expected_base=None)
    base = read_version(spark, path, base_v)
    gone = upserts.select(*key_cols)
    if tomb is not None:
        gone = gone.unionByName(tomb)
    survivors = base.join(gone, list(key_cols), "left_anti")
    return write_snapshot(
        survivors.unionByName(upserts), path, expected_base=base_v
    )


def compact(
    spark: SparkSession, path: str, target_files: int = 1
) -> int:
    """Small-file compaction as a new version: read the latest
    snapshot, coalesce to ``target_files`` files, commit. Data is
    byte-identical (same rows, fewer files); readers flip atomically
    and time travel to the fragmented version still works. Run after
    many small CDC merges — the lakehouse OPTIMIZE verb. coalesce()
    (not repartition) avoids a shuffle: it only glues existing
    partitions together, which is exactly what small-file compaction
    wants."""
    base_v = latest_version(path)
    if base_v is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    df = read_version(spark, path, base_v).coalesce(target_files)
    return write_snapshot(df, path, expected_base=base_v)


class VersionedSink:
    """Registry adapter (`adapter_id='versioned'`): the lakehouse table
    as a declarative Pipeline target. ``endpoint_id`` is the table
    path; config:

    * ``key_cols`` — present → MERGE upsert on those keys (with
      optional ``delete_col`` tombstone flag); absent → append a full
      snapshot version.
    * streaming inputs run through foreachBatch + merge (the CDC-apply
      loop), checkpointed at ``config['checkpoint']`` (default
      ``<path>_checkpoint``); ``config['sync']`` drains synchronously.
    """

    def write(self, df: DataFrame, connector) -> None:
        path = connector.endpoint_id
        keys = connector.config.get("key_cols")
        delete_col = connector.config.get("delete_col")

        def apply(batch_df: DataFrame, _bid: int) -> None:
            if batch_df.isEmpty():
                return
            if keys:
                merge_upsert(
                    batch_df.sparkSession, path, batch_df, keys, delete_col
                )
            else:
                write_snapshot(batch_df, path)

        if df.isStreaming:
            q = (
                df.writeStream.foreachBatch(apply)
                .option(
                    "checkpointLocation",
                    connector.config.get(
                        "checkpoint", path.rstrip("/") + "_checkpoint"
                    ),
                )
                .start()
            )
            if connector.config.get("sync"):
                q.processAllAvailable()
                q.stop()
            else:
                connector.config["query"] = q
            return
        apply(df, 0)


class VersionedSource:
    """Registry adapter (`adapter_id='versioned'`): read the latest —
    or, with ``config['version']``, a time-traveled — committed
    snapshot; the compiled Connector spec (fields/filters/sort/limit)
    then applies on top like any other source."""

    def read(self, spark: SparkSession, connector) -> DataFrame:
        v = connector.config.get("version")
        if v is None:
            return read_latest(spark, connector.endpoint_id)
        return read_version(spark, connector.endpoint_id, int(v))
