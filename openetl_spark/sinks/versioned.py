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

At 100 TB: ``merge_upsert`` rewrites the whole table per commit, which
is right for snapshot-sized batch merges (training-corpus refreshes);
``merge_upsert_partitioned`` is the selective path — the manifest maps
each partition to the version owning its data, so a one-partition
change rewrites one partition and carries the rest forward by
reference (the Iceberg/Delta data-file-reuse idea at partition
granularity).

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
    schema_evolution: bool = False,
) -> int:
    """MERGE INTO: rows in ``updates`` replace base rows with the same
    key, new keys insert, and (with ``delete_col``) rows flagged true
    delete their key from the table. Returns the committed version.
    The plan is one left_anti shuffle on the keys plus a union — no
    driver-side materialization. ``schema_evolution=True`` is the
    mergeSchema verb: columns added (or dropped) by the updates union
    with NULL fill on whichever side lacks them; the committed
    snapshot carries the widened schema. Off by default so schema
    drift is an explicit decision, not an accident."""
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
        survivors.unionByName(upserts, allowMissingColumns=schema_evolution),
        path,
        expected_base=base_v,
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
    * ``partition_col`` — with ``key_cols``, use the partition-scoped
      merge (only touched partitions rewrite).
    * ``schema_evolution`` — allow the whole-table merge to widen the
      schema (mergeSchema semantics).
    * streaming inputs run through foreachBatch + merge (the CDC-apply
      loop), checkpointed at ``config['checkpoint']`` (default
      ``<path>_checkpoint``); ``config['sync']`` drains synchronously.
    """

    def write(self, df: DataFrame, connector) -> None:
        path = connector.endpoint_id
        keys = connector.config.get("key_cols")
        delete_col = connector.config.get("delete_col")
        pcol = connector.config.get("partition_col")
        evolve = bool(connector.config.get("schema_evolution"))

        def apply(batch_df: DataFrame, _bid: int) -> None:
            if batch_df.isEmpty():
                return
            if keys and pcol:
                merge_upsert_partitioned(
                    batch_df.sparkSession, path, batch_df, keys, pcol, delete_col
                )
            elif keys:
                merge_upsert(
                    batch_df.sparkSession, path, batch_df, keys, delete_col,
                    schema_evolution=evolve,
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


# ------------------------------------------------- partition-scoped merge

def _read_manifest(path: str, version: int) -> dict:
    """Manifest for a committed version: {partition value → version
    whose v-dir holds that partition's current data}. Plain snapshot
    markers (zero-byte, from write_snapshot) have no manifest."""
    import json

    f = os.path.join(_versions_dir(path), str(version))
    with open(f) as fh:
        body = fh.read().strip()
    return json.loads(body)["partitions"] if body else {}


def _commit_manifest(path: str, version: int, partitions: dict) -> None:
    import json

    os.makedirs(_versions_dir(path), exist_ok=True)
    try:
        with open(os.path.join(_versions_dir(path), str(version)), "x") as fh:
            fh.write(json.dumps({"partitions": partitions}, sort_keys=True))
    except FileExistsError as e:
        raise ConcurrentWriteError(
            f"version {version} already committed under {path}"
        ) from e


def merge_upsert_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
    delete_col: str | None = None,
) -> int:
    """Partition-scoped MERGE (the SCALE.md 'next increment', now
    built): only partitions containing updated keys are rewritten; the
    commit manifest repoints touched partitions at the new version and
    carries every untouched partition forward by reference — a 100 TB
    table with a one-partition change rewrites one partition, not the
    table. This is the Iceberg/Delta data-file-reuse idea with the
    manifest granularity at partition level.

    Mechanics: the new version directory ``v=N`` holds ONLY the
    rewritten ``<partition_col>=…`` subdirectories (one distributed
    partitionBy write); the manifest (JSON inside the atomic version
    marker) maps every live partition to the version that owns its
    data. Reads resolve the manifest and scan exactly the referenced
    directories. Optimistic concurrency is unchanged — the manifest
    rides the exclusive marker create."""
    base_v = latest_version(path)
    manifest = {} if base_v is None else _read_manifest(path, base_v)
    version = 0 if base_v is None else base_v + 1

    if delete_col is not None:
        upserts = updates.filter(~updates[delete_col]).drop(delete_col)
        tomb = updates.filter(updates[delete_col]).select(partition_col, *key_cols)
    else:
        upserts, tomb = updates, None

    # touched partitions (distinct partition values of the change set —
    # low-cardinality by the definition of a partition column)
    touched_df = updates.select(partition_col).distinct()
    touched = {r[partition_col] for r in touched_df.collect()}

    new_data = upserts
    if manifest:
        hit = {p: v for p, v in manifest.items() if p in {str(t) for t in touched}}
        if hit:
            base_parts = [
                spark.read.option("basePath", os.path.join(path, f"v={v}"))
                .parquet(os.path.join(path, f"v={v}", f"{partition_col}={p}"))
                for p, v in sorted(hit.items())
            ]
            from functools import reduce

            base = reduce(DataFrame.unionByName, base_parts)
            gone = upserts.select(partition_col, *key_cols)
            if tomb is not None:
                gone = gone.unionByName(tomb)
            survivors = base.join(
                gone, [partition_col, *key_cols], "left_anti"
            )
            new_data = survivors.select(*upserts.columns).unionByName(upserts)

    new_data.write.partitionBy(partition_col).mode("overwrite").parquet(
        os.path.join(path, f"v={version}")
    )
    # partitions actually present in the new version dir (a partition
    # whose every row was deleted vanishes from the manifest)
    present = {
        d.split("=", 1)[1]
        for d in os.listdir(os.path.join(path, f"v={version}"))
        if d.startswith(f"{partition_col}=")
    }
    new_manifest = {
        p: v for p, v in manifest.items() if p not in {str(t) for t in touched}
    }
    new_manifest.update({p: version for p in present})
    _commit_manifest(path, version, new_manifest)
    return version


def read_latest_partitioned(
    spark: SparkSession, path: str, partition_col: str
) -> DataFrame:
    """Resolve the latest manifest and scan exactly the directories it
    references (grouped by owning version so each version contributes
    one multi-path read with partition-column recovery)."""
    from functools import reduce

    v = latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    manifest = _read_manifest(path, v)
    if not manifest:
        return read_version(spark, path, v)
    by_ver: dict[int, list[str]] = {}
    for p, ver in manifest.items():
        by_ver.setdefault(ver, []).append(
            os.path.join(path, f"v={ver}", f"{partition_col}={p}")
        )
    parts = [
        spark.read.option("basePath", os.path.join(path, f"v={ver}"))
        .parquet(*sorted(dirs))
        for ver, dirs in sorted(by_ver.items())
    ]
    return reduce(DataFrame.unionByName, parts)
