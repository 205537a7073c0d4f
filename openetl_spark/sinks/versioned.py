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
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first; re-run the merge."""


def _versions_dir(path: str) -> str:
    return os.path.join(path, "_versions")


def committed_versions(path: str) -> list[int]:
    d = _versions_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(int(v) for v in os.listdir(d) if v.isdigit())


def latest_version(path: str) -> int | None:
    vs = committed_versions(path)
    return vs[-1] if vs else None


def read_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Read one committed version. Manifest-aware: a version committed
    by ``merge_upsert_partitioned`` holds only its REWRITTEN
    partitions, with the manifest referencing every carried-forward
    partition in earlier version dirs — reading the bare ``v=N``
    directory would silently drop those (review finding r08). Plain
    snapshot versions read their directory directly."""
    if version not in committed_versions(path):
        raise FileNotFoundError(f"version {version} not committed under {path}")
    body = _marker_body(path, version)
    if body.get("partitions"):
        pcol = body.get("partition_col") or _infer_partition_col(
            path, body["partitions"]
        )
        return _read_manifest_dirs(
            spark, path, body["partitions"], pcol,
            partition_type=body.get("partition_type"),
        )
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def _infer_partition_col(path: str, manifest: dict) -> str:
    """Partition column for a pre-r08 manifest that didn't record it:
    read it off any referenced version directory's layout."""
    ver = next(iter(manifest.values()))
    for d in os.listdir(os.path.join(path, f"v={ver}")):
        if "=" in d:
            return d.split("=", 1)[0]
    raise FileNotFoundError(f"no partition directories under {path}/v={ver}")


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


def _publish(df_writer, path: str, version: int) -> None:
    """Write version data WITHOUT contending on the final directory:
    the snapshot lands in a writer-private staging dir and a single
    ``os.rename`` claims ``v=N``. Two racers each write their own
    staging data; exactly one rename wins, the loser raises
    ConcurrentWriteError BEFORE touching any ``v=N`` directory (a
    direct ``overwrite`` write into ``v=N`` would let the loser clobber
    the winner's already-committed data — review finding r08). An
    unmarked ``v=N`` is deliberately NOT reclaimed inline: between a
    concurrent writer's successful rename and its ``_commit`` the
    directory is byte-identical to a crashed writer's garbage, and an
    inline rmtree-and-retry could destroy that racer's just-renamed
    data while its commit then lands a marker over OUR data (ADVICE
    r04 — version N with A's marker over B's rows, both reporting
    success). Crashed-writer cleanup is the explicit ``reclaim_orphans``
    janitor, run when no writer is in flight. ``df_writer`` is a
    DataFrameWriter ready to ``.parquet()``."""
    import shutil
    import uuid

    stage = os.path.join(path, "_staging", uuid.uuid4().hex)
    df_writer.parquet(stage)
    target = os.path.join(path, f"v={version}")
    try:
        os.rename(stage, target)
    except OSError as e:
        shutil.rmtree(stage, ignore_errors=True)
        raise ConcurrentWriteError(
            f"version {version} directory already claimed under {path} "
            f"(concurrent writer, or a crashed writer's partial — run "
            f"reclaim_orphans() once no writer is in flight)"
        ) from e


def reclaim_orphans(path: str) -> list[str]:
    """Explicit janitor for crashed writers' garbage: removes ``v=N``
    directories that have NO commit marker (a writer died between
    rename and ``_commit``; markerless data is invisible to readers
    but blocks that version number) and leftover ``_staging`` entries
    (writers that died mid-write or lost the rename race). ONLY safe
    to run when no writer is in flight — an in-flight writer's
    just-renamed, not-yet-committed ``v=N`` is indistinguishable from
    crash garbage, which is exactly why ``_publish`` never reclaims
    inline. Returns the removed paths."""
    import shutil

    removed: list[str] = []
    committed = set(committed_versions(path))
    if os.path.isdir(path):
        for name in os.listdir(path):
            if not name.startswith("v="):
                continue
            try:
                v = int(name[2:])
            except ValueError:
                continue
            if v not in committed:
                full = os.path.join(path, name)
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
    staging = os.path.join(path, "_staging")
    if os.path.isdir(staging):
        for name in os.listdir(staging):
            full = os.path.join(staging, name)
            shutil.rmtree(full, ignore_errors=True)
            removed.append(full)
    return removed


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
    _publish(df.write.mode("overwrite"), path, version)
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
    spark: SparkSession, path: str, target_files: int = 1,
    zorder_by: list[str] | str | None = None,
) -> int:
    """Small-file compaction as a new version: read the latest
    snapshot, coalesce to ``target_files`` files, commit. Data is
    byte-identical (same rows, fewer files); readers flip atomically
    and time travel to the fragmented version still works. Run after
    many small CDC merges — the lakehouse OPTIMIZE verb. coalesce()
    (not repartition) avoids a shuffle: it only glues existing
    partitions together, which is exactly what small-file compaction
    wants.

    ``zorder_by`` upgrades the pass to OPTIMIZE ZORDER (r06-s2): the
    rewritten files are range-partitioned and sorted on the Morton
    z-value of the listed columns (sinks/layout.py), buying min/max
    file-skipping locality on each of them for the one shuffle the
    clustering write inherently costs. Same rows, same snapshot
    semantics — only the physical layout differs."""
    base_v = latest_version(path)
    if base_v is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    df = read_version(spark, path, base_v)
    if zorder_by:
        from openetl_spark.sinks.layout import zorder_value

        cols = [zorder_by] if isinstance(zorder_by, str) else list(zorder_by)
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
        row = df.agg(*aggs).first()
        mins = [row[f"_lo_{c}"] if row[f"_lo_{c}"] is not None else 0 for c in cols]
        maxs = [row[f"_hi_{c}"] if row[f"_hi_{c}"] is not None else 0 for c in cols]
        z = zorder_value(
            [F.coalesce(F.col(c), F.lit(0)) for c in cols], mins, maxs
        )
        df = (
            df.withColumn("_z", z)
            .repartitionByRange(target_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
        )
    else:
        df = df.coalesce(target_files)
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

def _marker_body(path: str, version: int) -> dict:
    """Parsed marker JSON for a committed version ({} for the plain
    zero-byte snapshot markers write_snapshot creates)."""
    import json

    f = os.path.join(_versions_dir(path), str(version))
    with open(f) as fh:
        body = fh.read().strip()
    return json.loads(body) if body else {}


def _read_manifest(path: str, version: int) -> dict:
    """Manifest for a committed version: {partition value → version
    whose v-dir holds that partition's current data}. Plain snapshot
    markers (zero-byte, from write_snapshot) have no manifest."""
    return _marker_body(path, version).get("partitions", {})


# Characters Hive/Spark escape in partition directory names
# (FileUtils.escapePathName): control chars plus this printable set.
_PART_ESCAPE = set('"#%\'*/:=?\\{[]^\x7f') | {chr(c) for c in range(0x20)}


def _escape_partition_value(value) -> str:
    """Spark writes ``pcol=<escaped value>`` directories using Hive's
    path escaping; manifest keys hold the RAW str(value), so every
    path built from a manifest key must re-apply the escaping or
    values containing ':' '/' '%' etc. resolve to missing directories
    (review finding r08). NULL partition values are rejected at merge
    time rather than mapped to __HIVE_DEFAULT_PARTITION__."""
    return "".join(
        f"%{ord(c):02X}" if c in _PART_ESCAPE else c for c in str(value)
    )


def _read_manifest_dirs(
    spark: SparkSession,
    path: str,
    manifest: dict,
    partition_col: str,
    partition_type: str | None = None,
) -> DataFrame:
    """Union the directories a manifest references. With
    ``partition_type`` recorded in the marker (r05+), the partition
    column is attached as a typed literal FROM THE MANIFEST KEY — not
    recovered from the directory name, whose type inference coerces a
    string value like '01' to int 1 and breaks the round-trip (ADVICE
    r04). One directory-scoped read per manifest entry; partition
    columns are low-cardinality by definition, so the listing cost is
    bounded. Markers without a recorded type (pre-r05 tables) fall
    back to per-version multi-path reads with directory recovery."""
    from functools import reduce

    by_ver: dict[int, list[str]] = {}
    for p, ver in manifest.items():
        by_ver.setdefault(ver, []).append(
            os.path.join(
                path, f"v={ver}", f"{partition_col}={_escape_partition_value(p)}"
            )
        )

    if partition_type is not None:
        # one multi-path read per OWNING VERSION (not per partition —
        # review finding r05: N separate reads meant N file listings
        # and an N-way union for hundreds of partitions) with the FULL
        # schema pinned: data fields from one footer read plus the
        # typed partition column, so directory-name parsing casts to
        # the recorded type instead of inferring ('01' stays '01').
        from pyspark.sql import types as T
        from pyspark.sql.types import _parse_datatype_string

        ptype = _parse_datatype_string(partition_type)
        parts = []
        for ver, dirs in sorted(by_ver.items()):
            data_schema = spark.read.parquet(sorted(dirs)[0]).schema
            full = T.StructType(
                [*data_schema.fields, T.StructField(partition_col, ptype)]
            )
            parts.append(
                spark.read.schema(full)
                .option("basePath", os.path.join(path, f"v={ver}"))
                .parquet(*sorted(dirs))
            )
        return reduce(DataFrame.unionByName, parts)

    parts = [
        spark.read.option("basePath", os.path.join(path, f"v={ver}"))
        .parquet(*sorted(dirs))
        for ver, dirs in sorted(by_ver.items())
    ]
    return reduce(DataFrame.unionByName, parts)


def _commit_manifest(
    path: str,
    version: int,
    partitions: dict,
    partition_col: str,
    partition_type: str | None = None,
) -> None:
    import json

    os.makedirs(_versions_dir(path), exist_ok=True)
    body = {"partitions": partitions, "partition_col": partition_col}
    if partition_type is not None:
        # the partition column's Spark type (simpleString) — readers
        # attach manifest keys as typed literals instead of trusting
        # directory-name inference (ADVICE r04: '01' → int 1)
        body["partition_type"] = partition_type
    try:
        with open(os.path.join(_versions_dir(path), str(version)), "x") as fh:
            fh.write(json.dumps(body, sort_keys=True))
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
    if None in touched:
        raise ValueError(
            f"NULL {partition_col!r} in updates: the partitioned merge "
            "keys its manifest on partition values and does not map "
            "NULL to __HIVE_DEFAULT_PARTITION__"
        )

    new_data = upserts
    if manifest:
        hit = {p: v for p, v in manifest.items() if p in {str(t) for t in touched}}
        if hit:
            from functools import reduce

            # attach the partition value as a typed literal from the
            # manifest key — a basePath directory-recovery read here
            # would INFER the type ('01' → bigint 1), poison new_data's
            # dtypes, and mis-type the next marker (ADVICE r04)
            ptype = dict(updates.dtypes)[partition_col]
            base_parts = [
                spark.read.parquet(
                    os.path.join(
                        path,
                        f"v={v}",
                        f"{partition_col}={_escape_partition_value(p)}",
                    )
                ).withColumn(partition_col, F.lit(p).cast(ptype))
                for p, v in sorted(hit.items())
            ]
            base = reduce(DataFrame.unionByName, base_parts)
            gone = upserts.select(partition_col, *key_cols)
            if tomb is not None:
                gone = gone.unionByName(tomb)
            survivors = base.join(
                gone, [partition_col, *key_cols], "left_anti"
            )
            new_data = survivors.select(*upserts.columns).unionByName(upserts)
    elif base_v is not None:
        # Base committed by write_snapshot/merge_upsert (plain marker,
        # no manifest, possibly not even partition directories): the
        # first partitioned merge CONVERTS the table — one full merge
        # + partitioned rewrite, after which every partition is
        # manifest-referenced. Previously this branch silently dropped
        # the whole base (review finding r08).
        base = read_version(spark, path, base_v)
        gone = upserts.select(*key_cols)
        if tomb is not None:
            gone = gone.unionByName(tomb.select(*key_cols))
        survivors = base.join(gone, list(key_cols), "left_anti")
        new_data = survivors.select(*upserts.columns).unionByName(upserts)

    _publish(
        new_data.write.partitionBy(partition_col).mode("overwrite"),
        path,
        version,
    )
    # partitions actually present in the new version (a partition whose
    # every row was deleted vanishes from the manifest) — derived from
    # the DATA's distinct values, not from directory names, so Hive
    # path escaping can't desynchronize manifest keys (review finding
    # r08)
    present = {
        str(r[0])
        for r in read_version_dir_values(
            spark, path, version, partition_col, schema=new_data.schema
        )
    }
    new_manifest = {
        p: v for p, v in manifest.items() if p not in {str(t) for t in touched}
    }
    new_manifest.update({p: version for p in present})
    _commit_manifest(
        path,
        version,
        new_manifest,
        partition_col,
        partition_type=dict(new_data.dtypes)[partition_col],
    )
    return version


def read_version_dir_values(
    spark: SparkSession, path: str, version: int, partition_col: str, schema=None
):
    """Distinct partition values physically present in one version
    directory (reads only the partition column of the just-written
    files). Pass the written DataFrame's ``schema`` to pin the
    partition column's type: bare ``spark.read.parquet`` INFERS types
    from directory names, coercing a string partition value like
    ``'01'`` to int 1, whose ``str()`` ('1') then matches neither
    ``str(touched)`` nor the Hive-escaped directory — silently
    orphaning those partitions from the manifest (ADVICE r04). With
    the true type pinned, directory strings round-trip exactly what
    ``partitionBy`` wrote. Reading back (columnar, partition column
    only) beats re-executing the merge plan for its distinct values —
    at scale the plan is a full shuffle join, the read-back is
    metadata-cheap."""
    reader = spark.read if schema is None else spark.read.schema(schema)
    return (
        reader.parquet(os.path.join(path, f"v={version}"))
        .select(partition_col)
        .distinct()
        .collect()
    )


def read_latest_partitioned(
    spark: SparkSession, path: str, partition_col: str
) -> DataFrame:
    """Resolve the latest manifest and scan exactly the directories it
    references (grouped by owning version so each version contributes
    one multi-path read with partition-column recovery)."""
    v = latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    manifest = _read_manifest(path, v)
    if not manifest:
        return read_version(spark, path, v)
    return _read_manifest_dirs(
        spark, path, manifest, partition_col,
        partition_type=_marker_body(path, v).get("partition_type"),
    )
