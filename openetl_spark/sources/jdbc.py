"""JDBC source/sink (≈ reference postgresql/mysql adapters).

The reference hand-builds SELECT/WHERE/ORDER/LIMIT strings per page
(`/root/reference/adapters/postgresql/src/index.ts:147-190`) and
multi-row INSERTs (`:198-223`). On Spark, `spark.read.jdbc` already
pushes projection/predicates/limit into the remote database, and
parallelism comes from `partitionColumn/lowerBound/upperBound/
numPartitions` — the scale-out replacement for LIMIT/OFFSET paging.

The custom-SQL escape hatch (reference `custom_query` endpoint,
`adapters/postgresql/src/index.ts:139-145`) maps to the JDBC ``query``
option.

No JDBC driver jars ship in this container, so this adapter is exercised
by unit tests only at the option-building level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openetl_spark.spec import Connector


def build_jdbc_options(connector: Connector) -> dict[str, str]:
    cfg = connector.config
    opts: dict[str, str] = {"url": cfg["url"]}
    if connector.endpoint_id == "custom_query" or "query" in cfg:
        opts["query"] = cfg["query"]
    else:
        table = connector.endpoint_id
        schema = cfg.get("schema_name")
        opts["dbtable"] = f"{schema}.{table}" if schema else table
    for k in ("user", "password", "driver", "fetchsize", "batchsize",
              "partitionColumn", "lowerBound", "upperBound", "numPartitions",
              "sessionInitStatement", "isolationLevel"):
        if k in cfg:
            opts[k] = str(cfg[k])
    return opts


def discover_partition_bounds(
    spark: SparkSession, connector: Connector, opts: dict[str, str]
) -> dict[str, str]:
    """Auto-configure parallel-read bounds: with ``partitionColumn`` set
    but lower/upper bounds absent, probe ``SELECT min/max(col)`` from the
    source (ONE row over JDBC — the same trick the reference's offset
    paging needs a COUNT(*) for, `adapters/postgresql/src/index.ts:181-187`)
    and fill ``lowerBound/upperBound/numPartitions``. An injectable
    ``config['bounds_probe'] = fn(bounds_query_options) -> (lo, hi)``
    stands in for the JDBC round-trip where no driver jar exists (tests),
    and is also the hook for dialects whose bounds live elsewhere
    (e.g. a stats catalog). Empty table (NULL bounds) → serial read:
    partition options are dropped rather than guessed."""
    col = opts["partitionColumn"]
    rel = f"({opts['query']}) t" if "query" in opts else opts["dbtable"]
    bounds_query = f"SELECT min({col}) AS lo, max({col}) AS hi FROM {rel}"
    # Strip ALL partition options: Spark validates them all-or-none, so
    # a stray pre-set lowerBound/upperBound (we're probing precisely
    # because at most one is set) would fail the probe read.
    probe_opts = {
        k: v for k, v in opts.items()
        if k not in ("dbtable", "partitionColumn", "numPartitions",
                     "lowerBound", "upperBound")
    }
    probe_opts["query"] = bounds_query
    probe = connector.config.get("bounds_probe")
    if probe is not None:
        lo, hi = probe(probe_opts)
    else:
        row = spark.read.format("jdbc").options(**probe_opts).load().first()
        lo, hi = (row["lo"], row["hi"]) if row is not None else (None, None)
    out = dict(opts)
    if lo is None or hi is None:
        # empty table: a partitioned read would need fabricated bounds
        for k in ("partitionColumn", "lowerBound", "upperBound", "numPartitions"):
            out.pop(k, None)
        return out
    out["lowerBound"], out["upperBound"] = str(lo), str(hi)
    out.setdefault(
        "numPartitions", str(connector.config.get("num_partitions", 8))
    )
    return out


class JdbcSource:
    def read(self, spark: SparkSession, connector: Connector) -> DataFrame:
        opts = build_jdbc_options(connector)
        if "partitionColumn" in opts and (
            "lowerBound" not in opts or "upperBound" not in opts
        ):
            opts = discover_partition_bounds(spark, connector, opts)
        return spark.read.format("jdbc").options(**opts).load()


class JdbcSink:
    def write(self, df: DataFrame, connector: Connector) -> None:
        opts = build_jdbc_options(connector)
        mode = connector.config.get("mode", "append")
        # batchsize ≈ reference itemsPerBatch upload chunking
        # (`src/index.ts:480-524`), executed per-partition in parallel.
        df.write.format("jdbc").options(**opts).mode(mode).save()
