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


class JdbcSource:
    def read(self, spark: SparkSession, connector: Connector) -> DataFrame:
        return spark.read.format("jdbc").options(**build_jdbc_options(connector)).load()


class JdbcSink:
    def write(self, df: DataFrame, connector: Connector) -> None:
        opts = build_jdbc_options(connector)
        mode = connector.config.get("mode", "append")
        # batchsize ≈ reference itemsPerBatch upload chunking
        # (`src/index.ts:480-524`), executed per-partition in parallel.
        df.write.format("jdbc").options(**opts).mode(mode).save()
