"""Lakehouse table-format sinks (Delta Lake / Apache Iceberg) behind a
clean availability guard.

The reference's biggest-sink analogue is its database upload path
(multi-row INSERT batches, `/root/reference/adapters/postgresql/src/
index.ts:198-223`); at 100 TB the equivalent durable target is a table
format with ACID appends/overwrites and partition evolution. The
formats are jar-provided (``delta-spark`` / ``iceberg-spark-runtime``)
and those jars are not in this container, so:

* writer CONSTRUCTION (format, mode, partitioning, path-vs-table) is
  pure Spark API and unit-tested here;
* execution raises ``TableFormatUnavailable`` with the exact jar hint
  when the format's DataSource class cannot be loaded, instead of a
  raw ClassNotFoundException deep in py4j.

Connector contract: ``endpoint_id`` = path (default) or table name with
``config['as_table']=True``; ``config['mode']`` ∈ append|overwrite
(default append); ``config['partition_by']`` = list of columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from openetl_spark.spec import Connector


class TableFormatUnavailable(RuntimeError):
    pass


_JAR_HINTS = {
    "delta": "io.delta:delta-spark_2.13 (+ spark.sql.extensions="
             "io.delta.sql.DeltaSparkSessionExtension)",
    "iceberg": "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13",
}


def format_available(spark, fmt: str) -> bool:
    """True when the format's DataSource registers in this JVM."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            fmt, spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def build_writer(df: DataFrame, connector: Connector, fmt: str):
    """Configured DataFrameWriter — separated from execution so the
    construction logic is testable without the jar."""
    cfg = connector.config
    mode = cfg.get("mode", "append")
    if mode not in ("append", "overwrite"):
        raise ValueError(f"table-format sink supports append|overwrite, got {mode!r}")
    writer = df.write.format(fmt).mode(mode)
    if cfg.get("partition_by"):
        writer = writer.partitionBy(*cfg["partition_by"])
    for k, v in cfg.get("options", {}).items():
        writer = writer.option(k, v)
    return writer


class TableFormatSink:
    def __init__(self, fmt: str):
        self.fmt = fmt

    def write(self, df: DataFrame, connector: Connector) -> None:
        spark = df.sparkSession
        if not format_available(spark, self.fmt):
            raise TableFormatUnavailable(
                f"{self.fmt} DataSource not on the classpath; add "
                f"{_JAR_HINTS.get(self.fmt, 'the runtime jar')} to use this sink"
            )
        writer = build_writer(df, connector, self.fmt)
        if connector.config.get("as_table"):
            writer.saveAsTable(connector.endpoint_id)
        else:
            writer.save(connector.endpoint_id)
