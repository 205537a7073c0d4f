"""In-memory source: Pipeline.data / tests (≈ reference push-only mode,
`/root/reference/src/index.ts:431-439`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openetl_spark.spec import Connector


class MemorySource:
    def read(self, spark: SparkSession, connector: Connector) -> DataFrame:
        data = connector.config["data"]
        if isinstance(data, DataFrame):
            return data
        schema = connector.config.get("schema")
        return spark.createDataFrame(data, schema=schema)
