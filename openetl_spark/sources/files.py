"""File-format sources (parquet/csv/json/orc/text/binaryFile).

The scale path: Spark partitions the scan itself (one task per file
split, `spark.sql.files.maxPartitionBytes` sized), so the reference's
page loop (`/root/reference/src/index.ts:224-282`) simply disappears —
SURVEY.md §2 A1/A2 "not needed once data is a DataFrame".

``binaryFile`` is the multimodal base (SURVEY.md C30): images/audio/
video land as ``content: binary`` + path/length metadata, the same
shape as the reference's S3 object download
(`/root/reference/adapters/s3/src/index.ts:167-177`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openetl_spark.spec import Connector


class FileSource:
    def __init__(self, fmt: str):
        self.fmt = fmt

    def read(self, spark: SparkSession, connector: Connector) -> DataFrame:
        opts = dict(connector.config.get("options", {}))
        schema = connector.config.get("schema")
        if connector.streaming:
            # File streams require an explicit schema; derive it from a
            # one-off static read when the caller didn't provide one
            # (driver-side metadata peek, no data scan).
            if schema is None:
                schema = spark.read.format(self.fmt).options(**opts).load(
                    connector.endpoint_id
                ).schema
            reader = spark.readStream.format(self.fmt).options(**opts).schema(schema)
            return reader.load(connector.endpoint_id)
        reader = spark.read.format(self.fmt).options(**opts)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(connector.endpoint_id)


class FileSink:
    def __init__(self, fmt: str):
        self.fmt = fmt

    def write(self, df: DataFrame, connector: Connector) -> None:
        opts = dict(connector.config.get("options", {}))
        if df.isStreaming:
            if connector.config.get("zorder_by"):
                # fail loudly rather than silently writing unclustered
                # files — z-order is a batch table-maintenance layout
                # (run it as a compaction pass over the landed data)
                raise ValueError("zorder_by is batch-only; compact the landed table instead")
            # Streaming file sink: exactly-once via checkpointed offsets.
            q = (
                df.writeStream.format(self.fmt)
                .options(**opts)
                .outputMode(connector.config.get("output_mode", "append"))
                .option(
                    "checkpointLocation",
                    connector.config.get(
                        "checkpoint", connector.endpoint_id.rstrip("/") + "_checkpoint"
                    ),
                )
                .start(connector.endpoint_id)
            )
            if connector.config.get("sync"):
                q.processAllAvailable()
                q.stop()
            else:
                connector.config["query"] = q  # caller manages lifecycle
            return
        mode = connector.config.get("mode", "append")
        zorder = connector.config.get("zorder_by")
        if zorder:
            # Z-order clustered layout (sinks/layout.py): min/max
            # file-skipping locality on every listed column for one
            # range shuffle. Declarative surface for OPTIMIZE ZORDER.
            if self.fmt != "parquet":
                raise ValueError("zorder_by is a parquet layout option")
            if mode != "overwrite":
                raise ValueError("zorder_by requires mode='overwrite'")
            if connector.config.get("partition_by"):
                # Hive partitioning splits the file set BY VALUE; the
                # z-curve clusters one flat file set. Combining them
                # would need per-partition clustering — reject rather
                # than silently dropping either layout.
                raise ValueError("zorder_by and partition_by are mutually exclusive")
            from openetl_spark.sinks.layout import write_zorder

            write_zorder(
                df,
                connector.endpoint_id,
                [zorder] if isinstance(zorder, str) else list(zorder),
                n_files=int(connector.config.get("zorder_files", 8)),
                options=opts,
            )
            return
        writer = df.write.format(self.fmt).options(**opts).mode(mode)
        partition_by = connector.config.get("partition_by")
        if partition_by:
            # Partitioned layout is the 100 TB default: downstream reads
            # prune partitions instead of scanning the lake.
            writer = writer.partitionBy(*partition_by)
        writer.save(connector.endpoint_id)
