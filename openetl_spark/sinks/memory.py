"""Memory sink: registers the result as a temp view (and optionally
captures rows for tests). The closest analogue of the reference's
`{data}` return (`/root/reference/src/index.ts:554`) without forcing a
driver-side collect for large results."""

from __future__ import annotations

from pyspark.sql import DataFrame

from openetl_spark.spec import Connector


class MemorySink:
    def write(self, df: DataFrame, connector: Connector) -> None:
        if df.isStreaming:
            q = (
                df.writeStream.format("memory")
                .queryName(connector.endpoint_id)
                .outputMode(connector.config.get("output_mode", "append"))
                .start()
            )
            if connector.config.get("sync", True):
                q.processAllAvailable()
                q.stop()
                capture = connector.config.get("capture")
                if capture is not None:
                    # backticks: endpoint ids need not be identifiers
                    capture.extend(
                        df.sparkSession.sql(
                            f"SELECT * FROM `{connector.endpoint_id}`"
                        ).collect()
                    )
            else:
                # async mode: capture would race the stream (no batch has
                # necessarily run) — hand back the query instead; the
                # orchestrator exposes it as PipelineResult.streaming_query
                connector.config["query"] = q
            return
        df.createOrReplaceTempView(connector.endpoint_id)
        capture = connector.config.get("capture")
        if capture is not None:
            # Bounded collect, explicitly opted into (tests / small results).
            capture.extend(df.collect())
