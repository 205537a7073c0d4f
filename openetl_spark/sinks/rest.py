"""REST upload sink: batched POSTs from executors.

≈ the reference's serial batch-upload loop
(`/root/reference/src/index.ts:480-524`) but distributed: each
partition batches its rows (`items_per_batch` ≈ target pagination's
itemsPerPage) and calls the injected ``upload_batch`` with retry —
``foreachPartition`` keeps rows off the driver entirely, which is the
only posture that survives a 100 TB write. The injected callable must
be picklable (runs on executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from openetl_spark.spec import Connector


class RestSink:
    def write(self, df: DataFrame, connector: Connector) -> None:
        if df.isStreaming:
            raise NotImplementedError(
                "REST sink does not accept streaming DataFrames directly; "
                "use writeStream.foreachBatch with a batch-mode rest target "
                "(each micro-batch is a bounded DataFrame)"
            )
        cfg = connector.config
        upload_batch = cfg["upload_batch"]  # Callable[[list[dict]], None]
        n = int(cfg.get("items_per_batch", 100))
        max_retries = int(cfg.get("max_retries", 0))
        retry_interval_s = float(cfg.get("retry_interval_s", 1.0))
        rps = cfg.get("requests_per_second")
        # distribute the global request budget across partitions: each
        # partition paces its flushes to rps/n_partitions
        n_parts = max(df.rdd.getNumPartitions(), 1)
        min_interval = (n_parts / float(rps)) if rps else 0.0

        def _send(partition) -> None:
            import time as _time

            batch: list[dict] = []
            last_flush = [0.0]

            def flush() -> None:
                if not batch:
                    return
                if min_interval:
                    wait = min_interval - (_time.monotonic() - last_flush[0])
                    if wait > 0:
                        _time.sleep(wait)
                attempt = 0
                while True:
                    try:
                        upload_batch(list(batch))
                        break
                    except Exception:
                        attempt += 1
                        if attempt > max_retries:
                            raise
                        _time.sleep(retry_interval_s)
                last_flush[0] = _time.monotonic()
                batch.clear()

            for row in partition:
                batch.append(row.asDict(recursive=True))
                if len(batch) >= n:
                    flush()
            flush()

        df.foreachPartition(_send)
