"""Pipeline orchestrator (≈ reference ``Orchestrator.runPipeline``,
`/root/reference/src/index.ts:358-555`).

Lifecycle: validate → resolve source → EXTRACT (compile connector to a
lazy DataFrame) → TRANSFORM (already fused into the lineage) →
``onload`` hook → LOAD (``onbeforesend`` → sink.write → ``onupload``),
with typed events (start/extract/transform/load/complete/error ≈
`src/types.ts:267-272`) emitted around each stage.

Key divergence from the reference, by design: extract/transform are
*lazy* — no rows move until the load (or an explicit ``collect``)
triggers the job, so the whole pipeline executes as one distributed
Spark job with operator fusion instead of materializing the dataset in
driver memory (`src/index.ts:222` accumulates everything in an array;
we never do). ``row_count`` in events is therefore reported only where
an action already ran.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from openetl_spark.plans.compiler import compile_connector
from openetl_spark.registry import get_sink
from openetl_spark.spec import Connector, Pipeline


@dataclass
class PipelineEvent:
    type: str  # start | extract | transform | load | error | complete | info
    message: str = ""
    data_count: int | None = None
    ts: float = field(default_factory=time.time)


class PipelineAbort(Exception):
    """onbeforesend returned False (`src/index.ts:444-450`)."""


@dataclass
class PipelineResult:
    df: DataFrame | None
    events: list[PipelineEvent]
    streaming_query: Any = None  # async streaming sinks hand their handle back

    def collect(self):
        return self.df.collect() if self.df is not None else []


class Orchestrator:
    """vault: credential_id -> auth config dict, passed to adapters via
    connector config at resolve time (≈ `src/index.ts:334-351`)."""

    def __init__(self, vault: dict[str, dict] | None = None, spark: SparkSession | None = None):
        self.vault = vault or {}
        self.spark = spark

    def _resolve_auth(self, connector: Connector, pipeline: Pipeline | None = None) -> Connector:
        """Return a connector with credentials + pipeline-level policies
        resolved into a COPIED config — never mutate the caller's spec
        (a cached 'auth' would silently survive credential rotation)."""
        import dataclasses

        config = dict(connector.config)
        if connector.credential_id:
            if connector.credential_id not in self.vault:
                raise KeyError(f"credential {connector.credential_id!r} not in vault")
            config["auth"] = self.vault[connector.credential_id]
        if pipeline is not None:
            # Pipeline-level error_handling / rate_limiting (reference
            # `src/types.ts:287-296`) flow into the source adapter's
            # retry/throttle knobs unless the connector overrides them.
            eh = pipeline.error_handling or {}
            rl = pipeline.rate_limiting or {}
            if "max_retries" in eh:
                config.setdefault("max_retries", eh["max_retries"])
            if "retry_interval" in eh:
                config.setdefault("retry_interval_s", eh["retry_interval"])
            if "requests_per_second" in rl:
                config.setdefault("requests_per_second", rl["requests_per_second"])
        return dataclasses.replace(connector, config=config)

    def run_pipeline(self, pipeline: Pipeline, strict_js_compat: bool = True) -> PipelineResult:
        events: list[PipelineEvent] = []

        def emit(type_: str, message: str = "", data_count: int | None = None) -> None:
            ev = PipelineEvent(type_, message, data_count)
            events.append(ev)
            if pipeline.logging:
                pipeline.logging(
                    {"type": ev.type, "message": ev.message, "dataCount": ev.data_count, "ts": ev.ts}
                )

        emit("start", f"pipeline {pipeline.id}")
        try:
            df = self._extract(pipeline, emit, strict_js_compat)

            if pipeline.onload:
                pipeline.onload(df)

            query = None
            if pipeline.target is not None:
                df, query = self._load(pipeline, df, emit)

            emit("complete", f"pipeline {pipeline.id} complete")
            return PipelineResult(df=df, events=events, streaming_query=query)
        except Exception as e:
            emit("error", str(e))
            raise

    def _extract(self, pipeline: Pipeline, emit, strict_js_compat: bool) -> DataFrame:
        from openetl_spark.session import get_spark

        spark = self.spark or get_spark()
        if (pipeline.source is None) == (pipeline.data is None):
            raise ValueError("pipeline requires exactly one of source or data")

        if pipeline.data is not None:
            df = (
                pipeline.data
                if isinstance(pipeline.data, DataFrame)
                else spark.createDataFrame(pipeline.data)
            )
            emit("info", "push-only pipeline: using inline data")
            return df

        source = self._resolve_auth(pipeline.source, pipeline)
        df = compile_connector(spark, source, strict_js_compat)
        emit("extract", f"compiled source {source.adapter_id}:{source.endpoint_id}")
        if source.transform:
            emit("transform", f"{len(source.transform)} transform(s) fused into plan")
        return df

    def observe(self, df: DataFrame, name: str = "pipeline_metrics", *metrics):
        """A26 metrics the scalable way: ``df.observe`` accumulates
        named aggregates DURING execution — no second pass over the
        data, unlike the reference's dataCount which required the rows
        in driver memory. Returns ``(df, observation)``; read
        ``observation.get`` after any action on the returned df."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        if not metrics:
            metrics = (F.count(F.lit(1)).alias("row_count"),)
        obs = Observation(name)
        return df.observe(obs, *metrics), obs

    def _load(self, pipeline: Pipeline, df: DataFrame, emit) -> tuple[DataFrame, Any]:
        if pipeline.onbeforesend:
            out = pipeline.onbeforesend(df)
            if out is False:
                raise PipelineAbort("onbeforesend aborted the pipeline")
            if isinstance(out, DataFrame):
                df = out
        target = self._resolve_auth(pipeline.target, pipeline)
        sink = get_sink(target.adapter_id)
        sink.write(df, target)
        emit("load", f"wrote to {target.adapter_id}:{target.endpoint_id}")
        if pipeline.onupload:
            pipeline.onupload()
        # async streaming sinks stash their handle in the RESOLVED copy
        # of the config; surface it to the caller via PipelineResult
        return df, target.config.get("query")
