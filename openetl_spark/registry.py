"""Source/sink adapter registry (≈ reference `registerAdapter`,
`/root/reference/src/index.ts:316-326,557-560`).

An adapter is a pair of callables behind a small protocol:

* ``Source.read(spark, connector) -> DataFrame``
* ``Sink.write(df, connector) -> None``

Built-ins (files/memory/jdbc/rest) self-register on import of
``openetl_spark.sources`` / ``openetl_spark.sinks``; users may register
their own at runtime exactly like the reference.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame, SparkSession

from openetl_spark.spec import Connector


class Source(Protocol):
    def read(self, spark: SparkSession, connector: Connector) -> DataFrame: ...


class Sink(Protocol):
    def write(self, df: DataFrame, connector: Connector) -> None: ...


_SOURCES: dict[str, Source] = {}
_SINKS: dict[str, Sink] = {}


def register_source(adapter_id: str, source: Source) -> None:
    _SOURCES[adapter_id] = source


def register_sink(adapter_id: str, sink: Sink) -> None:
    _SINKS[adapter_id] = sink


def register_source_default(adapter_id: str, source: Source) -> None:
    """Builtin registration: never clobber an adapter the user already
    registered under the same id (user registrations may legitimately
    happen before the first lookup triggers the builtin import)."""
    _SOURCES.setdefault(adapter_id, source)


def register_sink_default(adapter_id: str, sink: Sink) -> None:
    _SINKS.setdefault(adapter_id, sink)


def get_source(adapter_id: str) -> Source:
    _ensure_builtins()
    if adapter_id not in _SOURCES:
        raise KeyError(
            f"no source adapter {adapter_id!r}; registered: {sorted(_SOURCES)}"
        )
    return _SOURCES[adapter_id]


def get_sink(adapter_id: str) -> Sink:
    _ensure_builtins()
    if adapter_id not in _SINKS:
        raise KeyError(f"no sink adapter {adapter_id!r}; registered: {sorted(_SINKS)}")
    return _SINKS[adapter_id]


_loaded = False


def _ensure_builtins() -> None:
    # flag set only AFTER the imports succeed: a failed builtin import
    # must stay retryable and surface its real error, not a later
    # KeyError over an empty registry
    global _loaded
    if not _loaded:
        import openetl_spark.sources  # noqa: F401  (self-registers)
        import openetl_spark.sinks  # noqa: F401

        _loaded = True
