"""Built-in sinks. Importing this module registers them."""

from openetl_spark.sources.files import FileSink
from openetl_spark.sources.jdbc import JdbcSink
from openetl_spark.sinks.memory import MemorySink
from openetl_spark.sinks.rest import RestSink
from openetl_spark.registry import register_sink_default as register_sink

for fmt in ("parquet", "csv", "json", "orc", "text"):
    register_sink(fmt, FileSink(fmt))
register_sink("jdbc", JdbcSink())
register_sink("memory", MemorySink())
register_sink("rest", RestSink())

from openetl_spark.sources.mongo import MongoSink

register_sink("mongodb", MongoSink())

from openetl_spark.sources.dbapi import DbApiSink

register_sink("dbapi", DbApiSink())

from openetl_spark.sinks.table_format import TableFormatSink

register_sink("delta", TableFormatSink("delta"))
register_sink("iceberg", TableFormatSink("iceberg"))

__all__ = ["MemorySink", "RestSink"]

from openetl_spark.sinks.versioned import VersionedSink

register_sink("versioned", VersionedSink())
