"""Built-in sources. Importing this module registers them."""

from openetl_spark.sources.files import FileSource
from openetl_spark.sources.memory import MemorySource
from openetl_spark.sources.jdbc import JdbcSource
from openetl_spark.sources.rest import RestSource
from openetl_spark.registry import register_source_default as register_source

for fmt in ("parquet", "csv", "json", "orc", "text", "binaryFile"):
    register_source(fmt, FileSource(fmt))
register_source("memory", MemorySource())
register_source("jdbc", JdbcSource())
register_source("rest", RestSource())

from openetl_spark.sources.mongo import MongoSource

register_source("mongodb", MongoSource())

from openetl_spark.sources.gads import GoogleAdsSource

register_source("google-ads", GoogleAdsSource())

from openetl_spark.sources.dbapi import DbApiSource

register_source("dbapi", DbApiSource())

from openetl_spark.sources.services import register_all as _register_services

_register_services()

__all__ = ["FileSource", "MemorySource", "JdbcSource", "RestSource"]

from openetl_spark.sinks.versioned import VersionedSource

register_source("versioned", VersionedSource())
