"""openetl_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of jspreadsheet/openetl
(reference surveyed in SURVEY.md) on Apache Spark: declarative pipeline
spec -> DataFrame lineage -> Catalyst -> distributed execution, plus the
full relational operator surface, streaming, and large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal columns) the reference delegates or lacks.

Design stance (SURVEY.md §7): not a port. The reference's Connector
spec (`/root/reference/src/types.ts:242-264`) becomes a thin compiler
to DataFrame ops; everything relational is native Spark so Catalyst
does pushdown/pruning/join-selection for free.
"""

from openetl_spark.session import get_spark
from openetl_spark.spec import (
    Connector,
    Filter,
    FilterGroup,
    Pipeline,
    Sort,
    Transformation,
)
from openetl_spark.pipeline import Orchestrator

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Connector",
    "Filter",
    "FilterGroup",
    "Pipeline",
    "Sort",
    "Transformation",
    "Orchestrator",
]
