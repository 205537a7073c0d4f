from openetl_spark.plans.compiler import compile_connector

__all__ = ["compile_connector"]
