from openetl_spark.functions.filters import compile_filter, compile_filters
from openetl_spark.functions.transforms import apply_transforms

__all__ = ["compile_filter", "compile_filters", "apply_transforms"]
