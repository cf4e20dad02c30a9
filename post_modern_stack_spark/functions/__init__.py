"""Engine scalar/aggregate function idioms (all JVM-side, codegen-able).

Each helper encapsulates one of the correctness-critical Spark idioms
from SURVEY.md §2/§7 — notably the ordered array aggregation (A7), the
only non-default idiom the port genuinely requires. Nothing here is a
Python UDF; every function composes built-in ``pyspark.sql.functions``
so Catalyst sees through it (pushdown, codegen, pruning all intact).
"""

from post_modern_stack_spark.functions.core import (
    ordered_collect,
    pad_sequence,
    slice_drop_last,
    last_element,
    json_get,
    normalize_sku,
    epoch_ms_to_date,
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "ordered_collect",
    "pad_sequence",
    "slice_drop_last",
    "last_element",
    "json_get",
    "normalize_sku",
    "epoch_ms_to_date",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
