"""Flink built-in function surface on Spark (SURVEY.md §2.11-2.12).

~95% of the reference's ~180 functions
(T-COMMON/functions/BuiltInFunctionDefinitions.java) map 1:1 to
pyspark.sql.functions; ``scalar`` holds the shims for the rest.
"""

from flink_1_16_0_src_spark.functions.scalar import (  # noqa: F401
    single_value,
    split_index,
    temporal_overlaps,
    truncate_number,
)
