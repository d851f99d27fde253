"""Query inventory modules — importing this package registers every
query into ``flink_1_16_0_src_spark.registry.QUERIES``."""

from flink_1_16_0_src_spark.queries import (  # noqa: F401
    aggregates,
    aggregates_extra,
    cep,
    datastream_api,
    functions_extra,
    functions_json_cond,
    functions_math_temporal,
    functions_string,
    functions_types,
    joins,
    over_windows,
    pipeline_cluster,
    pipeline_dedup,
    pipeline_multimodal,
    pipeline_similarity,
    pipeline_text,
    rank_dedup,
    session_dynamic,
    setops_sort,
    subqueries,
    tpcds_shapes,
    tpch,
    unnest_lateral,
    window_tvf,
)
