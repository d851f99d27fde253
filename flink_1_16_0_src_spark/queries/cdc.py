"""CDC-format queries with DuckDB oracles — driver-checkable coverage
for the kafka CDC value decoders (previously pytest-only because the
container has no broker; here the kafka-wire frame is synthesized FROM
the events fixture, so the decode path itself is what the oracle
grades).

Reference parity: flink-formats/flink-json
DebeziumJsonDeserializationSchema / CanalJsonDeserializationSchema —
each op decodes to RowKind-stamped rows; updates emit the -U/+U pair.
The Spark side round-trips events → JSON envelope (to_json) →
``sources.kafka_value_decode`` → rows+__rowkind; the oracle computes
the expected changelog directly from the parquet table, so any decode
defect (op routing, before-image selection, old-patching, explode
shape) breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


def _op_expr():
    # deterministic op per event: click → insert, purchase → update,
    # everything else → delete
    return (
        F.when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "u")
        .otherwise("d")
    )


@query(
    "cdc_debezium_decode",
    oracle="""
    WITH src AS (
      SELECT event_id, user_id, round(value, 2) AS value,
             CASE WHEN event_type = 'click' THEN 'c'
                  WHEN event_type = 'purchase' THEN 'u'
                  ELSE 'd' END AS op
      FROM events WHERE event_id < 2000
    )
    SELECT event_id, user_id, value, '+I' AS rowkind FROM src WHERE op = 'c'
    UNION ALL
    SELECT event_id, user_id, round(value - 1, 2), '-U' FROM src WHERE op = 'u'
    UNION ALL
    SELECT event_id, user_id, value, '+U' FROM src WHERE op = 'u'
    UNION ALL
    SELECT event_id, user_id, round(value - 1, 2), '-D' FROM src WHERE op = 'd'
    """,
    tags=("connector", "cdc", "format"),
)
def cdc_debezium_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """debezium-json decode e2e: events → envelope (before = value-1
    for updates/deletes, after = current) → kafka_value_decode →
    RowKind-stamped changelog. Inserts emit +I(after), updates the
    -U(before)/+U(after) pair, deletes -D(before)."""
    from flink_1_16_0_src_spark import sources as srcs

    ev = load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    after = F.struct(
        F.col("event_id"),
        F.col("user_id"),
        F.round("value", 2).alias("value"),
    )
    before = F.struct(
        F.col("event_id"),
        F.col("user_id"),
        F.round(F.col("value") - 1, 2).alias("value"),
    )
    op = _op_expr()
    wire = ev.select(
        F.to_json(
            F.struct(
                F.when(op != "c", before).alias("before"),
                F.when(op != "d", after).alias("after"),
                op.alias("op"),
            )
        ).alias("value")
    )
    decoded = srcs.kafka_value_decode(
        wire, "event_id BIGINT, user_id BIGINT, value DOUBLE", fmt="debezium-json"
    )
    return decoded.select(
        "event_id", "user_id", "value", F.col("__rowkind").alias("rowkind")
    )


@query(
    "cdc_canal_decode",
    oracle="""
    WITH src AS (
      SELECT event_id, user_id, round(value, 2) AS value,
             CASE WHEN event_type = 'click' THEN 'INSERT'
                  WHEN event_type = 'purchase' THEN 'UPDATE'
                  ELSE 'DELETE' END AS op
      FROM events WHERE event_id < 2000
    )
    SELECT event_id, user_id, value, '+I' AS rowkind FROM src WHERE op = 'INSERT'
    UNION ALL
    SELECT event_id, user_id, round(value - 1, 2), '-U' FROM src WHERE op = 'UPDATE'
    UNION ALL
    SELECT event_id, user_id, value, '+U' FROM src WHERE op = 'UPDATE'
    UNION ALL
    SELECT event_id, user_id, value, '-D' FROM src WHERE op = 'DELETE'
    """,
    tags=("connector", "cdc", "format"),
)
def cdc_canal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canal-json decode e2e: the data ARRAY explodes positionally and
    the -U image patches data with the sparse ``old`` entry (only the
    changed column present — value-1 here), exercising the
    posexplode + per-field coalesce path the unit tests cover at
    row-scale."""
    from flink_1_16_0_src_spark import sources as srcs

    ev = load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    op = (
        F.when(F.col("event_type") == "click", "INSERT")
        .when(F.col("event_type") == "purchase", "UPDATE")
        .otherwise("DELETE")
    )
    data_row = F.struct(
        F.col("event_id"),
        F.col("user_id"),
        F.round("value", 2).alias("value"),
    )
    # sparse old image: only the changed column (value), as canal emits
    old_row = F.struct(
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("bigint").alias("user_id"),
        F.round(F.col("value") - 1, 2).alias("value"),
    )
    wire = ev.select(
        F.to_json(
            F.struct(
                F.array(data_row).alias("data"),
                F.when(op == "UPDATE", F.array(old_row)).alias("old"),
                op.alias("type"),
            )
        ).alias("value")
    )
    decoded = srcs.kafka_value_decode(
        wire, "event_id BIGINT, user_id BIGINT, value DOUBLE", fmt="canal-json"
    )
    return decoded.select(
        "event_id", "user_id", "value", F.col("__rowkind").alias("rowkind")
    )


@query(
    "cdc_maxwell_decode",
    oracle="""
    WITH src AS (
      SELECT event_id, user_id, round(value, 2) AS value,
             CASE WHEN event_type = 'click' THEN 'insert'
                  WHEN event_type = 'purchase' THEN 'update'
                  ELSE 'delete' END AS op
      FROM events WHERE event_id < 2000
    )
    SELECT event_id, user_id, value, '+I' AS rowkind FROM src WHERE op = 'insert'
    UNION ALL
    SELECT event_id, user_id, round(value - 1, 2), '-U' FROM src WHERE op = 'update'
    UNION ALL
    SELECT event_id, user_id, value, '+U' FROM src WHERE op = 'update'
    UNION ALL
    SELECT event_id, user_id, value, '-D' FROM src WHERE op = 'delete'
    """,
    tags=("connector", "cdc", "format"),
)
def cdc_maxwell_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maxwell-json decode e2e (flink-formats/flink-json
    MaxwellJsonDeserializationSchema): single-object ``data`` envelope,
    ``old`` holds only the changed columns' OLD values, deletes carry
    the row in ``data``. The -U image = data patched with old
    (per-field coalesce), exercised here with a sparse old containing
    only ``value``."""
    from flink_1_16_0_src_spark import sources as srcs

    ev = load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    op = (
        F.when(F.col("event_type") == "click", "insert")
        .when(F.col("event_type") == "purchase", "update")
        .otherwise("delete")
    )
    data_row = F.struct(
        F.col("event_id"),
        F.col("user_id"),
        F.round("value", 2).alias("value"),
    )
    old_row = F.struct(
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("bigint").alias("user_id"),
        F.round(F.col("value") - 1, 2).alias("value"),
    )
    wire = ev.select(
        F.to_json(
            F.struct(
                data_row.alias("data"),
                F.when(op == "update", old_row).alias("old"),
                op.alias("type"),
            )
        ).alias("value")
    )
    decoded = srcs.kafka_value_decode(
        wire, "event_id BIGINT, user_id BIGINT, value DOUBLE", fmt="maxwell-json"
    )
    return decoded.select(
        "event_id", "user_id", "value", F.col("__rowkind").alias("rowkind")
    )


@query(
    "cdc_ogg_decode",
    oracle="""
    WITH src AS (
      SELECT event_id, user_id, round(value, 2) AS value,
             CASE WHEN event_type = 'click' THEN 'I'
                  WHEN event_type = 'purchase' THEN 'U'
                  ELSE 'D' END AS op
      FROM events WHERE event_id < 2000
    )
    SELECT event_id, user_id, value, '+I' AS rowkind FROM src WHERE op = 'I'
    UNION ALL
    SELECT event_id, user_id, round(value - 1, 2), '-U' FROM src WHERE op = 'U'
    UNION ALL
    SELECT event_id, user_id, value, '+U' FROM src WHERE op = 'U'
    UNION ALL
    SELECT event_id, user_id, round(value - 1, 2), '-D' FROM src WHERE op = 'D'
    """,
    tags=("connector", "cdc", "format"),
)
def cdc_ogg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ogg-json (GoldenGate) decode e2e (flink-formats/flink-json
    ogg/OggJsonDeserializationSchema): debezium-shaped before/after
    envelope with ``op_type`` I|U|D; deletes emit -D from the before
    image, updates the -U(before)/+U(after) pair."""
    from flink_1_16_0_src_spark import sources as srcs

    ev = load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    after = F.struct(
        F.col("event_id"),
        F.col("user_id"),
        F.round("value", 2).alias("value"),
    )
    before = F.struct(
        F.col("event_id"),
        F.col("user_id"),
        F.round(F.col("value") - 1, 2).alias("value"),
    )
    op = (
        F.when(F.col("event_type") == "click", "I")
        .when(F.col("event_type") == "purchase", "U")
        .otherwise("D")
    )
    wire = ev.select(
        F.to_json(
            F.struct(
                F.when(op != "I", before).alias("before"),
                F.when(op != "D", after).alias("after"),
                op.alias("op_type"),
            )
        ).alias("value")
    )
    decoded = srcs.kafka_value_decode(
        wire, "event_id BIGINT, user_id BIGINT, value DOUBLE", fmt="ogg-json"
    )
    return decoded.select(
        "event_id", "user_id", "value", F.col("__rowkind").alias("rowkind")
    )
