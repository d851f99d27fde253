"""Format round-trip queries with identity oracles — driver-checkable
coverage for the non-parquet formats (csv/json/orc) and the upsert
sink materializer, which were pytest-only through r2.

Each query writes a fixture table through the format under test into a
scratch dir, reads it back through ``sources.read_table`` (the DDL
format registry path), and returns it; the oracle is the original
table — so any encode/decode defect (type mapping, header handling,
null round-trip) breaks the value hash.

Reference parity: flink-formats/flink-csv CsvRowDataSerDeSchema,
flink-json JsonRowDataSerDeSchema, flink-orc OrcFileFormatFactory.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load

_NATION_ORACLE = """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
           CAST(n_regionkey AS BIGINT) AS n_regionkey
    FROM nation
"""

_NATION_DDL = "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str, options=None) -> DataFrame:
    from flink_1_16_0_src_spark import sources as srcs

    src = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("bigint").alias("n_regionkey"),
    )
    d = tempfile.mkdtemp(prefix=f"fmt_{fmt}_")
    path = os.path.join(d, "nation_out")
    writer = src.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(path)
    return srcs.read_table(spark, path, fmt, schema=_NATION_DDL, options=options or {})


@query("format_csv_roundtrip", oracle=_NATION_ORACLE, tags=("connector", "format"))
def format_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """csv write → DDL-registry read (header + declared schema) is the
    identity on nation (flink-csv SerDe parity)."""
    return _roundtrip(spark, sf_dir, "csv", {"csv.include-header": "true"})


@query("format_json_roundtrip", oracle=_NATION_ORACLE, tags=("connector", "format"))
def format_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json-lines write → read round-trip (flink-json SerDe parity)."""
    return _roundtrip(spark, sf_dir, "json")


@query("format_orc_roundtrip", oracle=_NATION_ORACLE, tags=("connector", "format"))
def format_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orc write → read round-trip (flink-orc format parity)."""
    return _roundtrip(spark, sf_dir, "orc")


@query(
    "format_upsert_sink_materialized",
    oracle="""
    SELECT user_id, event_type, ts, round(value, 2) AS value FROM (
      SELECT user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("connector", "sink", "upsert"),
)
def format_upsert_sink_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SinkUpsertMaterializer e2e (SinkUpsertMaterializer.java:62):
    drain the events file-stream through foreach_batch_upsert keyed on
    (user_id, event_type) with (ts, event_id) as the version order; the
    materialized table is last-write-wins per key — the oracle's
    row_number()=1 projection."""
    from flink_1_16_0_src_spark.streaming import sources as ssrc
    from flink_1_16_0_src_spark.streaming.stateful import foreach_batch_upsert

    sdf = ssrc.stream_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    ).withColumn("__ord", F.struct(F.col("ts"), F.col("event_id")))
    d = tempfile.mkdtemp(prefix="upsert_sink_")
    target = os.path.join(d, "table")
    q = (
        sdf.writeStream.foreachBatch(
            foreach_batch_upsert(target, ["user_id", "event_type"], "__ord")
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(d, "ckpt"))
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(target).select(
        "user_id", "event_type", "ts", F.round("value", 2).alias("value")
    )
