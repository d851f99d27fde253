"""Streaming sources + run helpers.

Reference parity:
- FLIP-27 file source (`flink-connectors/flink-connector-files/.../table/
  FileSystemTableSource.java`) → ``spark.readStream.schema(...).parquet``.
- datagen source (`flink-table/flink-table-api-java-bridge/.../connector/
  datagen/table/DataGenTableSource.java`) → ``format("rate")``.
- WATERMARK FOR ts AS ts - INTERVAL 'd' (`flink-table/flink-sql-parser/
  .../ddl/SqlWatermark.java`) → ``withWatermark(ts, d)``. Expression
  watermarks beyond bounded-out-of-orderness must be materialized as a
  column first (SURVEY.md §2.9).

Scale: the file source lists + splits files exactly like batch parquet
scans — partition pruning and maxFilesPerTrigger bound per-batch work,
so a 100 TB backlog is consumed in bounded micro-batches instead of one
giant batch.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    watermark: tuple[str, str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open a fixture table as a file-stream source (schema taken from a
    batch read of the same path — file streams require explicit schema)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    if os.path.isfile(path):
        # the file-stream source monitors a DIRECTORY; expose the
        # single-file fixture through a symlink dir (no data copy)
        link_dir = os.path.join(
            tempfile.gettempdir(), "spark_graft_streams", f"{abs(hash(sf_dir))}_{name}"
        )
        os.makedirs(link_dir, exist_ok=True)
        link = os.path.join(link_dir, f"{name}.parquet")
        if not os.path.exists(link):
            os.symlink(path, link)
        path = link_dir
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if name == "events":
        dtype = dict(df.dtypes).get("ts")
        if dtype == "bigint":
            # TIMESTAMP(NANOS) fixture read as long (nanosAsLong) — integer-div to µs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype == "timestamp_ntz":
            # newer Spark reads parquet NANOS as NTZ — withWatermark needs TIMESTAMP
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark:
        df = df.withWatermark(*watermark)
    return df


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """datagen-source parity: monotonically increasing (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def run_to_memory(
    sdf: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain the stream with an availableNow trigger into a memory sink
    and return the materialized result as a batch DataFrame. This is the
    operator-harness analog of the reference's
    OneInputStreamOperatorTestHarness (SURVEY.md §5.1) — process all
    currently-available input, then inspect emitted rows."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.sql(f"SELECT * FROM {name}")


def write_stream(
    sdf: DataFrame, sink: str, path: str | None = None, output_mode: str = "append", **options
):
    """Sink parity: print → console, blackhole → noop, filesystem → file
    formats (`StreamExecSink.java`; print/blackhole sinks under
    flink-table-api-java-bridge)."""
    fmt = {"print": "console", "blackhole": "noop", "filesystem": "parquet"}.get(sink, sink)
    writer = sdf.writeStream.format(fmt).outputMode(output_mode).options(**options)
    if path:
        writer = writer.option("path", path)
    return writer


def with_proctime(df: DataFrame, col: str = "proctime") -> DataFrame:
    """PROCTIME() attribute (flink-table-api ProcTimedAttribute /
    SqlProcTimeFunction): a processing-time column stamped at
    evaluation. Inherently non-deterministic — results depending on it
    are wall-clock-dependent in BOTH engines, so it carries no oracle;
    use event time for reproducible pipelines (the same guidance the
    reference docs give)."""
    return df.withColumn(col, F.current_timestamp())
