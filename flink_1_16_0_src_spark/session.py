"""SparkSession factory + TableEnvironment-style wrapper.

Reference parity: Flink's ``TableEnvironmentImpl``
(flink-table/flink-table-api-java/src/main/java/org/apache/flink/table/api/internal/TableEnvironmentImpl.java:715
``sqlQuery``; :735 ``executeSql``). On Spark the session *is* the table
environment; this wrapper adds Flink-flavored ``CREATE TABLE ... WITH
('connector'=..., 'path'=..., 'format'=...)`` DDL translation so a
reference user can keep their DDL.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "flink_1_16_0_src_spark", cpus: str | None = None) -> SparkSession:
    """Tuned local session. At cluster scale the same confs apply except
    master/driver-memory; shuffle partitions should be ~2-3x total cores
    and AQE coalesces the excess at runtime."""
    cpus = cpus or CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fixture events.parquet stores TIMESTAMP(NANOS); read as long + convert (tables.load)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_CREATE_TABLE_WITH = re.compile(
    r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*"
    r"(?:\((?P<schema>[^)]*)\))?\s*WITH\s*\((?P<props>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_props(props: str) -> dict[str, str]:
    out = {}
    for m in re.finditer(r"'([^']+)'\s*=\s*'([^']*)'", props):
        out[m.group(1)] = m.group(2)
    return out


class TableEnvironment:
    """Minimal Flink-TableEnvironment-shaped facade over SparkSession.

    Supported Flink DDL subset: ``CREATE TABLE t (...) WITH
    ('connector'='filesystem','path'='...','format'='parquet|csv|json')``
    → registers a temp view backed by ``spark.read``. Everything else in
    ``execute_sql`` passes through to ``spark.sql`` (Catalyst parses
    ANSI SQL, same dialect family as Flink's Calcite).
    """

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    def execute_sql(self, sql: str) -> DataFrame | None:
        m = _CREATE_TABLE_WITH.match(sql.strip())
        if m:
            name = m.group(1)
            props = _parse_props(m.group("props"))
            connector = props.get("connector", "filesystem")
            if connector != "filesystem":
                raise NotImplementedError(
                    f"connector {connector!r}: only 'filesystem' DDL is translated; "
                    "use spark.readStream for kafka/rate parity (streaming module)"
                )
            fmt = props.get("format", "parquet")
            reader = self.spark.read
            if m.group("schema"):
                ddl_schema = ", ".join(
                    c.strip() for c in m.group("schema").split(",") if "WATERMARK" not in c.upper()
                )
                reader = reader.schema(ddl_schema)
            df = getattr(reader, fmt)(props["path"])
            df.createOrReplaceTempView(name)
            return df
        return self.spark.sql(sql)

    def sql_query(self, sql: str) -> DataFrame:
        return self.spark.sql(sql)

    def from_path(self, path: str, fmt: str = "parquet") -> DataFrame:
        return getattr(self.spark.read, fmt)(path)
