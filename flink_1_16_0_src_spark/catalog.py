"""Catalog surface — Flink `Catalog` / `CatalogManager` parity on Spark.

Reference parity (SURVEY.md §1.1 "Catalog" row):
- `flink-table/flink-table-common/src/main/java/org/apache/flink/table/
  catalog/Catalog.java` — the catalog SPI: listDatabases (:132),
  createDatabase (:166), dropDatabase (:196), listTables (:222),
  listViews (:232), tableExists (:252), dropTable (:263), renameTable
  (:276), createTable (:295), listFunctions (:471), createFunction
  (:506), dropFunction (:532).
- `GenericInMemoryCatalog.java` (flink-table-api-java .../catalog/) —
  the default in-memory implementation backing every TableEnvironment.
- `CatalogManager.java` — current-catalog/current-database resolution
  (`useDatabase`, 3-part name resolution).

Spark mapping: the session catalog IS the in-memory catalog
(`spark.catalog`, SessionCatalog). Databases map to Spark namespaces
(`CREATE DATABASE`), tables/views to catalog tables and temp views,
functions to `spark.udf.register` registrations. We wrap rather than
reimplement — Catalyst resolves 3-part names, so `useDatabase` ≡ `USE`.

Scale: catalog metadata is driver-side only; at 100 TB the catalog's
job is partition metadata — delegated to the Spark/Hive metastore, the
same division the reference makes with HiveCatalog.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CatalogTableStatistics:
    """Table-level stats (catalog/stats/CatalogTableStatistics.java:30):
    rowCount plus file/byte counts the filesystem reports; ANALYZE only
    fills rowCount (AnalyzeTableUtil.java:236-239 passes -1 for the
    rest, same here)."""

    row_count: int
    file_count: int = -1
    total_size: int = -1
    raw_data_size: int = -1


@dataclass
class CatalogColumnStatisticsData:
    """One column's stats — the union of the reference's per-type
    CatalogColumnStatisticsData{Long,Double,String,Boolean,Date} variants
    (catalog/stats/). Fields not meaningful for the column's type stay
    None, mirroring which variant the reference would have built."""

    null_count: Optional[int] = None
    ndv: Optional[int] = None
    min: object = None
    max: object = None
    avg_len: Optional[float] = None
    max_len: Optional[int] = None
    true_count: Optional[int] = None
    false_count: Optional[int] = None


@dataclass
class CatalogColumnStatistics:
    """catalog/stats/CatalogColumnStatistics.java:33 — column name →
    per-column data map."""

    column_statistics_data: dict[str, CatalogColumnStatisticsData] = field(
        default_factory=dict
    )

    def merge(self, new: "CatalogColumnStatistics") -> "CatalogColumnStatistics":
        """AnalyzeTableUtil.mergeColumnStatistics (:121-135): freshly
        analyzed columns override; columns analyzed earlier but not in
        this run keep their old stats."""
        merged = dict(self.column_statistics_data)
        merged.update(new.column_statistics_data)
        return CatalogColumnStatistics(merged)


class DatabaseNotExistException(Exception):
    """Catalog.java:222 throws DatabaseNotExistException."""


class TableNotExistException(Exception):
    """Catalog.java dropTable with ignoreIfNotExists=false."""


class TableAlreadyExistException(Exception):
    """Catalog.java createTable with ignoreIfExists=false."""


class FunctionNotExistException(Exception):
    """Catalog.java:532 dropFunction with ignoreIfNotExists=false."""


class GenericInMemoryCatalog:
    """`GenericInMemoryCatalog` parity backed by the Spark session
    catalog. Method names/signatures follow Catalog.java (snake_cased);
    `ignore_if_exists` / `ignore_if_not_exists` flags match the
    reference's boolean parameters."""

    def __init__(self, spark: SparkSession, name: str = "default_catalog"):
        self.spark = spark
        self.name = name
        # statistics store (GenericInMemoryCatalog.java keeps tableStats/
        # tableColumnStats/partitionStats/partitionColumnStats maps);
        # partition keys are the frozen partition-spec item set
        self._table_stats: dict[str, CatalogTableStatistics] = {}
        self._column_stats: dict[str, CatalogColumnStatistics] = {}
        self._partition_stats: dict[tuple, CatalogTableStatistics] = {}
        self._partition_column_stats: dict[tuple, CatalogColumnStatistics] = {}

    @staticmethod
    def _pkey(table: str, spec: dict) -> tuple:
        return (table, frozenset((k, str(v)) for k, v in spec.items()))

    # -- databases (Catalog.java:132-209) --------------------------------
    def list_databases(self) -> list[str]:
        return [d.name for d in self.spark.catalog.listDatabases()]

    def database_exists(self, db: str) -> bool:
        return self.spark.catalog.databaseExists(db)

    def create_database(self, db: str, ignore_if_exists: bool = False) -> None:
        clause = "IF NOT EXISTS " if ignore_if_exists else ""
        self.spark.sql(f"CREATE DATABASE {clause}{db}")

    def drop_database(
        self, db: str, ignore_if_not_exists: bool = False, cascade: bool = False
    ) -> None:
        if not ignore_if_not_exists and not self.database_exists(db):
            raise DatabaseNotExistException(db)
        clause = "IF EXISTS " if ignore_if_not_exists else ""
        self.spark.sql(f"DROP DATABASE {clause}{db}{' CASCADE' if cascade else ''}")

    # -- tables / views (Catalog.java:222-314) ---------------------------
    def list_tables(self, db: str | None = None) -> list[str]:
        if db is not None and not self.database_exists(db):
            raise DatabaseNotExistException(db)
        return [t.name for t in self.spark.catalog.listTables(db)]

    def list_views(self, db: str | None = None) -> list[str]:
        if db is not None and not self.database_exists(db):
            raise DatabaseNotExistException(db)
        return [
            t.name
            for t in self.spark.catalog.listTables(db)
            if t.tableType in ("TEMPORARY", "VIEW")
        ]

    def table_exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(table)

    def create_table(
        self, table: str, df: DataFrame, ignore_if_exists: bool = False
    ) -> None:
        """Register a DataFrame as a named temp view (the in-memory
        catalog's createTable: metadata only, no data copy)."""
        if self.table_exists(table):
            if ignore_if_exists:
                return
            raise TableAlreadyExistException(table)
        df.createTempView(table)

    def get_table(self, table: str) -> DataFrame:
        if not self.table_exists(table):
            raise TableNotExistException(table)
        return self.spark.table(table)

    def drop_table(self, table: str, ignore_if_not_exists: bool = False) -> None:
        if not self.table_exists(table):
            if ignore_if_not_exists:
                return
            raise TableNotExistException(table)
        if not self.spark.catalog.dropTempView(table):
            self.spark.sql(f"DROP TABLE IF EXISTS {table}")

    def rename_table(
        self, table: str, new_name: str, ignore_if_not_exists: bool = False
    ) -> None:
        """Catalog.java:276. Temp views have no ALTER ... RENAME in
        Spark; re-register the same logical plan under the new name —
        metadata-only, identical to the reference's map-key move.
        Permanent catalog tables go through ALTER TABLE ... RENAME so
        the old name actually stops resolving (rename post-condition)."""
        if not self.table_exists(table):
            if ignore_if_not_exists:
                return
            raise TableNotExistException(table)
        df = self.spark.table(table)
        df.createTempView(new_name)
        if not self.spark.catalog.dropTempView(table):
            # not a temp view: undo the view registration and rename the
            # permanent table in the session catalog instead
            self.spark.catalog.dropTempView(new_name)
            self.spark.sql(f"ALTER TABLE {table} RENAME TO {new_name}")

    def describe_table(self, table: str) -> list[tuple[str, str]]:
        """DESCRIBE — (column, dataType) pairs like CatalogTable schema."""
        if not self.table_exists(table):
            raise TableNotExistException(table)
        return self.spark.table(table).dtypes

    # -- statistics (Catalog.java:617-701 get/alter{Table,Partition}
    # [Column]Statistics — the SPI ANALYZE TABLE writes through) --------
    def get_table_statistics(self, table: str) -> CatalogTableStatistics:
        return self._table_stats.get(table, CatalogTableStatistics(-1))

    def get_table_column_statistics(self, table: str) -> CatalogColumnStatistics:
        return self._column_stats.get(table, CatalogColumnStatistics())

    def alter_table_statistics(
        self, table: str, stats: CatalogTableStatistics
    ) -> None:
        self._table_stats[table] = stats

    def alter_table_column_statistics(
        self, table: str, stats: CatalogColumnStatistics
    ) -> None:
        # merge-on-write like AnalyzeTableUtil: keep stats for columns
        # not covered by this run
        self._column_stats[table] = self.get_table_column_statistics(table).merge(
            stats
        )

    def get_partition_statistics(
        self, table: str, spec: dict
    ) -> CatalogTableStatistics:
        return self._partition_stats.get(
            self._pkey(table, spec), CatalogTableStatistics(-1)
        )

    def get_partition_column_statistics(
        self, table: str, spec: dict
    ) -> CatalogColumnStatistics:
        return self._partition_column_stats.get(
            self._pkey(table, spec), CatalogColumnStatistics()
        )

    def alter_partition_statistics(
        self, table: str, spec: dict, stats: CatalogTableStatistics
    ) -> None:
        self._partition_stats[self._pkey(table, spec)] = stats

    def alter_partition_column_statistics(
        self, table: str, spec: dict, stats: CatalogColumnStatistics
    ) -> None:
        key = self._pkey(table, spec)
        old = self._partition_column_stats.get(key, CatalogColumnStatistics())
        self._partition_column_stats[key] = old.merge(stats)

    # -- functions (Catalog.java:471-532) --------------------------------
    def list_functions(self) -> list[str]:
        return [f.name for f in self.spark.catalog.listFunctions()]

    def function_exists(self, name: str) -> bool:
        return self.spark.catalog.functionExists(name)

    def create_function(self, name: str, fn, return_type=None) -> None:
        """CREATE FUNCTION ≈ spark.udf.register (SqlCreateFunction.java →
        FunctionCatalog.registerTempSystemFunction)."""
        self.spark.udf.register(name, fn, return_type)

    def drop_function(self, name: str, ignore_if_not_exists: bool = False) -> None:
        if not self.function_exists(name):
            if ignore_if_not_exists:
                return
            raise FunctionNotExistException(name)
        self.spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")


class CatalogManager:
    """CatalogManager.java parity: current catalog/database tracking and
    name resolution. Spark has one session catalog; extra "catalogs"
    register as wrappers sharing it (the common single-metastore case;
    true federation needs Spark catalog plugins, out of scope)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._catalogs: dict[str, GenericInMemoryCatalog] = {
            "default_catalog": GenericInMemoryCatalog(spark)
        }
        self.current_catalog = "default_catalog"

    def register_catalog(self, name: str, catalog: GenericInMemoryCatalog) -> None:
        self._catalogs[name] = catalog

    def get_catalog(self, name: str | None = None) -> GenericInMemoryCatalog:
        return self._catalogs[name or self.current_catalog]

    def use_catalog(self, name: str) -> None:
        if name not in self._catalogs:
            raise DatabaseNotExistException(name)
        self.current_catalog = name

    def use_database(self, db: str) -> None:
        self.spark.sql(f"USE {db}")

    def current_database(self) -> str:
        return self.spark.catalog.currentDatabase()


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> None:
    """Statistics collection — Catalog.java:645 alterTableStatistics /
    :659 alterTableColumnStatistics, the surface behind the reference's
    CBO-with-stats TPC-DS runs (flink-tpcds-test TpcdsStatsProvider
    loads row counts + column NDV/min/max before planning). Spark
    analog: ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...] into
    the session catalog; with spark.sql.cbo.enabled the optimizer uses
    them for join reordering and build-side choice — same division of
    labor, stats feed the cost model, the engine replans.

    At 100 TB stats collection is itself a distributed scan — run it at
    load time (the reference does exactly this: stats ship WITH the
    data), not per query."""
    stmt = f"ANALYZE TABLE {table} COMPUTE STATISTICS"
    if columns:
        stmt += " FOR COLUMNS " + ", ".join(columns)
    spark.sql(stmt)


def table_stats(spark: SparkSession, table: str) -> dict:
    """Read back catalog statistics (rowCount/sizeInBytes) the way the
    planner sees them — CatalogTableStatistics parity."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    out = {}
    for r in rows:
        if r.col_name == "Statistics":
            out["raw"] = r.data_type
    return out
