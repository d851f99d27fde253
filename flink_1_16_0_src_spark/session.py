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
from pyspark.sql import functions as F

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
        # large heaps go long stretches without a full GC, so the
        # ContextCleaner (triggered by driver GC) never releases dead
        # broadcasts/shuffle files on long-running sessions
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fixture events.parquet stores TIMESTAMP(NANOS); read as long + convert (tables.load)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_CREATE_TABLE_AS = re.compile(
    r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*"
    r"(?:WITH\s*\((?P<props>[^)]*)\)\s*)?"
    r"AS\s+(?P<query>SELECT.*)$",
    re.IGNORECASE | re.DOTALL,
)

_CREATE_TABLE_WITH = re.compile(
    # schema group allows ONE level of nested parens — DECIMAL(10,2),
    # PROCTIME(), computed-column expressions
    r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*"
    r"(?:\((?P<schema>(?:[^()]|\([^()]*\))*)\)\s*)?"
    r"(?:PARTITIONED\s+BY\s*\((?P<partcols>[^)]*)\)\s*)?"
    r"WITH\s*\((?P<props>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


_CREATE_TABLE_LIKE = re.compile(
    # SqlCreateTableLike.java:71 — derive a table from an existing
    # registration; optional extra schema, WITH overrides, and a
    # (INCLUDING/EXCLUDING/OVERWRITING <feature>) merge-option list
    r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*"
    r"(?:\((?P<schema>(?:[^()]|\([^()]*\))*)\)\s*)?"
    r"(?:PARTITIONED\s+BY\s*\((?P<partcols>[^)]*)\)\s*)?"
    r"(?:WITH\s*\((?P<props>(?:[^()]|\([^()]*\))*)\)\s*)?"
    r"LIKE\s+(?P<base>\w+)\s*(?:\((?P<opts>[^)]*)\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_ALTER_TABLE = re.compile(
    # SqlAlterTableOptions / SqlAlterTableAdd / SqlAlterTableModify /
    # SqlAlterTableRename — op payload parsed in _alter_table
    r"ALTER\s+TABLE\s+(\w+)\s+(.*)$", re.IGNORECASE | re.DOTALL
)

_ANALYZE_TABLE = re.compile(
    # SqlAnalyzeTable.java (FLIP-240, new in 1.16): ANALYZE TABLE t
    # [PARTITION(p1[=v1], ...)] COMPUTE STATISTICS
    # [FOR COLUMNS c1, c2 | FOR ALL COLUMNS]
    r"ANALYZE\s+TABLE\s+(?P<name>[\w.]+)"
    r"(?:\s+PARTITION\s*\((?P<parts>[^)]*)\))?"
    r"\s+COMPUTE\s+STATISTICS"
    r"(?:\s+FOR\s+(?:(?P<allcols>ALL\s+COLUMNS)|COLUMNS\s+(?P<cols>[\w\s,`]+)))?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)

_EXECUTE_STATEMENT_SET = re.compile(
    # SqlExecute.java + SqlStatementSet.java:41 — inline form
    r"EXECUTE\s+STATEMENT\s+SET\s+BEGIN\s+(?P<body>.*?)\s*END\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_COMPILE_PLAN = re.compile(
    # SqlCompilePlan.java:41 `COMPILE PLAN 'f' [IF NOT EXISTS] FOR DML` +
    # SqlCompileAndExecutePlan.java `COMPILE AND EXECUTE PLAN 'f' FOR DML`
    r"COMPILE(?:\s+AND\s+(?P<execute>EXECUTE))?\s+PLAN\s+'(?P<file>[^']+)'"
    r"(?:\s+(?P<ine>IF\s+NOT\s+EXISTS))?\s+FOR\s+(?P<dml>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_EXECUTE_PLAN = re.compile(
    # SqlExecutePlan.java `EXECUTE PLAN 'f'`
    r"EXECUTE\s+PLAN\s+'(?P<file>[^']+)'\s*;?\s*$", re.IGNORECASE
)


def _split_statements(body: str) -> list[str]:
    """Split a statement-set body on top-level ';' (quote-aware)."""
    out, cur, in_q = [], [], False
    for ch in body:
        if ch == "'":
            in_q = not in_q
        if ch == ";" and not in_q:
            s = "".join(cur).strip()
            if s:
                out.append(s)
            cur = []
        else:
            cur.append(ch)
    s = "".join(cur).strip()
    if s:
        out.append(s)
    return out


def _normalize_flink_type(coldef: str) -> str:
    """Flink logical types Spark's DDL parser doesn't spell the same
    way (LogicalTypeParser.java): precisioned TIMESTAMP[_LTZ](p) →
    TIMESTAMP (Spark timestamps are micros; (3) millis fit), BYTES →
    BINARY. Everything else (STRING/BIGINT/DECIMAL(p,s)/VARCHAR(n)/
    ARRAY<..>/MAP<..>/ROW→struct spelled by the user) parses as-is."""
    s = re.sub(r"\bTIMESTAMP_LTZ\s*\(\s*\d+\s*\)", "TIMESTAMP", coldef,
               flags=re.IGNORECASE)
    s = re.sub(r"\bTIMESTAMP\s*\(\s*\d+\s*\)", "TIMESTAMP", s, flags=re.IGNORECASE)
    s = re.sub(r"\bBYTES\b", "BINARY", s, flags=re.IGNORECASE)
    # ROW<a INT, b STRING> → STRUCT<...> (RowType); MULTISET<T> →
    # MAP<T, INT> (MultisetType IS element→count per LogicalTypeParser)
    s = re.sub(r"\bROW\s*<", "STRUCT<", s, flags=re.IGNORECASE)
    s = re.sub(r"\bMULTISET\s*<([^<>]+)>", r"MAP<\1, INT>", s, flags=re.IGNORECASE)
    return s


def _parse_props(props: str) -> dict[str, str]:
    out = {}
    for m in re.finditer(r"'([^']+)'\s*=\s*'([^']*)'", props):
        out[m.group(1)] = m.group(2)
    return out


# INSERT INTO appends (sink.mode=append), INSERT OVERWRITE replaces —
# the filesystem sink's two write modes (FileSystemTableSink overwrite
# flag from SqlInsert.isOverwrite)
# unique names for inline FROM-subquery streaming relations
import itertools as _itertools

_STREAM_SUB_SEQ = _itertools.count()

_INSERT_INTO = re.compile(
    # optional column list (SqlInsert column list, Flink 1.16 FLIP-219
    # partial-insert): strictly identifiers+commas so a parenthesized
    # subquery body is never mistaken for one
    r"INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?(\w+)\s*"
    r"(?:\(\s*(?P<collist>\w+(?:\s*,\s*\w+)*)\s*\)\s*)?(?P<body>.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _apply_insert_column_list(df, collist: str | None, declared: dict):
    """INSERT INTO t (a, b) SELECT ...: the query's columns map to the
    listed target columns positionally; declared-but-unlisted columns
    land as typed NULLs (Flink's partial-insert null-fill)."""
    if not collist:
        return df
    names = [c.strip() for c in collist.split(",")]
    if len(names) != len(df.columns):
        raise ValueError(
            f"INSERT column list {names} arity {len(names)} != query "
            f"column count {len(df.columns)}"
        )
    df = df.toDF(*names)
    for cname, ctype in declared.items():
        if cname not in names:
            df = df.withColumn(cname, F.lit(None).cast(ctype))
    if declared:
        df = df.select(*[c for c in declared], *[c for c in names if c not in declared])
    return df

_STATIC_PARTITION = re.compile(r"^\s*PARTITION\s*\(([^)]*)\)\s*", re.IGNORECASE)


def _parse_static_partition(rest: str) -> tuple[dict[str, str], str]:
    """``PARTITION (k1='v1', k2=3) SELECT ...`` → ({k1: v1, k2: 3},
    remaining query). Flink SqlInsert static partition clause
    (flink-table/flink-sql-parser SqlInsert; values land as constant
    columns on every written row)."""
    m = _STATIC_PARTITION.match(rest)
    if not m:
        return {}, rest
    parts: dict[str, str] = {}
    for kv in m.group(1).split(","):
        if not kv.strip():
            continue
        k, v = kv.split("=", 1)
        parts[k.strip()] = v.strip().strip("'")
    return parts, rest[m.end():]

# Flink join-strategy hints (T-PLANNER hint/JoinStrategy.java:29-47) →
# Spark's equivalents. BROADCAST/SHUFFLE_HASH share names; SHUFFLE_MERGE
# → MERGE; NEST_LOOP → SHUFFLE_REPLICATE_NL. The table-options hint
# (FlinkHints.java OPTIONS) has no Spark analog inside a query — options
# belong on the DDL/reader here — so it is stripped.
_HINT_MAP = {"SHUFFLE_MERGE": "MERGE", "NEST_LOOP": "SHUFFLE_REPLICATE_NL"}

# WATERMARK FOR ts AS ts - INTERVAL '5' SECOND (SqlWatermark.java) —
# bounded-out-of-orderness only (expression watermarks need a computed
# column first, SURVEY.md §2.9)
_WATERMARK_SPEC = re.compile(
    r"WATERMARK\s+FOR\s+(\w+)\s+AS\s+\1\s*-\s*INTERVAL\s*'([\d.]+)'\s*(\w+)",
    re.IGNORECASE,
)
_HINT_BLOCK = re.compile(r"/\*\+(.*?)\*/", re.DOTALL)
_OPTIONS_HINT = re.compile(r"OPTIONS\s*\([^)]*\)\s*,?", re.IGNORECASE)


_LOOKUP_HINT = re.compile(r"LOOKUP\s*\(([^)]*)\)\s*,?", re.IGNORECASE)
_LOOKUP_OPT_KEYS = {
    "table", "async", "output-mode", "capacity", "timeout",
    "retry-predicate", "retry-strategy", "fixed-delay", "max-attempts",
}
_LOOKUP_OPT_ENUMS = {
    "async": {"true", "false"},
    "output-mode": {"ordered", "allow_unordered"},
    "retry-predicate": {"lookup_miss"},
    "retry-strategy": {"fixed_delay"},
}


def parse_lookup_hint(body: str) -> dict[str, str]:
    """Validate a ``LOOKUP('k'='v', ...)`` hint body (FLINK-28779,
    LookupJoinHintOptions.java): known keys only, 'table' required,
    enum values checked. Returns the option dict."""
    opts: dict[str, str] = {}
    for m in re.finditer(r"'([^']*)'\s*=\s*'([^']*)'", body):
        k, v = m.group(1).lower(), m.group(2)
        if k not in _LOOKUP_OPT_KEYS:
            raise ValueError(f"unknown LOOKUP hint option {k!r}")
        ev = _LOOKUP_OPT_ENUMS.get(k)
        if ev and v.lower() not in ev:
            raise ValueError(f"LOOKUP hint {k!r} must be one of {sorted(ev)}, got {v!r}")
        opts[k] = v
    if "table" not in opts:
        raise ValueError("LOOKUP hint requires the 'table' option")
    return opts


def translate_hints(sql: str) -> str:
    """Rewrite Flink hint names inside every /*+ ... */ block to the
    Spark planner's vocabulary (JoinStrategy.java:29-47 parity).
    ``LOOKUP(...)`` hints (FLINK-28779) are validated then absorbed:
    their async/capacity/timeout/retry knobs tune the reference's
    mid-query lookup I/O, which the Spark lowering replaces with a
    set-oriented join against the current dim snapshot — correctness
    is unchanged, so like OPTIONS they leave no Spark hint behind.
    The API path (operators/lookup.py) carries the real async / cache
    / retry execution semantics."""

    def _one(m: re.Match) -> str:
        body = _OPTIONS_HINT.sub("", m.group(1))
        lm = _LOOKUP_HINT.search(body)
        if lm:
            parse_lookup_hint(lm.group(1))  # validation errors surface
            body = _LOOKUP_HINT.sub("", body)
        for flink, spark_name in _HINT_MAP.items():
            body = re.sub(rf"\b{flink}\b", spark_name, body, flags=re.IGNORECASE)
        body = body.strip().rstrip(",").strip()
        return f"/*+ {body} */" if body else ""

    return translate_niladic_clocks(_HINT_BLOCK.sub(_one, sql))


# LOCALTIME = millis-of-day of the SESSION-LOCAL wall clock. Derived
# from localtimestamp() components (not unix_millis(current_timestamp())
# % day, which is UTC millis-of-day and diverges whenever
# spark.sql.session.timeZone is non-UTC). localtimestamp() is fixed per
# query, so the three references read the same instant.
_LOCALTIME_EXPR = (
    "(hour(localtimestamp())*3600000 + minute(localtimestamp())*60000"
    " + CAST(floor(date_part('SECOND', localtimestamp()) * 1000) AS BIGINT))"
)


def relation_positions(unq: str) -> set[str]:
    """Identifiers that appear in RELATION positions (after FROM / JOIN /
    the ``TABLE src`` of a window TVF, plus comma-separated FROM lists)
    of an already quote-stripped SQL body. Used by the CREATE VIEW
    batch-vs-streaming router so a column or alias that merely SHARES a
    watermarked source's name no longer false-positives a batch view
    into the streaming path (ADVICE r11 #5)."""
    rels: set[str] = set()
    for m in re.finditer(r"\b(?:FROM|JOIN|TABLE)\s+`?([A-Za-z_]\w*)`?", unq,
                         re.IGNORECASE):
        rels.add(m.group(1))
    # comma-separated FROM lists: FROM a [AS x], b [y], c
    for m in re.finditer(
        r"\bFROM\s+`?[A-Za-z_]\w*`?(?:\s+(?:AS\s+)?[A-Za-z_]\w*)?"
        r"((?:\s*,\s*`?[A-Za-z_]\w*`?(?:\s+(?:AS\s+)?[A-Za-z_]\w*)?)+)",
        unq, re.IGNORECASE,
    ):
        for mm in re.finditer(r",\s*`?([A-Za-z_]\w*)`?", m.group(1)):
            rels.add(mm.group(1))
    return {r.lower() for r in rels}


def translate_niladic_clocks(sql: str) -> str:
    """Flink's niladic clock keywords Spark doesn't parse bare
    (BuiltInFunctionDefinitions localTimestamp/localTime):
    ``LOCALTIMESTAMP`` → ``localtimestamp()`` (same session-timezone
    wall reading); ``LOCALTIME`` → millis-of-day BIGINT of the session
    wall clock, the repo's TIME(p) convention (func_time_type — Spark
    has no TIME type). Rides the translate_hints pass, which every SQL
    entry point runs. Substitution is quote-aware: occurrences inside
    single-quoted string literals are left untouched."""

    def _subst(segment: str) -> str:
        segment = re.sub(
            r"\bLOCALTIMESTAMP\b(?!\s*\()", "localtimestamp()", segment,
            flags=re.IGNORECASE,
        )
        return re.sub(
            r"\bLOCALTIME\b(?!\s*\()", _LOCALTIME_EXPR, segment,
            flags=re.IGNORECASE,
        )

    # odd indices of the split are the quoted literals ('' = escaped
    # quote stays inside one literal token) — substitute only between
    parts = re.split(r"('(?:[^']|'')*')", sql)
    return "".join(p if i % 2 else _subst(p) for i, p in enumerate(parts))


class TableEnvironment:
    """Flink-TableEnvironment-shaped facade over SparkSession
    (TableEnvironmentImpl.java:715 sqlQuery / :735 executeSql).

    Supported Flink DDL subset: ``CREATE TABLE t (...) WITH
    ('connector'=..., ...)`` for connectors filesystem (formats
    parquet/csv/json/orc/text/avro), datagen, print, blackhole, kafka
    (passthrough mapping). Source tables register as temp views;
    sink-only connectors (print/blackhole/filesystem with no existing
    data) record the sink spec and ``INSERT INTO sink SELECT ...``
    routes the query result to it. Everything else passes through to
    ``spark.sql`` (Catalyst speaks the same ANSI dialect family as
    Flink's Calcite).
    """

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self._sinks: dict[str, dict] = {}
        self._sources: dict[str, dict] = {}
        self._watermarks: dict[str, tuple[str, str]] = {}
        # processing-time attributes (`pt AS PROCTIME()` computed
        # columns): table -> column; FOR SYSTEM_TIME AS OF one of these
        # lowers to the lookup join (current dim snapshot)
        self._proctimes: dict[str, str] = {}
        self._set_overrides: dict[str, str] = {}
        # parsed DDL per table — the CatalogTable the reference keeps;
        # CREATE TABLE ... LIKE and ALTER TABLE derive from these
        self._registrations: dict[str, dict] = {}
        # TemporalTableFunction registry: name -> (history df, time
        # attribute, primary key) — TableImpl.createTemporalTableFunction
        self._temporal_fns: dict[str, tuple] = {}
        # streaming views (create_streaming_view): name -> body SQL.
        # The compiled STREAMING relation is registered as a temp view
        # under the same name, so any later stream_query statement —
        # TVF table argument, OVER/Top-N source, plain FROM, join side
        # — composes over it through the ordinary catalog lookup.
        self._stream_views: dict[str, str] = {}
        # CLI split form: BEGIN STATEMENT SET; ... END; buffers here
        self._pending_statement_set: "StatementSet | None" = None
        from flink_1_16_0_src_spark.catalog import CatalogManager

        self.catalog_manager = CatalogManager(self.spark)

    # Flink TableEnvironment catalog methods (TableEnvironmentImpl.java
    # useCatalog/useDatabase/listTables/listFunctions) delegate to the
    # CatalogManager; SHOW/DESCRIBE/USE SQL passes through execute_sql.
    def use_catalog(self, name: str) -> None:
        self.catalog_manager.use_catalog(name)

    def use_database(self, db: str) -> None:
        self.catalog_manager.use_database(db)

    def list_tables(self) -> list[str]:
        return self.catalog_manager.get_catalog().list_tables()

    def list_functions(self) -> list[str]:
        return self.catalog_manager.get_catalog().list_functions()

    def create_temporary_view(self, name: str, df: DataFrame) -> None:
        self.catalog_manager.get_catalog().create_table(name, df)

    def drop_temporary_view(self, name: str) -> None:
        self.catalog_manager.get_catalog().drop_table(name)

    def execute_sql(self, sql: str) -> DataFrame | None:
        from flink_1_16_0_src_spark import sources as srcs

        stmt = sql.strip()
        # EXECUTE STATEMENT SET BEGIN ... END (SqlExecute.java +
        # SqlStatementSet.java:41): the SQL-text form routes to the
        # same StatementSet machinery as the API — each INSERT's plan
        # joins the common-subgraph analysis, shared subtrees persist
        # once. The CLI split form (SqlBeginStatementSet.java:
        # `BEGIN STATEMENT SET;` ... `END;`) buffers across calls.
        mexec = _EXECUTE_STATEMENT_SET.match(stmt)
        if mexec:
            stmts = _split_statements(mexec.group("body"))
            # STREAMING route (SqlStatementSet.java:41 works identically
            # in streaming mode via StreamStatementSetImpl.java): when
            # every INSERT reads a WATERMARKED DDL source and passes
            # the stream set's admission gate, the SQL-text form
            # drives the streaming multi-sink executor — one shared
            # scan per distinct source, watermark-closed window
            # aggregates. Anything else (temp views, watermark-less
            # sources, stateful shapes the per-batch model can't keep
            # exact) falls back to the batch common-subgraph set.
            sset = None
            try:
                cand = self.create_stream_statement_set()
                for ins in stmts:
                    cand.add_insert_sql(ins)
                srcs_used = {t[3] for t in cand._inserts}
                if srcs_used and all(s in self._watermarks
                                     for s in srcs_used):
                    sset = cand
            except (ValueError, KeyError):
                sset = None
            if sset is not None:
                summary = sset.execute()
                return self.spark.createDataFrame(
                    [(summary["statements"],
                      summary["window_agg_statements"],
                      summary["streaming_queries"])],
                    "statements int, window_agg_statements int, "
                    "streaming_queries int",
                )
            ss = self.create_statement_set()
            for ins in stmts:
                ss.add_insert_sql(ins)
            summary = ss.execute()
            return self.spark.createDataFrame(
                [(summary["statements"], summary["shared_subplans"])],
                "statements int, shared_subplans int",
            )
        # CREATE [TEMPORARY] [SYSTEM] FUNCTION f AS 'module.attr'
        # [LANGUAGE PYTHON] (SqlCreateFunction.java → FunctionCatalog
        # registerTempSystemFunction). The identifier resolves through
        # Python's import system; JAVA/SCALA classpath loading has no
        # analog in a Python engine and is rejected.
        mcfn = re.match(
            r"^CREATE\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+"
            r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)\s+AS\s+"
            r"'(?P<path>[^']+)'(?:\s+LANGUAGE\s+(?P<lang>\w+))?\s*;?$",
            stmt, re.IGNORECASE,
        )
        if mcfn:
            lang = (mcfn.group("lang") or "PYTHON").upper()
            if lang != "PYTHON":
                raise ValueError(
                    f"LANGUAGE {lang}: only PYTHON functions can be loaded "
                    "by a Python engine (no JVM classpath here)"
                )
            name = mcfn.group("name")
            if mcfn.group("ine") and self.catalog_manager.get_catalog().function_exists(name):
                return None
            import importlib

            mod_path, _, attr = mcfn.group("path").rpartition(".")
            if not mod_path:
                raise ValueError(
                    f"function identifier {mcfn.group('path')!r} must be a "
                    "dotted module.attr path"
                )
            fn = getattr(importlib.import_module(mod_path), attr)
            from flink_1_16_0_src_spark.functions.udf import register as _reg_fn

            _reg_fn(self.spark, name, fn)
            return None
        mdfn = re.match(
            r"^DROP\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+"
            r"(?P<ife>IF\s+EXISTS\s+)?(?P<name>\w+)\s*;?$",
            stmt, re.IGNORECASE,
        )
        if mdfn:
            self.catalog_manager.get_catalog().drop_function(
                mdfn.group("name"), ignore_if_not_exists=mdfn.group("ife") is not None
            )
            return None
        mcp = _COMPILE_PLAN.match(stmt)
        if mcp:
            return self._compile_plan(
                mcp.group("file"),
                mcp.group("ine") is not None,
                mcp.group("dml"),
                execute=mcp.group("execute") is not None,
            )
        mep = _EXECUTE_PLAN.match(stmt)
        if mep:
            return self._execute_plan(mep.group("file"))
        if re.match(r"^BEGIN\s+STATEMENT\s+SET\s*;?\s*$", stmt, re.IGNORECASE):
            self._pending_statement_set = self.create_statement_set()
            return None
        if self._pending_statement_set is not None:
            if re.match(r"^END\s*;?\s*$", stmt, re.IGNORECASE):
                ss, self._pending_statement_set = self._pending_statement_set, None
                summary = ss.execute()
                return self.spark.createDataFrame(
                    [(summary["statements"], summary["shared_subplans"])],
                    "statements int, shared_subplans int",
                )
            self._pending_statement_set.add_insert_sql(stmt)
            return None
        # Flink SET / RESET statements (SqlSet/SqlReset,
        # flink-sql-parser/.../dql/SqlSet.java): session config knobs.
        # `SET 'k' = 'v'` → spark.conf.set; bare SET lists the session
        # confs; RESET 'k' / RESET unsets. `table.*` keys without a
        # Spark twin still store/round-trip (TableConfig parity).
        mset = re.match(r"^SET(?:\s+'([^']+)'\s*=\s*'([^']*)')?\s*;?$", stmt, re.IGNORECASE)
        if mset:
            if mset.group(1) is None:
                rows = [(k, v) for k, v in sorted(self._set_overrides.items())]
                return self.spark.createDataFrame(rows or [("", "")], "key string, value string").where(
                    "key <> ''"
                )
            k, v = mset.group(1), mset.group(2)
            self._set_overrides[k] = v
            try:
                self.spark.conf.set(k, v)
            except Exception:
                pass  # Flink-only key (table.exec.*) — stored for parity
            return None
        mreset = re.match(r"^RESET(?:\s+'([^']+)')?\s*;?$", stmt, re.IGNORECASE)
        if mreset:
            keys = [mreset.group(1)] if mreset.group(1) else list(self._set_overrides)
            for k in keys:
                self._set_overrides.pop(k, None)
                try:
                    self.spark.conf.unset(k)
                except Exception:
                    pass
            return None
        mcta = _CREATE_TABLE_AS.match(stmt)
        if mcta:
            # CTAS (FLIP-218, Flink 1.16 SqlCreateTableAs): create the
            # table AND populate it from the query atomically. With a
            # filesystem connector the result is written to the path and
            # the registered view reads it back (so later readers see
            # durable data); with no connector it registers the query
            # result as a view (Spark-native lazy table).
            name = mcta.group(1)
            props = _parse_props(mcta.group("props") or "")
            body = self._rewrite_flink_clauses(translate_hints(mcta.group("query")))
            df = self.spark.sql(body)
            connector = props.get("connector")
            if connector == "filesystem":
                fmt = props.get("format", "parquet")
                if "path" not in props:
                    raise ValueError(
                        f"CTAS {name!r}: connector 'filesystem' requires a "
                        "'path' property (WITH ('path'='...'))"
                    )
                srcs.write_table(df, props["path"], connector, fmt, props)
                df = srcs.read_table(self.spark, props["path"], fmt)
                self._sources[name] = props
            elif connector == "jdbc":
                # r12 (VERDICT r11 #7): CTAS shares INSERT INTO's sink
                # matrix (SqlCreateTableAs → DynamicTableSink, FLIP-218
                # create-then-insert). Populate through the sink path,
                # then re-read the created table so later readers see
                # the DURABLE rows; the table also registers as a sink
                # so follow-up INSERT INTO appends connect the same way.
                srcs.write_table(df, None, "jdbc",
                                 props.get("format", "parquet"), props)
                df = srcs.jdbc_source(self.spark, props)
                self._sources[name] = props
                self._sinks[name] = {"connector": "jdbc", "props": props}
            elif connector in ("kafka", "upsert-kafka", "print", "blackhole"):
                # terminal / broker-backed sinks: populate through the
                # sink path (kafka encodes rows via the option-mapper +
                # kafka_value_encode wire frame); the registered view
                # keeps the query result readable (kafka readback needs
                # a broker, print/blackhole are write-only)
                srcs.write_table(
                    df, props.get("path"), connector,
                    props.get("format",
                              "json" if "kafka" in connector else "parquet"),
                    props,
                )
                self._sinks[name] = {"connector": connector, "props": props}
            elif connector is not None:
                raise NotImplementedError(f"CTAS into connector {connector!r}")
            df.createOrReplaceTempView(name)
            # record the registration (schema inferred from the query)
            # so CREATE TABLE ... LIKE and ALTER TABLE work on CTAS
            # tables too
            self._registrations[name] = {
                "cols": [], "props": props, "partcols": [],
                "metadata_cols": {}, "computed_cols": {}, "watermark": None,
            }
            return df
        mlike = _CREATE_TABLE_LIKE.match(stmt)
        if mlike:
            return self._create_table_like(mlike)
        m = _CREATE_TABLE_WITH.match(stmt)
        if m:
            name = m.group(1)
            reg = self._parse_create_table(
                name, m.group("schema"), m.group("partcols"), m.group("props")
            )
            return self._register_parsed(name, reg)
        manalyze = _ANALYZE_TABLE.match(stmt)
        if manalyze:
            return self._analyze_table(manalyze)
        malter = _ALTER_TABLE.match(stmt)
        if malter:
            return self._alter_table(malter.group(1), malter.group(2))
        mshow = re.match(
            r"^SHOW\s+CREATE\s+TABLE\s+(\w+)\s*;?\s*$", stmt, re.IGNORECASE
        )
        if mshow:
            return self._show_create_table(mshow.group(1))
        mshowpart = re.match(
            r"^SHOW\s+PARTITIONS\s+(?P<name>[\w.]+)"
            r"(?:\s+PARTITION\s*\((?P<spec>[^)]*)\))?\s*;?\s*$",
            stmt, re.IGNORECASE,
        )
        if mshowpart:
            return self._show_partitions(
                mshowpart.group("name"), mshowpart.group("spec")
            )
        mshowcols = re.match(
            r"^SHOW\s+COLUMNS\s+(?:FROM|IN)\s+(?P<name>[\w.]+)"
            r"(?:\s+(?P<neg>NOT\s+)?LIKE\s+'(?P<pat>[^']*)')?\s*;?\s*$",
            stmt, re.IGNORECASE,
        )
        if mshowcols:
            return self._show_columns(
                mshowcols.group("name"),
                mshowcols.group("pat"),
                negated=mshowcols.group("neg") is not None,
            )
        mcview = re.match(
            r"^CREATE\s+(?:TEMPORARY\s+)?VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?"
            r"(?P<name>\w+)\s+AS\s+(?P<q>.+?)\s*;?\s*$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if mcview:
            # SqlCreateView.java: in the reference views are
            # mode-agnostic (expanded at plan time); here a view whose
            # body reads a WATERMARKED DDL source or another streaming
            # view is a STREAMING view (create_streaming_view — later
            # stream_query statements compose over it); anything else
            # keeps the plain batch temp-view registration.
            body = mcview.group("q")
            unq = "".join(
                p for i, p in enumerate(re.split(r"('(?:[^']|'')*')", body))
                if i % 2 == 0
            )
            streaming_rels = {
                s.lower()
                for s in set(self._watermarks) | set(self._stream_views)
            }
            # match only FROM/JOIN/TABLE( relation positions — a column
            # or alias sharing a streaming relation's name must NOT
            # route a batch view through create_streaming_view
            if streaming_rels & relation_positions(unq):
                self.create_streaming_view(mcview.group("name"), body)
                return None
            self.spark.sql(
                self._rewrite_flink_clauses(translate_hints(stmt))
            )
            return None
        malterview = re.match(
            r"^ALTER\s+VIEW\s+(?P<name>\w+)\s+"
            r"(?:RENAME\s+TO\s+(?P<newname>\w+)|AS\s+(?P<query>.+))\s*;?\s*$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if malterview:
            # SqlAlterViewRename.java / SqlAlterViewAs.java: temp views
            # re-register (metadata-only move / plan swap)
            vname = malterview.group("name")
            if malterview.group("newname"):
                self.catalog_manager.get_catalog().rename_table(
                    vname, malterview.group("newname")
                )
                return None
            body = self._rewrite_flink_clauses(
                translate_hints(malterview.group("query"))
            )
            self.spark.sql(body).createOrReplaceTempView(vname)
            return None
        mdesccat = re.match(
            r"^DESC(?:RIBE)?\s+CATALOG\s+(\w+)\s*;?\s*$", stmt, re.IGNORECASE
        )
        if mdesccat:
            # SqlDescribeCatalog.java — info-name/value rows
            cname = mdesccat.group(1)
            if cname not in self.catalog_manager._catalogs:
                raise ValueError(f"catalog {cname!r} does not exist")
            rows = [
                ("name", cname),
                ("type", "generic_in_memory"),
                ("comment", ""),
            ]
            return self.spark.createDataFrame(
                rows, "info_name string, info_value string"
            )
        if re.match(r"^SHOW\s+CURRENT\s+CATALOG\s*;?\s*$", stmt, re.IGNORECASE):
            # SqlShowCurrentCatalog.java — one row, reference column name
            return self.spark.createDataFrame(
                [(self.catalog_manager.current_catalog,)],
                "`current catalog name` string",
            )
        if re.match(r"^SHOW\s+CURRENT\s+DATABASE\s*;?\s*$", stmt, re.IGNORECASE):
            return self.spark.createDataFrame(
                [(self.catalog_manager.current_database(),)],
                "`current database name` string",
            )
        # catalog statements (SqlCreateCatalog.java / SqlUseCatalog.java /
        # SqlShowCatalogs.java / SqlDropCatalog) — resolved by the
        # CatalogManager; only the in-memory type exists in this env
        mcc = re.match(
            r"^CREATE\s+CATALOG\s+(\w+)(?:\s+WITH\s*\((?P<props>[^)]*)\))?\s*;?\s*$",
            stmt, re.IGNORECASE,
        )
        if mcc:
            from flink_1_16_0_src_spark.catalog import GenericInMemoryCatalog

            props = _parse_props(mcc.group("props") or "")
            ctype = props.get("type", "generic_in_memory")
            if ctype != "generic_in_memory":
                raise NotImplementedError(
                    f"catalog type {ctype!r}: only generic_in_memory exists "
                    "in this environment (hive/jdbc catalogs need external "
                    "services)"
                )
            self.catalog_manager.register_catalog(
                mcc.group(1), GenericInMemoryCatalog(self.spark, mcc.group(1))
            )
            return None
        muc = re.match(r"^USE\s+CATALOG\s+(\w+)\s*;?\s*$", stmt, re.IGNORECASE)
        if muc:
            self.catalog_manager.use_catalog(muc.group(1))
            return None
        if re.match(r"^SHOW\s+CATALOGS\s*;?\s*$", stmt, re.IGNORECASE):
            rows = [(n,) for n in sorted(self.catalog_manager._catalogs)]
            return self.spark.createDataFrame(rows, "catalog_name string")
        mdc = re.match(r"^DROP\s+CATALOG\s+(\w+)\s*;?\s*$", stmt, re.IGNORECASE)
        if mdc:
            name = mdc.group(1)
            if name == self.catalog_manager.current_catalog:
                raise ValueError(f"cannot drop the current catalog {name!r}")
            self.catalog_manager._catalogs.pop(name, None)
            return None
        stmt = translate_hints(stmt)
        # Flink EXPLAIN syntax (SqlRichExplain: EXPLAIN [PLAN FOR] <q>)
        # → Spark's EXPLAIN <q>
        stmt = re.sub(r"^EXPLAIN\s+PLAN\s+FOR\s+", "EXPLAIN ", stmt, flags=re.IGNORECASE)
        # Flink spells temporary-object drops with the keyword
        # (SqlDropView/SqlDropTable isTemporary); Spark's temp views
        # drop via plain DROP VIEW
        stmt = re.sub(
            r"^DROP\s+TEMPORARY\s+(VIEW|TABLE)\b", r"DROP \1", stmt,
            flags=re.IGNORECASE,
        )
        # EXPLAIN with ExplainDetails (SqlRichExplain + ExplainDetail
        # enum; explain.md "ExplainDetails"): ESTIMATED_COST → Spark's
        # cost mode (optimizer Statistics per node), JSON_EXECUTION_PLAN
        # → executedPlan().toJSON() (a real JSON execution plan),
        # CHANGELOG_MODE → formatted plan + the insert-only annotation
        # (batch/micro-batch relations are [I]; retraction streams in
        # this engine are explicit __rowkind columns, so per-node
        # changelog traits don't exist — documented deviation).
        mex = re.match(
            r"^EXPLAIN\s+((?:ESTIMATED_COST|CHANGELOG_MODE|JSON_EXECUTION_PLAN)"
            r"(?:\s*,\s*(?:ESTIMATED_COST|CHANGELOG_MODE|JSON_EXECUTION_PLAN))*)\s+"
            r"(?P<q>.+)$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if mex:
            details = {d.strip().upper() for d in mex.group(1).split(",")}
            body = self._rewrite_flink_clauses(mex.group("q"))
            qe = self.spark.sql(body)._jdf.queryExecution()
            jvm_mode = self.spark._jvm.org.apache.spark.sql.execution.ExplainMode
            parts = []
            if "ESTIMATED_COST" in details:
                parts.append(qe.explainString(jvm_mode.fromString("cost")))
            if "CHANGELOG_MODE" in details:
                parts.append(
                    "changelogMode=[I] (insert-only batch/micro-batch "
                    "relations; retractions are explicit __rowkind rows)\n"
                    + qe.explainString(jvm_mode.fromString("simple"))
                )
            if "JSON_EXECUTION_PLAN" in details:
                parts.append(qe.executedPlan().toJSON())
            return self.spark.createDataFrame(
                [("\n\n".join(parts),)], "plan string"
            )
        stmt = self._rewrite_flink_clauses(stmt)
        mi = _INSERT_INTO.match(stmt)
        if mi and mi.group(2) in self._sinks:
            from flink_1_16_0_src_spark import sources as srcs

            sink = self._sinks[mi.group(2)]
            df, static_parts = self._build_insert_df(
                sink, mi.group("collist"), mi.group("body")
            )
            mode = "overwrite" if mi.group(1).upper() == "OVERWRITE" else "append"
            srcs.write_table(
                df,
                sink["props"].get("path"),
                sink["connector"],
                sink["props"].get("format", "parquet"),
                # the statement's INTO/OVERWRITE keyword wins over any
                # DDL-declared sink.mode (SqlInsert.isOverwrite parity)
                {**sink["props"], "sink.mode": mode},
                partitioned_by=sink.get("partitioned_by")
                or (list(static_parts) or None),
            )
            return None
        return self.spark.sql(stmt)

    def _build_insert_df(
        self, sink: dict, collist: str | None, rest,
        spark: SparkSession | None = None,
    ) -> "tuple[DataFrame, dict]":
        """Shared INSERT body preparation for execute_sql and
        StatementSet.add_insert_sql: static ``PARTITION (...)`` clause
        (typed constant columns — SqlPartitionUtils.getPartitionKVs),
        column-list mapping with typed NULL fill, Flink clause/hint
        rewriting of the query body. ``spark`` overrides the planning
        session (the streaming statement set plans inside foreachBatch,
        whose micro-batch frame lives in a CLONED session — temp views
        registered there are invisible to the main one).

        ``rest`` may also be an already-built DataFrame (r13: the
        statement-set accumulator path hands its merged frame over
        directly) — then no SQL text is parsed or planned here, only
        the column-list/positional mapping to the sink schema applies
        (a static PARTITION clause has no text to ride in on)."""
        spark = spark or self.spark
        if isinstance(rest, DataFrame):
            static_parts, df = {}, rest
        else:
            static_parts, body = _parse_static_partition(rest)
            df = spark.sql(
                self._rewrite_flink_clauses(translate_hints(body), spark=spark)
            )
        declared = {}
        if sink.get("schema"):
            from pyspark.sql.types import StructType

            declared = {
                f.name: f.dataType
                for f in StructType.fromDDL(sink["schema"]).fields
            }
        df = _apply_insert_column_list(df, collist, declared)
        if declared and not collist:
            # no column list: Flink maps the query to the declared sink
            # schema POSITIONALLY (names don't matter, arity does) —
            # static-partition columns are excluded from the mapping
            targets = [c for c in declared if c not in static_parts]
            if len(df.columns) == len(targets):
                df = df.toDF(*targets)
        for k, v in static_parts.items():
            lit = F.lit(v)
            if k in declared:
                lit = lit.cast(declared[k])
            df = df.withColumn(k, lit)
        return df, static_parts

    def _parse_create_table(
        self, name: str, schema_txt: str | None, partcols_txt: str | None,
        props_txt: str | None,
    ) -> dict:
        """Parse the schema/partition/WITH pieces of a CREATE TABLE into
        the registration dict _register_parsed consumes (the CatalogTable
        the reference's SqlCreateTableConverter builds)."""
        props = _parse_props(props_txt or "")
        partcols = [
            c.strip() for c in (partcols_txt or "").split(",") if c.strip()
        ]
        cols: list[str] = []
        metadata_cols: dict[str, str] = {}
        computed_cols: dict[str, str] = {}
        proctime_cols: list[str] = []
        watermark: tuple[str, str] | None = None
        primary_key: list[str] | None = None
        pk_name: str | None = None
        if schema_txt:
            swm = re.search(
                r"WATERMARK\s+FOR\s+(\w+)\s+AS\s+SOURCE_WATERMARK\s*\(\s*\)",
                schema_txt, re.IGNORECASE,
            )
            if swm:
                # SOURCE_WATERMARK() is a marker the CONNECTOR must
                # replace with its own strategy (BuiltInFunctionDefinitions
                # .java:132 SOURCE_WATERMARK; its default implementation throws
                # because none of the file/values connectors here emit
                # one — the same TableException the reference raises).
                raise ValueError(
                    "WATERMARK FOR "
                    f"{swm.group(1)} AS SOURCE_WATERMARK(): none of this "
                    "catalog's connectors provide a source watermark; "
                    "declare a bounded-delay watermark instead "
                    "(col - INTERVAL 'n' UNIT)"
                )
            wm = _WATERMARK_SPEC.search(schema_txt)
            if wm:
                unit = wm.group(3).upper().rstrip("S") + (
                    "S" if float(wm.group(2)) != 1 else ""
                )
                watermark = (wm.group(1), f"{wm.group(2)} {unit}")
            from flink_1_16_0_src_spark.sql_clauses import _split_top_commas

            for c in _split_top_commas(schema_txt):
                c = c.strip()
                if "WATERMARK" in c.upper():
                    continue
                # table constraint `[CONSTRAINT name] PRIMARY KEY (cols)
                # NOT ENFORCED` (SqlTableConstraint.java; Flink REQUIRES
                # NOT ENFORCED — the engine doesn't own the data, so it
                # cannot guarantee the constraint, UniqueConstraint.java)
                pk = re.match(
                    r"(?:CONSTRAINT\s+(\w+)\s+)?PRIMARY\s+KEY\s*\(([^)]*)\)"
                    r"(\s+NOT\s+ENFORCED)?\s*$",
                    c,
                    re.IGNORECASE,
                )
                if pk:
                    if pk.group(3) is None:
                        raise ValueError(
                            f"table {name!r}: PRIMARY KEY must be declared NOT "
                            "ENFORCED (Flink rejects enforced mode — the "
                            "engine does not own the data)"
                        )
                    primary_key = [
                        k.strip().strip("`") for k in pk.group(2).split(",")
                    ]
                    pk_name = pk.group(1)
                    continue
                # `name TYPE METADATA [FROM 'key'] [VIRTUAL]` —
                # SqlTableColumn.SqlMetadataColumn: routed from the
                # connector's metadata, not the payload
                md = re.match(
                    r"(\w+)\s+\w+(?:\(\d+(?:,\d+)?\))?\s+METADATA(?:\s+FROM\s+'(\w+)')?",
                    c,
                    re.IGNORECASE,
                )
                if md:
                    metadata_cols[md.group(1)] = md.group(2) or md.group(1)
                    continue
                # computed column (SqlTableColumn.SqlComputedColumn):
                # `name AS expr` — evaluated on read, PROCTIME() maps
                # to current_timestamp()
                cc = re.match(r"(\w+)\s+AS\s+(.+)$", c, re.IGNORECASE | re.DOTALL)
                if cc:
                    if re.search(r"PROCTIME\s*\(\s*\)", cc.group(2), re.IGNORECASE):
                        proctime_cols.append(cc.group(1))
                    computed_cols[cc.group(1)] = re.sub(
                        r"PROCTIME\s*\(\s*\)", "current_timestamp()",
                        cc.group(2).strip(), flags=re.IGNORECASE,
                    )
                    continue
                cols.append(_normalize_flink_type(c))
        return {
            "cols": cols,
            "props": props,
            "partcols": partcols,
            "metadata_cols": metadata_cols,
            "computed_cols": computed_cols,
            "proctime_cols": proctime_cols,
            "watermark": watermark,
            "primary_key": primary_key,
            "pk_name": pk_name,
        }

    def _register_parsed(self, name: str, reg: dict) -> DataFrame | None:
        """Register a parsed CREATE TABLE: connector dispatch (the old
        _CREATE_TABLE_WITH branch body), now shared by plain CREATE,
        CREATE ... LIKE, and ALTER re-registration."""
        from flink_1_16_0_src_spark import sources as srcs

        props = reg["props"]
        connector = props.get("connector", "filesystem")
        fmt = props.get("format", "parquet")
        schema = ", ".join(reg["cols"]) or None
        self._registrations[name] = reg
        if reg["watermark"] is not None:
            self._watermarks[name] = reg["watermark"]
        for pc in reg.get("proctime_cols", ()):
            # processing-time attribute (ProctimeAttribute in the
            # reference): FOR SYSTEM_TIME AS OF <this col> = lookup join
            self._proctimes.setdefault(name, pc)
        if connector in ("print", "blackhole"):
            self._sinks[name] = {"connector": connector, "props": props}
            return None
        if connector == "datagen":
            # SEQUENCE fields (DataGenTableSourceFactory: 'fields.<f>.
            # kind'='sequence' + start/end) make datagen a BOUNDED
            # DETERMINISTIC source — the reference's fixture generator
            # for exactly-reproducible tests; random kinds stay the
            # unbounded rate stream (engine-reproducible randomness is
            # not part of the datagen contract there either).
            seq = {}
            for key, v in props.items():
                mk = re.match(r"fields\.(\w+)\.kind$", key)
                if mk and v == "sequence":
                    f = mk.group(1)
                    seq[f] = (
                        int(props[f"fields.{f}.start"]),
                        int(props[f"fields.{f}.end"]),
                    )
            if seq and not schema:
                # mirror the equal-length / mixed-kind validations:
                # sequence props without a parsed schema must not fall
                # through to the unbounded random rate stream.
                raise ValueError(
                    "datagen: sequence field props require a column "
                    "schema in the CREATE TABLE (the bounded sequence "
                    "source derives row types from it)"
                )
            if seq and schema:
                from pyspark.sql.types import StructType

                st = StructType.fromDDL(schema)
                lens = {e - s + 1 for s, e in seq.values()}
                if len(lens) != 1:
                    raise ValueError(
                        "datagen: sequence fields must have equal "
                        "lengths (the generator zips them positionally)"
                    )
                missing = [f.name for f in st.fields if f.name not in seq]
                if missing:
                    raise ValueError(
                        f"datagen: fields {missing} need 'fields.<f>."
                        "kind'='sequence' — random kinds are the "
                        "unbounded rate stream, not mixable with the "
                        "bounded sequence source"
                    )
                df = self.spark.range(lens.pop()).select(
                    *[
                        (F.col("id") + F.lit(seq[f.name][0]))
                        .cast(f.dataType)
                        .alias(f.name)
                        for f in st.fields
                    ]
                )
                df.createOrReplaceTempView(name)
                return df
            df = srcs.datagen_source(
                self.spark, int(props.get("rows-per-second", "100"))
            )
            df.createOrReplaceTempView(name)
            return df
        if connector in ("kafka", "upsert-kafka"):
            df = srcs.kafka_source(self.spark, props)
            if schema:
                # declared schema ⇒ run the format's value
                # deserializer (KafkaDynamicSource wires the
                # DeserializationSchema the same way); without one,
                # expose the raw key/value/metadata frame
                df = srcs.kafka_value_decode(
                    df,
                    schema,
                    fmt=props.get("value.format", props.get("format", "json")),
                    props=props,
                    tombstones=connector == "upsert-kafka",
                    metadata=reg["metadata_cols"] or None,
                )
            for cname, cexpr in reg["computed_cols"].items():
                df = df.withColumn(cname, F.expr(cexpr))
            df = self._apply_overlay(df, reg)
            df.createOrReplaceTempView(name)
            return df
        if connector == "jdbc":
            # register lazily: Spark's jdbc reader connects at load()
            # for schema inference, so defer until first use — the
            # same laziness as Flink's JdbcDynamicTableSource, which
            # only connects when the scan runs
            self._sources[name] = props
            self._sinks[name] = {"connector": connector, "props": props}
            return None
        if connector == "filesystem":
            if "path" not in props:
                raise ValueError(
                    f"table {name!r}: connector 'filesystem' requires a "
                    "'path' property (WITH ('path'='...'))"
                )
            path = props["path"]
            if not os.path.exists(path.removeprefix("file://")):
                # path doesn't exist yet → it's a sink table
                self._sinks[name] = {
                    "connector": connector,
                    "props": props,
                    "partitioned_by": reg["partcols"],
                    "schema": schema,
                }
                return None
            df = srcs.read_table(self.spark, path, fmt, schema, props)
            for cname, cexpr in reg["computed_cols"].items():
                df = df.withColumn(cname, F.expr(cexpr))
            df = self._apply_overlay(df, reg)
            df.createOrReplaceTempView(name)
            self._sources[name] = props
            return df
        raise NotImplementedError(f"connector {connector!r}")

    @staticmethod
    def _apply_overlay(df: DataFrame, reg: dict) -> DataFrame:
        """Re-apply ALTER TABLE ADD/MODIFY schema evolution recorded on
        the registration (see _alter_table) after a re-registration."""
        for op, cname, ctype in reg.get("alter_overlay", ()):
            if op == "add":
                df = df.withColumn(cname, F.lit(None).cast(ctype))
            else:
                df = df.withColumn(cname, F.col(cname).cast(ctype))
        return df

    def _create_table_like(self, m: "re.Match") -> DataFrame | None:
        """CREATE TABLE ... LIKE (SqlCreateTableLike.java:71 +
        SqlTableLike.java merge options). Physical columns are always
        inherited (new declarations append); OPTIONS / WATERMARKS /
        GENERATED / METADATA / PARTITIONS merge per the
        INCLUDING / EXCLUDING / OVERWRITING strategy list — default
        ``INCLUDING ALL OVERWRITING OPTIONS`` as in the reference."""
        name, base = m.group(1), m.group("base")
        braw = self._registrations.get(base)
        if braw is None:
            raise ValueError(
                f"CREATE TABLE ... LIKE: base table {base!r} has no DDL "
                "registration in this session"
            )
        new = self._parse_create_table(
            name, m.group("schema"), m.group("partcols"), m.group("props")
        )
        # merge strategies: feature -> including|excluding|overwriting
        strat = {
            "options": "overwriting", "watermarks": "including",
            "generated": "including", "metadata": "including",
            "partitions": "including", "constraints": "including",
        }
        for mm in re.finditer(
            r"(INCLUDING|EXCLUDING|OVERWRITING)\s+"
            r"(ALL|OPTIONS|WATERMARKS|GENERATED|METADATA|PARTITIONS|CONSTRAINTS)",
            m.group("opts") or "",
            re.IGNORECASE,
        ):
            mode, feat = mm.group(1).lower(), mm.group(2).lower()
            if feat == "all":
                for k in strat:
                    strat[k] = mode
            else:
                strat[feat] = mode

        base_names = {c.split()[0].lower() for c in braw["cols"]}
        dup = [c.split()[0] for c in new["cols"] if c.split()[0].lower() in base_names]
        if dup:
            raise ValueError(f"LIKE: duplicate physical column(s) {dup}")

        def _merge_dict(feat: str, bval: dict, nval: dict) -> dict:
            mode = strat[feat]
            if mode == "excluding":
                return dict(nval)
            if mode == "including":
                conflict = {k for k in set(bval) & set(nval) if bval[k] != nval[k]}
                if conflict:
                    raise ValueError(
                        f"LIKE INCLUDING {feat.upper()}: conflicting entries "
                        f"{sorted(conflict)} (use OVERWRITING {feat.upper()})"
                    )
            return {**bval, **nval}

        def _pick(feat: str, bval, nval):
            mode = strat[feat]
            if mode == "excluding":
                return nval
            if mode == "including" and nval and bval and nval != bval:
                raise ValueError(
                    f"LIKE INCLUDING {feat.upper()}: the derived table "
                    f"re-declares {feat} (use OVERWRITING {feat.upper()})"
                )
            return nval or bval

        reg = {
            "cols": braw["cols"] + new["cols"],
            "props": _merge_dict("options", braw["props"], new["props"]),
            "partcols": _pick("partitions", braw["partcols"], new["partcols"]),
            "metadata_cols": _merge_dict(
                "metadata", braw["metadata_cols"], new["metadata_cols"]
            ),
            "computed_cols": _merge_dict(
                "generated", braw["computed_cols"], new["computed_cols"]
            ),
            "watermark": _pick("watermarks", braw["watermark"], new["watermark"]),
            # PRIMARY KEY rides the CONSTRAINTS strategy (SqlTableLike
            # FeatureOption.CONSTRAINTS)
            "primary_key": _pick(
                "constraints", braw.get("primary_key"), new.get("primary_key")
            ),
            "pk_name": _pick("constraints", braw.get("pk_name"), new.get("pk_name")),
            # an ALTERed base hands its evolved schema down
            "alter_overlay": list(braw.get("alter_overlay", ())),
        }
        return self._register_parsed(name, reg)

    def _alter_table(self, name: str, rest: str) -> DataFrame | None:
        """ALTER TABLE RENAME TO / SET (...) / ADD ... / MODIFY ...
        (SqlAlterTableRename / SqlAlterTableOptions.java /
        SqlAlterTableAdd.java / SqlAlterTableModify.java). DDL-registered
        tables re-register; everything else passes to Spark's own ALTER."""
        from flink_1_16_0_src_spark.sql_clauses import _split_top_commas

        rest = rest.strip().rstrip(";").strip()
        mren = re.match(r"^RENAME\s+TO\s+(\w+)\s*$", rest, re.IGNORECASE)
        if mren:
            new_name = mren.group(1)
            self.catalog_manager.get_catalog().rename_table(name, new_name)
            for d in (self._registrations, self._sources, self._sinks,
                      self._watermarks):
                if name in d:
                    d[new_name] = d.pop(name)
            return None
        mset = re.match(r"^SET\s*\((.*)\)\s*$", rest, re.IGNORECASE | re.DOTALL)
        if mset:
            reg = self._registrations.get(name)
            if reg is None:
                raise ValueError(
                    f"ALTER TABLE {name!r} SET: not a DDL-registered table"
                )
            reg["props"].update(_parse_props(mset.group(1)))
            # re-register so a source table re-reads with the new
            # options (format/path/csv knobs take effect immediately)
            self._register_parsed(name, reg)
            return None
        mreset = re.match(r"^RESET\s*\((.*)\)\s*$", rest, re.IGNORECASE | re.DOTALL)
        if mreset:
            # SqlAlterTableReset.java: drop the listed option keys so the
            # table falls back to defaults; the connector key is the
            # table's identity and cannot be reset (AlterTableResetOperation
            # validation in OperationConverterUtils)
            reg = self._registrations.get(name)
            if reg is None:
                raise ValueError(
                    f"ALTER TABLE {name!r} RESET: not a DDL-registered table"
                )
            keys = [
                k.strip().strip("'\"") for k in mreset.group(1).split(",") if k.strip()
            ]
            if not keys:
                raise ValueError("ALTER TABLE RESET requires at least one key")
            if "connector" in keys:
                raise ValueError("ALTER TABLE RESET cannot reset 'connector'")
            for k in keys:
                reg["props"].pop(k, None)
            self._register_parsed(name, reg)
            return None
        mcompact = re.match(
            r"^(?:PARTITION\s*\((?P<spec>[^)]*)\)\s+)?COMPACT\s*$", rest, re.IGNORECASE
        )
        if mcompact:
            return self._compact_table(name, mcompact.group("spec"))
        maddpk = re.match(
            r"^ADD\s+(?:CONSTRAINT\s+(\w+)\s+)?PRIMARY\s+KEY\s*\(([^)]*)\)"
            r"(\s+NOT\s+ENFORCED)?\s*$",
            rest, re.IGNORECASE,
        )
        if maddpk:
            # SqlAlterTableAddConstraint.java: PK is catalog metadata
            # (NOT ENFORCED mandatory — UniqueConstraint.java)
            reg = self._registrations.get(name)
            if reg is None:
                raise ValueError(
                    f"ALTER TABLE {name!r} ADD CONSTRAINT: not a DDL-registered table"
                )
            if maddpk.group(3) is None:
                raise ValueError(
                    "PRIMARY KEY must be declared NOT ENFORCED (Flink rejects "
                    "enforced mode — the engine does not own the data)"
                )
            if reg.get("primary_key"):
                raise ValueError(f"table {name!r} already has a primary key")
            reg["primary_key"] = [
                k.strip().strip("`") for k in maddpk.group(2).split(",")
            ]
            reg["pk_name"] = maddpk.group(1)
            return None
        mdroppk = re.match(
            r"^DROP\s+(?:CONSTRAINT\s+(\w+)|PRIMARY\s+KEY)\s*$", rest, re.IGNORECASE
        )
        if mdroppk:
            # SqlAlterTableDropConstraint.java (named or bare form)
            reg = self._registrations.get(name)
            if reg is None or not reg.get("primary_key"):
                raise ValueError(f"table {name!r} has no primary key to drop")
            cname = mdroppk.group(1)
            if cname and reg.get("pk_name") and cname != reg["pk_name"]:
                raise ValueError(
                    f"table {name!r} has no constraint named {cname!r}"
                )
            reg["primary_key"] = None
            reg["pk_name"] = None
            return None
        # normalize Spark's `ADD COLUMNS (...)` spelling onto Flink's
        # `ADD (...)` so both route identically
        rest_n = re.sub(
            r"^(ADD|MODIFY)\s+COLUMNS?\s*", r"\1 ", rest, flags=re.IGNORECASE
        )
        madd = re.match(
            r"^(ADD|MODIFY)\s*(?:\((?P<multi>.*)\)|(?P<single>\w+\s+.+))\s*$",
            rest_n, re.IGNORECASE | re.DOTALL,
        )
        if madd:
            op = madd.group(1).upper()
            coldefs = [
                _normalize_flink_type(c.strip())
                for c in _split_top_commas(madd.group("multi") or madd.group("single"))
                if c.strip()
            ]
            reg = self._registrations.get(name)
            if reg is None:
                # permanent Spark table: delegate (ADD COLUMNS supported)
                if op == "ADD":
                    return self.spark.sql(
                        f"ALTER TABLE {name} ADD COLUMNS ({', '.join(coldefs)})"
                    )
                raise ValueError(
                    f"ALTER TABLE {name!r} MODIFY: not a DDL-registered table"
                )
            # schema evolution lands as an OVERLAY (applied on the live
            # view now AND re-applied by _register_parsed on any future
            # re-registration) rather than editing reg["cols"]: tables
            # whose schema was inferred from files have empty cols, and
            # a partial declared schema would PRUNE the other columns on
            # the next read
            df = self.spark.table(name)
            live = {c.lower() for c in df.columns}
            overlay: list = reg.setdefault("alter_overlay", [])
            for cd in coldefs:
                parts = cd.split(None, 1)
                if len(parts) != 2:
                    raise ValueError(f"ALTER TABLE {op}: bad column def {cd!r}")
                cname, ctype = parts[0], parts[1].strip()
                if op == "ADD":
                    if cname.lower() in live:
                        raise ValueError(f"ALTER TABLE ADD: column {cname!r} exists")
                    # files lack the new column → null of the declared
                    # type on the live view (schema evolution on read)
                    df = df.withColumn(cname, F.lit(None).cast(ctype))
                    live.add(cname.lower())
                else:  # MODIFY: retype in place via cast-on-read
                    if cname.lower() not in live:
                        raise ValueError(
                            f"ALTER TABLE MODIFY: no column {cname!r}"
                        )
                    df = df.withColumn(cname, F.col(cname).cast(ctype))
                overlay.append((op.lower(), cname, ctype))
            df.createOrReplaceTempView(name)
            return None
        # anything else (DROP COLUMNS, table properties Spark-style, …)
        # keeps the old passthrough behavior
        return self.spark.sql(f"ALTER TABLE {name} {rest}")

    def _compile_plan(
        self, file: str, if_not_exists: bool, dml: str, execute: bool
    ) -> DataFrame | None:
        """COMPILE [AND EXECUTE] PLAN (FLIP-190 — SqlCompilePlan.java:41,
        SqlCompileAndExecutePlan.java; TableEnvironmentImpl
        .compilePlanAndWrite): persist a DML pipeline to a plan file that
        EXECUTE PLAN can run in a later session. Overwrite rules match
        the reference: an existing file is an error, IF NOT EXISTS skips
        compilation, and SET 'table.plan.force-recompile'='true'
        overwrites (TableConfigOptions.PLAN_FORCE_RECOMPILE).

        Honest scope: the reference freezes the physical plan at
        exec-node granularity so a later MINOR version replays it
        byte-stable. Catalyst neither serializes nor replays physical
        plans, so the persisted artifact here is the logical contract —
        the DML text plus the catalog registrations (CatalogTable
        snapshots) and SET overrides it depends on — and EXECUTE PLAN
        re-derives the physical plan under the restored environment.
        Plan-freezing across engine upgrades is documented out of scope
        in COVERAGE."""
        import json

        dml = dml.strip().rstrip(";").strip()
        if re.match(r"^STATEMENT\s+SET", dml, re.IGNORECASE):
            dml = "EXECUTE " + dml
        force = self._set_overrides.get("table.plan.force-recompile") == "true"
        if os.path.exists(file) and not force:
            if not if_not_exists:
                raise ValueError(
                    f"COMPILE PLAN: {file!r} exists — use IF NOT EXISTS or "
                    "SET 'table.plan.force-recompile'='true'"
                )
        else:
            words = set(re.findall(r"\w+", dml))
            plan = {
                "version": 1,
                "statement": dml,
                "registrations": {
                    n: r for n, r in self._registrations.items() if n in words
                },
                "set_overrides": self._set_overrides,
            }
            os.makedirs(os.path.dirname(file) or ".", exist_ok=True)
            with open(file, "w") as f:
                json.dump(plan, f, indent=1)
        if execute:
            return self._execute_plan(file)
        return None

    def _execute_plan(self, file: str) -> DataFrame | None:
        """EXECUTE PLAN (SqlExecutePlan.java; TableEnvironmentImpl
        .executePlan): restore the plan file's environment — catalog
        registrations the current session lacks, then SET overrides —
        and run its DML through the normal dispatch."""
        import json

        with open(file) as f:
            plan = json.load(f)
        for name, reg in plan.get("registrations", {}).items():
            if name in self._registrations:
                continue  # current session's definition wins (same-name rule)
            if reg.get("watermark") is not None:
                reg["watermark"] = tuple(reg["watermark"])
            self._register_parsed(name, reg)
        for k, v in plan.get("set_overrides", {}).items():
            if k not in self._set_overrides:
                self.execute_sql(f"SET '{k}' = '{v}'")
        return self.execute_sql(plan["statement"])

    def _compact_table(self, name: str, spec_txt: str | None) -> None:
        """ALTER TABLE [PARTITION(...)] COMPACT (SqlAlterTableCompact
        .java:33; the small-file compaction the reference's filesystem
        sink runs under 'auto-compaction' — FileSystemConnectorOptions
        .java:232, compact operators under flink-connector-files
        .../table/stream/compact/). Routes to sources.compact_partitions
        on the table's path (or one partition directory), honoring the
        'compaction.file-size' option (MemorySize syntax, default 128mb),
        then re-registers the view so the next query lists the new files.

        Scale: compaction is itself a distributed job — each executor
        rewrites its share and only the directory swap is driver-side.
        Run per partition as it closes, not table-wide."""
        from flink_1_16_0_src_spark import sources as srcs

        reg = self._registrations.get(name)
        props = (reg or {}).get("props") or self._sources.get(name) or {}
        if props.get("connector") != "filesystem" or "path" not in props:
            raise ValueError(
                f"ALTER TABLE {name} COMPACT: only filesystem-connector "
                "tables with a 'path' can be compacted"
            )
        partcols = (reg or {}).get("partcols") or []
        path = props["path"]
        partitioned_by: list[str] | None = partcols or None
        if spec_txt is not None:
            spec: dict[str, str] = {}
            for item in spec_txt.split(","):
                item = item.strip()
                if not item:
                    continue
                if "=" not in item:
                    raise ValueError(
                        f"ALTER TABLE {name} COMPACT: partition spec must be "
                        f"fully valued, got bare key {item!r}"
                    )
                k, v = item.split("=", 1)
                spec[k.strip().strip("`")] = v.strip().strip("'\"")
            # hive layout: the spec must cover a directory PREFIX of the
            # declared partition columns
            if list(spec) != partcols[: len(spec)]:
                raise ValueError(
                    f"ALTER TABLE {name} COMPACT: partition spec {list(spec)} "
                    f"must be a prefix of the partition columns {partcols}"
                )
            path = path.rstrip("/") + "".join(
                f"/{k}={spec[k]}" for k in partcols[: len(spec)]
            )
            remaining = partcols[len(spec):]
            partitioned_by = remaining or None

        size_txt = props.get("compaction.file-size", "128mb")
        msize = re.match(r"^\s*(\d+)\s*([kmg]?b)?\s*$", size_txt, re.IGNORECASE)
        if not msize:
            raise ValueError(f"bad compaction.file-size {size_txt!r}")
        mult = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3}[
            (msize.group(2) or "b").lower()
        ]
        srcs.compact_partitions(
            self.spark,
            path,
            props.get("format", "parquet"),
            partitioned_by=partitioned_by,
            target_file_size_bytes=int(msize.group(1)) * mult,
        )
        if reg is not None:
            self._register_parsed(name, reg)
        else:
            srcs.read_table(
                self.spark, props["path"], props.get("format", "parquet")
            ).createOrReplaceTempView(name)
        return None

    def _analyze_table(self, m: "re.Match") -> None:
        """ANALYZE TABLE (FLIP-240, new in 1.16 — SqlAnalyzeTable.java;
        semantics AnalyzeTableUtil.java:70-117): compute CatalogTable-
        Statistics (row count) and, under FOR [ALL] COLUMNS, per-column
        CatalogColumnStatistics — nullCount for every column, plus
        ndv/max/min for numeric/date/timestamp, ndv/avgLen/maxLen for
        strings, trueCount/falseCount for booleans (AnalyzeTableUtil
        .getColumnStatsSelects :170-233) — and store them through the
        catalog's alter*Statistics SPI with the reference's per-column
        merge (:121-135). NDV uses APPROX_COUNT_DISTINCT exactly as the
        reference does (:183) — stats feed the cost model, so a sketch
        is the right accuracy/cost point at scale.

        Spark-first deviation: for a partition spec with bare keys the
        reference loops one scan PER PARTITION (:82-97). Here all
        requested partitions are computed in ONE grouped aggregate pass
        (group by the bare keys) — one distributed scan instead of P,
        the difference between a night and a coffee at 100 TB."""
        from pyspark.sql import functions as F

        from flink_1_16_0_src_spark.catalog import (
            CatalogColumnStatistics,
            CatalogColumnStatisticsData,
            CatalogTableStatistics,
        )

        name = m.group("name")
        df = self.spark.table(name)
        partcols = (self._registrations.get(name) or {}).get("partcols") or []

        # -- partition-spec validation (SqlAnalyzeTable.java rules:
        # partitioned tables require a full-key spec; non-partitioned
        # tables reject PARTITION) --------------------------------------
        spec: dict[str, str | None] = {}
        if m.group("parts") is not None:
            if not partcols:
                raise ValueError(
                    f"ANALYZE TABLE {name}: not a partitioned table, "
                    "PARTITION() is invalid"
                )
            for item in m.group("parts").split(","):
                item = item.strip()
                if not item:
                    continue
                if "=" in item:
                    k, v = item.split("=", 1)
                    spec[k.strip().strip("`")] = v.strip()
                else:
                    spec[item.strip("`")] = None
            missing = [p for p in partcols if p not in spec]
            if missing:
                raise ValueError(
                    f"ANALYZE TABLE {name}: partition spec must name every "
                    f"partition column; missing {missing}"
                )
        elif partcols:
            raise ValueError(
                f"ANALYZE TABLE {name} is partitioned — PARTITION(...) "
                "is required (TablePartitionedException parity)"
            )

        # -- column selection -------------------------------------------
        dtypes = dict(df.dtypes)
        if m.group("allcols"):
            columns = [c for c in df.columns if c not in spec]
        elif m.group("cols"):
            columns = [c.strip().strip("`") for c in m.group("cols").split(",") if c.strip()]
            unknown = [c for c in columns if c not in dtypes]
            if unknown:
                raise ValueError(f"ANALYZE TABLE {name}: no such columns {unknown}")
        else:
            columns = []

        def _type_class(dt: str) -> str:
            dt = dt.lower()
            if dt == "boolean":
                return "bool"
            if dt.startswith(
                ("tinyint", "smallint", "int", "bigint", "float", "double",
                 "decimal", "date", "timestamp")
            ):
                return "num"
            if dt.startswith(("string", "varchar", "char")):
                return "str"
            return "other"  # arrays/maps/binary: nullCount only (ref default:229)

        aggs = [F.count(F.lit(1)).alias("rowCount")]
        for c in columns:
            qc = F.col(c)
            aggs.append((F.count(F.lit(1)) - F.count(qc)).alias(f"{c}__nullCount"))
            tc = _type_class(dtypes[c])
            if tc in ("num", "str"):
                aggs.append(F.approx_count_distinct(qc).alias(f"{c}__ndv"))
            if tc == "num":
                aggs.append(F.max(qc).alias(f"{c}__max"))
                aggs.append(F.min(qc).alias(f"{c}__min"))
            elif tc == "str":
                aggs.append(
                    F.avg(F.length(qc).cast("double")).alias(f"{c}__avgLen")
                )
                aggs.append(
                    F.max(F.length(qc).cast("bigint")).alias(f"{c}__maxLen")
                )
            elif tc == "bool":
                aggs.append(
                    F.count(F.when(qc == True, 1)).alias(f"{c}__trueCount")  # noqa: E712
                )
                aggs.append(
                    F.count(F.when(qc == False, 1)).alias(f"{c}__falseCount")  # noqa: E712
                )

        valued = {k: v for k, v in spec.items() if v is not None}
        bare = [k for k, v in spec.items() if v is None]
        for k, v in valued.items():
            df = df.where(F.expr(f"`{k}` = {v}"))
        grouped = df.groupBy(*[F.col(k) for k in bare]).agg(*aggs) if spec else df.agg(*aggs)
        rows = grouped.collect()  # one row per analyzed partition — catalog
        # metadata, bounded by the partition count, never data-sized

        def _col_stats(row) -> CatalogColumnStatistics:
            data = {}
            for c in columns:
                d = CatalogColumnStatisticsData(null_count=row[f"{c}__nullCount"])
                tc = _type_class(dtypes[c])
                if tc in ("num", "str"):
                    d.ndv = row[f"{c}__ndv"]
                if tc == "num":
                    d.min, d.max = row[f"{c}__min"], row[f"{c}__max"]
                elif tc == "str":
                    d.avg_len, d.max_len = row[f"{c}__avgLen"], row[f"{c}__maxLen"]
                elif tc == "bool":
                    d.true_count = row[f"{c}__trueCount"]
                    d.false_count = row[f"{c}__falseCount"]
                data[c] = d
            return CatalogColumnStatistics(data)

        cat = self.catalog_manager.get_catalog()
        if spec:
            for row in rows:
                row_spec = dict(valued)
                row_spec.update({k: row[k] for k in bare})
                cat.alter_partition_statistics(
                    name, row_spec, CatalogTableStatistics(row["rowCount"])
                )
                if columns:
                    cat.alter_partition_column_statistics(
                        name, row_spec, _col_stats(row)
                    )
        else:
            row = rows[0]
            cat.alter_table_statistics(name, CatalogTableStatistics(row["rowCount"]))
            if columns:
                cat.alter_table_column_statistics(name, _col_stats(row))
        return None

    def _show_create_table(self, name: str) -> DataFrame:
        """SHOW CREATE TABLE (SqlShowCreateTable.java → ShowCreateUtil):
        reconstruct the Flink DDL from the registration — declared or
        inferred schema, watermark, ALTER overlays, PARTITIONED BY, and
        the WITH options. Non-DDL tables delegate to Spark's own
        SHOW CREATE TABLE."""
        reg = self._registrations.get(name)
        if reg is None:
            return self.spark.sql(f"SHOW CREATE TABLE {name}")
        cols = list(reg["cols"])
        if not cols:
            # schema was inferred from the files — reconstruct from the
            # live view (ShowCreateUtil prints the resolved schema too)
            try:
                cols = [f"{c} {t.upper()}" for c, t in self.spark.table(name).dtypes]
            except Exception:
                cols = []
        for cname, key in reg["metadata_cols"].items():
            cols.append(
                f"{cname} METADATA" + (f" FROM '{key}'" if key != cname else "")
            )
        for cname, cexpr in reg["computed_cols"].items():
            cols.append(f"{cname} AS {cexpr}")
        for op, cname, ctype in reg.get("alter_overlay", ()):
            if op == "add":
                cols.append(f"{cname} {ctype}")
            else:
                cols = [
                    f"{cname} {ctype}" if c.split()[0].lower() == cname.lower() else c
                    for c in cols
                ]
        if reg.get("primary_key"):
            named = (
                f"CONSTRAINT {reg['pk_name']} " if reg.get("pk_name") else ""
            )
            cols.append(
                f"{named}PRIMARY KEY ({', '.join(reg['primary_key'])}) NOT ENFORCED"
            )
        if reg["watermark"] is not None:
            wcol, dl = reg["watermark"]
            amount, unit = dl.split(" ", 1)
            cols.append(
                f"WATERMARK FOR {wcol} AS {wcol} - INTERVAL '{amount}' {unit}"
            )
        lines = [f"CREATE TABLE {name} ("]
        lines.append(",\n".join(f"  {c}" for c in cols))
        lines.append(")")
        if reg["partcols"]:
            lines.append(f"PARTITIONED BY ({', '.join(reg['partcols'])})")
        props = ",\n".join(
            f"  '{k}' = '{v}'" for k, v in sorted(reg["props"].items())
        )
        lines.append(f"WITH (\n{props}\n)")
        ddl = "\n".join(lines)
        return self.spark.createDataFrame([(ddl,)], "result string")

    def _show_partitions(self, name: str, spec_txt: str | None) -> DataFrame:
        """SHOW PARTITIONS t [PARTITION(spec)] (SqlShowPartitions —
        TableEnvironmentImpl.java:1353-1380: catalog.listPartitions,
        rows are 'k1=v1/k2=v2' strings in one 'partition name' column).
        Partitions are discovered from the hive-layout directories under
        the table's path — the same listing the filesystem connector's
        partition discovery does; at 100 TB this is catalog/metastore
        metadata, never a data scan."""
        reg = self._registrations.get(name)
        props = (reg or {}).get("props") or self._sources.get(name) or {}
        partcols = (reg or {}).get("partcols") or []
        if not partcols or props.get("connector") != "filesystem":
            raise ValueError(
                f"SHOW PARTITIONS {name}: not a partitioned filesystem table"
            )
        want: dict[str, str] = {}
        if spec_txt:
            for item in spec_txt.split(","):
                if "=" in item:
                    k, v = item.split("=", 1)
                    want[k.strip().strip("`")] = v.strip().strip("'\"")
        base = props["path"].removeprefix("file://").rstrip("/")

        def _walk(d: str, depth: int) -> list[list[str]]:
            if depth == len(partcols):
                return [[]]
            out = []
            prefix = partcols[depth] + "="
            for entry in sorted(os.listdir(d)):
                full = os.path.join(d, entry)
                if os.path.isdir(full) and entry.startswith(prefix):
                    for rest in _walk(full, depth + 1):
                        out.append([entry] + rest)
            return out

        rows = []
        for kvs in _walk(base, 0):
            spec = dict(kv.split("=", 1) for kv in kvs)
            if all(spec.get(k) == v for k, v in want.items()):
                rows.append(("/".join(kvs),))
        return self.spark.createDataFrame(rows, "`partition name` string")

    def _show_columns(
        self, name: str, pattern: str | None, negated: bool = False
    ) -> DataFrame:
        """SHOW COLUMNS (FROM|IN) t [[NOT] LIKE 'p'] (SqlShowColumns —
        reference output is the DESCRIBE shape: name/type/null/key/
        extras/watermark; LIKE uses SQL %/_ wildcards)."""
        df = self.spark.table(name)
        wm = self._watermarks.get(name)
        pk = (self._registrations.get(name) or {}).get("primary_key") or []
        pk_label = f"PRI({', '.join(pk)})" if pk else None
        rows = []
        for field in df.schema.fields:
            if pattern is not None:
                rex = re.escape(pattern).replace("%", ".*").replace("_", ".")
                hit = re.fullmatch(rex, field.name) is not None
                if hit == negated:
                    continue
            rows.append(
                (
                    field.name,
                    field.dataType.simpleString().upper(),
                    field.nullable,
                    pk_label if field.name in pk else None,
                    None,
                    f"`{wm[0]}` AS `{wm[0]}` - INTERVAL '{wm[1]}'"
                    if wm and wm[0] == field.name
                    else None,
                )
            )
        return self.spark.createDataFrame(
            rows,
            "name string, type string, null boolean, key string, "
            "extras string, watermark string",
        )

    def _rewrite_flink_clauses(
        self, sql: str, spark: SparkSession | None = None
    ) -> str:
        """Window-TVF + MATCH_RECOGNIZE SQL surface (sql_clauses.py):
        TUMBLE/HOP/CUMULATE/SESSION(TABLE t, DESCRIPTOR(ts), ...) and
        t MATCH_RECOGNIZE (...) lower onto operators.windows /
        operators.cep before Catalyst parses the statement. ``spark``
        overrides the resolving session (foreachBatch plans against
        the micro-batch's CLONED session, whose temp views the main
        session cannot see)."""
        if re.search(
            r"MATCH_RECOGNIZE|TABLE\s*\(\s*(TUMBLE|HOP|CUMULATE|SESSION)"
            r"|FOR\s+SYSTEM_TIME\s+AS\s+OF|LATERAL\s+TABLE"
            r"|\b(TUMBLE|HOP|SESSION)\s*\(",  # legacy group windows
            sql,
            re.IGNORECASE,
        ):
            from flink_1_16_0_src_spark.sql_clauses import rewrite_flink_clauses

            # temporal joins resolve the versioned table's time
            # attribute from its DDL WATERMARK declaration; proctime
            # attributes route FOR SYSTEM_TIME AS OF to the lookup join
            return rewrite_flink_clauses(
                spark or self.spark, sql,
                time_attrs={t: col for t, (col, _d) in self._watermarks.items()},
                temporal_fns=self._temporal_fns,
                proctime_attrs=set(self._proctimes.values()),
            )
        return sql

    def create_temporal_table_function(
        self, name: str, history, time_attr: str, primary_key: str
    ) -> None:
        """Table.createTemporalTableFunction parity (TableImpl.java →
        TemporalTableFunctionImpl.java): register ``history`` (a
        DataFrame or a registered table name) as a temporal table
        function; SQL can then write ``LATERAL TABLE (name(probe.ts))``
        and the clause rewriter lowers it onto the as-of join
        operator."""
        df = history if isinstance(history, DataFrame) else self.spark.table(history)
        # 4th slot: a process-unique registration token. The streaming
        # lowering keys its materialized-history parquet cache by it —
        # id(df) is NOT safe (a re-registration can free the old frame
        # and a new frame may reuse the same id, resurrecting a stale
        # history dir).
        from flink_1_16_0_src_spark import sql_clauses as _sc

        self._temporal_fns[name] = (
            df, time_attr, primary_key, next(_sc._TTF_REGISTRATION_COUNTER),
        )

    def sql_query(self, sql: str) -> DataFrame:
        return self.spark.sql(self._rewrite_flink_clauses(translate_hints(sql)))

    def create_statement_set(self) -> "StatementSet":
        """TableEnvironment.createStatementSet (T-API
        StatementSet.java): buffer INSERTs, execute as one shared-plan
        job."""
        return StatementSet(self)

    def create_stream_statement_set(self) -> "StreamStatementSet":
        """StreamTableEnvironment.createStatementSet
        (StreamStatementSetImpl.java): buffer streaming INSERTs sharing
        ONE DDL source scan, drain as a single streaming job."""
        return StreamStatementSet(self)

    # ---- DataStream <-> Table bridges (SURVEY §3.3;
    # flink-table-api-java-bridge StreamTableEnvironment) --------------

    def from_data_stream(self, ds, watermark: tuple[str, str] | None = None) -> DataFrame:
        """StreamTableEnvironment.fromDataStream: a DataStream becomes a
        Table; an optional ``(ts_col, delay)`` declares the event-time
        attribute (Schema.watermark parity) via withWatermark."""
        df = ds.df if hasattr(ds, "df") else ds
        return df.withWatermark(*watermark) if watermark else df

    def to_data_stream(self, table: DataFrame):
        """StreamTableEnvironment.toDataStream (insert-only)."""
        from flink_1_16_0_src_spark.datastream import DataStream

        return DataStream(table)

    def to_changelog_stream(
        self, table: DataFrame, keys: list[str] | None = None, order_col: str | None = None
    ) -> DataFrame:
        """StreamTableEnvironment.toChangelogStream: expose a table's
        changelog as ``__rowkind``-stamped rows. Insert-only (no keys):
        every row is ``+I``. With ``keys`` + ``order_col``: the per-key
        version history replays as +I for the first version, then a
        -U(previous image)/+U(current image) pair per later version —
        pure lag()-window Catalyst expressions, no Python (the batch
        twin of ``streaming.stateful.changelog_normalize``)."""
        if not keys:
            return table.withColumn("__rowkind", F.lit("+I"))
        assert order_col, "keys require an order_col to sequence versions"
        from pyspark.sql import Window as W

        vals = [c for c in table.columns if c not in keys]
        w = W.partitionBy(*keys).orderBy(order_col)
        # window exprs can't live under explode — materialize lags first
        staged = table.select(
            *keys,
            *vals,
            *[F.lag(c).over(w).alias(f"__prev_{c}") for c in vals],
            F.row_number().over(w).alias("__vn"),
        )
        cur = F.struct(*[F.col(c).alias(c) for c in vals])
        prev = F.struct(*[F.col(f"__prev_{c}").alias(c) for c in vals])

        def pair(img, rk: str):
            return F.struct(img.alias("img"), F.lit(rk).alias("rk"))

        pairs = F.when(F.col("__vn") == 1, F.array(pair(cur, "+I"))).otherwise(
            F.array(pair(prev, "-U"), pair(cur, "+U"))
        )
        out = staged.select(*keys, F.explode(pairs).alias("__e"))
        return out.select(
            *keys,
            *[F.col(f"__e.img.{c}").alias(c) for c in vals],
            F.col("__e.rk").alias("__rowkind"),
        )

    def from_changelog_stream(
        self, df: DataFrame, keys: list[str], order_col: str
    ) -> DataFrame:
        """StreamTableEnvironment.fromChangelogStream: materialize a
        ``__rowkind``-stamped changelog back into a table — last
        add-image (+I/+U) per key wins; a key whose latest change is
        ``-D`` disappears (the ChangelogNormalize-then-upsert path)."""
        from pyspark.sql import Window as W

        w = W.partitionBy(*keys).orderBy(F.col(order_col).desc())
        latest = (
            df.where(F.col("__rowkind") != "-U")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
        )
        return latest.where(F.col("__rowkind") != "-D").drop("__rn", "__rowkind")

    def table(self, name: str) -> DataFrame:
        """Resolve a DDL-registered table. Filesystem/kafka tables are
        already temp views; lazily-registered jdbc tables connect here
        (first use), then register so SQL sees them too."""
        props = self._sources.get(name)
        if props is not None and props.get("connector") == "jdbc":
            from flink_1_16_0_src_spark import sources as srcs

            df = srcs.jdbc_source(self.spark, props)
            df.createOrReplaceTempView(name)
            return df
        return self.spark.table(name)

    def stream(self, name: str, options: dict | None = None) -> DataFrame:
        """Open a DDL-registered filesystem table as a STREAMING frame
        with its declared watermark applied (SqlWatermark.java →
        withWatermark). The batch view registered by execute_sql stays
        untouched; this is the streaming-side bridge of the same table.
        ``options`` pass through to the reader (e.g.
        maxFilesPerTrigger to force multi-batch drains in tests)."""
        props = self._sources.get(name)
        if props is None:
            raise ValueError(f"{name!r} was not registered by execute_sql DDL")
        schema = self.spark.table(name).schema
        reader = self.spark.readStream.schema(schema)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        path = props["path"]
        if os.path.isfile(path):
            # the file-stream source monitors a DIRECTORY; expose a
            # single-file table through a symlink dir (same trick as
            # streaming.sources.stream_table, no data copy)
            import tempfile as _tf

            link_dir = os.path.join(
                _tf.gettempdir(), "spark_graft_streams",
                f"ddl_{abs(hash(path))}_{name}",
            )
            os.makedirs(link_dir, exist_ok=True)
            link = os.path.join(link_dir, os.path.basename(path))
            if not os.path.exists(link):
                os.symlink(path, link)
            path = link_dir
        from flink_1_16_0_src_spark.streaming.sources import note_source_bytes

        note_source_bytes(path)
        sdf = getattr(reader, props.get("format", "parquet"))(path)
        if name in self._watermarks:
            sdf = sdf.withWatermark(*self._watermarks[name])
        return sdf

    def create_streaming_view(self, name: str, sql: str) -> DataFrame:
        """CREATE TEMPORARY VIEW over a STREAMING pipeline —
        TableEnvironmentImpl.createTemporaryView; the reference expands
        views at plan time and optimizes the whole multi-operator
        statement DAG as one graph
        (StreamCommonSubGraphBasedOptimizer.scala:49). The body
        compiles through stream_query, so it may be any streamable
        statement (projection/filter, interval join, window TVF agg,
        ...); the resulting STREAMING relation registers under
        ``name`` and later stream_query statements compose over it —
        as a TVF table argument (``TABLE name``), an OVER / Top-N
        source, a plain FROM, or a join side. DataFrames are lazy
        plans, so eager compilation here IS the reference's plan-time
        view expansion (nothing executes until a sink starts)."""
        df = self.stream_query(sql)
        df.createOrReplaceTempView(name)
        self._stream_views[name] = sql
        return df

    def from_path(self, path: str, fmt: str = "parquet") -> DataFrame:
        return getattr(self.spark.read, fmt)(path)

    def from_elements(self, elements, schema=None) -> DataFrame:
        """PyFlink TableEnvironment.from_elements parity: an in-memory
        VALUES relation (same operation the SQL VALUES clause plans)."""
        return self.spark.createDataFrame(elements, schema)

    def execute_streaming_insert(self, sql: str, checkpoint: str | None = None):
        """The production streaming statement: ``INSERT INTO <sink>
        SELECT ... FROM TABLE(TUMBLE|HOP(...)) ...`` executed in
        STREAMING mode (StreamTableEnvironment.executeSql on an
        insert). The body compiles via stream_query (streaming TVF
        resolution, struct regrouping), the sink spec comes from its
        DDL registration, and the bounded source drains with
        availableNow — Flink's batch-over-stream unified execution.
        Returns after the drain completes (TableResult.await parity).
        """
        import tempfile as _tf

        mi = _INSERT_INTO.match(sql.strip())
        if not mi or mi.group(2) not in self._sinks:
            raise ValueError(
                "execute_streaming_insert needs INSERT INTO <DDL sink> SELECT ..."
            )
        sink = self._sinks[mi.group(2)]
        if mi.group(1).upper() == "OVERWRITE":
            raise ValueError("streaming INSERT is append-only (no OVERWRITE)")
        out = self.stream_query(mi.group("body"))
        # same FLIP-219 column-list contract as the batch INSERT path:
        # listed target columns map positionally, declared-but-unlisted
        # columns null-fill (all projection ops — streamable)
        declared = {}
        if sink.get("schema"):
            from pyspark.sql.types import StructType

            declared = {
                f.name: f.dataType
                for f in StructType.fromDDL(sink["schema"]).fields
            }
        out = _apply_insert_column_list(out, mi.group("collist"), declared)
        if declared and not mi.group("collist") and len(out.columns) == len(declared):
            out = out.toDF(*declared)
        writer = out.writeStream.trigger(availableNow=True).option(
            "checkpointLocation",
            checkpoint or _tf.mkdtemp(prefix="spark_graft_ckpt_"),
        )
        conn = sink["connector"]
        from flink_1_16_0_src_spark.streaming.sources import (
            _scoped_shuffle_partitions,
            derived_stream_partitions,
        )

        with _scoped_shuffle_partitions(
            self.spark, derived_stream_partitions(self.spark, out)
        ):
            if conn == "filesystem":
                q = writer.format(sink["props"].get("format", "parquet")).option(
                    "path", sink["props"]["path"]
                ).outputMode("append").start()
            elif conn in ("blackhole", "print"):
                q = writer.format("noop").outputMode("append").start()
            else:
                raise ValueError(
                    f"streaming insert: unsupported sink connector {conn!r}"
                )
            q.awaitTermination()
        return q

    def stream_query(self, sql: str, _nested: int = 0) -> DataFrame:
        """Run window-TVF SQL text in STREAMING mode (the
        EnvironmentSettings.inStreamingMode() sqlQuery path): every
        ``TABLE(TUMBLE|HOP|CUMULATE(...))`` whose table was registered
        by DDL resolves to its streaming frame (declared watermark
        applied), the windowed view is a streaming relation, and the
        surrounding SELECT compiles to a streaming plan — feed the
        result to writeStream / streaming.sources.run_to_memory.

        All four window TVFs stream (SqlSessionTableFunction.java,
        SliceAssigners.java:61-94): SESSION regroups onto Spark's
        merging ``session_window`` aggregate (the batch gaps-and-islands
        rewrite uses lag() windows, not streamable); CUMULATE resolves
        to the slice-explode view whose plain window_start/window_end
        grouping can't prove append closure — drain it in UPDATE mode
        with availableNow (the stream_cumulate_drain contract).

        STATEMENT COMPOSITION (r10, depth lifted r11 — the reference
        plans arbitrary multi-operator streaming DAGs from one
        statement, StreamCommonSubGraphBasedOptimizer.scala:49):
        parenthesized FROM-subqueries compile recursively to ANY
        depth (each recursion peels one subquery off a strictly
        smaller statement), and relations registered via
        :meth:`create_streaming_view` compose everywhere a named
        table can appear (TVF table argument, OVER / Top-N source,
        plain FROM, join side) — so ``filter → join → TVF agg``,
        ``subquery → OVER``, ``UNION ALL → group agg``, and
        ``view → continuous Top-N`` are each ONE statement. The
        canonical Top-N / window Top-N ROW_NUMBER statements keep
        their dedicated StreamExecRank / StreamExecWindowRank paths."""
        import re as _re

        from flink_1_16_0_src_spark.sql_clauses import (
            _GW_CALL,
            _statement_from_kw as _statement_from_kw_early,
            rewrite_group_windows,
            rewrite_window_tvfs,
        )

        def resolver(name: str) -> DataFrame:
            if name in self._sources:
                return self.stream(name)
            return self.spark.table(name)

        out = translate_hints(sql)
        # Statement composition — the reference plans arbitrary
        # multi-operator streaming DAGs from a single statement
        # (StreamCommonSubGraphBasedOptimizer.scala:49; exec nodes
        # compose freely): a parenthesized FROM-subquery compiles
        # RECURSIVELY (any depth) to a streaming relation that the
        # outer statement's lowerings (TVF agg, OVER, plain SQL,
        # joins) consume as an ordinary named relation. The canonical
        # Top-N statement (inner ROW_NUMBER) keeps its dedicated
        # StreamExecRank path below.
        # A window TVF's table argument may itself be a parenthesized
        # subquery — TABLE(TUMBLE(TABLE (SELECT ...), DESCRIPTOR ...))
        # — compiled recursively like any FROM-subquery, so
        # filter-subquery → join-subquery → TVF agg is ONE statement
        # (the reference's planner nests Calc/Join under the window
        # agg exec node the same way).
        while True:
            mtvf = _re.search(
                r"(?:TUMBLE|HOP|CUMULATE|SESSION)\s*\(\s*(?:DATA\s*=>\s*)?"
                r"(?P<t>TABLE)\s*\(",
                out, _re.IGNORECASE,
            )
            if mtvf is None:
                break
            from flink_1_16_0_src_spark.sql_clauses import _balanced

            open_idx = mtvf.end() - 1
            close = _balanced(out, open_idx)
            inner = out[open_idx + 1 : close - 1].strip()
            if not _re.match(r"^SELECT\b", inner, _re.IGNORECASE):
                raise ValueError(
                    "streaming TVF: TABLE ( ... ) argument must be a "
                    "SELECT subquery (a plain table name needs no "
                    "parentheses)"
                )
            if _nested > 32:
                raise ValueError(
                    "streaming SQL: FROM-subquery nesting deeper than "
                    "32 levels — register an inner statement as a "
                    "streaming view (create_streaming_view)"
                )
            sub_df = self.stream_query(inner, _nested=_nested + 1)
            view = f"__stream_sub_{next(_STREAM_SUB_SEQ)}"
            sub_df.createOrReplaceTempView(view)
            out = out[: mtvf.start("t")] + "TABLE " + view + out[close:]
        fk0 = _statement_from_kw_early(out)
        if fk0 is not None:
            msub = _re.match(r"FROM\s*\(", out[fk0:], _re.IGNORECASE)
            if msub:
                from flink_1_16_0_src_spark.sql_clauses import (
                    _balanced,
                    _unquoted_text,
                )

                open_idx = fk0 + msub.end() - 1
                close = _balanced(out, open_idx)
                inner = out[open_idx + 1 : close - 1].strip()
                if _re.match(r"^SELECT\b", inner, _re.IGNORECASE) and not _re.search(
                    r"\bROW_NUMBER\s*\(", _unquoted_text(inner), _re.IGNORECASE
                ):
                    # arbitrary depth (VERDICT r10 next #4): each
                    # recursion peels exactly one FROM-subquery off a
                    # strictly smaller statement, so nesting unwinds
                    # to any depth without a view — the reference
                    # plans arbitrary-depth DAGs from one statement
                    # (StreamCommonSubGraphBasedOptimizer.scala:49).
                    # _nested caps runaway input, far above real SQL.
                    if _nested > 32:
                        raise ValueError(
                            "streaming SQL: FROM-subquery nesting "
                            "deeper than 32 levels — register an "
                            "inner statement as a streaming view "
                            "(create_streaming_view)"
                        )
                    sub_df = self.stream_query(inner, _nested=_nested + 1)
                    view = f"__stream_sub_{next(_STREAM_SUB_SEQ)}"
                    sub_df.createOrReplaceTempView(view)
                    out = out[:fk0] + "FROM " + view + out[close:]
        if _re.search(r"\bMATCH_RECOGNIZE\b", out, _re.IGNORECASE):
            # streaming MATCH_RECOGNIZE (StreamExecMatch): the NFA runs
            # in the per-key stateful buffer; the lowered view is a
            # streaming relation the surrounding SELECT composes over
            from flink_1_16_0_src_spark.sql_clauses import (
                rewrite_match_recognize,
            )

            out = rewrite_match_recognize(
                self.spark, out, resolver=resolver, streaming=True
            )
        if _re.search(r"\bLATERAL\s+TABLE\b", out, _re.IGNORECASE):
            # legacy temporal table FUNCTION join in streaming mode —
            # the classic rates example; lowers onto the same as-of
            # state machine as FOR SYSTEM_TIME (TemporalTableFunction
            # Impl.java / TemporalRowTimeJoinOperator)
            from flink_1_16_0_src_spark.sql_clauses import (
                lower_streaming_temporal_fn,
            )

            def _ttf_resolve(nm: str):
                for s in self._sources:
                    if s.lower() == nm.lower():
                        return self.stream(s), self._watermarks.get(s)
                raise ValueError(
                    f"streaming LATERAL TABLE: unknown DDL table {nm!r}"
                )

            return lower_streaming_temporal_fn(
                out, _ttf_resolve, self._temporal_fns, self.spark
            )
        specs: list[dict] = []
        out = rewrite_window_tvfs(
            self.spark, out, resolver, keep_struct=True, specs=specs,
        )
        if _GW_CALL.search(out):
            # legacy GROUP BY TUMBLE/HOP/SESSION(...) streaming syntax —
            # the pre-FLIP-145 classic; same struct-regroup path as the
            # TVFs (SESSION contributes a session_window spec)
            out = rewrite_group_windows(
                self.spark, out, resolver, keep_struct=True, specs=specs
            )
        # processing-time temporal joins (lookup joins): the dim side of
        # ``JOIN d FOR SYSTEM_TIME AS OF probe.<proctime>`` is the
        # CURRENT batch snapshot (StreamExecLookupJoin) — drop the
        # marker (stream-static join, Spark-native) and pin those dims
        # to their batch views in the streaming substitution below.
        # Event-time AS OF needs the custom as-of state machine — point
        # there instead of planning a wrong join.
        lookup_dims: set[str] = set()
        if _re.search(r"FOR\s+SYSTEM_TIME\s+AS\s+OF", out, _re.IGNORECASE):
            from flink_1_16_0_src_spark.sql_clauses import rewrite_lookup_join

            proctimes = set(self._proctimes.values())
            for jm in _re.finditer(
                r"JOIN\s+(\w+)(?:\s+(?:AS\s+)?\w+)?\s+FOR\s+SYSTEM_TIME"
                r"\s+AS\s+OF\s+([\w.]+)",
                out, _re.IGNORECASE,
            ):
                if jm.group(2).split(".")[-1] in proctimes:
                    lookup_dims.add(jm.group(1).lower())
            out = rewrite_lookup_join(out, proctimes)
            if _re.search(r"FOR\s+SYSTEM_TIME\s+AS\s+OF", out, _re.IGNORECASE):
                # event-time AS OF: lower onto the as-of state machine
                # (StreamExecTemporalJoin.java:77 →
                # TemporalRowTimeJoinOperator; VERDICT r8 #4)
                from flink_1_16_0_src_spark.sql_clauses import (
                    lower_streaming_temporal_join,
                )

                def _tj_resolve(nm: str):
                    for s in self._sources:
                        if s.lower() == nm.lower():
                            return self.stream(s), self._watermarks.get(s)
                    raise ValueError(
                        f"streaming temporal join: unknown DDL table "
                        f"{nm!r} — both sides must be CREATE TABLE "
                        "sources"
                    )

                return lower_streaming_temporal_join(out, _tj_resolve)
        # plain (non-TVF) references to DDL sources stream too: an
        # interval join / filter / agg over raw attributes is a valid
        # streaming statement in the reference (StreamExecIntervalJoin
        # et al.) — substitute each remaining source-table token with a
        # streaming temp view of it (declared watermark applied).
        # Quote-aware so string literals are untouched.
        for name in self._sources:
            if name.lower() in lookup_dims:
                continue
            pat = rf"(?<![\w.]){_re.escape(name)}(?![\w.])"
            if not _re.search(pat, out, _re.IGNORECASE):
                continue
            sview = f"__stream_src_{name}"
            self.stream(name).createOrReplaceTempView(sview)
            parts = _re.split(r"('(?:[^']|'')*')", out)
            out = "".join(
                p if i % 2 else _re.sub(pat, sview, p, flags=_re.IGNORECASE)
                for i, p in enumerate(parts)
            )
        # streaming OVER aggregation has no Catalyst lowering (Spark
        # rejects non-time windows on streams at sink start with an
        # opaque error) — lower the single-spec SELECT ... OVER ...
        # FROM t statement onto the custom stateful operators
        # (StreamExecOverAggregate.java:91 ≈ streaming/stateful.py
        # streaming_over_unbounded / streaming_over_bounded).
        # MATCH_RECOGNIZE's own OVER usage was consumed by the lowering
        # above; statements mixing window TVFs with OVER are out of
        # scope (the reference plans them as separate exec nodes —
        # compose via two statements).
        unquoted = "".join(
            p for i, p in enumerate(_re.split(r"('(?:[^']|'')*')", out))
            if i % 2 == 0
        )
        if _re.search(r"\bROW_NUMBER\s*\(", unquoted, _re.IGNORECASE):
            if specs:
                # window Top-N: ROW_NUMBER partitioned by window_start,
                # window_end over a window TVF — StreamExecWindowRank
                # (EXEC-S/StreamExecWindowRank.java:77); lowers onto the
                # append-mode top-k-per-closed-window composition
                from flink_1_16_0_src_spark.sql_clauses import (
                    lower_streaming_window_topn,
                )

                return lower_streaming_window_topn(out, specs)
            # the canonical Top-N pattern (row_number-filter over an
            # OVER window) plans as StreamExecRank, never as a window —
            # FlinkLogicalRankRule parity; must run before the generic
            # OVER lowering, whose aggregate set excludes ranks
            from flink_1_16_0_src_spark.sql_clauses import (
                lower_streaming_topn,
            )

            return lower_streaming_topn(out, self.spark.table)
        if _re.search(r"\bOVER\s*\(", unquoted, _re.IGNORECASE):
            if specs:
                raise ValueError(
                    "OVER aggregation combined with a window TVF in one "
                    "streaming statement: run the OVER pass as its own "
                    "statement (or use streaming.windows.window_topn "
                    "for window Top-N)"
                )
            from flink_1_16_0_src_spark.sql_clauses import (
                lower_streaming_over,
            )

            return lower_streaming_over(self.spark, out, self.spark.table)
        kinds = {s["fn"] for s in specs}
        if ("CUMULATE" in kinds or "SESSION" in kinds) and len(specs) != 1:
            raise ValueError(
                "streaming SESSION/CUMULATE SQL supports a single window "
                "TVF per statement"
            )
        if "CUMULATE" in kinds:
            return self.spark.sql(out)
        session_spec = next((s for s in specs if s["fn"] == "SESSION"), None)
        if session_spec is None:
            struct_tok = "__w"
        else:
            struct_tok = (
                f"session_window({session_spec['ts']},"
                f" '{session_spec['gap']}')"
            )
        start_ext, end_ext = f"{struct_tok}.start", f"{struct_tok}.end"
        # STREAMING aggregation must group by the TimeWindow struct —
        # only it carries the event-time attribute (extracted start/end
        # columns lose the watermark linkage and Spark rejects append
        # mode). Rewrite the canonical Flink shape: GROUP BY
        # window_start[, window_end][, keys] groups by __w instead, and
        # bare window_start / window_end SELECT items become struct
        # extracts with the same output names.
        def _regroup(m: _re.Match) -> str:
            entries = [e.strip() for e in m.group(1).split(",")]
            if not any(e.lower() in ("window_start", "window_end") for e in entries):
                return m.group(0)
            keep = [e for e in entries if e.lower() not in ("window_start", "window_end")]
            if session_spec is not None:
                # Flink sessions merge per PARTITION BY key regardless
                # of the grouping; Spark's session_window merges per
                # the full GROUP BY key set — require the declared keys
                # in the GROUP BY so the two agree
                keep_bare = [e.split(".")[-1].lower() for e in keep]
                missing = [
                    k for k in session_spec.get("keys", ())
                    if k.split(".")[-1].lower() not in keep_bare
                ]
                if missing:
                    raise ValueError(
                        f"streaming SESSION: PARTITION BY keys {missing} "
                        "must appear in GROUP BY (session merge scope)"
                    )
                declared = {
                    k.split(".")[-1].lower()
                    for k in session_spec.get("keys", ())
                }
                extra = [
                    e for e, b in zip(keep, keep_bare) if b not in declared
                ]
                if extra:
                    raise ValueError(
                        f"streaming SESSION: GROUP BY keys {extra} are not "
                        "in the TVF's PARTITION BY (session merge scope): "
                        "Flink merges sessions per PARTITION BY key only, "
                        "while Spark's session_window merges per the full "
                        "GROUP BY key set — extra grouping keys would change "
                        "window bounds and membership; add them to PARTITION "
                        "BY or drop them from GROUP BY"
                    )
            return "GROUP BY " + ", ".join([struct_tok] + keep)

        def _depth_at(s: str, idx: int) -> int:
            depth, i = 0, 0
            while i < idx:
                c = s[i]
                if c == "'":
                    i += 1
                    while i < len(s) and s[i] != "'":
                        i += 1
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                i += 1
            return depth

        # the struct regroup (and the SELECT-list extract rewrite after
        # it) contract the OUTERMOST query block only — a subquery's own
        # GROUP BY window_start would be rewritten onto the outer
        # block's struct alias, so nesting is rejected, not corrupted
        gb_pat = _re.compile(
            r"GROUP\s+BY\s+([\w.]+(?:\s*,\s*[\w.]+)*)", _re.IGNORECASE
        )
        pieces, pos = [], 0
        for m in gb_pat.finditer(out):
            entries = [e.strip().lower() for e in m.group(1).split(",")]
            windowed = any(e in ("window_start", "window_end") for e in entries)
            if _depth_at(out, m.start()) > 0:
                if windowed:
                    raise ValueError(
                        "GROUP BY window_start/window_end inside a subquery: "
                        "streaming SQL supports the single-block window "
                        "aggregate shape — restructure the statement or "
                        "compose via operators.windows + the streaming "
                        "Python API"
                    )
                continue
            pieces.append(out[pos : m.start()])
            pieces.append(_regroup(m))
            pos = m.end()
        out = "".join(pieces) + out[pos:]
        # SELECT-list occurrences become aliased struct extracts (the
        # output keeps the TVF column names); everywhere else (WHERE/
        # HAVING/ORDER BY) a bare extract — an alias there is invalid
        # statement-level FROM via the depth-0 quote-aware scan — a
        # SELECT-list FROM (TRIM/SUBSTRING/EXTRACT ... FROM ..., IS
        # DISTINCT FROM) must not shift the head/tail split, or the
        # window_start items after it lose their aliases
        from flink_1_16_0_src_spark.sql_clauses import _statement_from_kw

        fpos = _statement_from_kw(out)
        if fpos is None:
            fpos = len(out)
        head, tail = out[:fpos], out[fpos:]
        for tok, ext in (("window_start", start_ext), ("window_end", end_ext)):
            # one pass per token, consuming any explicit `AS alias` into
            # the match so an alias that is ITSELF named window_start
            # (e.g. `SESSION_START(...) AS window_start` after the aux
            # rewrite) is never re-substituted; a bare item keeps the
            # TVF column name as its alias
            head = _re.sub(
                rf"(?<![\w.]){tok}(?![\w.])(\s+AS\s+\w+)?",
                lambda m, e=ext, t=tok: (
                    e + m.group(1) if m.group(1) else f"{e} AS {t}"
                ),
                head, flags=_re.IGNORECASE,
            )
        tail = _re.sub(
            r"(?<![\w.])window_start(?![\w.])",
            lambda _m: start_ext, tail, flags=_re.IGNORECASE,
        )
        tail = _re.sub(
            r"(?<![\w.])window_end(?![\w.])",
            lambda _m: end_ext, tail, flags=_re.IGNORECASE,
        )
        return self.spark.sql(head + tail)


class StatementSet:
    """Multi-sink statement set — StatementSet.java (T-API) /
    StreamStatementSet parity. Flink optimizes all buffered INSERTs as
    ONE DAG, computing common sub-plans once
    (StreamCommonSubGraphBasedOptimizer.scala:49 splits the multi-sink
    DAG into shared sub-graphs). Spark has no multi-sink job, so
    ``execute()`` reproduces the sharing explicitly: it finds the
    maximal analyzed sub-plans appearing in 2+ buffered statements,
    persists each once (Spark's CacheManager then substitutes the
    cached relation into every consumer automatically), runs the sinks
    sequentially, and unpersists.

    Bare table scans are never persisted — re-reading columnar parquet
    is cheaper than materializing a 100 TB scan; sharing starts at the
    first non-leaf operator (filtered/projected/aggregated prefix).
    """

    def __init__(self, tenv: "TableEnvironment"):
        self._tenv = tenv
        # (sink_name, df, static_partition_cols | None)
        self._inserts: list[tuple[str, DataFrame, list[str] | None]] = []

    def add_insert(self, sink_name: str, df: DataFrame) -> "StatementSet":
        self._inserts.append((sink_name, df, None))
        return self

    def add_insert_sql(self, sql: str) -> "StatementSet":
        mi = _INSERT_INTO.match(sql.strip())
        if not mi:
            raise ValueError("statement must be INSERT INTO <sink> <query>")
        # the SAME body preparation as execute_sql's INSERT path
        # (_build_insert_df): hint/clause rewriting, column lists,
        # typed static partitions — SQL-text statement sets and single
        # INSERTs agree by construction
        sink = self._tenv._sinks.get(mi.group(2), {})
        df, static_parts = self._tenv._build_insert_df(
            sink, mi.group("collist"), mi.group("body")
        )
        self._inserts.append((mi.group(2), df, list(static_parts) or None))
        return self

    def _maximal_shared(self) -> list:
        """Maximal analyzed subtrees occurring in >= 2 statements
        (keyed by canonicalized semantic hash; leaves excluded)."""
        plans = [df._jdf.queryExecution().analyzed() for _, df, _sp in self._inserts]

        def subtrees(p, acc):
            acc.append(p)
            ch = p.children()
            for i in range(ch.size()):
                subtrees(ch.apply(i), acc)

        occur: dict[int, set] = {}
        node_by_key: dict[int, object] = {}
        for si, p in enumerate(plans):
            acc: list = []
            subtrees(p, acc)
            for t in acc:
                key = t.semanticHash()
                occur.setdefault(key, set()).add(si)
                node_by_key[key] = t
        shared = {k for k, s in occur.items() if len(s) > 1}

        maximal: dict[int, object] = {}

        def walk(p):
            key = p.semanticHash()
            if key in shared and p.children().size() > 0:
                maximal[key] = node_by_key[key]
                return  # don't descend: parent subsumes children
            ch = p.children()
            for i in range(ch.size()):
                walk(ch.apply(i))

        for p in plans:
            walk(p)
        return list(maximal.values())

    def execute(self) -> dict:
        from pyspark.sql import DataFrame as PyDataFrame

        from flink_1_16_0_src_spark import sources as srcs

        spark = self._tenv.spark
        cached: list[DataFrame] = []
        for jnode in self._maximal_shared():
            jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                spark._jsparkSession, jnode
            )
            pdf = PyDataFrame(jdf, spark)
            pdf.persist()
            cached.append(pdf)
        try:
            for sink_name, df, static_cols in self._inserts:
                sink = self._tenv._sinks.get(sink_name)
                if sink is None:
                    raise KeyError(f"unknown sink table {sink_name!r}")
                srcs.write_table(
                    df,
                    sink["props"].get("path"),
                    sink["connector"],
                    sink["props"].get("format", "parquet"),
                    # statement-set inserts are INSERT INTO → append,
                    # same precedence rule as execute_sql
                    {**sink["props"], "sink.mode": "append"},
                    partitioned_by=sink.get("partitioned_by")
                    or static_cols,
                )
        finally:
            for pdf in cached:
                pdf.unpersist()
        return {"statements": len(self._inserts), "shared_subplans": len(cached)}


_SSET_WIN_TVF = re.compile(
    r"TABLE\s*\(\s*(?P<fn>TUMBLE|HOP|CUMULATE)\s*\(\s*(?:DATA\s*=>\s*)?"
    r"TABLE\s+(?P<src>\w+)\s*,\s*"
    r"(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*(?P<ts>\w+)\s*\)\s*,\s*"
    r"(?P<i1>INTERVAL\s*'[^']+'\s*\w+)\s*"
    r"(?:,\s*(?P<i2>INTERVAL\s*'[^']+'\s*\w+)\s*)?\)\s*\)",
    re.IGNORECASE,
)
_SSET_SESSION_TVF = re.compile(
    r"TABLE\s*\(\s*SESSION\s*\(\s*(?:DATA\s*=>\s*)?"
    r"TABLE\s+(?P<src>\w+)"
    r"(?:\s+PARTITION\s+BY\s+(?P<keys>\w+(?:\s*,\s*\w+)*))?\s*,\s*"
    r"(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*(?P<ts>\w+)\s*\)\s*,\s*"
    r"(?:GAP\s*=>\s*)?(?P<gap>INTERVAL\s*'[^']+'\s*\w+)\s*\)\s*\)",
    re.IGNORECASE,
)
_SSET_AGG_HEAD = re.compile(
    r"\b(?:COUNT|SUM|AVG|MIN|MAX|STDDEV\w*|VAR\w*|LISTAGG|COLLECT|"
    r"FIRST_VALUE|LAST_VALUE|APPROX_COUNT_DISTINCT)\s*\(",
    re.IGNORECASE,
)


def _balanced_span(txt: str, start: int) -> int:
    """End index (exclusive) of the paren group opening at
    ``txt[start] == '('``."""
    d = 0
    for i in range(start, len(txt)):
        d += txt[i] == "("
        d -= txt[i] == ")"
        if d == 0:
            return i + 1
    return len(txt)


def _over_clauses(txt: str) -> list[tuple[int, int, str]]:
    """Each window-function expression ``fn(args) OVER (spec)`` in
    ``txt`` as (expr start, expr end, spec text) — the statement-set
    admission gate uses the spec to decide whether every OVER is
    window-scoped and the span to excise window functions before the
    bare-aggregate scan."""
    out: list[tuple[int, int, str]] = []
    for m in re.finditer(r"\bOVER\s*\(", txt, re.IGNORECASE):
        end = _balanced_span(txt, m.end() - 1)
        spec = txt[m.end():end - 1]
        j = m.start()
        while j > 0 and txt[j - 1].isspace():
            j -= 1
        fn_start = j
        if j > 0 and txt[j - 1] == ")":
            d, k = 0, j - 1
            while k >= 0:
                d += txt[k] == ")"
                d -= txt[k] == "("
                if d == 0:
                    break
                k -= 1
            k -= 1
            while k >= 0 and (txt[k].isalnum() or txt[k] == "_"):
                k -= 1
            fn_start = k + 1
        out.append((fn_start, end, spec))
    return out


class StreamStatementSet:
    """STREAMING multi-sink statement set — StreamStatementSetImpl.java
    (flink-table-api-bridge) parity: all buffered INSERTs optimize as
    ONE job and the shared source scan is computed once
    (StreamCommonSubGraphBasedOptimizer.scala:49 splits the multi-sink
    DAG into shared sub-graphs). Spark has no multi-sink streaming
    query, so ``execute()`` reproduces the sharing with the canonical
    Spark pattern: ONE streaming read of the common DDL source +
    ``foreachBatch`` that persists each micro-batch and plans every
    buffered INSERT over it — source listing, decode, and batch
    materialization happen once per batch regardless of how many sinks
    consume it.

    Statements over DIFFERENT streaming sources may share one set
    (r11): they group by source and each group runs as its own
    streaming query with its own provably-shared scan — identical to
    the reference, where common-subgraph sharing merges only
    IDENTICAL scans and disjoint sources are disjoint subgraphs of
    the one job. The receipt's ``streaming_queries`` counts the
    groups.

    Statement admission mirrors the per-batch execution model
    (VERDICT r10 "What's wrong" #2 closed the partial-aggregate hole):

    - STATELESS statements (projection / filter / batch-dim or lookup
      joins) re-plan per micro-batch — exact by construction.
    - TUMBLE window TVF aggregates (``GROUP BY window_start,
      window_end``) run with real cross-batch semantics: raw source
      rows stage per statement until the running watermark
      (max event time − DDL delay, WindowOperator.java contract)
      passes their window end, then the whole window is planned ONCE
      over its complete row set and appended — never a per-batch
      partial. Late rows whose window already closed are dropped,
      exactly like the engine's append-mode window aggregate. Staged
      state is bounded by (watermark delay + window size) of rows per
      statement, the same horizon the engine's own window state keeps.
    - HOP / CUMULATE TVF aggregates (r11): a row belongs to SEVERAL
      windows, so rows stage until their LAST covering window closes
      and emission post-filters the planned output on ``window_end``
      (which the SELECT list must expose, un-aliased) to windows
      closing in (previous watermark, current watermark] — every
      window emits exactly once with its complete row set.
    - Staging I/O (r12, VERDICT r11 #1): TUMBLE/HOP/CUMULATE staging
      is APPEND-ONLY — each batch writes ONLY its own still-open rows
      as a new parquet segment annotated with first/last covering
      window end; segments drop whole once the watermark passes their
      max end. Stage writes per batch are O(batch delta) — a row is
      written to staging at most once per drain (the manifest's
      ``staged_rows_cum`` is the receipt) — and emission planning
      reads only rows covering a window closing this batch, skipping
      batches whose watermark advance contains no window-end grid
      point: the reference's per-record O(delta) slicing
      (SlicingWindowOperator.java:101), not an O(horizon) rewrite.
    - SESSION TVF aggregates (r11): sessions MERGE, so a row's window
      identity isn't fixed on arrival — assignment is recomputed over
      staged ∪ new rows each batch, and a session is final (emitted
      once, complete) when the watermark passes max(ts)+gap: any
      surviving non-late future row necessarily starts a NEW session,
      the reference's purge-on-fire contract (WindowOperator.java /
      SessionWindowAssigner.java merging windows). SESSION keeps the
      per-batch rewrite — but of OPEN-session rows only, so its stage
      footprint is bounded by the live sessions, not the drain
      history. KEYLESS session assignment orders the whole open set
      in one window task (the global gap chain is inherently
      sequential); keyed sessions parallelize per key — bound the
      keyless form's open horizon via the watermark delay, or key the
      session (PARTITION BY) for scale.
    - Anything else stateful across batches (non-windowed GROUP BY /
      global aggregates, DISTINCT, OVER, MATCH_RECOGNIZE,
      and stream-stream joins) is REJECTED at add time:
      those need their own ``stream_query`` statement — one stateful
      pipeline per sink, the same granularity the reference gives each
      exec-node chain.

    Recovery (r11, SURVEY §7.3 risk 3 closed): with an explicit
    ``checkpoint`` dir, window staging + the running watermark persist
    INSIDE it next to Spark's offset log, tracked by an atomically-
    replaced manifest written after each batch's emissions — a
    killed-and-restarted (or re-executed) drain resumes mid-window:
    offsets skip consumed files, staged open windows carry over, and a
    replayed already-manifested batch is skipped (no duplicate
    emissions). Emissions to unpartitioned filesystem sinks are
    EXACTLY-ONCE end-to-end via a two-phase file commit (FileSink's
    pending→finalized rename protocol / TwoPhaseCommittingSink
    parity): each batch writes sink output to a pending dir, the
    manifest records the moves BEFORE any sink mutation, then
    idempotent renames finalize — a crash before the manifest
    recomputes the batch onto the overwritten pending dir (sinks
    untouched); a crash after it finishes the moves at the next
    startup. Partitioned / non-filesystem sinks keep the direct
    append (at-least-once on a mid-emit crash). Resuming requires
    the same statements in the same order (the manifest fingerprints
    them and rejects a mismatch)."""

    def __init__(self, tenv: "TableEnvironment"):
        self._tenv = tenv
        # (sink, collist | None, body SQL, source, kind, tumble-info)
        self._inserts: list[tuple[str, str | None, str, str, str, dict | None]] = []

    def _classify(
        self, unquoted: str, body: str, src_name: str
    ) -> tuple[str, dict | None]:
        """Admission gate: 'stateless' | 'tumble' (exact under the
        per-batch model) or ValueError for shapes whose per-batch
        re-planning would emit wrong (partial / duplicated) results
        under a multi-batch drain. Keyword scans run on the
        quote-stripped text; the TVF parse needs the RAW body (the
        INTERVAL literal lives in quotes)."""
        if re.search(r"\bMATCH_RECOGNIZE\b", unquoted, re.IGNORECASE):
            raise ValueError(
                "streaming statement set: MATCH_RECOGNIZE is stateful "
                "across micro-batches — run it as its own stream_query"
            )
        # OVER is admissible ONLY when every window function is scoped
        # to a (window_start, window_end) partition of a window TVF —
        # then each frame lives inside one watermark-closed window and
        # the per-window raw-row plan is exact (the reference's window
        # Top-N / window rank inside statement sets,
        # WindowRankProcessor.java). Validated below once the TVF is
        # known; unscoped OVER stays rejected. Scale note: these
        # statements stage the OPEN windows' full row sets (bounded by
        # watermark delay + window span — the generic raw-row bound),
        # not the k-bounded rank state the standalone stream_query
        # window Top-N keeps (streaming/windows.py window_topn,
        # TopNBuffer parity) — for very hot windows with a small k,
        # prefer the standalone form.
        overs = _over_clauses(unquoted)
        if re.search(r"\bSELECT\s+DISTINCT\b|\(\s*DISTINCT\b", unquoted,
                     re.IGNORECASE):
            raise ValueError(
                "streaming statement set: DISTINCT deduplicates across "
                "micro-batches — run it as its own stream_query"
            )
        gm = re.search(r"\bGROUP\s+BY\b(?P<keys>.*)$", unquoted,
                       re.IGNORECASE | re.DOTALL)
        sm = _SSET_SESSION_TVF.search(body)
        if sm is not None and overs:
            raise ValueError(
                "streaming statement set: OVER on a SESSION TVF is not "
                "supported — sessions merge, so a row's window identity "
                "isn't fixed; run it as its own stream_query"
            )
        if sm is not None:
            # SESSION windows MERGE (a row's window identity isn't
            # fixed on arrival — SessionWindowAssigner.java merging
            # windows), but the staging model closes them exactly:
            # rows of still-open sessions stay staged; a session is
            # FINAL once the watermark passes max(ts)+gap, because any
            # surviving (non-late) future row has ts+gap > wm ≥ that
            # session's end and therefore starts a NEW session — the
            # reference's purge-on-fire contract (WindowOperator.java).
            keys_txt = gm.group("keys") if gm else ""
            if not (re.search(r"\bwindow_start\b", keys_txt, re.IGNORECASE)
                    and re.search(r"\bwindow_end\b", keys_txt,
                                  re.IGNORECASE)):
                raise ValueError(
                    "streaming statement set: a SESSION TVF statement "
                    "must GROUP BY window_start, window_end so every "
                    "emitted row is a watermark-closed session"
                )
            wm = self._tenv._watermarks.get(src_name)
            if wm is None:
                raise ValueError(
                    f"streaming statement set: source {src_name!r} "
                    "needs a WATERMARK declaration — session closure "
                    "is watermark-driven"
                )
            if sm.group("ts").lower() != wm[0].lower():
                raise ValueError(
                    f"streaming statement set: DESCRIPTOR"
                    f"({sm.group('ts')}) must be the source's "
                    f"event-time attribute {wm[0]!r}"
                )
            from flink_1_16_0_src_spark.sql_clauses import _interval_str

            return "session", {
                "ts": wm[0],
                "gap": _interval_str(sm.group("gap")),
                "keys": [k.strip()
                         for k in (sm.group("keys") or "").split(",")
                         if k.strip()],
            }
        if re.search(r"TABLE\s*\(\s*SESSION\s*\(", unquoted, re.IGNORECASE):
            raise ValueError(
                "streaming statement set: unsupported SESSION TVF form "
                "— expected TABLE(SESSION(TABLE src [PARTITION BY k], "
                "DESCRIPTOR(ts), INTERVAL gap))"
            )
        tm = _SSET_WIN_TVF.search(body)
        if tm is None:
            if overs:
                raise ValueError(
                    "streaming statement set: OVER aggregates are "
                    "stateful across micro-batches (per-batch "
                    "re-planning would mis-frame rows) — scope them to "
                    "a window TVF with OVER (PARTITION BY window_start, "
                    "window_end ...) or run them as their own "
                    "stream_query"
                )
            if gm is not None or _SSET_AGG_HEAD.search(unquoted):
                raise ValueError(
                    "streaming statement set: a non-windowed aggregate "
                    "re-planned per micro-batch appends one PARTIAL "
                    "result per batch — run it as its own stream_query, "
                    "or aggregate into a watermark-closed TUMBLE/HOP/"
                    "CUMULATE window (GROUP BY window_start, window_end)"
                )
            return "stateless", None
        for _s, _e, spec in overs:
            pspec = re.search(
                r"PARTITION\s+BY\s+(?P<p>.*?)(?:\bORDER\s+BY\b|$)",
                spec, re.IGNORECASE | re.DOTALL,
            )
            ptxt = pspec.group("p") if pspec else ""
            if not (re.search(r"\bwindow_start\b", ptxt, re.IGNORECASE)
                    and re.search(r"\bwindow_end\b", ptxt, re.IGNORECASE)):
                raise ValueError(
                    "streaming statement set: every OVER must "
                    "PARTITION BY window_start, window_end (plus any "
                    "keys) so each frame lives inside one "
                    "watermark-closed window — unscoped OVER is "
                    "stateful across micro-batches"
                )
        keys = gm.group("keys") if gm else ""
        if gm is None:
            # row-level windowed statement (window Top-N / enrichment):
            # exact under raw-row staging — each window plans ONCE over
            # its complete row set — provided no bare aggregate
            # collapses rows ACROSS windows (window functions excised
            # before the scan; their frames are window-scoped above)
            bare = unquoted
            for s_, e_, _spec in sorted(overs, reverse=True):
                bare = bare[:s_] + bare[e_:]
            if _SSET_AGG_HEAD.search(bare):
                raise ValueError(
                    "streaming statement set: aggregates over a window "
                    "TVF need GROUP BY window_start, window_end — "
                    "without it the aggregate collapses across windows "
                    "and re-plans one PARTIAL result per batch"
                )
        elif not (re.search(r"\bwindow_start\b", keys, re.IGNORECASE)
                  and re.search(r"\bwindow_end\b", keys, re.IGNORECASE)):
            raise ValueError(
                "streaming statement set: a window TVF statement must "
                "GROUP BY window_start, window_end so every emitted row "
                "is a watermark-closed window"
            )
        wm = self._tenv._watermarks.get(src_name)
        if wm is None:
            raise ValueError(
                f"streaming statement set: source {src_name!r} needs a "
                "WATERMARK declaration — window closure is "
                "watermark-driven"
            )
        if tm.group("ts").lower() != wm[0].lower():
            raise ValueError(
                f"streaming statement set: DESCRIPTOR({tm.group('ts')}) "
                f"must be the source's event-time attribute {wm[0]!r}"
            )
        from flink_1_16_0_src_spark.sql_clauses import _interval_str

        fn = tm.group("fn").upper()
        if fn == "TUMBLE":
            return "tumble", {
                "ts": wm[0],
                "size": _interval_str(tm.group("i1")),
                "offset": (_interval_str(tm.group("i2"))
                           if tm.group("i2") else None),
                "acc": self._parse_win_acc(body, tm),
            }
        # HOP(slide, size) / CUMULATE(step, max): a row belongs to
        # SEVERAL windows, so emission post-filters the planned output
        # on window_end — the SELECT list must expose it
        if not tm.group("i2"):
            raise ValueError(
                f"streaming statement set: {fn} takes two INTERVAL "
                "arguments"
            )
        head = re.split(r"\bFROM\b", unquoted, maxsplit=1,
                        flags=re.IGNORECASE)[0]
        # Emission post-filters the PLANNED output on a column literally
        # named window_end, so admission must guarantee a BARE window_end
        # projection item — ``SELECT window_end AS we`` used to pass the
        # old \bwindow_end\b scan and then abort the drain mid-stream
        # with an unresolved column (ADVICE r11 #3).
        items, depth, cur = [], 0, []
        for ch in re.sub(r"^\s*SELECT\s+(DISTINCT\s+)?", "", head,
                         flags=re.IGNORECASE):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                items.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        items.append("".join(cur).strip())
        if not any(
            re.fullmatch(r"(?:\w+\.)?window_end", it, re.IGNORECASE)
            for it in items
        ):
            raise ValueError(
                f"streaming statement set: a {fn} statement must SELECT "
                "window_end as a bare (un-aliased) column — emission "
                "filters closed windows on it"
            )
        return "win_multi", {
            "ts": wm[0],
            "fn": fn,
            "i1": _interval_str(tm.group("i1")),
            "i2": _interval_str(tm.group("i2")),
            "acc": self._parse_win_acc(body, tm),
        }

    def _parse_win_acc(self, body: str, tm: "re.Match") -> dict | None:
        """Decompose a TUMBLE/HOP/CUMULATE statement into PARTIAL ACCUMULATORS
        (r12, VERDICT r11 #1c): when every SELECT item is a group key
        or a plain COUNT/SUM/MIN/MAX/AVG aggregate, staging keeps ONE
        partial row per open (window, keys) group instead of raw rows
        — the reference's incremental window accumulators
        (MiniBatchIncrementalGroupAggFunction.java local/global split,
        SlicingWindowOperator.java:101 per-record accumulate). Stage
        volume becomes O(open groups) regardless of row rate; a 1-hour
        window at any throughput stages one row per trigger per group.
        Returns None (raw-row staging) for shapes the merge cannot
        express: expressions AROUND aggregates, HAVING, DISTINCT-agg,
        non-column group keys, un-aliased aggregates."""
        head = body[:tm.start()]
        hm = re.fullmatch(r"\s*SELECT\s+(?P<sel>.+?)\s+FROM\s+", head,
                          re.IGNORECASE | re.DOTALL)
        if hm is None:
            return None
        rm = re.fullmatch(
            r"\s*(?:WHERE\s+(?P<w>.*?)\s+)?"
            r"GROUP\s+BY\s+(?P<g>[\w\s,\.]+?)\s*;?\s*",
            body[tm.end():], re.IGNORECASE | re.DOTALL,
        )
        if rm is None:
            return None  # HAVING / exotic tail → raw-row staging
        gkeys = [k.strip().split(".")[-1].lower()
                 for k in rm.group("g").split(",") if k.strip()]
        data_keys = [k for k in gkeys
                     if k not in ("window_start", "window_end")]
        # split the SELECT list on top-level commas
        items, depth, cur = [], 0, []
        for ch in hm.group("sel"):
            depth += ch == "("
            depth -= ch == ")"
            if ch == "," and depth == 0:
                items.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        items.append("".join(cur).strip())
        sel: list[dict] = []
        aggs = {"COUNT", "SUM", "MIN", "MAX", "AVG"}
        for it in items:
            km = re.fullmatch(
                r"(?:\w+\.)?(\w+)(?:\s+AS\s+(\w+))?", it, re.IGNORECASE
            )
            if km and km.group(1).lower() in gkeys:
                sel.append({"kind": "key", "col": km.group(1).lower(),
                            "alias": km.group(2) or km.group(1)})
                continue
            am = re.fullmatch(
                r"(\w+)\s*\((.*)\)\s+AS\s+(\w+)", it,
                re.IGNORECASE | re.DOTALL,
            )
            if am is None or am.group(1).upper() not in aggs:
                return None
            inner = am.group(2).strip()
            # inner must be balanced (the fullmatch above could pair
            # the fn's '(' with a later ')'), aggregate-free, and not
            # reference the window columns
            d = 0
            for ch in inner:
                d += ch == "("
                d -= ch == ")"
                if d < 0:
                    return None
            if d != 0 or _SSET_AGG_HEAD.search(inner):
                return None
            if re.search(r"\bwindow_(start|end)\b|\bDISTINCT\b", inner,
                         re.IGNORECASE):
                return None
            fn_u = am.group(1).upper()
            if inner == "*" and fn_u != "COUNT":
                return None
            if am.group(3).lower() in gkeys:
                return None  # alias shadows a group key → ambiguous
            sel.append({"kind": "agg", "fn": fn_u, "expr": inner,
                        "alias": am.group(3)})
        return {"where": rm.group("w"), "keys": data_keys, "sel": sel}

    def _acc_stage_emit(
        self, rows, acc: dict, idx: int, batch_id, state: dict,
        old_stages: list, lo, hi, bspark, batch_view: str,
        sink_name: str, collist, emit_fn, stage_fn, ep_us,
        grid: int | None = None, rem: int = 0, grid_exact: bool = True,
    ) -> None:
        """Shared partial-accumulator stage+emit (r12, VERDICT r11 #1c)
        for TUMBLE/HOP/CUMULATE: ``rows`` already carries
        window_start/window_end (exploded per covering window for
        HOP/CUMULATE) and the WHERE/late filters. Fold the batch into
        ONE partial row per (window, keys) group (COUNT/SUM merge by
        sum, MIN/MAX by min/max, AVG as a sum+count pair), stage the
        partials as append-only segments, merge partials of windows
        closing in (lo, hi] and emit — exact, no output post-filter,
        no raw-row re-planning. ``grid``/``rem`` drive the
        no-window-boundary planning skip when ``grid_exact``."""
        paggs, aidx = [], []
        for i2_, it in enumerate(acc["sel"]):
            if it["kind"] != "agg":
                continue
            aidx.append(i2_)
            e = F.lit(1) if it["expr"] == "*" else F.expr(it["expr"])
            if it["fn"] == "AVG":
                paggs.append(F.sum(e).alias(f"__p{i2_}_s"))
                paggs.append(F.count(e).alias(f"__p{i2_}_c"))
            else:
                agg_fn = {"COUNT": F.count, "SUM": F.sum,
                          "MIN": F.min, "MAX": F.max}[it["fn"]]
                paggs.append(agg_fn(e).alias(f"__p{i2_}"))
        gb = ["window_start", "window_end", *acc["keys"]]
        pb = (rows.groupBy(*gb).agg(*paggs) if paggs
              else rows.select(*gb).distinct()).persist()
        segs = state["stage"][idx] or []
        plan_needed = hi is not None
        if hi is not None and lo is not None and grid and grid_exact:
            hi_us, lo_us = ep_us(hi), ep_us(lo)
            e_hi_us = hi_us - ((hi_us - rem) % grid)
            if e_hi_us <= lo_us:
                plan_needed = False
        if plan_needed:
            rel = pb
            if segs:
                rel = rel.unionByName(
                    bspark.read.schema(pb.schema)
                    .parquet(*[s_["dir"] for s_ in segs])
                )
            rel = rel.where(F.col("window_end") <= F.lit(hi))
            if lo is not None:
                rel = rel.where(F.col("window_end") > F.lit(lo))
            rel = rel.persist()
            if rel.limit(1).count():
                # merge-result types must equal the RAW plan's aggregate
                # types or the sink schema drifts between the acc and
                # raw-row paths — e.g. AVG(DECIMAL(10,2)) is
                # DECIMAL(14,6) under Spark's typing while the naive
                # sum/count division is not, and SUM-of-SUMs widens
                # decimal precision. Resolve the raw types ONCE PER
                # STATEMENT (cached on the acc dict — r13: this is a
                # plan analysis, and re-running it per emission boundary
                # made every boundary pay an analyzer pass for types
                # that cannot change across batches).
                raw_types = acc.get("_raw_types")
                if raw_types is None:
                    raw_types = [
                        f.dataType
                        for f in rows.select(*[
                            F.expr(
                                f"{acc['sel'][i2_]['fn']}"
                                f"({acc['sel'][i2_]['expr']})"
                            )
                            for i2_ in aidx
                        ]).schema.fields
                    ]
                    acc["_raw_types"] = raw_types
                maggs = []
                for j_, i2_ in enumerate(aidx):
                    it = acc["sel"][i2_]
                    if it["fn"] == "AVG":
                        mcol = F.sum(f"__p{i2_}_s") / F.sum(f"__p{i2_}_c")
                    else:
                        merge_fn = {"COUNT": F.sum, "SUM": F.sum,
                                    "MIN": F.min, "MAX": F.max}[it["fn"]]
                        mcol = merge_fn(f"__p{i2_}")
                    maggs.append(
                        mcol.cast(raw_types[j_]).alias(it["alias"])
                    )
                merged = (rel.groupBy(*gb).agg(*maggs) if maggs
                          else rel.select(*gb).distinct())
                final = merged.select(*[
                    F.col(it["col"]).alias(it["alias"])
                    if it["kind"] == "key" else F.col(it["alias"])
                    for it in acc["sel"]
                ])
                # hand the merged DataFrame to the emitter directly
                # (r13, VERDICT r12 #6): the former temp-view +
                # "SELECT * FROM wview" hop re-planned SQL text at
                # every emission boundary for a frame this code had
                # already built — accumulator statements now plan ZERO
                # statement text after classification, O(#statements)
                # not O(#boundaries) (full_statement_plans receipt)
                emit_fn(sink_name, collist, final,
                        bspark, slot=(batch_id, idx))
            rel.unpersist()
        keep_new = (pb.where(F.col("window_end") > F.lit(hi))
                    if hi is not None else pb)
        state["stage"][idx] = stage_fn(
            keep_new, "window_end", idx, batch_id, segs, hi, old_stages
        )
        pb.unpersist()

    def add_insert_sql(self, sql: str) -> "StreamStatementSet":
        mi = _INSERT_INTO.match(sql.strip())
        if not mi:
            raise ValueError("statement must be INSERT INTO <sink> <query>")
        if mi.group(1).upper() == "OVERWRITE":
            raise ValueError("streaming INSERT is append-only (no OVERWRITE)")
        sink_name, body = mi.group(2), mi.group("body")
        if sink_name not in self._tenv._sinks:
            raise KeyError(f"unknown sink table {sink_name!r}")
        unquoted = "".join(
            p for i, p in enumerate(re.split(r"('(?:[^']|'')*')", body))
            if i % 2 == 0
        )
        refs = [
            s for s in self._tenv._sources
            if re.search(rf"(?<![\w.]){re.escape(s)}(?![\w.])", unquoted,
                         re.IGNORECASE)
        ]
        # the STREAM side is the watermarked source; other referenced
        # DDL tables are batch DIMENSIONS and resolve through their
        # batch temp views inside the per-batch planning (the
        # stream-dim enrichment shape). A watermark-less statement
        # keeps the old rule: its single DDL source IS the stream.
        wm_srcs = [s for s in refs if s in self._tenv._watermarks]
        srcs_in = wm_srcs if wm_srcs else refs
        if len(srcs_in) != 1:
            raise ValueError(
                "streaming statement set: each statement must read "
                "exactly one streaming (watermarked) DDL source (got "
                f"{srcs_in or 'none'}); batch DDL dims may join freely, "
                "stream-stream joins run as their own stream_query"
            )
        kind, info = self._classify(unquoted, body, srcs_in[0])
        self._inserts.append(
            (sink_name, mi.group("collist"), body, srcs_in[0], kind, info)
        )
        return self

    def execute(
        self,
        checkpoint: str | None = None,
        max_files_per_trigger: int | None = None,
    ) -> dict:
        """Drain all statements (availableNow). Statements GROUP BY
        their streaming source: each distinct source runs as ONE
        streaming query whose scan its statements provably share —
        the reference's common-subgraph sharing merges IDENTICAL
        scans the same way (StreamCommonSubGraphBasedOptimizer.scala:
        49); distinct sources are distinct subgraphs there too, they
        merely ride one job. ``streaming_queries`` in the receipt =
        number of distinct sources (1 for the classic shared-scan
        set). With a checkpoint dir and several sources, each group
        persists under its own ``src<i>/`` subdir.
        ``max_files_per_trigger`` forces multi-batch drains (tests
        use it to prove cross-batch window correctness)."""
        if not self._inserts:
            raise ValueError("streaming statement set: no statements buffered")
        groups: dict[str, list] = {}
        for it in self._inserts:
            groups.setdefault(it[3], []).append(it)
        total = {
            "statements": len(self._inserts),
            "shared_source": (next(iter(groups)) if len(groups) == 1
                              else sorted(groups)),
            "window_agg_statements": 0,
            "streaming_queries": 0,
            # r13 (VERDICT r12 #6): how many times any statement's SQL
            # TEXT was planned during the drain. Accumulator-decomposed
            # window statements contribute 0 (their merged frame is
            # handed to the emitter as a DataFrame); stateless and
            # raw-row-staged statements inherently re-plan per boundary
            # (their text must bind each batch's view content).
            "full_statement_plans": 0,
        }
        for gi, (src_name, inserts) in enumerate(groups.items()):
            ck = (os.path.join(checkpoint, f"src{gi}")
                  if checkpoint and len(groups) > 1 else checkpoint)
            r = self._execute_group(
                src_name, inserts, ck, max_files_per_trigger
            )
            total["window_agg_statements"] += r["window_agg_statements"]
            total["full_statement_plans"] += r["full_statement_plans"]
            total["streaming_queries"] += 1
        return total

    def _execute_group(
        self,
        src_name: str,
        inserts: list,
        checkpoint: str | None,
        max_files_per_trigger: int | None,
    ) -> dict:
        """One streaming query draining every statement that reads
        ``src_name`` — the shared-scan unit of execute()."""
        import shutil as _sh
        import tempfile as _tf

        import pandas as _pd

        from flink_1_16_0_src_spark import sources as srcs

        tenv, spark = self._tenv, self._tenv.spark
        sdf = tenv.stream(
            src_name,
            options=(
                {"maxFilesPerTrigger": str(max_files_per_trigger)}
                if max_files_per_trigger else None
            ),
        )
        batch_view = f"__sset_batch_{next(_STREAM_SUB_SEQ)}"
        pat = rf"(?<![\w.]){re.escape(src_name)}(?![\w.])"
        win_idx = [i for i, it in enumerate(inserts)
                   if it[4] in ("tumble", "win_multi", "session")]
        wm_spec = tenv._watermarks.get(src_name)
        # stage value per windowed statement: a LIST of append-only
        # segment entries {dir, max_end, rows} for tumble/win_multi
        # (r12 — written once per batch, dropped whole when the
        # watermark passes max_end); a single re-staged dir for
        # SESSION (merging windows need the full open-session row set
        # each batch — that rewrite is bounded by OPEN sessions only)
        state: dict = {"max_ts": None, "wm": None, "last_batch": None,
                       "stage": {i: ([] if inserts[i][4] != "session"
                                     else None) for i in win_idx},
                       "pending": [], "staged_rows_cum": 0,
                       "full_plans": 0}
        # Persistent staging (r11, SURVEY §7.3 risk 3): with an
        # explicit checkpoint dir, window staging + the running
        # watermark live INSIDE it next to Spark's offset log, tracked
        # by an atomically-replaced manifest — a killed-and-restarted
        # (or simply re-executed) drain resumes mid-window instead of
        # replaying offsets over empty staging. A fully-processed
        # replayed batch is skipped (no duplicate emissions), and
        # unpartitioned-filesystem emissions ride the two-phase file
        # commit below (pending dir → manifest → idempotent renames)
        # for exactly-once across crashes at ANY point.
        import datetime as _dt
        import json as _json

        stmt_sig = [f"{s}::{c or ''}::{b}" for s, c, b, _s2, _k, _i
                    in inserts]
        mpath = (os.path.join(checkpoint, "sset_manifest.json")
                 if checkpoint else None)
        if checkpoint:
            os.makedirs(checkpoint, exist_ok=True)
            stage_root = os.path.join(checkpoint, "sset_stage")
            os.makedirs(stage_root, exist_ok=True)
        else:
            stage_root = _tf.mkdtemp(prefix="spark_graft_sset_state_") \
                if win_idx else None
        if mpath and os.path.exists(mpath):
            with open(mpath) as fh:
                m = _json.load(fh)
            if m["statements"] != stmt_sig:
                raise ValueError(
                    "streaming statement set: checkpoint "
                    f"{checkpoint!r} was written by a DIFFERENT "
                    "statement set — resume requires the same INSERTs "
                    "in the same order, or a fresh checkpoint dir"
                )
            state["max_ts"] = (_dt.datetime.fromisoformat(m["max_ts"])
                               if m["max_ts"] else None)
            state["wm"] = (_dt.datetime.fromisoformat(m["wm"])
                           if m["wm"] else None)
            state["last_batch"] = m["last_batch"]
            state["stage"] = {int(k): v
                              for k, v in m["stage"].items()}
            state["pending"] = m.get("pending", [])
            state["staged_rows_cum"] = m.get("staged_rows_cum", 0)
            for i_, v_ in state["stage"].items():
                if inserts[i_][4] != "session" and isinstance(v_, str):
                    raise ValueError(
                        "streaming statement set: checkpoint "
                        f"{checkpoint!r} staged windows in the pre-r12 "
                        "full-rewrite format — drain it with the old "
                        "build or start a fresh checkpoint dir"
                    )
        delay = _pd.Timedelta(wm_spec[1]) if win_idx else None
        pend_root = (os.path.join(checkpoint, "sset_pending")
                     if checkpoint else None)

        def _commit_pending():
            """Phase 2 of the two-phase file commit: move each
            manifested pending file into its sink under a
            batch/statement-deterministic name. Idempotent — a file
            already moved is absent from its pending dir and skipped,
            so a crash anywhere inside the move loop re-runs safely
            (FileSink's pending→finalized rename protocol,
            StreamingFileSink/TwoPhaseCommittingSink parity)."""
            import glob as _glob

            for ent in state["pending"]:
                files = sorted(
                    _glob.glob(os.path.join(ent["src"], "part-*"))
                )
                os.makedirs(ent["dst"], exist_ok=True)
                for f in files:
                    dst = os.path.join(
                        ent["dst"], ent["prefix"] + os.path.basename(f)
                    )
                    if os.path.exists(f):
                        try:
                            os.replace(f, dst)
                        except OSError:
                            # checkpoint and sink on different
                            # filesystems: copy-then-delete keeps the
                            # protocol (the pending copy is the
                            # durable one until the delete)
                            _sh.copy2(f, dst)
                            os.remove(f)
                _sh.rmtree(ent["src"], ignore_errors=True)
            state["pending"] = []


        def _write_manifest(batch_id):
            if mpath is None:
                return
            tmp = mpath + ".tmp"
            with open(tmp, "w") as fh:
                _json.dump({
                    "statements": stmt_sig,
                    "max_ts": (state["max_ts"].isoformat()
                               if state["max_ts"] else None),
                    "wm": (state["wm"].isoformat()
                           if state["wm"] else None),
                    "last_batch": batch_id,
                    "stage": state["stage"],
                    "pending": state["pending"],
                    "staged_rows_cum": state["staged_rows_cum"],
                }, fh)
            os.replace(tmp, mpath)

        def _ep_us(dt_):
            """Epoch micros of a (naive, UTC-semantics) datetime —
            avoids .timestamp()'s local-TZ interpretation."""
            return ((dt_ - _dt.datetime(1970, 1, 1))
                    // _dt.timedelta(microseconds=1))

        def _stage_segment(keep_new, end_col, idx, batch_id, segs, hi,
                           old_stages):
            """Append-only staging (r12, VERDICT r11 #1): write ONLY
            the batch's own still-open rows as a new segment annotated
            with its max window-end and row count, then drop whole
            segments the watermark has passed. Per-batch stage writes
            are O(batch delta); a row is written to staging AT MOST
            ONCE over the drain (staged_rows_cum in the manifest is
            the auditable receipt)."""
            smax, srows = keep_new.agg(
                F.max(end_col), F.count("*")
            ).first()
            segs = list(segs)
            if srows:
                segdir = os.path.join(stage_root, f"s{idx}_b{batch_id}")
                keep_new.write.mode("overwrite").parquet(segdir)
                segs.append({"dir": segdir, "max_end": smax.isoformat(),
                             "rows": int(srows)})
                state["staged_rows_cum"] += int(srows)
            if hi is not None:
                live = []
                for s_ in segs:
                    if _dt.datetime.fromisoformat(s_["max_end"]) <= hi:
                        old_stages.append(s_["dir"])
                    else:
                        live.append(s_)
                segs = live
            return segs

        if state["pending"]:
            # the previous run crashed between manifest and commit —
            # finish the moves before consuming anything new, then
            # persist the cleared pending list
            _commit_pending()
            _write_manifest(state["last_batch"])

        def _emit(sink_name, collist, sub, bspark, post=None, slot=None):
            sink = tenv._sinks[sink_name]
            if isinstance(sub, str):
                # statement TEXT re-planned for this boundary — the
                # receipt's full_statement_plans counts these (r13;
                # accumulator statements pass a built DataFrame instead
                # and never re-plan their text)
                state["full_plans"] += 1
            df, static_parts = tenv._build_insert_df(
                sink, collist, sub, spark=bspark
            )
            if post is not None:
                df = post(df)
            parts = (sink.get("partitioned_by")
                     or (list(static_parts) or None))
            if (pend_root is not None and slot is not None
                    and sink["connector"] == "filesystem" and not parts):
                # phase 1 of the two-phase file commit: write the
                # batch's output to a pending dir (overwrite — a
                # recompute-replay after a pre-manifest crash lands on
                # the same dir) and record the move in the manifest
                # BEFORE any sink mutation. Partitioned / non-file
                # sinks keep the direct append (at-least-once on a
                # mid-emit crash, documented).
                bid, sidx = slot
                pdir = os.path.join(pend_root, f"b{bid}_s{sidx}")
                srcs.write_table(
                    df, pdir, "filesystem",
                    sink["props"].get("format", "parquet"),
                    {**sink["props"], "sink.mode": "overwrite"},
                    partitioned_by=None,
                )
                state["pending"].append({
                    "src": pdir,
                    "dst": sink["props"]["path"],
                    "prefix": f"sset-b{bid}-s{sidx}-",
                })
                return
            srcs.write_table(
                df,
                sink["props"].get("path"),
                sink["connector"],
                sink["props"].get("format", "parquet"),
                {**sink["props"], "sink.mode": "append"},
                partitioned_by=parts,
            )

        def fn(batch_df, batch_id):
            if (state["last_batch"] is not None
                    and batch_id <= state["last_batch"]):
                # replay of a batch the manifest already recorded as
                # fully processed (emissions + staging + watermark) —
                # skip, exactly-once across restarts
                return
            old_stages: list[str] = []
            state["pending"] = []
            batch_df.persist()
            batch_df.createOrReplaceTempView(batch_view)
            bspark = batch_df.sparkSession
            # running watermark = max event time seen − delay (the
            # engine's WatermarkStrategy contract); a bounded 1-row agg
            wm_prev, wm_new = state["wm"], state["wm"]
            if win_idx:
                bmax = batch_df.agg(F.max(wm_spec[0])).first()[0]
                if bmax is not None:
                    state["max_ts"] = (
                        bmax if state["max_ts"] is None
                        else max(state["max_ts"], bmax)
                    )
                if state["max_ts"] is not None:
                    wm_new = state["max_ts"] - delay
            try:
                for idx, (sink_name, collist, body, _s, kind, info) in enumerate(inserts):
                    parts = re.split(r"('(?:[^']|'')*')", body)
                    if kind == "stateless":
                        sub = "".join(
                            p if i % 2 else re.sub(pat, batch_view, p,
                                                   flags=re.IGNORECASE)
                            for i, p in enumerate(parts)
                        )
                        _emit(sink_name, collist, sub, bspark,
                              slot=(batch_id, idx))
                        continue
                    if kind == "win_multi":
                        # HOP / CUMULATE: a row belongs to SEVERAL
                        # windows. r12 staging is APPEND-ONLY (VERDICT
                        # r11 next-round #1): each batch writes ONLY
                        # its own still-open rows as a new stage
                        # SEGMENT annotated with first/last covering
                        # window end; a segment drops whole when the
                        # watermark passes its max last-end. Emission
                        # plans the statement over (new rows ∪ live
                        # segments) FILTERED to rows covering a window
                        # closing in (wm_prev, wm_new] and post-filters
                        # output on window_end — each window emits
                        # once, complete (a window ending at e keeps
                        # exactly the rows with fend <= e <= lend).
                        # Batches where (wm_prev, wm_new] contains no
                        # window-end grid point skip planning entirely.
                        # Write per batch = O(batch delta), compute =
                        # O(rows of closing windows) — the reference's
                        # per-record O(delta) slicing
                        # (SlicingWindowOperator.java:101), not
                        # O(open horizon) per batch.
                        tsu = F.unix_micros(F.col(info["ts"]))
                        i1_us = int(_pd.Timedelta(info["i1"]).total_seconds() * 1e6)
                        i2_us = int(_pd.Timedelta(info["i2"]).total_seconds() * 1e6)
                        if info["fn"] == "HOP":
                            # window ends = k*slide + size; a row at t
                            # covers ends in (t, t + size]
                            grid, rem = i1_us, i2_us % i1_us
                            lend_us = (tsu - (tsu % F.lit(i1_us))) + F.lit(i2_us)
                            d = tsu - F.lit(i2_us)
                            fend_us = (d - F.pmod(d, F.lit(i1_us))) \
                                + F.lit(i1_us + i2_us)
                        else:
                            # CUMULATE(step=i1, max=i2): span start
                            # S = floor(t/max)*max, slice ends
                            # S + j*step for j >= 1, first end > t
                            grid, rem = i1_us, 0
                            span = tsu - (tsu % F.lit(i2_us))
                            off = tsu - span
                            lend_us = span + F.lit(i2_us)
                            fend_us = span + (off - (off % F.lit(i1_us))) \
                                + F.lit(i1_us)
                        if info.get("acc"):
                            # PARTIAL-ACCUMULATOR staging for HOP /
                            # CUMULATE (r12, VERDICT r11 #1c extended):
                            # explode each row into its covering
                            # windows, fold the batch into ONE partial
                            # row per (window, keys) group, stage the
                            # partials, and merge at emission — stage
                            # I/O O(open groups × windows-per-row), no
                            # raw-row re-planning, no output
                            # post-filter (groups key on the window).
                            acc = info["acc"]
                            end_us = F.explode(
                                F.sequence(fend_us, lend_us,
                                           F.lit(i1_us))
                            )
                            rows = batch_df.withColumn("__sset_eus",
                                                       end_us)
                            ws_us = (
                                F.col("__sset_eus") - F.lit(i2_us)
                                if info["fn"] == "HOP"
                                else tsu - (tsu % F.lit(i2_us))
                            )
                            rows = (
                                rows
                                .withColumn("window_start",
                                            F.timestamp_micros(ws_us))
                                .withColumn(
                                    "window_end",
                                    F.timestamp_micros(
                                        F.col("__sset_eus")
                                    ),
                                )
                                .drop("__sset_eus")
                            )
                            if acc["where"]:
                                rows = rows.where(F.expr(acc["where"]))
                            if wm_prev is not None:
                                rows = rows.where(
                                    F.col("window_end") > F.lit(wm_prev)
                                )
                            self._acc_stage_emit(
                                rows, acc, idx, batch_id,
                                state, old_stages, wm_prev, wm_new,
                                bspark, batch_view, sink_name, collist,
                                _emit, _stage_segment, _ep_us,
                                grid=i1_us, rem=rem,
                                grid_exact=(info["fn"] == "HOP"
                                            or i2_us % i1_us == 0),
                            )
                            continue
                        lcol, fcol = "__sset_lend", "__sset_fend"
                        cur_new = (
                            batch_df
                            .withColumn(lcol, F.timestamp_micros(lend_us))
                            .withColumn(fcol, F.timestamp_micros(fend_us))
                        )
                        segs = state["stage"][idx] or []
                        lo, hi = wm_prev, wm_new
                        plan_needed = hi is not None
                        if (hi is not None and lo is not None
                                and (info["fn"] == "HOP"
                                     or i2_us % i1_us == 0)):
                            # largest window-end grid point <= hi; none
                            # in (lo, hi] → no window closes this batch
                            hi_us, lo_us = _ep_us(hi), _ep_us(lo)
                            e_hi_us = hi_us - ((hi_us - rem) % grid)
                            if e_hi_us <= lo_us:
                                plan_needed = False
                        if plan_needed:
                            rel = cur_new
                            if segs:
                                rel = rel.unionByName(
                                    bspark.read.schema(cur_new.schema)
                                    .parquet(*[s_["dir"] for s_ in segs])
                                )
                            rel = rel.where(F.col(fcol) <= F.lit(hi))
                            if lo is not None:
                                rel = rel.where(F.col(lcol) > F.lit(lo))
                            rel = rel.persist()
                            if rel.limit(1).count():
                                wview = f"{batch_view}_w{idx}"
                                rel.drop(lcol, fcol) \
                                    .createOrReplaceTempView(wview)
                                sub = "".join(
                                    p if i % 2 else re.sub(
                                        pat, wview, p, flags=re.IGNORECASE)
                                    for i, p in enumerate(parts)
                                )

                                def post(df, lo=lo, hi=hi):
                                    cond = F.col("window_end") <= F.lit(hi)
                                    if lo is not None:
                                        cond = cond & (
                                            F.col("window_end") > F.lit(lo)
                                        )
                                    return df.where(cond)

                                _emit(sink_name, collist, sub, bspark,
                                      post, slot=(batch_id, idx))
                            rel.unpersist()
                        keep_new = (
                            cur_new.where(F.col(lcol) > F.lit(hi))
                            if hi is not None else cur_new
                        )
                        state["stage"][idx] = _stage_segment(
                            keep_new, lcol, idx, batch_id, segs, hi,
                            old_stages,
                        )
                        continue
                    if kind == "session":
                        # SESSION: recompute session assignment over
                        # staged ∪ new rows each batch (merging
                        # windows); sessions whose end = max(ts)+gap
                        # has passed the watermark are final — feed
                        # their COMPLETE row sets to the statement
                        # (recomputing the TVF over whole closed
                        # sessions reproduces exactly those sessions,
                        # since sessions are maximal disjoint row
                        # groups). Open-session rows re-stage raw.
                        from pyspark.sql import Window as _W

                        gap_us = int(
                            _pd.Timedelta(info["gap"]).total_seconds()
                            * 1e6
                        )
                        tsu = F.unix_micros(F.col(info["ts"]))
                        cur = batch_df
                        if wm_prev is not None:
                            # isWindowLate (allowed lateness 0): the
                            # row's prospective session [ts, ts+gap)
                            # closed before the watermark and fired
                            # state was purged — drop
                            cur = cur.where(
                                F.timestamp_micros(tsu + F.lit(gap_us))
                                > F.lit(wm_prev)
                            )
                        stg = state["stage"][idx]
                        if stg is not None:
                            cur = cur.unionByName(
                                bspark.read.schema(cur.schema)
                                .parquet(stg)
                            )
                        pk = ([F.col(k) for k in info["keys"]]
                              if info["keys"] else [F.lit(1)])
                        kw = _W.partitionBy(*pk).orderBy(info["ts"])
                        cur = cur.withColumn(
                            "__sset_sid",
                            F.sum(
                                F.coalesce(
                                    (tsu - F.unix_micros(
                                        F.lag(F.col(info["ts"])).over(kw)
                                    ) > F.lit(gap_us)).cast("int"),
                                    F.lit(1),
                                )
                            ).over(
                                kw.rowsBetween(_W.unboundedPreceding, 0)
                            ),
                        )
                        scol = "__sset_send"
                        cur = cur.withColumn(
                            scol,
                            F.timestamp_micros(
                                F.max(tsu).over(
                                    _W.partitionBy(
                                        *pk, F.col("__sset_sid")
                                    )
                                )
                                + F.lit(gap_us)
                            ),
                        ).persist()
                        closed = (
                            cur.where(F.col(scol) <= F.lit(wm_new))
                            if wm_new is not None else None
                        )
                        open_df = (
                            cur.where(F.col(scol) > F.lit(wm_new))
                            if wm_new is not None else cur
                        )
                        if closed is not None and closed.limit(1).count():
                            wview = f"{batch_view}_w{idx}"
                            closed.drop(scol, "__sset_sid") \
                                .createOrReplaceTempView(wview)
                            sub = "".join(
                                p if i % 2 else re.sub(
                                    pat, wview, p, flags=re.IGNORECASE)
                                for i, p in enumerate(parts)
                            )
                            _emit(sink_name, collist, sub, bspark,
                                  slot=(batch_id, idx))
                        new_stage = os.path.join(
                            stage_root, f"s{idx}_b{batch_id}"
                        )
                        open_df.drop(scol, "__sset_sid").write \
                            .mode("overwrite").parquet(new_stage)
                        cur.unpersist()
                        if stg is not None:
                            old_stages.append(stg)
                        state["stage"][idx] = new_stage
                        continue
                    if kind == "tumble" and info.get("acc"):
                        # PARTIAL-ACCUMULATOR staging (r12, VERDICT r11
                        # #1c): the batch's rows fold into ONE partial
                        # row per (window, keys) group before staging
                        # (COUNT/SUM/MIN/MAX merge by sum/min/max, AVG
                        # by a sum+count pair) — stage I/O is O(open
                        # groups) per batch at ANY row rate, the
                        # reference's incremental accumulator contract
                        # (MiniBatchIncrementalGroupAggFunction.java,
                        # SlicingWindowOperator.java:101).
                        acc = info["acc"]
                        wargs = [F.col(info["ts"]), info["size"]]
                        if info["offset"]:
                            wargs += [info["size"], info["offset"]]
                        win = F.window(*wargs)
                        rows = (batch_df
                                .withColumn("window_start", win.start)
                                .withColumn("window_end", win.end))
                        if acc["where"]:
                            rows = rows.where(F.expr(acc["where"]))
                        if wm_prev is not None:
                            rows = rows.where(
                                F.col("window_end") > F.lit(wm_prev)
                            )
                        size_us = int(
                            _pd.Timedelta(info["size"]).total_seconds()
                            * 1e6
                        )
                        off_us = (
                            int(_pd.Timedelta(info["offset"])
                                .total_seconds() * 1e6)
                            if info["offset"] else 0
                        )
                        self._acc_stage_emit(
                            rows, acc, idx, batch_id,
                            state, old_stages, wm_prev, wm_new,
                            bspark, batch_view, sink_name, collist,
                            _emit, _stage_segment, _ep_us,
                            grid=size_us, rem=off_us % size_us,
                        )
                        continue
                    # TUMBLE window agg (raw-row staging — shapes the
                    # accumulator decomposition can't express): each row
                    # belongs to exactly ONE window; rows stage until it
                    # closes, then the statement plans once over the
                    # window's COMPLETE row set. r12 staging is
                    # APPEND-ONLY (see the win_multi note): the batch's
                    # open-window rows write ONCE as a segment; emission
                    # reads new ∪ live segments row-filtered to windows
                    # closing in (wm_prev, wm_new] (exact for TUMBLE —
                    # no output post-filter needed), and segments drop
                    # whole once the watermark passes their max end.
                    wargs = [F.col(info["ts"]), info["size"]]
                    if info["offset"]:
                        wargs += [info["size"], info["offset"]]
                    # window() only resolves under Project/Aggregate —
                    # tag the window end as a column, filter on that
                    wcol = "__sset_wend"
                    cur_new = batch_df.withColumn(wcol, F.window(*wargs).end)
                    if wm_prev is not None:
                        # late rows of already-emitted windows drop —
                        # append-mode window-agg semantics
                        cur_new = cur_new.where(F.col(wcol) > F.lit(wm_prev))
                    segs = state["stage"][idx] or []
                    lo, hi = wm_prev, wm_new
                    plan_needed = hi is not None
                    if hi is not None and lo is not None:
                        # no window-end grid point in (lo, hi] → no
                        # window closes this batch; skip even reading
                        # the segments
                        size_us = int(
                            _pd.Timedelta(info["size"]).total_seconds() * 1e6
                        )
                        off_us = (
                            int(_pd.Timedelta(info["offset"])
                                .total_seconds() * 1e6)
                            if info["offset"] else 0
                        )
                        hi_us, lo_us = _ep_us(hi), _ep_us(lo)
                        e_hi_us = hi_us - ((hi_us - off_us % size_us)
                                           % size_us)
                        if e_hi_us <= lo_us:
                            plan_needed = False
                    if plan_needed:
                        closed = cur_new
                        if segs:
                            closed = closed.unionByName(
                                bspark.read.schema(cur_new.schema)
                                .parquet(*[s_["dir"] for s_ in segs])
                            )
                        closed = closed.where(F.col(wcol) <= F.lit(hi))
                        if lo is not None:
                            closed = closed.where(F.col(wcol) > F.lit(lo))
                        closed = closed.persist()
                        if closed.limit(1).count():
                            wview = f"{batch_view}_w{idx}"
                            closed.drop(wcol).createOrReplaceTempView(wview)
                            sub = "".join(
                                p if i % 2 else re.sub(
                                    pat, wview, p, flags=re.IGNORECASE)
                                for i, p in enumerate(parts)
                            )
                            _emit(sink_name, collist, sub, bspark,
                              slot=(batch_id, idx))
                        closed.unpersist()
                    keep_new = (cur_new.where(F.col(wcol) > F.lit(hi))
                                if hi is not None else cur_new)
                    state["stage"][idx] = _stage_segment(
                        keep_new, wcol, idx, batch_id, segs, hi, old_stages
                    )
                if win_idx:
                    state["wm"] = wm_new
                # durability point: pending outputs + staging +
                # watermark + batch id hit the manifest BEFORE any
                # sink mutation (phase 1 of the two-phase commit),
                # THEN pending files move into their sinks (phase 2,
                # idempotent renames), THEN the manifest clears its
                # pending list and superseded stage dirs drop (never
                # delete a dir a manifest still references). A crash
                # before the manifest recomputes the batch
                # (deterministic, pending overwritten, sinks
                # untouched); after it, startup finishes the moves —
                # exactly-once for unpartitioned filesystem sinks.
                state["last_batch"] = batch_id
                _write_manifest(batch_id)
                if state["pending"]:
                    _commit_pending()
                    _write_manifest(batch_id)
                for d_ in old_stages:
                    _sh.rmtree(d_, ignore_errors=True)
            finally:
                batch_df.unpersist()

        from flink_1_16_0_src_spark.streaming.sources import (
            _scoped_shuffle_partitions,
            derived_stream_partitions,
        )

        _sess = sdf.sparkSession
        with _scoped_shuffle_partitions(
            _sess, derived_stream_partitions(_sess)
        ):
            q = (
                sdf.writeStream.foreachBatch(fn)
                .trigger(availableNow=True)
                .option(
                    "checkpointLocation",
                    checkpoint or _tf.mkdtemp(prefix="spark_graft_sset_"),
                )
                .start()
            )
            q.awaitTermination()
        if stage_root is not None and not checkpoint:
            # windows still open at end-of-drain are NOT emitted
            # (append-mode contract, same as the stream_query drains);
            # with a checkpoint dir they PERSIST — a later execute()
            # with the same checkpoint resumes them mid-window
            _sh.rmtree(stage_root, ignore_errors=True)
        return {"window_agg_statements": len(win_idx),
                "full_statement_plans": state["full_plans"]}
