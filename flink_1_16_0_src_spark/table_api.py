"""Table API fluent surface (SURVEY.md §3.2 — entry point 2).

Reference parity: the Table API builds QueryOperation trees
(T-API/operations/ProjectQueryOperation.java, FilterQueryOperation,
AggregateQueryOperation, JoinQueryOperation, SortQueryOperation,
SetQueryOperation, DistinctQueryOperation) with expressions resolved by
ExpressionResolver; PyFlink mirrors it in flink-python/pyflink/table/
(table.py `Table`, expressions.py `col`). Here each fluent call maps
1:1 onto the DataFrame API — the same logical plans Spark SQL builds,
so Catalyst owns optimization exactly as the planner owns
QueryOperations in the reference.

Expression spelling follows PyFlink: ``col("a")``, aggregates as
properties (``col("b").sum``), ``.alias``, arithmetic/comparison
operators — implemented as a thin wrapper over ``pyspark.sql.Column``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Expr:
    """PyFlink-expression-flavored wrapper over a Spark Column
    (pyflink/table/expressions.py col / Expression)."""

    def __init__(self, c: Column):
        self._c = c

    # aggregates are properties in PyFlink: col("b").sum
    @property
    def sum(self) -> "Expr":
        return Expr(F.sum(self._c))

    @property
    def avg(self) -> "Expr":
        return Expr(F.avg(self._c))

    @property
    def min(self) -> "Expr":
        return Expr(F.min(self._c))

    @property
    def max(self) -> "Expr":
        return Expr(F.max(self._c))

    @property
    def count(self) -> "Expr":
        return Expr(F.count(self._c))

    @property
    def distinct(self) -> "Expr":
        return Expr(self._c)  # combined as count.distinct via count_distinct

    @property
    def is_null(self) -> "Expr":
        return Expr(self._c.isNull())

    @property
    def is_not_null(self) -> "Expr":
        return Expr(self._c.isNotNull())

    def alias(self, name: str) -> "Expr":
        return Expr(self._c.alias(name))

    def cast(self, t: str) -> "Expr":
        return Expr(self._c.cast(t))

    def _lift(self, other):
        if isinstance(other, Expr):
            return other._c
        return other

    def __add__(self, o):
        return Expr(self._c + self._lift(o))

    def __sub__(self, o):
        return Expr(self._c - self._lift(o))

    def __mul__(self, o):
        return Expr(self._c * self._lift(o))

    def __truediv__(self, o):
        return Expr(self._c / self._lift(o))

    def __rsub__(self, o):
        return Expr(self._lift(o) - self._c)

    def __rmul__(self, o):
        return Expr(self._c * self._lift(o))

    def __radd__(self, o):
        return Expr(self._c + self._lift(o))

    def __eq__(self, o):  # noqa: D105
        return Expr(self._c == self._lift(o))

    def __ne__(self, o):
        return Expr(self._c != self._lift(o))

    def __lt__(self, o):
        return Expr(self._c < self._lift(o))

    def __le__(self, o):
        return Expr(self._c <= self._lift(o))

    def __gt__(self, o):
        return Expr(self._c > self._lift(o))

    def __ge__(self, o):
        return Expr(self._c >= self._lift(o))

    def __and__(self, o):
        return Expr(self._c & self._lift(o))

    def __or__(self, o):
        return Expr(self._c | self._lift(o))

    def __invert__(self):
        return Expr(~self._c)

    @property
    def desc(self) -> "Expr":
        return Expr(self._c.desc())

    @property
    def asc(self) -> "Expr":
        return Expr(self._c.asc())


def col(name: str) -> Expr:
    return Expr(F.col(name))


def lit(v) -> Expr:
    return Expr(F.lit(v))


def _cols(exprs) -> list[Column]:
    out = []
    for e in exprs:
        if isinstance(e, Expr):
            out.append(e._c)
        elif isinstance(e, Column):
            out.append(e)
        else:
            out.append(F.col(e))
    return out


class _Range:
    """``range_('b', 'd')`` — an inclusive schema-order column span
    (PyFlink expressions.range_; BuiltInFunctionDefinitions RANGE_TO)."""

    def __init__(self, start: str, end: str):
        self.start, self.end = start, end


def range_(start: str, end: str) -> _Range:
    return _Range(start, end)


class _ColumnSelector:
    """withColumns/withoutColumns column-function expansion
    (BuiltInFunctionDefinitions WITH_COLUMNS/WITHOUT_COLUMNS;
    ColumnFunctionsExpander in the reference planner). Resolved
    against the actual schema at select() time."""

    def __init__(self, include: bool, items):
        self.include, self.items = include, items

    def resolve(self, columns: list[str]) -> list[str]:
        picked: list[str] = []
        for it in self.items:
            if isinstance(it, _Range):
                i, j = columns.index(it.start), columns.index(it.end)
                if j < i:
                    raise ValueError(f"range_({it.start!r}, {it.end!r}) is reversed")
                picked.extend(columns[i : j + 1])
            else:
                name = it if isinstance(it, str) else it._c._jc.toString()
                if name not in columns:
                    raise ValueError(f"column {name!r} not in schema")
                picked.append(name)
        if self.include:
            seen = set()
            return [c for c in picked if not (c in seen or seen.add(c))]
        drop = set(picked)
        return [c for c in columns if c not in drop]


def with_columns(*items) -> _ColumnSelector:
    return _ColumnSelector(True, items)


def without_columns(*items) -> _ColumnSelector:
    return _ColumnSelector(False, items)


class Table:
    """Fluent relational surface over a DataFrame (PyFlink Table)."""

    def __init__(self, df: DataFrame):
        self._df = df

    # ---- projection / filter (ProjectQueryOperation / Filter...) ----

    def select(self, *exprs) -> "Table":
        expanded: list = []
        for e in exprs:
            if isinstance(e, _ColumnSelector):
                expanded.extend(e.resolve(self._df.columns))
            else:
                expanded.append(e)
        return Table(self._df.select(*_cols(expanded)))

    def add_columns(self, *exprs) -> "Table":
        return Table(self._df.select("*", *_cols(exprs)))

    def add_or_replace_columns(self, **exprs) -> "Table":
        """PyFlink Table.add_or_replace_columns: same-named columns are
        replaced in place, new names append."""
        df = self._df
        for name, e in exprs.items():
            df = df.withColumn(name, _cols([e])[0])
        return Table(df)

    def drop_columns(self, *names: str) -> "Table":
        return Table(self._df.drop(*names))

    # ---- row-based operations (Table.map/flat_map, the PyFlink
    # "Row-based Operations" surface) — Arrow-batched, never per-row ----

    def map(self, fn, output_schema: str) -> "Table":
        """Row-based map. Spark-first deviation from PyFlink's
        one-Row-at-a-time udf contract: ``fn`` receives and returns a
        pandas DataFrame per Arrow batch (same result, vectorized).
        ``output_schema`` is the result DDL, e.g. 'a BIGINT, b STRING'."""
        return Table(
            self._df.mapInPandas(lambda it: (fn(b) for b in it), output_schema)
        )

    def flat_map(self, fn, output_schema: str) -> "Table":
        """Row-based flat_map (UDTF shape): ``fn`` maps one pandas batch
        to a pandas DataFrame with ANY number of rows (0..n per input
        row)."""
        return Table(
            self._df.mapInPandas(lambda it: (fn(b) for b in it), output_schema)
        )

    def rename_columns(self, **renames: str) -> "Table":
        df = self._df
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        return Table(df)

    def filter(self, pred) -> "Table":
        return Table(self._df.where(_cols([pred])[0]))

    where = filter

    # ---- aggregation (AggregateQueryOperation) ----

    def group_by(self, *keys) -> "GroupedTable":
        return GroupedTable(self._df, _cols(keys))

    # ---- sort / limit (SortQueryOperation) ----

    def order_by(self, *exprs) -> "Table":
        return Table(self._df.orderBy(*_cols(exprs)))

    def fetch(self, n: int) -> "Table":
        return Table(self._df.limit(n))

    limit = fetch

    def offset(self, n: int) -> "Table":
        """Table.offset (SortQueryOperation offset) — pair with
        ``fetch`` after ``order_by`` for deterministic pagination."""
        return Table(self._df.offset(n))

    # ---- joins (JoinQueryOperation) ----

    def join(self, other: "Table", on=None, how: str = "inner") -> "Table":
        cond = _cols([on])[0] if on is not None else None
        return Table(self._df.join(other._df, cond, how))

    def left_outer_join(self, other: "Table", on=None) -> "Table":
        return self.join(other, on, "left")

    def right_outer_join(self, other: "Table", on=None) -> "Table":
        return self.join(other, on, "right")

    def full_outer_join(self, other: "Table", on=None) -> "Table":
        return self.join(other, on, "full")

    # ---- set ops (SetQueryOperation) ----

    def union(self, other: "Table") -> "Table":
        return Table(self._df.unionByName(other._df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return Table(self._df.unionByName(other._df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self._df.intersect(other._df))

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self._df.intersectAll(other._df))

    def minus(self, other: "Table") -> "Table":
        return Table(self._df.subtract(other._df))

    def minus_all(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df))

    def distinct(self) -> "Table":
        return Table(self._df.distinct())

    # ---- execution ----

    def to_data_frame(self) -> DataFrame:
        return self._df

    def execute(self) -> DataFrame:
        return self._df

    def explain(self) -> str:
        return self._df._jdf.queryExecution().toString()


class GroupedTable:
    def __init__(self, df: DataFrame, keys: list[Column]):
        self._df, self._keys = df, keys

    def select(self, *exprs) -> Table:
        """PyFlink contract: the grouping keys listed first, then the
        aggregate expressions (grouping columns come through the
        groupBy output automatically)."""
        aggs = _cols(exprs)[len(self._keys):]
        return Table(self._df.groupBy(*self._keys).agg(*aggs))

    def agg(self, *exprs) -> Table:
        return Table(self._df.groupBy(*self._keys).agg(*_cols(exprs)))

    def flat_aggregate(self, create_acc, accumulate, emit_value, schema) -> Table:
        """Table API flatAggregate (pyflink GroupedTable.flat_aggregate
        over a TableAggregateFunction): multi-row emission per group —
        delegates to the DataStream surface's accumulator contract
        (``datastream.KeyedStream.flat_aggregate``)."""
        from flink_1_16_0_src_spark.datastream import DataStream

        key_names = [self._df.select(k).columns[0] for k in self._keys]
        return Table(
            DataStream(self._df)
            .key_by(*key_names)
            .flat_aggregate(create_acc, accumulate, emit_value, schema)
            .df
        )


# ---- group windows (Tumble/Slide/Session descriptors, pyflink/table/window.py;
# reference GroupWindowedTable / WindowGroupedTable in T-API table.py twins) ----


class _GroupWindow:
    """Resolved window descriptor: kind + durations + time column +
    alias. ``spark_key()`` lowers it to the builtin window()/
    session_window() grouping expression."""

    def __init__(self, kind: str, size: str, slide: str | None, ts: Column | None, name: str | None):
        self.kind, self.size, self.slide, self.ts, self.name = kind, size, slide, ts, name

    def on(self, ts) -> "_GroupWindow":
        self.ts = _cols([ts])[0]
        return self

    def alias(self, name: str) -> "_GroupWindow":
        self.name = name
        return self

    def spark_key(self) -> Column:
        if self.kind == "tumble":
            w = F.window(self.ts, self.size)
        elif self.kind == "slide":
            w = F.window(self.ts, self.size, self.slide)
        else:
            w = F.session_window(self.ts, self.size)
        return w.alias(self.name)


class Tumble:
    @staticmethod
    def over(size: str) -> _GroupWindow:
        return _GroupWindow("tumble", size, None, None, None)


class Slide:
    @staticmethod
    def over(size: str) -> "_SlideBuilder":
        return _SlideBuilder(size)


class _SlideBuilder:
    def __init__(self, size: str):
        self._size = size

    def every(self, slide: str) -> _GroupWindow:
        return _GroupWindow("slide", self._size, slide, None, None)


class Session:
    @staticmethod
    def with_gap(gap: str) -> _GroupWindow:
        return _GroupWindow("session", gap, None, None, None)


class WindowedTable:
    """Table.window(Tumble.over(...).on(...).alias('w')) — group_by
    must reference the window alias plus any keys (PyFlink
    GroupWindowedTable contract)."""

    def __init__(self, df: DataFrame, win: _GroupWindow):
        self._df, self._win = df, win

    def group_by(self, *keys) -> "GroupedTable":
        spark_keys = []
        for k in keys:
            # the window alias is referenced as col('<name>'): compare
            # the unresolved column reprs
            if isinstance(k, Expr) and str(k._c) == str(F.col(self._win.name)):
                spark_keys.append(self._win.spark_key())
            else:
                spark_keys.append(_cols([k])[0])
        return WindowGroupedTable(self._df, spark_keys)


class WindowGroupedTable(GroupedTable):
    """PyFlink WindowGroupedTable: select() lists one projection per
    grouping key first (window properties like col('w').start resolve
    against the aggregated output), then the aggregates."""

    def select(self, *exprs) -> "Table":
        n_keys = len(self._keys)
        cols = _cols(exprs)
        out = self._df.groupBy(*self._keys).agg(*cols[n_keys:])
        agg_names = out.columns[n_keys:]
        return Table(out.select(*cols[:n_keys], *agg_names))


# window_start/window_end accessors: col("w").start / col("w").end
def _expr_start(self: Expr) -> Expr:
    return Expr(self._c.getField("start"))


def _expr_end(self: Expr) -> Expr:
    return Expr(self._c.getField("end"))


Expr.start = property(_expr_start)
Expr.end = property(_expr_end)


def _table_window(self: Table, win: _GroupWindow) -> WindowedTable:
    if win.ts is None or win.name is None:
        raise ValueError("window descriptor needs .on(col) and .alias(name)")
    return WindowedTable(self._df, win)


Table.window = _table_window


# ---- OVER windows (pyflink Over descriptor → pyspark.sql.Window) ----


class Over:
    @staticmethod
    def partition_by(*keys) -> "_OverBuilder":
        return _OverBuilder(keys)

    @staticmethod
    def order_by(*exprs) -> "_OverBuilder":
        return _OverBuilder(()).order_by(*exprs)


class _OverBuilder:
    """Over.partition_by(...).order_by(...).preceding(...).alias(name)
    (pyflink/table/window.py Over). preceding accepts 'unbounded_range',
    'unbounded_row', or an int row count; following defaults to
    CURRENT ROW/RANGE like the reference."""

    def __init__(self, keys):
        from pyspark.sql import Window as W

        self._keys = _cols(list(keys)) if keys else []
        self._order: list[Column] = []
        self._preceding: str | int = "unbounded_range"
        self._name: str | None = None
        self._W = W

    def order_by(self, *exprs) -> "_OverBuilder":
        self._order = _cols(exprs)
        return self

    def preceding(self, p: str | int) -> "_OverBuilder":
        self._preceding = p
        return self

    def alias(self, name: str) -> "_OverBuilder":
        self._name = name
        return self

    def spec(self):
        w = self._W.partitionBy(*self._keys)
        if self._order:
            w = w.orderBy(*self._order)
        if self._preceding == "unbounded_range":
            w = w.rangeBetween(self._W.unboundedPreceding, self._W.currentRow)
        elif self._preceding == "unbounded_row":
            w = w.rowsBetween(self._W.unboundedPreceding, self._W.currentRow)
        else:
            w = w.rowsBetween(-int(self._preceding), self._W.currentRow)
        return w


class OverWindowedTable:
    def __init__(self, df: DataFrame, over: _OverBuilder):
        self._df, self._over = df, over

    def select(self, *exprs) -> Table:
        out = []
        for e in exprs:
            if isinstance(e, Expr) and getattr(e, "_pending_over", False):
                c = e._c.over(self._over.spec())
                name = getattr(e, "_over_alias", None)
                out.append(c.alias(name) if name else c)
            else:
                out.append(_cols([e])[0])
        return Table(self._df.select(*out))


def _expr_over(self: Expr, _window_ref) -> Expr:
    """col('b').sum.over(col('w')) — the aggregate is applied over the
    enclosing over_window's spec at select time (the reference resolves
    the alias the same way). A later .alias() is deferred until after
    the OVER is attached (aliasing the bare aggregate first would make
    Column.over illegal)."""
    e = Expr(self._c)
    e._pending_over = True
    return e


_expr_alias_plain = Expr.alias


def _expr_alias(self: Expr, name: str) -> Expr:
    if getattr(self, "_pending_over", False):
        e = Expr(self._c)
        e._pending_over = True
        e._over_alias = name
        return e
    return _expr_alias_plain(self, name)


Expr.alias = _expr_alias


Expr.over = _expr_over


def _table_over_window(self: Table, over: _OverBuilder) -> OverWindowedTable:
    return OverWindowedTable(self._df, over)


Table.over_window = _table_over_window
