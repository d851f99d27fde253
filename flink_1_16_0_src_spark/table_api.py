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


class Table:
    """Fluent relational surface over a DataFrame (PyFlink Table)."""

    def __init__(self, df: DataFrame):
        self._df = df

    # ---- projection / filter (ProjectQueryOperation / Filter...) ----

    def select(self, *exprs) -> "Table":
        return Table(self._df.select(*_cols(exprs)))

    def add_columns(self, *exprs) -> "Table":
        return Table(self._df.select("*", *_cols(exprs)))

    def drop_columns(self, *names: str) -> "Table":
        return Table(self._df.drop(*names))

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
