"""Shims for Flink built-ins without a direct Spark equivalent.

References into BuiltInFunctionDefinitions.java (T-COMMON/functions/)
and runtime SqlFunctionUtils.java (T-RUNTIME/functions/) by line.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_index(col: Column | str, sep: str, index: int) -> Column:
    """SPLIT_INDEX(str, sep, idx) — 0-based, NULL when out of range
    (BuiltInFunctionDefinitions.java:923; runtime
    SqlFunctionUtils.java splitIndex). Spark: get() over split()."""
    return F.get(F.split(col, _regex_escape(sep)), index)


def _regex_escape(sep: str) -> str:
    # Flink's SPLIT_INDEX separator is a literal, Spark's split takes a
    # regex — escape metacharacters
    import re

    return re.escape(sep)


def truncate_number(col: Column | str, scale: int = 0) -> Column:
    """TRUNCATE(x, d) — truncate toward zero to d decimals
    (BuiltInFunctionDefinitions truncate; Flink SqlFunctionUtils).
    Spark's trunc() is date-only, so compose: int-cast is
    toward-zero."""
    factor = 10**scale
    c = F.col(col) if isinstance(col, str) else col
    return (c * factor).cast("long") / F.lit(factor)


def temporal_overlaps(
    start1: Column, end1: Column, start2: Column, end2: Column
) -> Column:
    """(s1, e1) OVERLAPS (s2, e2) (BuiltInFunctionDefinitions.java:1475
    temporalOverlaps): half-open interval intersection test, SQL
    standard semantics (inclusive ends per Calcite)."""
    return (start1 <= end2) & (start2 <= end1)


def time_of_day_millis(ts: Column | str) -> Column:
    """TIME(p) representation (T-COMMON/types/logical/TimeType.java;
    runtime stores TIME as int millis-of-day, RowData.java getInt).
    Spark has no TIME type — SURVEY §1.3 maps it to an integer
    millis-of-day column. Millis within the minute come from the epoch
    so sub-second precision survives (unix_timestamp would truncate)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (
        F.hour(c).cast("bigint") * 3600000
        + F.minute(c).cast("bigint") * 60000
        + (F.unix_micros(c) / 1000).cast("bigint") % 60000
    )


def time_from_millis(millis: Column | str) -> Column:
    """Render an int millis-of-day TIME value as 'HH:mm:ss.SSS' (the
    inverse of time_of_day_millis, for sinks/display — Flink's
    TimeType casts to string the same way)."""
    c = F.col(millis) if isinstance(millis, str) else millis
    return F.concat_ws(
        ":",
        F.lpad((c / 3600000).cast("bigint").cast("string"), 2, "0"),
        F.lpad(((c / 60000).cast("bigint") % 60).cast("string"), 2, "0"),
        F.concat(
            F.lpad(((c / 1000).cast("bigint") % 60).cast("string"), 2, "0"),
            F.lit("."),
            F.lpad((c % 1000).cast("string"), 3, "0"),
        ),
    )


def single_value(col: Column | str) -> Column:
    """SINGLE_VALUE aggregate (SingleValueAggFunction.java): returns the
    group's only value, raises if the group has more than one row —
    used by the planner under scalar subqueries. Spark has no erroring
    builtin; raise via assert_true + first."""
    c = F.col(col) if isinstance(col, str) else col
    check = F.assert_true(
        F.count(c) <= 1, F.lit("SINGLE_VALUE: more than one row in group")
    )
    # assert_true returns NULL on success; coalesce keeps the value
    return F.when(check.isNull(), F.first(c, ignorenulls=False)).otherwise(F.first(c))

def current_watermark(ts: Column, delay_interval: str, arrival_order: Column) -> Column:
    """CURRENT_WATERMARK(rowtime) (BuiltInFunctionDefinitions.java:1754)
    — bounded-out-of-orderness watermark as of each row's ARRIVAL:
    max rowtime over strictly-preceding arrivals minus the delay, NULL
    before any row (Flink returns NULL when no watermark was emitted
    yet). The 1-PRECEDING frame encodes emit-then-advance: a row is
    judged against the watermark from BEFORE it arrived, the same rule
    `streaming/late.LateRowRouter` applies across micro-batches.

    Batch analog only — in live streams the carried watermark lives in
    LateRowRouter. Global ordering ⇒ single-partition window; use on
    bounded replay/debug data, not a 100 TB scan.
    """
    from pyspark.sql.window import Window

    w = Window.orderBy(arrival_order).rowsBetween(Window.unboundedPreceding, -1)
    return F.max(ts).over(w) - F.expr(f"INTERVAL {delay_interval}")


def is_alpha(col: Column | str) -> Column:
    """Flink IS_ALPHA (flink-table-runtime SqlFunctionUtils.isAlpha:
    true iff the string is non-empty and every char is a letter)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"^\p{L}+$")


def is_digit(col: Column | str) -> Column:
    """Flink IS_DIGIT (SqlFunctionUtils.isDigit: non-empty, all digit
    chars)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"^[0-9]+$")


def is_decimal(col: Column | str) -> Column:
    """Flink IS_DECIMAL (SqlFunctionUtils.isDecimal: the string parses
    as a decimal number — optional sign, digits, optional point)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$")


def similar_to_regex(pattern: str, escape: str | None = None) -> str:
    """Translate a SQL:2016 ``SIMILAR TO`` pattern to an ANCHORED
    regex: ``%``→``.*``, ``_``→``.``; ``| * + ? ( ) [ ]`` keep their
    regex meaning; ``. \\ ^ $ { }`` are literals. Shared by the Spark
    predicate below and the DuckDB oracles (DuckDB's own SIMILAR TO is
    a plain anchored regex WITHOUT the %/_ wildcard translation — a
    cross-dialect trap, so both engines consume this one output)."""
    out = []
    in_class = False
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if escape and ch == escape and i + 1 < len(pattern):
            nxt = pattern[i + 1]
            # escaped char is literal: regex-escape it if it's regex meta
            out.append("\\" + nxt if nxt in ".\\^$*+?()[]{}|" else nxt)
            i += 2
            continue
        if in_class:
            out.append(ch)
            if ch == "]":
                in_class = False
        elif ch == "[":
            out.append(ch)
            in_class = True
        elif ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        elif ch in r".\^${}":
            # literal in SIMILAR TO, meta in Java regex
            out.append("\\" + ch)
        else:
            # | * + ? ( ) keep their regex meaning under SIMILAR TO
            out.append(ch)
        i += 1
    return "^" + "".join(out) + "$"


def similar_to(col: Column | str, pattern: str, escape: str | None = None) -> Column:
    """SQL:2016 ``SIMILAR TO`` predicate (Calcite SqlLikeUtils.similar,
    used by the reference planner): LIKE wildcards ``%``/``_`` combined
    with POSIX-regex operators, matched against the WHOLE string. Spark
    has no SIMILAR TO, so the pattern is translated to an anchored Java
    regex at plan time (driver-side string work; the executed predicate
    is a codegen'd RLike)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(similar_to_regex(pattern, escape))


def element(arr: Column | str) -> Column:
    """Flink ``ELEMENT(array)`` (BuiltInFunctionDefinitions ELEMENT):
    the sole element of a single-element array, NULL for an empty
    array, runtime error when the array has more than one element."""
    a = F.col(arr) if isinstance(arr, str) else arr
    return (
        F.when(F.size(a) == 1, F.element_at(a, 1))
        .when(F.size(a) == 0, F.lit(None))
        .otherwise(F.raise_error(F.lit("ELEMENT() on array with more than one element")))
    )


def current_row_timestamp() -> Column:
    """Flink ``CURRENT_ROW_TIMESTAMP()`` (BuiltInFunctionDefinitions —
    evaluated PER ROW, unlike CURRENT_TIMESTAMP's per-query constant).
    Spark's now()/current_timestamp() are query-constant, so the
    per-row clock goes through ``reflect('java.lang.System',
    'currentTimeMillis')`` — still JVM-side codegen, no Python.
    Nondeterministic by definition: no oracle (same class as
    PROCTIME())."""
    return F.timestamp_millis(
        F.expr("CAST(reflect('java.lang.System','currentTimeMillis') AS BIGINT)")
    )
