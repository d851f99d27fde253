"""Unit tests for the SIMILAR TO pattern translation and ELEMENT()
(functions/scalar.py) — the oracled conformance query covers fixture
shapes; these cover the translation grammar incl. ESCAPE and the
ELEMENT empty/error branches."""

from __future__ import annotations

import re

import pytest

from flink_1_16_0_src_spark.functions.scalar import similar_to_regex


@pytest.mark.parametrize(
    "pattern,escape,matches,rejects",
    [
        ("%(red|blue)%", None, ["a red x", "blue"], ["green", "re d"]),
        ("Brand#_", None, ["Brand#7"], ["Brand#17", "Brand#"]),
        ("[0-9]-%", None, ["1-URGENT", "5-"], ["x-URGENT", "12URGENT"]),
        ("a_c", None, ["abc", "a.c"], ["ac", "abbc"]),
        # ESCAPE: wildcard made literal
        ("100!%", "!", ["100%"], ["1000", "100"]),
        ("a!_b", "!", ["a_b"], ["axb"]),
        # regex metas that are LITERAL under SIMILAR TO
        ("a.b", None, ["a.b"], ["axb"]),
        ("c^d", None, ["c^d"], ["cd"]),
        # quantifiers keep regex meaning
        ("ab+c", None, ["abc", "abbc"], ["ac"]),
        ("x[abc]*y", None, ["xy", "xabcy"], ["xdy"]),
    ],
)
def test_similar_to_regex_translation(pattern, escape, matches, rejects):
    rx = re.compile(similar_to_regex(pattern, escape))
    # the translated regex is ^...$-anchored, so search == whole-string match
    for s in matches:
        assert rx.search(s), (pattern, s)
    for s in rejects:
        assert not rx.search(s), (pattern, s)


def test_element_branches(spark):
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark.functions.scalar import element

    df = spark.createDataFrame([(1, ["only"]), (2, [])], "id int, arr array<string>")
    rows = {r["id"]: r["e"] for r in df.select("id", element("arr").alias("e")).collect()}
    assert rows == {1: "only", 2: None}

    big = spark.createDataFrame([(3, ["a", "b"])], "id int, arr array<string>")
    with pytest.raises(Exception):
        big.select(element("arr").alias("e")).collect()


def test_current_row_timestamp_per_row_and_bounded(spark):
    """CURRENT_ROW_TIMESTAMP(): per-row wall-clock (not the per-query
    constant current_timestamp) — every value falls inside the
    [before, after] bracket of the action."""
    import datetime as dt

    from flink_1_16_0_src_spark.functions.scalar import current_row_timestamp

    before = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    rows = (
        spark.range(100)
        .select(current_row_timestamp().alias("ts"))
        .collect()
    )
    after = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    assert all(before - dt.timedelta(seconds=2) <= r.ts <= after + dt.timedelta(seconds=2) for r in rows)


def test_localtime_localtimestamp_clock_class(spark):
    """LOCALTIMESTAMP / LOCALTIME (BuiltInFunctionDefinitions
    localTimestamp/localTime): Spark does not parse the bare keywords,
    so translate_niladic_clocks (riding every SQL entry point's
    translate_hints pass) maps LOCALTIMESTAMP -> localtimestamp() and
    LOCALTIME -> millis-of-day BIGINT (the repo's TIME(p) convention,
    func_time_type). Bracketed like every clock-class function (no
    oracle by design)."""
    import datetime as dt

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    before = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    row = t.sql_query(
        "SELECT LOCALTIMESTAMP AS lts, LOCALTIME AS lt, CURRENT_DATE AS d,"
        " CAST(CURRENT_TIMESTAMP AS TIMESTAMP_NTZ) AS cts"
    ).collect()[0]
    after = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    slop = dt.timedelta(seconds=2)
    assert before - slop <= row.lts <= after + slop
    assert abs((row.cts - row.lts).total_seconds()) < 2  # same UTC instant
    ms_of_day = (before.hour * 3600 + before.minute * 60) * 1000
    assert abs(row.lt - ms_of_day) < 3_700_000  # within the hour + slop
    assert row.d in (before.date(), after.date())


def test_niladic_clock_rewrite_quote_aware_and_session_tz(spark):
    """The niladic-clock pass must not rewrite occurrences inside
    string literals, and LOCALTIME must read the SESSION-timezone wall
    clock (millis-of-day of localtimestamp()), not UTC millis-of-day —
    Flink's localTime is session-zone-local like localTimestamp."""
    from flink_1_16_0_src_spark.session import translate_niladic_clocks

    sql = ("SELECT 'LOCALTIME wins' AS a, LOCALTIME AS lt "
           "WHERE 'x' LIKE '%LOCALTIMESTAMP%'")
    out = translate_niladic_clocks(sql)
    assert "'LOCALTIME wins'" in out and "'%LOCALTIMESTAMP%'" in out
    assert "hour(localtimestamp())" in out

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        row = spark.sql(translate_niladic_clocks(
            "SELECT LOCALTIME AS lt, hour(localtimestamp()) AS h,"
            " minute(localtimestamp()) AS m")).collect()[0]
        assert row.lt // 3600000 == row.h
        assert (row.lt % 3600000) // 60000 == row.m
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
