"""CEP / MATCH_RECOGNIZE — pattern matching over ordered event rows.

Reference parity (SURVEY.md §2.8):
- SQL MATCH_RECOGNIZE: StreamExecMatch.java:59 / BatchExecMatch.java —
  PARTITION BY / ORDER BY rowtime / PATTERN / DEFINE / MEASURES /
  AFTER MATCH SKIP { PAST LAST ROW | TO NEXT ROW }.
- CEP library NFA: flink-libraries/flink-cep/.../nfa/NFA.java:86 —
  v1 scope is strict contiguity with greedy quantifiers
  (SURVEY.md §7.3 risk 4), which covers PATTERN (A B* C), (A B+ C?),
  {n,m} ranges; no ALTERNATION groups yet (A|B inside one variable can
  be expressed in its DEFINE predicate instead).

Execution model: the NFA core is pure Python over one key's ordered
rows; Spark distributes it per key via ``applyInPandas`` (batch) /
``applyInPandasWithState`` (streaming, buffer carried across batches).
Per-key sequential scan is inherent to CEP — the reference runs the
same way inside its keyed operator; the 100 TB story is key
parallelism, not intra-key parallelism.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

Row = dict
Matched = dict  # var name -> list[Row]
Predicate = Callable[[Row, Matched], bool]


@dataclass
class Step:
    """One pattern variable: ``var`` with quantifier {min,max} and a
    DEFINE predicate. ``max=None`` means unbounded (* / +); greedy."""

    var: str
    predicate: Predicate
    min: int = 1
    max: int | None = 1

    @staticmethod
    def star(var: str, predicate: Predicate) -> "Step":
        return Step(var, predicate, 0, None)

    @staticmethod
    def plus(var: str, predicate: Predicate) -> "Step":
        return Step(var, predicate, 1, None)

    @staticmethod
    def opt(var: str, predicate: Predicate) -> "Step":
        return Step(var, predicate, 0, 1)


def _match_at(
    rows: list[Row], start: int, steps: list[Step], within: tuple[str, object] | None = None
) -> tuple[int, Matched] | None:
    """Greedy backtracking match anchored at ``start``; returns
    (end_exclusive, matched-rows-per-var) for the longest match, else
    None. Strict contiguity (every row must be consumed by some var).
    ``within=(ts_col, max_delta)`` prunes matches spanning more than
    max_delta from the first matched row (Pattern.within /
    flink-cep Pattern.java windowTime)."""

    def in_window(j: int) -> bool:
        if within is None:
            return True
        ts_col, max_delta = within
        return rows[j][ts_col] - rows[start][ts_col] <= max_delta

    def rec(i: int, si: int, matched: Matched) -> tuple[int, Matched] | None:
        if si == len(steps):
            return i, {k: list(v) for k, v in matched.items()}
        step = steps[si]
        taken = []
        matched.setdefault(step.var, [])
        base_len = len(matched[step.var])
        # greedily consume as many as allowed
        j = i
        while (step.max is None or len(taken) < step.max) and j < len(rows):
            if in_window(j) and step.predicate(rows[j], matched):
                matched[step.var].append(rows[j])
                taken.append(rows[j])
                j += 1
            else:
                break
        # backtrack from longest to min
        while True:
            if len(taken) >= step.min:
                res = rec(j, si + 1, matched)
                if res is not None:
                    return res
            if not taken:
                break
            taken.pop()
            matched[step.var].pop()
            j -= 1
        del matched[step.var][base_len:]
        if not matched[step.var]:
            del matched[step.var]
        return None

    return rec(start, 0, {})


def _partial_at(rows: list[Row], start: int, steps: list[Step]) -> bool:
    """True if rows[start:] can ALL be consumed by a proper prefix of
    the pattern — i.e. a match could still complete with future rows.
    Drives streaming buffer retention."""

    def rec(i: int, si: int, matched: Matched) -> bool:
        if i == len(rows):
            return True  # everything consumed; pattern still open (full matches are caught by _match_at first)
        if si == len(steps):
            return False  # pattern exhausted but rows remain
        step = steps[si]
        matched.setdefault(step.var, [])
        base_len = len(matched[step.var])
        taken = []
        j = i
        while (step.max is None or len(taken) < step.max) and j < len(rows):
            if step.predicate(rows[j], matched):
                matched[step.var].append(rows[j])
                taken.append(rows[j])
                j += 1
            else:
                break
        while True:
            if len(taken) >= step.min and rec(j, si + 1, matched):
                return True
            if (step.max is None or len(taken) <= step.max) and j == len(rows) and taken:
                return True  # quantifier still open at buffer end
            if not taken:
                break
            taken.pop()
            matched[step.var].pop()
            j -= 1
        del matched[step.var][base_len:]
        return False

    return rec(start, 0, {})


def match_sequence(
    rows: list[Row],
    steps: list[Step],
    after_match: str = "past_last_row",
    within: tuple[str, object] | None = None,
) -> list[Matched]:
    """Run the pattern over one key's ordered rows. ``after_match``:
    'past_last_row' resumes after the match (non-overlapping, Flink's
    default) or 'to_next_row' resumes at start+1 (overlapping).
    ``within=(ts_col, max_delta)`` bounds a match's time span."""
    out: list[Matched] = []
    i = 0
    while i < len(rows):
        m = _match_at(rows, i, steps, within)
        if m is not None:
            end, matched = m
            out.append(matched)
            i = end if (after_match == "past_last_row" and end > i) else i + 1
        else:
            i += 1
    return out


# ---- MEASURES helpers (reference: MatchCodeGenerator.scala measures) ----


def first(matched: Matched, var: str, col: str):
    return matched[var][0][col] if matched.get(var) else None


def last(matched: Matched, var: str, col: str):
    return matched[var][-1][col] if matched.get(var) else None


def count_of(matched: Matched, var: str) -> int:
    return len(matched.get(var, []))


def sum_of(matched: Matched, var: str, col: str) -> float:
    return float(sum(r[col] for r in matched.get(var, [])))


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: str | list[str],
    steps: list[Step],
    measures: dict[str, Callable[[Matched], object]],
    output_schema: StructType,
    after_match: str = "past_last_row",
    within: tuple[str, object] | None = None,
) -> DataFrame:
    """Batch MATCH_RECOGNIZE: one output row per match, carrying the
    partition keys + computed measures. Distributed per partition key
    (single shuffle), NFA scan inside each key. ``within`` bounds the
    match's time span (Pattern.within parity)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="stable")  # str or list both fine
        rows = pdf.to_dict("records")
        keys = {k: pdf.iloc[0][k] for k in partition_by}
        out = []
        for matched in match_sequence(rows, steps, after_match, within):
            rec = dict(keys)
            for name, fmeas in measures.items():
                rec[name] = fmeas(matched)
            out.append(rec)
        cols = [f.name for f in output_schema.fields]
        return pd.DataFrame(out, columns=cols)

    return df.groupBy(*partition_by).applyInPandas(fn, output_schema)


def match_recognize_stream(
    sdf: DataFrame,
    partition_by: list[str],
    order_by: str,
    steps: list[Step],
    measures: dict[str, Callable[[Matched], object]],
    output_schema: StructType,
    after_match: str = "past_last_row",
) -> DataFrame:
    """Streaming MATCH_RECOGNIZE: per-key row buffer carried in state
    (JSON rows), matched greedily each batch; matched prefixes are
    discarded, the unmatched tail is retained (bounded by the longest
    open partial match — callers should bound patterns with a time
    condition in DEFINE for production, like Flink's WITHIN clause)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import ArrayType, StringType, StructField

    state_schema = StructType([StructField("buf", ArrayType(StringType()))])

    def fn(key, pdfs: Iterable[pd.DataFrame], state) -> Iterable[pd.DataFrame]:
        buf = [json.loads(s) for s in state.get[0]] if state.exists else []
        for pdf in pdfs:
            for d in pdf.sort_values(order_by, kind="stable").to_dict("records"):
                d[order_by] = (
                    d[order_by].isoformat() if hasattr(d[order_by], "isoformat") else d[order_by]
                )
                buf.append(d)
        buf.sort(key=lambda r: r[order_by])
        out, consumed = [], 0
        i = 0
        while i < len(buf):
            m = _match_at(buf, i, steps)
            if m is not None:
                end, matched = m
                rec = dict(zip(partition_by, key))
                for name, fmeas in measures.items():
                    rec[name] = fmeas(matched)
                out.append(rec)
                nxt = end if (after_match == "past_last_row" and end > i) else i + 1
                consumed, i = nxt, nxt
            elif _partial_at(buf, i, steps):
                break  # open partial match — retain buf[i:] for future rows
            else:
                i += 1
                consumed = i  # row i can never start a match; drop it
        buf = buf[consumed:]
        state.update(([json.dumps(r, default=str) for r in buf],))
        cols = [f.name for f in output_schema.fields]
        res = pd.DataFrame(out, columns=cols)
        # JSON round-trip stringifies timestamps — restore declared dtypes
        for f in output_schema.fields:
            if "timestamp" in f.dataType.simpleString():
                res[f.name] = pd.to_datetime(res[f.name])
        yield res

    return sdf.groupBy(*partition_by).applyInPandasWithState(
        fn, output_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
