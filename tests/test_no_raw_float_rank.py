"""Source-scan pin (VERDICT r2 next-round #1 'done' criterion): no
row_number/rank window anywhere may ORDER BY an unrounded float
aggregate column. Raw double sums differ in the last ulp across
engines and across Spark partition orders, so a rank boundary on them
is nondeterministic — every ranking on a computed float (``__``-prefixed
internal columns like __cos/__adc/__dists) must round first
(F.round(col, n)) so ties collapse identically everywhere."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "flink_1_16_0_src_spark"


def _order_by_spans(src: str):
    """Yield the balanced-paren argument span of every .orderBy( call."""
    for m in re.finditer(r"\.orderBy\(", src):
        i, depth = m.end(), 1
        while i < len(src) and depth:
            if src[i] == "(":
                depth += 1
            elif src[i] == ")":
                depth -= 1
            i += 1
        yield src[m.end() : i - 1]


# __-prefixed internal columns that are NOT computed floats (event-time
# copies, side tags, epoch longs) — exempt from the rounding rule. Any NEW
# __column in an orderBy must either round or be classified here.
NON_FLOAT_INTERNAL = {
    "__t", "__side", "__rt", "__epoch", "__rowtime", "__ts", "__ord",
    "__b",  # histogram_quantiles bucket index — floor()ed bigint
    "__q6",  # token_budget_select quality — round()ed 6-dp BIGINT micro-units
    "__idh",  # quality_percentile id-range sub-bucket — floor()ed BIGINT
}


def test_no_rank_on_unrounded_float_column():
    offenders = []
    for path in PKG.rglob("*.py"):
        src = path.read_text()
        for span in _order_by_spans(src):
            # internal computed-float columns are __-prefixed by convention
            cols = set(re.findall(r"""['"](__[a-z][a-z0-9_]*)['"]""", span))
            if (cols - NON_FLOAT_INTERNAL) and "F.round" not in span:
                offenders.append((str(path), span.strip()[:80]))
    assert not offenders, f"rank on unrounded float column(s): {offenders}"


def _call_spans(src: str, fn: str):
    """Yield the balanced-paren argument span of every ``fn(`` call."""
    for m in re.finditer(re.escape(fn) + r"\(", src):
        i, depth = m.end(), 1
        while i < len(src) and depth:
            if src[i] == "(":
                depth += 1
            elif src[i] == ")":
                depth -= 1
            i += 1
        yield src[m.end() : i - 1]


def test_no_argmin_on_unrounded_float_array():
    """VERDICT r3 guard extension: argmin via array_position(X,
    array_min(X)) is the same cross-engine hazard as raw-float ranking —
    a one-ulp difference near a distance tie flips the selected cell
    (the driver r2/r3 cluster_kmeans_update hash-fail class). Every
    array_min over a computed-double array must operate on a ROUNDED
    array: either the span itself rounds (F.round) or the argument is a
    variable the call site derived via a round-transform (named rd/
    rdists/__rdists by convention)."""
    offenders = []
    for path in PKG.rglob("*.py"):
        src = path.read_text()
        for span in _call_spans(src, "F.array_min"):
            s = span.strip()
            if "F.round" in s or re.fullmatch(r"(rd|rdists|cur)", s) or "__rdists" in s:
                continue
            offenders.append((str(path), s[:80]))
    assert not offenders, f"argmin over unrounded float array(s): {offenders}"


def test_no_round_of_aggregate_divide_in_queries():
    """VERDICT r3 guard extension: round(<double-divide of a decimal
    aggregate>) in a query's hashed surface is a cross-engine boundary
    lottery — Spark rounds doubles exactly (BigDecimal half-up), DuckDB
    via an inexact ×10^n multiply, so a mean landing near x.00005
    diverges (cluster_kmeans_update failed the driver twice this way
    while passing every local run). Emit sufficient statistics
    (n, decimal sums as strings) or divide in decimal instead."""
    offenders = []
    for path in (PKG / "queries").rglob("*.py"):
        src = path.read_text()
        for span in _call_spans(src, "F.round"):
            flat = " ".join(span.split())
            if 'cast("double") /' in flat or "/ F.count" in flat:
                offenders.append((str(path), flat[:100]))
    assert not offenders, f"round of aggregate double-divide: {offenders}"
