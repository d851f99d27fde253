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
