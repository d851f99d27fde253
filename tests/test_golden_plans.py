"""Golden optimized-plan snapshots — the analog of the reference's 222
checked-in XML plan files (SURVEY.md §5 layer 2). A normalized
`explain(formatted)` for representative queries is pinned under
tests/golden_plans/; a change in join strategy, pushdown, or agg mode
shows up as a diff here before it shows up as a perf regression.

Normalization strips volatile tokens (expression ids, codegen ids,
paths, stats, plan-node numbering) so only STRUCTURE is pinned.
"""

from __future__ import annotations

import os
import re

import pytest

from flink_1_16_0_src_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_plans")

PINNED = [
    "agg_q6_forecast_revenue",   # scan+filter pushdown+agg
    "join_multiway_q5",          # multi-join order + broadcast choices
    "topn_per_group",            # WindowGroupLimit
    "setop_intersect_all",       # intersect-all rewrite
    "join_range_bucketed",       # custom range join lowering
    "agg_q1_pricing_summary",    # two-phase hash agg (partial+final)
    "tpch_q21_suppliers_waiting",  # semi + anti join pair
    "subq_tpch_q20_nested_in",   # nested IN → semi-join chain
    "join_semi",                 # IN-subquery semi join
    "join_asof_temporal",        # as-of temporal join lowering
    "agg_grouping_sets",         # Expand operator
    "over_rows_sliding",         # window frame physical op
    "dedup_keep_first",          # dedup → window + filter
    "unnest_with_ordinality",    # posexplode generator
    "tpcds_q67_rollup_rank",     # rollup + rank over aggregate
    "tpcds_q57_monthly_deviation",  # window avg + rank over agg CTE
    "tpcds_q78_unreturned_ratio",   # distinct-derived anti join + agg
    "tpcds_q72_date_offset_join",   # residual inequality on hash join
    "tpcds_q92_excess_discount",    # decorrelated scalar-avg threshold
    "tvf_sql_tumble",               # SQL-text TVF lowering == window() plan
    "cep_followed_by",              # Pattern API NFA partition shape
    "tpcds_q45_disjunctive_subquery",  # IN-subquery inside OR (existence join)
    "tpcds_q98_class_share_window",    # window sum over aggregate output
    "sample_stratified_cap",        # hash-order window + group limit (r3)
    "pack_sequences_bins",          # single-shuffle prefix-sum packing (r3)
    "decontam_ngram_overlap",       # broadcast bench grams + map-side check (r3)
    "join_bucketed_exchange_free",  # zero-exchange bucketed join (r3)
]


def _normalize(plan: str) -> str:
    out = []
    for line in plan.splitlines():
        if not line.strip():
            continue
        # keep only the operator-tree section and node headers
        if line.startswith("== Physical Plan =="):
            out.append(line)
            continue
        if re.match(r"^\s*[:+\-|*\s]*[A-Za-z(]", line) and "==" not in line:
            s = re.sub(r"#\d+L?", "#x", line)
            s = re.sub(r"\[id=#?\d+\]", "[id=#x]", s)
            s = re.sub(r"file:[^\s,\]]+", "file:PATH", s)
            s = re.sub(r"\(\d+\)", "(n)", s)
            s = re.sub(r"Statistics\([^)]*\)", "Statistics(X)", s)
            # only keep tree lines (node names), drop detail sections
            if re.match(r"^\s*(\(n\)\s+)?[:+\-|*\s]*(\*?\s*)?[A-Z][A-Za-z]+", s) and ":" not in s.split()[0]:
                pass
            out.append(s)
        if len(out) > 400:
            break
    # keep only the tree (before the first node-detail block)
    tree = []
    for line in out:
        if re.match(r"^\(n\) [A-Z]", line.strip()):
            break
        tree.append(line.rstrip())
    return "\n".join(tree) + "\n"


@pytest.mark.parametrize("name", PINNED)
def test_golden_plan(spark, name):
    df = all_queries()[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    got = _normalize(plan)
    path = os.path.join(GOLDEN_DIR, f"{name}.txt")
    if not os.path.exists(path):  # first run records the golden
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(got)
        pytest.skip(f"golden recorded: {path}")
    with open(path) as f:
        want = f.read()
    assert got == want, f"optimized plan drifted for {name} — diff vs {path}"
