"""Bench one-line budget gate (VERDICT r11 next-steps #2).

The driver captures the LAST 2000 bytes of bench.py output and parses
the final JSON line; r5's over-long line recorded ``parsed: null`` and
r11's 59-row line filled 1,999 of the 2,000 capture bytes. This test
serializes the CURRENT headline list through the exact production
serializer at worst-case digit widths and fails before catalog growth
can reproduce that — adding a headline row that breaks the budget is a
red test, not a judge finding.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def test_worst_case_line_fits_budget_with_margin():
    # Worst case far beyond "current timings + 20% digit inflation":
    # every per-query median at 3 integer digits + 2 dp (no headline row
    # has ever exceeded 10 s at sf0.1), total at 5 integer digits + 3 dp.
    timings = {name: 999.99 for name in bench.HEADLINE}
    line = bench.headline_line(timings, total=99999.999, sf=0.1, dp=2)
    assert len(line) < bench.LINE_BUDGET_BYTES, (
        f"worst-case headline line is {len(line)} B >= "
        f"{bench.LINE_BUDGET_BYTES} B budget ({len(bench.HEADLINE)} rows) — "
        "demote a family-redundant row to DETAIL_ONLY"
    )


def test_headline_and_detail_are_disjoint_registry_names():
    from kafka_stream_service_spark.queries.registry import QUERIES

    overlap = set(bench.HEADLINE) & set(bench.DETAIL_ONLY)
    assert not overlap, f"rows in both HEADLINE and DETAIL_ONLY: {sorted(overlap)}"
    unknown = (set(bench.HEADLINE) | set(bench.DETAIL_ONLY)) - set(QUERIES)
    assert not unknown, f"bench rows not in the registry: {sorted(unknown)}"
