"""Physical-plan inspection helpers.

Scale-readiness is checked in CI, not hoped for: the tests assert that
dimension joins broadcast, filters reach the parquet scan, and nothing
degenerates into a cartesian product. ``.explain`` output is the contract
— these helpers make it assertable.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> str:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= at_least, f"expected >= {at_least} broadcast joins, found {n}:\n{plan}"
    return plan


def assert_pushed_filters(df: DataFrame, fragment: str) -> str:
    """Assert a predicate fragment appears in the scan's PushedFilters."""
    plan = physical_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert any(fragment in line for line in pushed), (
        f"filter {fragment!r} not pushed to scan. PushedFilters lines: {pushed}"
    )
    return plan


def assert_no_cartesian(df: DataFrame) -> str:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"
    return plan


_KEYED_SHUFFLE = re.compile(r"Arguments: (?:hash|range)partitioning\(")


def count_shuffle_exchanges(plan: str) -> int:
    """Count KEYED shuffle-exchange nodes in a FORMATTED physical plan.

    Formatted mode names shuffle nodes bare — ``(N) Exchange`` — with
    the partitioning demoted to a separate ``Arguments:`` line, so
    matching ``Exchange hashpartitioning`` (the SIMPLE-mode spelling)
    counts zero on every formatted plan and silently turns a shuffle
    budget into a no-op. This counts the ``Arguments:`` lines instead:
    hash/range partitioning only — the data-scale shuffles a budget is
    about. Excluded by design: SinglePartition exchanges (1-row scalar
    attachments after full aggregation), BroadcastExchange (the cheap
    path budgets steer toward; its Arguments name a BroadcastMode), and
    ReusedExchange (no new shuffle). Subquery sections count — a scalar
    subquery's keyed shuffle is as real as the main plan's.
    """
    return len(_KEYED_SHUFFLE.findall(plan))
