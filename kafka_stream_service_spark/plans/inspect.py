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


# Tree lines look like ``   +- Exchange (4)`` / ``:  +- * HashAggregate (3)``
# / ``   +- Scan parquet  (1)``; capture the (possibly multi-word) operator
# name, its node id, and the indent depth.
_TREE_NODE = re.compile(
    r"^([\s:+*-]*?)(?:\+- |:- )?\*?\s?([A-Za-z][A-Za-z0-9]*(?: [a-z][A-Za-z0-9]*)*)\s+\((\d+)\)\s*$"
)

# Walking DOWN from a SinglePartition exchange toward the leaf:
# - SAFE nodes bound the subtree's cardinality before the collapse —
#   aggregation finals (group cardinality) and limits (literal bound);
# - TRANSPARENT nodes preserve/shrink rows without bounding them — keep
#   walking through;
# - broadcast joins: the bounded side is the broadcast build; the STREAM
#   side (printed first in formatted trees) determines cardinality, so
#   the walk follows it;
# - anything else (Scan, Generate, Expand, Union, shuffle joins, ...)
#   is a data-scale source: offender.
_SP_SAFE = frozenset(
    {
        "HashAggregate",
        "ObjectHashAggregate",
        "SortAggregate",
        "LocalLimit",
        "GlobalLimit",
        "TakeOrderedAndProject",
    }
)
_SP_TRANSPARENT = frozenset(
    {
        "Project",
        "Filter",
        "Sort",
        "Window",
        "WindowGroupLimit",
        "ColumnarToRow",
        "InputAdapter",
        "AQEShuffleRead",
        "CoalesceExec",
        "Coalesce",
        "BroadcastHashJoin",  # stream side printed first: fall through
        "BroadcastNestedLoopJoin",
        "ReusedExchange",
        "Exchange",  # a keyed exchange below doesn't bound rows either
        "ShuffleQueryStage",
        "BroadcastQueryStage",
    }
)


def single_partition_offenders(plan: str) -> list[str]:
    """Names of data-scale operators feeding a ``SinglePartition``
    exchange — i.e. an unbounded subtree being serialized onto one
    partition (the classic global ``Window.orderBy`` regression).

    ``count_shuffle_exchanges`` deliberately ignores SinglePartition
    exchanges, so a budget alone would count such a plan as zero
    shuffles — exactly the scalability failure budgets exist to catch
    (ADVICE r11). This companion makes the gap assertable:
    :func:`assert_no_data_scale_single_partition` and the catalog-wide
    sweep in tests/test_single_partition_guard.py.

    Works on FORMATTED plans: finds each ``Exchange (N)`` tree line
    whose detail section says ``Arguments: SinglePartition``, then walks
    the exchange's child chain (formatted trees print a node's first
    child immediately below it, one indent deeper) through
    row-preserving operators and broadcast joins' stream side until a
    cardinality-bounding node (aggregate/limit — safe) or a data-scale
    source (scan/generate/expand — offender) decides it.
    """
    lines = plan.splitlines()
    # node ids whose detail section marks a SinglePartition exchange
    sp_ids: set[str] = set()
    current_id: str | None = None
    for ln in lines:
        m = re.match(r"^\((\d+)\) Exchange\b", ln)
        if m:
            current_id = m.group(1)
            continue
        if re.match(r"^\(\d+\) ", ln):
            current_id = None
            continue
        if current_id and "Arguments:" in ln and "SinglePartition" in ln:
            sp_ids.add(current_id)
    if not sp_ids:
        return []
    tree_nodes = [
        (m.group(2), m.group(3))
        for ln in lines
        if (m := _TREE_NODE.match(ln))
    ]
    offenders: list[str] = []
    for idx, (name, node_id) in enumerate(tree_nodes):
        if name != "Exchange" or node_id not in sp_ids:
            continue
        j = idx + 1
        while j < len(tree_nodes):
            child = tree_nodes[j][0]
            if child in _SP_SAFE:
                break
            if child in _SP_TRANSPARENT:
                j += 1
                continue
            offenders.append(child)
            break
        else:
            offenders.append("<leaf>")
    return offenders


def assert_no_data_scale_single_partition(df: DataFrame) -> str:
    plan = physical_plan(df)
    bad = single_partition_offenders(plan)
    assert not bad, (
        f"SinglePartition exchange fed by non-aggregated operator(s) {bad} — "
        f"a data-scale subtree is collapsing onto one partition:\n{plan}"
    )
    return plan
