"""Source lints that make known performance traps unrepresentable.

VERDICT r10 found `q_pair_containment` passing an inline ``F.split()``
into ``word_shingles_from_tokens`` — the exact O(len^2)-per-row re-split
the helper's docstring forbids (judge-measured ~7x at sf0.1, growing
quadratically with document length). These greps turn the trap (and its
SQL-string sibling) into a CI failure so it can never land again.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "kafka_stream_service_spark"

# The one legitimate wrapper lives in operators/dedup.py (word_shingles,
# documented as the one-off convenience form). Everywhere else, a split()
# expression flowing into the _from_tokens helper is the O(len^2) trap.
_ALLOWED = {PKG / "operators" / "dedup.py"}

_INLINE_SPLIT = re.compile(
    r"word_shingles_from_tokens\(\s*F\.split\b", re.MULTILINE
)


def _py_sources():
    for path in sorted(PKG.rglob("*.py")):
        yield path
    yield REPO / "__spark_entry__.py"
    yield REPO / "bench.py"


def test_no_inline_split_into_shingle_helper():
    hits = []
    for path in _py_sources():
        if path in _ALLOWED or not path.exists():
            continue
        text = path.read_text()
        for m in _INLINE_SPLIT.finditer(text):
            line = text.count("\n", 0, m.start()) + 1
            hits.append(f"{path.relative_to(REPO)}:{line}")
    assert not hits, (
        "inline F.split() passed into word_shingles_from_tokens — the "
        "expression is re-inlined into every try_element_at (O(len^2) per "
        "row in document length). Project the token array first "
        f"(.select(F.split(...).alias('toks'))): {hits}"
    )


def test_shingle_wrapper_not_reintroduced_in_queries():
    # The r10 dead helper `_word_shingles` (queries/dedup.py) wrapped the
    # inline-split form; it was deleted in r11. Keep queries/ free of
    # local re-wrappers so the only shingle entry points are the audited
    # operators/dedup.py ones.
    offenders = []
    for path in sorted((PKG / "queries").glob("*.py")):
        for m in re.finditer(r"def\s+_?word_shingles\b", path.read_text()):
            offenders.append(str(path.relative_to(REPO)))
    assert not offenders, f"local shingle wrapper redefined: {offenders}"


# ---------------------------------------------------------------------------
# Driver-side .collect() baseline (round 12)
# ---------------------------------------------------------------------------

# Every audited .collect() site in non-test source pulls BOUNDED rows to
# the driver (partition counts, k centroids, 1-row scalar bounds, replay
# fixture sentinels) — never data-scale results. This baseline makes any
# NEW driver-side pull a conscious, reviewed act: adding one fails this
# test until the count here is raised in the same diff (with the bound
# stated in the call site's comment/docstring).
_COLLECT_BASELINE = {
    "operators/graph.py": 1,      # LPA/CC convergence flag (1 row)
    "operators/ivf.py": 2,        # Lloyd centroids (k x dim) per iteration
    "operators/ranks.py": 1,      # per-partition counts (|partitions| rows)
    "operators/scan.py": 1,       # per-partition totals (|partitions| rows)
    "queries/corpus_ops.py": 1,   # quantization scale bounds (1 row)
    "queries/mlops.py": 1,        # fold census (k rows)
    "queries/round11i.py": 3,     # k-center greedy: k pulls of ONE row each
    "queries/round12.py": 1,      # IVF refresh touched-list ids (<= k rows)
    "queries/round7j.py": 1,      # fixture time bounds (1 row)
    "queries/round7m.py": 1,      # calendar bounds (1 row)
    "queries/round9b.py": 1,      # split threshold (1 row)
    "queries/round9c.py": 2,      # LM head/tail cuts (1 row each)
    "queries/stataudit.py": 2,    # domain bounds (1 row each)
    "queries/storage_q.py": 1,    # snapshot version pin (1 row)
    "queries/streaming_replay.py": 8,  # replay fixtures: bounds/sentinels
    "bench.py": 2,                # harness: 1-row aggregate scans, timed
}


def test_collect_sites_stay_at_audited_baseline():
    found: dict[str, int] = {}
    for path in _py_sources():
        if not path.exists():
            continue
        n = path.read_text().count(".collect()")
        if n:
            try:
                rel = str(path.relative_to(PKG))
            except ValueError:
                rel = str(path.relative_to(REPO))
            found[rel] = n
    new_or_grown = {
        f: n for f, n in found.items() if n > _COLLECT_BASELINE.get(f, 0)
    }
    assert not new_or_grown, (
        f"new driver-side .collect() sites beyond the audited baseline: "
        f"{new_or_grown} — a collect must pull BOUNDED rows (partition "
        "counts, k centroids, scalars); state the bound at the site and "
        "raise _COLLECT_BASELINE in the same diff"
    )
    shrunk = {f: n for f, n in _COLLECT_BASELINE.items() if found.get(f, 0) < n}
    assert not shrunk, (
        f"stale _COLLECT_BASELINE entries (sites removed): {shrunk} — "
        "lower the baseline so it cannot mask a future addition"
    )


# ---------------------------------------------------------------------------
# Spark-side exact-percentile aggregate ban (round 15)
# ---------------------------------------------------------------------------

# Round 14 migrated every Spark-side percentile()/percentile_disc call
# site onto operators/ranks.group_exact_percentiles: the built-in is a
# TypedImperativeAggregate that buffers EVERY value of a group in one
# reducer — |corpus|/|groups| bytes on a single task when the group
# count is small (the audit shape), a guaranteed OOM at 100 TB. This
# lint freezes the migration at zero. The patterns cover the ways a
# Spark expression can reach the aggregate: the DSL attribute form
# (F.percentile / F.percentile_disc / percentile_cont) and percentile
# spelled inside an expr(...) / selectExpr(...) / spark.sql(...) string
# on one line. DuckDB ORACLE SQL strings keep using percentile_disc on
# purpose — they are the independent check, built as bare triple-quoted
# strings never passed to a Spark expression builder, so none of these
# patterns can match them. percentile_approx stays allowed: it is a
# bounded sketch, not a per-group value buffer.
_SPARK_PERCENTILE = (
    re.compile(r"F\.percentile(?:_cont|_disc)?\s*\("),
    re.compile(r"""(?:\bexpr|selectExpr|\.sql)\(\s*f?["'][^"']*percentile(?!_approx)"""),
)


def test_no_spark_side_exact_percentile_aggregates():
    hits = []
    for path in _py_sources():
        if not path.exists():
            continue
        text = path.read_text()
        for pat in _SPARK_PERCENTILE:
            for m in pat.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits.append(f"{path.relative_to(REPO)}:{line}")
    assert not hits, (
        "Spark-side percentile()/percentile_disc aggregate call site — the "
        "built-in buffers every value of a group in ONE reducer (OOM at "
        "scale with few groups). Use "
        "operators/ranks.py:group_exact_percentiles (bounded by the value "
        f"domain) instead: {hits}"
    )
