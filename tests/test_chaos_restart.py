"""Chaos pass on the round-6 replay sinks (VERDICT r6 next-steps #5).

The replay oracles are deterministic by construction; these variants
prove they stay deterministic across a CRASH. The chaos knob in
streaming_replay makes the first run raise after a micro-batch's sink
function has fully applied but before Spark records the epoch commit —
the exact window exactly-once sinks exist for — then a second run
resumes from the same checkpoint and re-delivers that epoch. The test
then compares the query's output to its DuckDB oracle, so a
double-applied epoch (log rows doubled, merge re-applied, HLL partial
landed twice) flips the same hash the driver checks.

Extends test_streaming_restart_no_dups_no_loss to the three round-6
sink modes: pointer-swap MERGE, dual-sink fan-out, HLL partial merge.
"""

from __future__ import annotations

import pytest

from tools.verify_local import compare, duck_connection

from kafka_stream_service_spark.queries import streaming_replay
from kafka_stream_service_spark.queries.registry import QUERIES

SF = "/root/testdata/sf0.001"

CHAOS_QUERIES = [
    "q_stream_merge_sink_replay",
    "q_stream_fanout_dual_sink_replay",
    "q_stream_hll_merge_replay",
]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", CHAOS_QUERIES)
def test_replay_survives_mid_epoch_crash(spark, duck, name, monkeypatch):
    monkeypatch.setattr(streaming_replay, "CHAOS_KILL_FIRST_RUN", True)
    spec = QUERIES[name]
    spdf = spec.spark_fn(spark, SF).toPandas()
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(name, spdf, ddf)
    assert not problems, f"{name} lost exactly-once under crash-restart: {problems}"


def test_chaos_crash_actually_fires(spark, monkeypatch):
    """Guard the guard: the chaotic first run must really crash (a knob
    wired to a dead path would make the suite vacuous)."""
    calls = []
    monkeypatch.setattr(streaming_replay, "CHAOS_KILL_FIRST_RUN", True)
    orig = streaming_replay._run_foreach_batch

    def spying(stream_df, sink_fn, ckpt):
        def spy(b, e):
            calls.append(e)
            return sink_fn(b, e)

        return orig(stream_df, spy, ckpt)

    monkeypatch.setattr(streaming_replay, "_run_foreach_batch", spying)
    QUERIES["q_stream_merge_sink_replay"].spark_fn(spark, SF).collect()
    # 2 epochs; epoch 0 applied, crash, then epoch 0 replayed + epoch 1
    assert sorted(calls) == [0, 0, 1], calls
