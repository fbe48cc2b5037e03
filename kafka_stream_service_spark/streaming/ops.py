"""Streaming operator wrappers (SURVEY.md §2.2 "Streaming-only").

These compose on any streaming DataFrame with an event-time column; the
batch-expressible equivalents are oracle-checked in ``queries/events_q.py``,
and ``tests/test_streaming.py`` drives these genuinely-streaming forms with
chunked file replay + watermarks + checkpoint restarts.

State-scale notes: watermarks bound all state here — windowed agg state is
(windows x keys) within the watermark horizon; dedup state is one entry per
key within the horizon; stream-static join keeps no state (the static side
is broadcast per micro-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with local-tz semantics); fixture
    event time arrives as TIMESTAMP_NTZ — cast is lossless under the
    engine's pinned UTC session timezone."""
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        return events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def windowed_agg(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window_size: str = "1 hour",
    slide: str | None = None,
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling/sliding event-time window aggregation with late-data drop."""
    win = F.window(ts_col, window_size, slide) if slide else F.window(ts_col, window_size)
    return (
        _event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(win, *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sessionized(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    gap: str = "30 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Session-window aggregation (state merges adjacent windows within gap)."""
    return (
        _event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(key, F.session_window(ts_col, gap))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("event_id",),
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming dedup: first occurrence per key wins; state expires with
    the watermark when ``within_watermark`` (dropDuplicatesWithinWatermark)
    — the only sane variant at 100 TB (unbounded-state dedup is a leak)."""
    with_wm = _event_time(events, ts_col).withWatermark(ts_col, watermark)
    if within_watermark:
        return with_wm.dropDuplicatesWithinWatermark(list(keys))
    return with_wm.dropDuplicates(list(keys))


def accumulate_totals(state, batches, value_col: str = "value"):
    """Pure accumulate step shared by the TWS processor below: fold pandas
    batches into a ``(total, n)`` tuple, starting from ``state`` (a prior
    tuple, or None/falsy for a fresh key — mirrors ``ValueState.get()``
    after an ``exists()`` check).

    Factored out of the processor so the state-transition logic is
    unit-testable without the TWS protobuf protocol
    (``tests/test_stateful.py::test_accumulate_totals_*``)."""
    total, n = state if state else (0.0, 0)
    for pdf in batches:
        total += float(pdf[value_col].sum())
        n += len(pdf)
    return total, n


def running_totals_tws(
    stream: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running totals via ``transformWithStateInPandas`` (Spark 4's
    arbitrary-stateful API — typed per-key state on the RocksDB store,
    successor to ``applyInPandasWithState``, which
    ``tests/test_stateful.py`` also covers).

    State is one (total, n) ValueState per key — O(active keys), stream-
    length independent; the same processor shape extends to timers/TTL for
    expiring idle keys at scale.

    Runtime requirement: the TWS state protocol speaks protobuf, so
    ``google.protobuf`` must be importable by the Python workers (absent in
    this test container — the test is skipped there and
    ``applyInPandasWithState`` covers the arbitrary-stateful surface).
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField(key, T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("total", T.DoubleType()), T.StructField("n", T.LongType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key_tuple, rows, timerValues):
            prior = self._state.get() if self._state.exists() else None
            total, n = accumulate_totals(prior, rows, value_col)
            self._state.update((total, n))
            yield pd.DataFrame({key: [key_tuple[0]], "total": [total], "n": [n]})

        def close(self) -> None:
            pass

    return stream.groupBy(key).transformWithStateInPandas(
        RunningTotals(), outputStructType=out_schema, outputMode="Update", timeMode="None"
    )


def stream_static_join(
    events: DataFrame,
    static_dim: DataFrame,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Stream-static join: the static side is re-read/broadcast per
    micro-batch; no streaming state."""
    return events.join(F.broadcast(static_dim), on=on, how=how)
