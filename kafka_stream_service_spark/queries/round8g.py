"""Round-8 operator batch 7: forecast backtesting — the evaluation
loop that closes the forecasting family (q_ewma_smoothing smooths,
q_holt_linear_smoothing forecasts, this scores those forecasts against
what actually happened, next to a naive baseline).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

from .registry import query
from .round8 import _HOLT_CTE, _HOLT_DAILY_DUCK, _HOLT_SELECT, _holt_levels

_BT_VIEW_SEQ = itertools.count()

# The backtest projection is SHARED SQL text (like the Holt recursion
# itself): one-step-ahead forecast for day t is the forecast_next_q6 the
# model emitted at t-1; the naive baseline is yesterday's actual. The
# error numerators stay exact integers < 2^53, so each APE is one exact
# FLOOR(double/double) — engine-identical (DECIMAL division is NOT:
# DuckDB and Spark round quotient scales differently).
_BACKTEST_SELECT = """
    SELECT day_ix, x_cents,
           fc_q6,
           CAST(ABS(x_cents * 1000000 - fc_q6) AS BIGINT) AS abs_err_q6,
           CAST(FLOOR(CAST(ABS(x_cents * 1000000 - fc_q6) AS DOUBLE)
                      / CAST(x_cents AS DOUBLE)) AS BIGINT) AS ape_q6,
           CAST(FLOOR(CAST(ABS(x_cents - prev_x) AS DOUBLE) * 1000000.0
                      / CAST(x_cents AS DOUBLE)) AS BIGINT) AS ape_naive_q6,
           CAST(CASE WHEN CAST(ABS(x_cents * 1000000 - fc_q6) AS DOUBLE)
                          / CAST(x_cents AS DOUBLE)
                        < CAST(ABS(x_cents - prev_x) AS DOUBLE) * 1000000.0
                          / CAST(x_cents AS DOUBLE)
                THEN 1 ELSE 0 END AS INT) AS model_beats_naive
    FROM (
      SELECT day_ix, x_cents,
             LAG(forecast_next_q6) OVER (ORDER BY day_ix) AS fc_q6,
             LAG(x_cents) OVER (ORDER BY day_ix) AS prev_x
      FROM hq
    )
    WHERE fc_q6 IS NOT NULL
"""


@query(
    "q_forecast_backtest",
    oracle=(
        f"WITH RECURSIVE holt_daily AS ({_HOLT_DAILY_DUCK}), {_HOLT_CTE},"
        f" hq AS ({_HOLT_SELECT}) {_BACKTEST_SELECT}"
    ),
    tags=("timeseries", "forecasting", "evaluation", "round8"),
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead forecast BACKTEST of the Holt model: for every day
    t >= 1, the forecast the model emitted at t-1 (level + trend, the
    quantized forecast_next_q6) is scored against the day's actual —
    absolute error and absolute percentage error, next to the naive
    persistence baseline (yesterday's actual), with a per-day
    model-beats-naive verdict (the MASE-style comparison that decides
    whether a forecaster earns its keep). The errors are exact integers
    over the already-quantized recursion outputs; the APE ratios are one
    fixed FLOOR(double/double) each, with numerators < 2^53 so the
    doubles are exact (decimal division was rejected: its rounding
    scale differs between engines — measured one-ulp flips).

    Scale shape: the Holt scan runs on the day grain (see
    q_holt_linear_smoothing — optimization r15 moved it off the
    per-iteration WITH RECURSIVE execution onto one grouped Arrow
    scan; the oracle keeps the recursive form); the backtest adds two
    LAG windows over <=366 aggregated rows, still the SHARED
    _BACKTEST_SELECT text so the scoring expression trees stay
    engine-identical. SF-invariant after the first groupBy.
    """
    hq = _holt_levels(spark, sf_dir)
    view = f"holt_bt_{next(_BT_VIEW_SEQ)}"
    hq.createOrReplaceTempView(view)
    out = spark.sql(_BACKTEST_SELECT.replace("FROM hq", f"FROM {view}"))
    # Resolved at analysis — drop the per-invocation view (ADVICE r9).
    spark.catalog.dropTempView(view)
    return out
