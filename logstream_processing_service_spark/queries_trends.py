"""Driver-contract queries: time-series / sequence trend operators
(operators/trends.py) over the ``events`` table — cohort retention,
Markov transitions, least-squares volume trend, CUSUM change-points,
and OHLC bars. Reference ties: src/ml/volume_analyzer.py:27-73 (volume
timeline features), src/db/pattern_ops.py (event-sequence mining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import _t, spec
from .operators import trends as TR

_COHORT_ORACLE = """
WITH uw AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
    FROM events
),
c AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY 1),
cells AS (
    SELECT c.cohort,
           CAST(date_diff('day', c.cohort, uw.wk) / 7 AS INT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM uw JOIN c USING (user_id)
    GROUP BY 1, 2
)
SELECT cohort, week_offset, n_active,
       round(n_active / CAST(max(CASE WHEN week_offset = 0 THEN n_active END)
                 OVER (PARTITION BY cohort) AS DOUBLE), 6) AS retention
FROM cells ORDER BY cohort, week_offset
"""


@spec("cohort_retention", _COHORT_ORACLE, "A-ext", "cohort", "retention")
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TR.cohort_retention(_t(spark, sf_dir, "events"))


_TRANSITIONS_ORACLE = """
WITH seq AS (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
),
pairs AS (
    SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, event_type, n,
       round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
           AS prob
FROM pairs ORDER BY prev_type, event_type
"""


@spec("event_transitions", _TRANSITIONS_ORACLE, "W2-ext", "markov", "sequence")
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TR.event_transitions(_t(spark, sf_dir, "events"))


# All moment sums are exact BIGINTs, so slope/intercept/r2 divide
# exactly-representable doubles — engine-identical (see operator docstring
# for why the built-in regr_* aggregates are NOT used).
_TREND_ORACLE = """
WITH daily AS (
    SELECT event_type,
           CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
m AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy
    FROM daily GROUP BY 1
),
k AS (
    SELECT event_type, n_days,
           CAST(n_days * sxy - sx * sy AS DOUBLE) AS num,
           CAST(n_days * sxx - sx * sx AS DOUBLE) AS den_x,
           CAST(n_days * syy - sy * sy AS DOUBLE) AS den_y,
           CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
    FROM m
)
SELECT event_type, n_days,
       round(CASE WHEN den_x <> 0 THEN num / den_x END, 6) AS slope,
       round((syd - (CASE WHEN den_x <> 0 THEN num / den_x END) * sxd)
             / CAST(n_days AS DOUBLE), 6) AS intercept,
       round(CASE WHEN den_x <> 0 AND den_y <> 0
                  THEN num * num / (den_x * den_y) END, 6) AS r2
FROM k ORDER BY event_type
"""


@spec("volume_trend", _TREND_ORACLE, "M8-ext", "regression", "trend")
def q_volume_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TR.volume_trend(_t(spark, sf_dir, "events"))


# Deviations are scaled to integers (10n·x − 11·total), so the cumulative
# sum and running min are exact BIGINT window aggregates; see operator
# docstring for the max(0, ·) → running-min identity.
_CUSUM_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS daily_n
    FROM events GROUP BY 1, 2
),
scaled AS (
    SELECT event_type, day, daily_n,
           CAST(sum(daily_n) OVER (PARTITION BY event_type) AS BIGINT)
               AS total,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
    FROM daily
),
cum AS (
    SELECT *,
           CAST(sum(10 * nd * daily_n - 11 * total) OVER (
                PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS c
    FROM scaled
),
s AS (
    SELECT *,
           c - least(CAST(0 AS BIGINT), min(c) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_int
    FROM cum
)
SELECT event_type, day, daily_n,
       round(s_int / CAST(10 * nd AS DOUBLE), 6) AS cusum,
       CAST(s_int > 30 * total AS INT) AS is_change
FROM s ORDER BY event_type, day
"""


@spec("cusum_changepoints", _CUSUM_ORACLE, "M10-ext", "cusum", "changepoint")
def q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TR.cusum_changepoints(_t(spark, sf_dir, "events"))


_OHLC_ORACLE = """
WITH keyed AS (
    SELECT event_type, CAST(ts AS DATE) AS day, value,
           lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
    FROM events
)
SELECT event_type, day,
       round(arg_min(value, k), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(arg_max(value, k), 4) AS close,
       CAST(count(*) AS BIGINT) AS volume,
       round(sum(value), 2) AS turnover,
       round(avg(value), 4) AS vwap
FROM keyed GROUP BY 1, 2 ORDER BY 1, 2
"""


@spec("ohlc_bars", _OHLC_ORACLE, "A-ext", "ohlc", "resample")
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TR.ohlc_bars(_t(spark, sf_dir, "events"))


# Strict sequencing via the same two stacked strictly-before window passes
# (UNBOUNDED PRECEDING .. 1 PRECEDING over the deterministic (ts, event_id)
# order) — the oracle is the identical prefix-test formulation, so tie
# semantics can't diverge. Counts are exact BIGINTs; ratios divide them.
_FUNNEL_ORACLE = """
WITH w1 AS (
    SELECT user_id, event_type,
           count(CASE WHEN event_type = 'view' THEN 1 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > 0 AS has1,
           ts, event_id
    FROM events
),
w2 AS (
    SELECT *, (event_type = 'click' AND has1) AS q2 FROM w1
),
w3 AS (
    SELECT *,
           count(CASE WHEN q2 THEN 1 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > 0 AS has2
    FROM w2
),
pu AS (
    SELECT user_id,
           max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS r1,
           max(CASE WHEN q2 THEN 1 ELSE 0 END) AS r2,
           max(CASE WHEN event_type = 'purchase' AND has2
                    THEN 1 ELSE 0 END) AS r3
    FROM w3 GROUP BY 1
),
t AS (
    SELECT CAST(sum(r1) AS BIGINT) AS n1, CAST(sum(r2) AS BIGINT) AS n2,
           CAST(sum(r3) AS BIGINT) AS n3
    FROM pu
)
SELECT 1 AS stage, 'view' AS stage_name, n1 AS n_users,
       1.0 AS pct_of_top, 1.0 AS pct_of_prev FROM t
UNION ALL
SELECT 2, 'click', n2,
       round(CASE WHEN n1 > 0 THEN CAST(n2 AS DOUBLE) / n1 END, 6),
       round(CASE WHEN n1 > 0 THEN CAST(n2 AS DOUBLE) / n1 END, 6) FROM t
UNION ALL
SELECT 3, 'purchase', n3,
       round(CASE WHEN n1 > 0 THEN CAST(n3 AS DOUBLE) / n1 END, 6),
       round(CASE WHEN n2 > 0 THEN CAST(n3 AS DOUBLE) / n2 END, 6) FROM t
ORDER BY stage
"""


@spec("funnel_conversion", _FUNNEL_ORACLE, "W-ext", "funnel", "sequence")
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel with strict in-order sequencing
    (one user-keyed sort, two stacked prefix-test windows — no
    self-joins); see operators/trends.py funnel_conversion."""
    return TR.funnel_conversion(_t(spark, sf_dir, "events"))


# Exact sliding-window distinct: the oracle re-scans per window via the
# day-range join — exactness is what makes it pairable with the set-union
# operator; at scale the operator's docstring prescribes the HLL/bitmap
# swap (distinct_actors_hll_registry is the sketch twin).
_ROLLING_DISTINCT_ORACLE = """
WITH dd AS (
    SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
    FROM events
),
days AS (
    SELECT event_type, day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_day
    FROM dd GROUP BY 1, 2
)
SELECT d.event_type, d.day, d.uniq_day,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS uniq_win
FROM days d
JOIN dd e ON e.event_type = d.event_type
         AND e.day BETWEEN d.day - 6 AND d.day
GROUP BY 1, 2, 3
ORDER BY 1, 2
"""


@spec(
    "rolling_distinct_users",
    _ROLLING_DISTINCT_ORACLE,
    "A6-ext", "sliding-distinct", "wau",
)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day exact distinct actors per (event_type, day) — the
    set-union form (sliding COUNT DISTINCT is not decomposable); see
    operators/trends.py rolling_distinct_users for the 100 TB HLL swap."""
    return TR.rolling_distinct_users(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# r7 registrations: seasonal decomposition, robust anomalies, resampling
# ---------------------------------------------------------------------------


@spec(
    "seasonal_volume_decompose",
    TR.seasonal_decompose_oracle_sql(),
    "trends", "seasonality", "W2",
)
def q_seasonal_volume_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily event volume:
    trend (centered 7-day mean) + day-of-week seasonal + residual.
    One RANGE window over the daily aggregate — no self-joins; the
    daily table is |days| rows at any corpus size."""
    return TR.seasonal_decompose(_t(spark, sf_dir, "events"))


from .operators.analytics import mad_anomaly_oracle_sql as _mad_oracle_sql  # noqa: E402


@spec("mad_anomaly", _mad_oracle_sql(), "anomaly", "robust", "M10")
def q_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust anomaly census over event values — the
    breakdown-resistant twin of anomaly_flags' mean/stddev z-score
    (one contaminated batch cannot shift the threshold). Two exact
    median selections via rank, no per-group sort-collect."""
    from .operators.analytics import mad_anomaly

    return mad_anomaly(_t(spark, sf_dir, "events"))


@spec(
    "resample_daily_volume",
    TR.resample_daily_volume_oracle_sql(),
    "trends", "resample", "T5",
)
def q_resample_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-complete daily resample: aggregate to day grain, then
    join onto the generated day spine so gap days appear with zero
    volume and carried-forward context — the pandas .resample()
    contract at Spark scale (the spine is |days| rows, broadcast)."""
    return TR.resample_daily_volume(_t(spark, sf_dir, "events"))


@spec(
    "holt_winters_daily",
    TR.holt_winters_oracle_sql(),
    "trends", "forecast", "M8-ext",
)
def q_holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level + trend + weekly seasonal) over
    daily event volume with a 7-day forecast tail. The recurrence runs
    at DAY grain — |days| rows at any corpus size — after one
    distributed daily aggregate; the DuckDB twin unrolls the coupled
    recurrence as a recursive CTE with repr()-interpolated DOUBLE
    coefficients so both engines execute the identical IEEE sequence.
    alpha_10x 0.05 (ROADMAP r7 ledger)."""
    return TR.holt_winters_daily(_t(spark, sf_dir, "events"))


@spec(
    "holt_winters_anomaly",
    TR.holt_winters_anomaly_oracle_sql(),
    "trends", "anomaly", "M10-ext",
)
def q_holt_winters_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-residual anomaly flags: days whose volume z-scores
    beyond 3σ against the Holt-Winters one-step expectation — the
    seasonal-aware upgrade of the static z-score (a normal Monday level
    is an anomaly on Sunday). Residuals from the 6-dp fits; z rounded
    4 dp before the threshold on both engines."""
    return TR.holt_winters_anomaly(_t(spark, sf_dir, "events"))


@spec(
    "ewma_control_chart",
    TR.ewma_control_chart_oracle_sql(),
    "trends", "anomaly", "A-ext",
)
def q_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart per event type (Roberts 1959): smoothed
    daily-volume statistic vs the asymptotic mu ± L·sigma·sqrt(α/(2−α))
    band — detects small sustained shifts the z chart misses. Exact
    BIGINT moments; identical double-op recurrence on both engines."""
    return TR.ewma_control_chart(_t(spark, sf_dir, "events"))


@spec(
    "forecast_backtest_report",
    TR.forecast_backtest_oracle_sql(),
    "trends", "forecast-eval", "M-ext",
)
def q_forecast_backtest_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy backtest (Hyndman & Koehler 2006; r10 queue,
    rehearsed r9): MASE and sMAPE of the Holt-Winters one-step fits vs
    the seasonal-naive y_{t-m} baseline. Exact-BIGINT MASE denominator,
    NULL-guarded against a perfect naive (r9 advice); day-grain shuffle
    only."""
    return TR.forecast_backtest_report(_t(spark, sf_dir, "events"))
