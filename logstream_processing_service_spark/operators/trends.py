"""Time-series / sequence trend operators over the event log.

The reference analyzes per-cluster volume timelines with hand-rolled
velocity, rolling-average, and deviation features
(src/ml/volume_analyzer.py:27-73) and mines event sequences per cluster
(src/db/pattern_ops.py). This module provides the principled batch
versions of those instincts as pure DataFrame transforms:

- ``cohort_retention``     — weekly cohort x week-offset retention matrix
- ``event_transitions``    — first-order Markov transition probabilities
- ``volume_trend``         — per-type least-squares trend of daily volume
- ``cusum_changepoints``   — one-sided CUSUM level-shift detection
- ``ohlc_bars``            — open/high/low/close value bars per type-day
- ``funnel_conversion``    — ordered multi-stage funnel (strict sequencing)
- ``rolling_distinct_users`` — exact trailing-window distinct actors

Cross-engine exactness notes are inline: wherever a statistic can be
computed from INTEGER aggregates (counts, day indices, scaled rationals),
it is — integer sums are associative, so Spark's and DuckDB's different
aggregation orders produce bit-identical doubles after the final division.
Double-sum statistics (OHLC turnover/vwap) follow the repo-wide
round(sum,2)/round(avg,4) parity convention.

Scale notes: every operator here reduces events to a per-(key, day) or
per-(key, pair) grain FIRST (map-side combinable aggregations), so shuffle
volume is bounded by |keys| x |days|, not by corpus size; the trailing
per-key statistics run over tiny frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the ISO week of
    their first activity; each (cohort, week_offset) cell counts users
    from that cohort active offset weeks later, plus the retention rate
    vs the cohort's size.

    Reference tie: the per-cluster timeline grouping of
    src/ml/volume_analyzer.py:44-50, re-expressed at the user grain —
    the product-analytics question "do users come back?".

    Plan: ONE user-keyed shuffle (groupBy user_id collecting the bounded
    set of active weeks + its min), then an in-row explode and a tiny
    (cohort, offset)-grain aggregate. The naive formulation joins the
    activity table back to a first-activity table — a second full
    user-keyed shuffle this shape avoids. Retention divides two exact
    BIGINTs, so the double is engine-identical.
    """
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    per_user = (
        events.select(F.col("user_id"), wk.alias("wk"))
        .groupBy("user_id")
        .agg(
            F.min("wk").alias("cohort"),
            F.collect_set("wk").alias("weeks"),
        )
    )
    cells = (
        per_user.select(
            "cohort", F.explode("weeks").alias("wk")
        )
        # Monday-truncated dates differ by exact multiples of 7
        .select(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    size = Window.partitionBy("cohort")
    return (
        cells.withColumn(
            "retention",
            F.round(
                F.col("n_active")
                / F.max(
                    F.when(F.col("week_offset") == 0, F.col("n_active"))
                ).over(size),
                6,
            ),
        )
        .orderBy("cohort", "week_offset")
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type), with counts.

    Reference tie: src/db/pattern_ops.py mines per-cluster event
    sequences; the transition matrix is the canonical first-order
    summary of those sequences.

    Plan: one user-keyed window (ordered by (ts, event_id) — the
    repo-wide deterministic sequence order) to form adjacent pairs, then
    a pair-grain count with map-side combine. The probability divides
    two exact BIGINTs → engine-identical doubles. At 100 TB the pair
    grain is |types|² — trivially small — and the user-keyed sort is the
    one unavoidable exchange (any sequence semantics needs it).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id", "ts", "event_id", "event_type"
        )
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return (
        pairs.withColumn(
            "prob", F.round(F.col("n") / F.sum("n").over(tot), 6)
        )
        .orderBy("prev_type", "event_type")
    )


def volume_trend(events: DataFrame) -> DataFrame:
    """Per-type least-squares linear trend of daily event volume:
    slope (events/day), intercept, and r² — the principled version of
    the reference's velocity feature (src/ml/volume_analyzer.py:56-59,
    "Velocity (Current - Previous)" over the volume timeline).

    Exactness: x is the epoch-day index and y the daily count — both
    integers — so n, Σx, Σy, Σxy, Σx², Σy² accumulate as exact BIGINTs
    (associative: safe under any aggregation order), and

        slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)

    divides two exactly-representable doubles → bit-identical across
    engines; same for intercept and r². This is why the operator does
    NOT use the built-in regr_slope/regr_r2 (whose streaming-update
    internals differ between engines in the last ulp).

    Scale: daily grain first (map-side combinable), per-type moment
    aggregation second — shuffle bounded by |types| × |days|.
    """
    daily = (
        events.groupBy(
            F.col("event_type"),
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_days")
    den_x = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    den_y = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    slope = F.when(den_x != 0, num / den_x)
    return (
        m.select(
            "event_type",
            "n_days",
            F.round(slope, 6).alias("slope"),
            F.round(
                (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
                / n.cast("double"),
                6,
            ).alias("intercept"),
            F.round(
                F.when(
                    (den_x != 0) & (den_y != 0), num * num / (den_x * den_y)
                ),
                6,
            ).alias("r2"),
        )
        .orderBy("event_type")
    )


def cusum_changepoints(events: DataFrame) -> DataFrame:
    """One-sided CUSUM level-shift detection over each type's daily
    volume: S_t = max(0, S_{t-1} + (x_t − 1.1·μ)), flagged when
    S_t > 3·μ — "volume has run persistently above 110% of its mean".

    The recursion is rewritten with the running-minimum identity
    S_t = C_t − min(0, min_{j≤t} C_j) where C is the cumulative sum of
    deviations — turning a stateful loop into two window functions (a
    cumulative sum and a running min), both linear-scan friendly.

    Exactness: deviations are scaled to INTEGERS — with μ = total/n,
    10n·(x_t − 1.1μ) = 10n·x_t − 11·total — so the cumulative sum and
    running min are exact BIGINT window aggregates (associativity-safe),
    and the final S_t = S_int/(10n) divides two exact integers →
    engine-identical doubles. The flag compare S_t > 3μ cross-multiplies
    to the integer test S_int > 30·total.

    Reference tie: the deviation feature of src/ml/volume_analyzer.py:
    64-68 ("How far from average?"), upgraded from a pointwise z-score
    to a sequential detector with memory.

    Scale: daily grain first; the windows partition by type over
    |days|-length series — tiny. 100 TB cost is the one daily-grain
    shuffle.
    """
    daily = (
        events.groupBy(
            F.col("event_type"), F.col("ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("daily_n"))
    )
    per_type = Window.partitionBy("event_type")
    seq = Window.partitionBy("event_type").orderBy("day")
    run = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaled = (
        daily.withColumn("total", F.sum("daily_n").over(per_type))
        .withColumn("nd", F.count(F.lit(1)).over(per_type))
        # dev_int = 10·n·x_t − 11·total  ==  10n·(x_t − 1.1μ)
        .withColumn(
            "dev_int",
            10 * F.col("nd") * F.col("daily_n") - 11 * F.col("total"),
        )
        .withColumn("cum", F.sum("dev_int").over(run))
        .withColumn(
            "s_int",
            F.col("cum") - F.least(F.lit(0).cast("bigint"), F.min("cum").over(run)),
        )
    )
    return (
        scaled.select(
            "event_type",
            "day",
            "daily_n",
            F.round(
                F.col("s_int") / (10 * F.col("nd")).cast("double"), 6
            ).alias("cusum"),
            # int, not boolean: the driver's value-hash stringifies
            # True/true differently across engines
            (F.col("s_int") > 30 * F.col("total"))
            .cast("int")
            .alias("is_change"),
        )
        .orderBy("event_type", "day")
    )


def ohlc_bars(events: DataFrame) -> DataFrame:
    """OHLC value bars per (event_type, day): open/close are the value
    of the first/last event in (ts, event_id) order — the deterministic
    sequence order used repo-wide — high/low the extremes, plus volume
    and turnover.

    Plan: ONE aggregation; open/close use min_by/max_by over a
    composite (ts, event_id) key, so there is no window sort and no
    second shuffle — the classic "first/last per group needs a window"
    trap avoided. The key is a zero-padded string because the oracle
    engine's arg_min only orders scalars; at production scale swap it
    for a packed integer when event ids fit the spare bits below the
    microsecond epoch (the string costs one ~32-byte alloc per row).
    Turnover/vwap follow the repo's round(sum,2)/round(avg,4)
    double-parity convention.
    """
    # parquet timestamps load as TIMESTAMP_NTZ; the session timezone is
    # pinned to UTC (session.py), so the LTZ cast is the identity on the
    # underlying micros and unix_micros matches the oracle's epoch_us
    key = F.concat(
        F.lpad(
            F.unix_micros(F.col("ts").cast("timestamp_ltz")).cast("string"),
            20,
            "0",
        ),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        events.groupBy(
            F.col("event_type"), F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("volume"),
            F.round(F.sum("value"), 2).alias("turnover"),
            F.round(F.avg("value"), 4).alias("vwap"),
        )
        .orderBy("event_type", "day")
    )


def funnel_conversion(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered three-stage funnel with STRICT sequencing: a user reaches
    stage k only via a stage-k event that occurs strictly after some
    qualifying stage-(k-1) event — not merely "did all three types",
    which over-counts users who purchased before ever viewing.

    Reference tie: src/db/pattern_ops.py mines per-cluster event
    sequences; the funnel is the product-analytics question asked of
    those sequences ("how far do users get, in order?").

    Plan: ONE user-keyed sort (the unavoidable sequence exchange) feeds
    two stacked Window passes over the same (ts, event_id) order —
    "any stage-1 strictly before this row?" then "any qualifying
    stage-2 strictly before this row?" — so qualification is a pure
    prefix test, no self-joins, no per-user array materialization. The
    naive formulation chains k joins of the event table with itself
    (k full shuffles of type-filtered subsets); this shape pays one.
    Both Windows share the partitioning+ordering, so Spark plans a
    single Sort. Counts are exact BIGINTs; conversion ratios divide two
    exact integers → engine-identical doubles.

    The strictly-before frame (UNBOUNDED PRECEDING .. 1 PRECEDING) over
    the deterministic (ts, event_id) total order makes tie handling
    identical across engines: a same-timestamp pair qualifies iff the
    earlier event_id is the earlier stage.
    """
    s1, s2, s3 = stages
    before = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "has1",
            F.count(F.when(F.col("event_type") == s1, 1)).over(before) > 0,
        )
        .withColumn("q2", (F.col("event_type") == s2) & F.col("has1"))
        .withColumn("has2", F.count(F.when(F.col("q2"), 1)).over(before) > 0)
        .withColumn("q3", (F.col("event_type") == s3) & F.col("has2"))
    )
    per_user = flagged.groupBy("user_id").agg(
        F.max((F.col("event_type") == s1).cast("int")).alias("r1"),
        F.max(F.col("q2").cast("int")).alias("r2"),
        F.max(F.col("q3").cast("int")).alias("r3"),
    )
    totals = per_user.agg(
        F.sum("r1").cast("bigint").alias("n1"),
        F.sum("r2").cast("bigint").alias("n2"),
        F.sum("r3").cast("bigint").alias("n3"),
    )
    n1, n2, n3 = F.col("n1"), F.col("n2"), F.col("n3")
    ratio = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den.cast("double")), 6
    )
    return totals.select(
        F.expr(
            f"stack(3, 1, '{s1}', n1, 2, '{s2}', n2, 3, '{s3}', n3)"
            " as (stage, stage_name, n_users)"
        ),
        ratio(n2, n1).alias("_c21"),
        ratio(n3, n1).alias("_c31"),
        ratio(n3, n2).alias("_c32"),
    ).select(
        "stage",
        "stage_name",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.when(F.col("stage") == 1, F.lit(1.0))
        .when(F.col("stage") == 2, F.col("_c21"))
        .otherwise(F.col("_c31"))
        .alias("pct_of_top"),
        F.when(F.col("stage") == 1, F.lit(1.0))
        .when(F.col("stage") == 2, F.col("_c21"))
        .otherwise(F.col("_c32"))
        .alias("pct_of_prev"),
    ).orderBy("stage")


def rolling_distinct_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Exact distinct actors per (event_type, day) over the trailing
    ``window_days`` window — the DAU/WAU report. Sliding COUNT(DISTINCT)
    is not decomposable (you cannot subtract a day out of a distinct
    count), so the only exact forms are re-scan-per-window or
    set-union; this is the set-union form: reduce events to per-day
    distinct-user SETS once (map-side combinable via collect_set), then
    a RANGE window over the epoch-day index unions ≤window_days sets
    in-row.

    Scale: shuffle volume is |types| × |days| rows whose payload is the
    per-day distinct-user set — bounded by daily actives, NOT event
    count. At 100 TB daily-active sets outgrow rows; swap collect_set
    for the mergeable HLL sketch (hll_sketch_agg per day, hll_union
    over the same RANGE window — the distinct_actors_hll_registry
    machinery, ≤5% error) or a roaring bitmap UDAF for exactness. This
    exact operator IS the oracle those swaps are tested against.

    The RANGE frame (not ROWS) makes missing days count as empty sets —
    a 7-day window is 7 calendar days, not the last 7 observed days.
    """
    daily = events.groupBy(
        F.col("event_type"), F.col("ts").cast("date").alias("day")
    ).agg(F.collect_set("user_id").alias("us"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_x")
        .rangeBetween(-(window_days - 1), 0)
    )
    return (
        daily.withColumn(
            "day_x",
            F.datediff(F.col("day"), F.lit("1970-01-01")).cast("bigint"),
        )
        .withColumn(
            "uniq_win",
            F.size(
                F.array_distinct(F.flatten(F.collect_list("us").over(w)))
            ).cast("bigint"),
        )
        .select(
            "event_type",
            "day",
            F.size("us").cast("bigint").alias("uniq_day"),
            "uniq_win",
        )
        .orderBy("event_type", "day")
    )


def seasonal_decompose(events: DataFrame) -> DataFrame:
    """Classical additive seasonal decomposition of daily event volume,
    per type: y(day) = trend + seasonal(dow) + residual — the moving-
    average decomposition (Cleveland's STL ancestor) behind "is Monday
    always like this, or is something wrong?" monitoring. Extends the
    reference's rolling volume features (src/ml/volume_analyzer.py:27-73)
    with an explicit seasonal model.

    Cross-engine exactness (the volume_trend discipline): daily counts y
    are integers; the centered ±3-day RANGE window yields (sum7, cnt7)
    integer pairs; the detrended value y − sum7/cnt7 is represented as
    the EXACT integer (y·cnt7 − sum7)·(420/cnt7) — 420 = lcm(1..7), so
    the scale factor is integral for every edge-window width — and the
    per-(type, dow) seasonal mean divides two exact integers. Every
    double is produced by one identical division/subtraction tree in
    both engines, then rounded at 6 dp.

    Scale: one (type, day) aggregate (map-side combinable), one
    partitioned window over |types|×|days| rows, one dow-grain
    broadcast-back join. The corpus is touched once.
    """
    daily = events.groupBy(
        F.col("event_type"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rangeBetween(-3, 3)
    )
    d = daily.select(
        "event_type",
        "x",
        "y",
        F.sum("y").over(w).alias("sum7"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cnt7"),
    ).select(
        "*",
        ((F.col("x") % 7 + 7) % 7).alias("dow"),
        (
            (F.col("y") * F.col("cnt7") - F.col("sum7"))
            * (F.lit(420) / F.col("cnt7")).cast("bigint")
        ).alias("du"),  # 420 × detrended, exact BIGINT
    )
    # seasonal mean as a WINDOW over (type, dow), not a groupBy + self-
    # join: Spark does not dedupe common subplans, so the join form
    # scans and re-aggregates the corpus TWICE (caught by the plan test)
    ws = Window.partitionBy("event_type", "dow")
    out = d.select(
        "*",
        (
            F.sum("du").over(ws).cast("double")
            / (F.lit(420.0) * F.count(F.lit(1)).over(ws).cast("double"))
        ).alias("seasonal"),
    )
    return out.select(
        "event_type",
        "x",
        F.col("dow").cast("int").alias("dow"),
        "y",
        F.round(
            F.col("sum7").cast("double") / F.col("cnt7").cast("double"), 6
        ).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round(
            F.col("du").cast("double") / 420.0 - F.col("seasonal"), 6
        ).alias("residual"),
    ).orderBy("event_type", "x")


def seasonal_decompose_oracle_sql() -> str:
    """DuckDB twin with the identical integer-scaled expression tree."""
    return """
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    d AS (
        SELECT event_type, x, y,
               CAST(sum(y) OVER w AS BIGINT) AS sum7,
               CAST(count(*) OVER w AS BIGINT) AS cnt7
        FROM daily
        WINDOW w AS (
            PARTITION BY event_type ORDER BY x
            RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING
        )
    ),
    du AS (
        SELECT *, ((x % 7 + 7) % 7) AS dow,
               (y * cnt7 - sum7) * CAST(420 / cnt7 AS BIGINT) AS du
        FROM d
    ),
    seas AS (
        SELECT *,
               CAST(sum(du) OVER ws AS DOUBLE)
                   / (420.0 * CAST(count(*) OVER ws AS DOUBLE)) AS seasonal
        FROM du
        WINDOW ws AS (PARTITION BY event_type, dow)
    )
    SELECT event_type, x, CAST(dow AS INT) AS dow, y,
           round(CAST(sum7 AS DOUBLE) / CAST(cnt7 AS DOUBLE), 6) AS trend,
           round(seasonal, 6) AS seasonal,
           round(CAST(du AS DOUBLE) / 420.0 - seasonal, 6) AS residual
    FROM seas
    ORDER BY event_type, x
    """


def resample_daily_volume(events: DataFrame) -> DataFrame:
    """Gap-filled daily volume per type: a complete calendar spine from
    each type's first to last active day, observed counts where they
    exist, LINEAR INTERPOLATION between the nearest observed neighbors
    where they don't — the resampling step every downstream
    trend/seasonal/changepoint model assumes has already happened
    (volume_trend et al. silently treat missing days as absent, not
    zero; this operator makes the time grid explicit).

    Cross-engine exactness: the interpolated value is the rational
    (prev_y·(next_x − x) + next_y·(x − prev_x)) / (next_x − prev_x)
    with an exact BIGINT numerator and denominator — one identical
    double division on both engines, then 6-dp rounding. Spine
    endpoints are each type's own min/max day, so every gap has both
    neighbors by construction.

    Scale: the daily aggregate is map-side combinable; the spine
    explodes in-row from a |types|-row min/max aggregate; neighbor
    lookup is two IGNORE-NULLS window passes over |types|×|span| rows —
    never event-grain.
    """
    daily = events.groupBy(
        F.col("event_type"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    span = daily.groupBy("event_type").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    spine = span.select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("x"),
    )
    g = spine.join(daily, ["event_type", "x"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = g.select(
        "event_type",
        "x",
        "y",
        F.last(F.col("y"), ignorenulls=True).over(wb).alias("py"),
        F.last(
            F.when(F.col("y").isNotNull(), F.col("x")), ignorenulls=True
        ).over(wb).alias("px"),
        F.first(F.col("y"), ignorenulls=True).over(wf).alias("ny"),
        F.first(
            F.when(F.col("y").isNotNull(), F.col("x")), ignorenulls=True
        ).over(wf).alias("nx"),
    )
    interp = (
        F.col("py") * (F.col("nx") - F.col("x"))
        + F.col("ny") * (F.col("x") - F.col("px"))
    ).cast("double") / (F.col("nx") - F.col("px")).cast("double")
    return filled.select(
        "event_type",
        "x",
        F.round(
            F.when(F.col("y").isNotNull(), F.col("y").cast("double"))
            .otherwise(interp),
            6,
        ).alias("y_filled"),
        F.col("y").isNull().alias("interpolated"),
    ).orderBy("event_type", "x")


def resample_daily_volume_oracle_sql() -> str:
    """DuckDB twin: same spine, same IGNORE NULLS neighbor windows,
    same exact-BIGINT interpolation numerator."""
    return """
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT event_type, min(x) AS lo, max(x) AS hi
        FROM daily GROUP BY 1
    ),
    spine AS (
        SELECT event_type, unnest(generate_series(lo, hi)) AS x FROM span
    ),
    g AS (
        SELECT spine.event_type, spine.x, daily.y
        FROM spine LEFT JOIN daily
          ON spine.event_type = daily.event_type AND spine.x = daily.x
    ),
    filled AS (
        SELECT event_type, x, y,
               last_value(y IGNORE NULLS) OVER wb AS py,
               last_value(CASE WHEN y IS NOT NULL THEN x END IGNORE NULLS)
                   OVER wb AS px,
               first_value(y IGNORE NULLS) OVER wf AS ny,
               first_value(CASE WHEN y IS NOT NULL THEN x END IGNORE NULLS)
                   OVER wf AS nx
        FROM g
        WINDOW wb AS (PARTITION BY event_type ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY event_type ORDER BY x
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, x,
           round(CASE WHEN y IS NOT NULL THEN CAST(y AS DOUBLE)
                      ELSE CAST(py * (nx - x) + ny * (x - px) AS DOUBLE)
                           / CAST(nx - px AS DOUBLE) END, 6) AS y_filled,
           (y IS NULL) AS interpolated
    FROM filled
    ORDER BY event_type, x
    """


def holt_winters_daily(
    events: DataFrame,
    m: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    horizon: int = 7,
) -> DataFrame:
    """Additive Holt–Winters (triple exponential smoothing) per event
    type over the daily volume series: in-sample one-step-ahead fits
    plus an ``horizon``-day forecast — the forecasting upgrade of
    ``volume_trend`` (level+trend) and ``seasonal_decompose``
    (retrospective decomposition): HW carries level, trend AND the
    weekly seasonal forward, which is what a capacity planner actually
    consumes.

    Semantics (both engines compute the IDENTICAL op sequence so the
    driver hash matches bit-for-bit after 6-dp rounding):
    - series = observed days ordered by day (row_number grain; gap days
      are treated as consecutive observations — compose with
      ``resample_daily_volume`` upstream for calendar-complete input);
    - init from the first two seasons with exact BIGINT sums T1, T2:
      level0 = T1/m, trend0 = (T2 − T1)/(m·m), seasonal_i = y_i − T1/m
      (single divisions of exact integers — engine-identical);
    - for t ≥ 2m (0-indexed t = seq − 1):
        fitted  = level + trend + s_old          (one-step forecast)
        level' = α·(y − s_old) + (1 − α)·(level + trend)
        trend' = β·(level' − level) + (1 − β)·trend
        s_new  = γ·(y − level') + (1 − γ)·s_old
    - forecast h = 1..horizon (horizon ≤ m):
        yhat = level_T + h·trend_T + s_{T−m+h}.
    Types with fewer than 2m + 1 observed days are skipped on both
    sides.

    Scale: ONE daily-grain shuffle (map-side combined count), then the
    recurrence runs per type over a |days|-length pandas frame inside
    applyInPandas — the series is tiny by construction and types are
    the parallel unit (the same judgment call as the stream twins: a
    genuinely sequential recurrence over a small keyed series, not a
    corpus-sized loop).
    """
    import pandas as pd

    if horizon > m:
        raise ValueError("horizon beyond one season needs s re-indexing")

    daily = (
        events.groupBy(
            F.col("event_type"), F.col("ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )

    schema = (
        "event_type string, day date, kind string, y bigint, "
        "yhat double, level double, trend double, seasonal double"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import datetime

        pdf = pdf.sort_values("day").reset_index(drop=True)
        n = len(pdf)
        if n < 2 * m + 1:
            return pd.DataFrame(
                columns=[
                    "event_type", "day", "kind", "y", "yhat", "level",
                    "trend", "seasonal",
                ]
            )
        et = pdf["event_type"].iloc[0]
        ys = [int(v) for v in pdf["y"]]
        t1 = sum(ys[:m])
        t2 = sum(ys[m : 2 * m])
        level = t1 / m
        trend = (t2 - t1) / (m * m)
        s = [ys[i] - t1 / m for i in range(m)]  # s[i] seeds slot i
        # consume the second season to warm the seasonal slots exactly
        # like the oracle: recurrence starts at t = m (so fits cover
        # t = 2m.. using s values updated once)
        out = []
        for t in range(m, n):
            y = float(ys[t])
            s_old = s[t % m]
            fitted = level + trend + s_old
            new_level = alpha * (y - s_old) + (1.0 - alpha) * (level + trend)
            trend = beta * (new_level - level) + (1.0 - beta) * trend
            s[t % m] = gamma * (y - new_level) + (1.0 - gamma) * s_old
            level = new_level
            if t >= 2 * m:
                out.append(
                    (
                        et, pdf["day"].iloc[t], "fit", ys[t],
                        round(fitted, 6), round(level, 6),
                        round(trend, 6), round(s[t % m], 6),
                    )
                )
        last_day = pdf["day"].iloc[n - 1]
        for h in range(1, horizon + 1):
            yhat = level + h * trend + s[(n - 1 + h) % m]
            out.append(
                (
                    et,
                    last_day + datetime.timedelta(days=h),
                    "forecast", None, round(yhat, 6), None, None, None,
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "event_type", "day", "kind", "y", "yhat", "level",
                "trend", "seasonal",
            ],
        )

    return (
        daily.groupBy("event_type")
        .applyInPandas(run, schema=schema)
        .orderBy("event_type", "day")
    )


def holt_winters_oracle_sql(
    m: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    horizon: int = 7,
) -> str:
    """DuckDB twin: the recurrence unrolled as a RECURSIVE CTE whose
    state row carries (type, t, level, trend, the m seasonal slots as a
    DOUBLE list). Every coefficient is interpolated with repr() and CAST
    to DOUBLE — DuckDB evaluates bare decimal literals in DECIMAL
    arithmetic, and 1.0 − 0.3 in decimal is NOT the IEEE double
    (1.0 - 0.3); casting makes both engines run the identical
    double-precision op sequence, so 6-dp rounding hashes match."""
    a_ = f"CAST({alpha!r} AS DOUBLE)"
    a1 = f"CAST({1.0 - alpha!r} AS DOUBLE)"
    b_ = f"CAST({beta!r} AS DOUBLE)"
    b1 = f"CAST({1.0 - beta!r} AS DOUBLE)"
    g_ = f"CAST({gamma!r} AS DOUBLE)"
    g1 = f"CAST({1.0 - gamma!r} AS DOUBLE)"
    return f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type, day, y,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   - 1 AS t
        FROM daily
    ),
    eligible AS (
        SELECT event_type, count(*) AS n FROM series
        GROUP BY 1 HAVING count(*) >= 2 * {m} + 1
    ),
    init AS (
        SELECT s.event_type,
               sum(CASE WHEN s.t < {m} THEN s.y END) AS t1,
               sum(CASE WHEN s.t >= {m} AND s.t < 2 * {m} THEN s.y END)
                   AS t2
        FROM series s JOIN eligible e USING (event_type)
        GROUP BY 1
    ),
    s0 AS (
        SELECT s.event_type,
               list(CAST(s.y AS DOUBLE) - i.t1 / {m} ORDER BY s.t)
                   AS slist
        FROM series s JOIN init i USING (event_type)
        WHERE s.t < {m}
        GROUP BY 1
    ),
    rec AS (
        SELECT i.event_type, CAST({m} - 1 AS BIGINT) AS t,
               CAST(NULL AS BIGINT) AS y,
               CAST(NULL AS DOUBLE) AS fitted,
               i.t1 / {m} AS level,
               (i.t2 - i.t1) / {m * m} AS trend,
               s0.slist AS slist
        FROM init i JOIN s0 USING (event_type)
        UNION ALL
        SELECT st.event_type, sr.t, sr.y,
               st.level + st.trend + st.slist[CAST(sr.t % {m} AS INT) + 1]
                   AS fitted,
               {a_} * (sr.y - st.slist[CAST(sr.t % {m} AS INT) + 1])
                   + {a1} * (st.level + st.trend) AS level,
               {b_} * (({a_} * (sr.y
                                - st.slist[CAST(sr.t % {m} AS INT) + 1])
                        + {a1} * (st.level + st.trend)) - st.level)
                   + {b1} * st.trend AS trend,
               list_transform(
                   st.slist,
                   (x, i) -> CASE
                       WHEN i = CAST(sr.t % {m} AS INT) + 1
                       THEN {g_} * (sr.y
                                    - ({a_} * (sr.y - x)
                                       + {a1} * (st.level + st.trend)))
                            + {g1} * x
                       ELSE x END
               ) AS slist
        FROM rec st
        JOIN series sr
          ON sr.event_type = st.event_type AND sr.t = st.t + 1
    ),
    fits AS (
        SELECT r.event_type, s.day, 'fit' AS kind, r.y,
               round(r.fitted, 6) AS yhat,
               round(r.level, 6) AS level,
               round(r.trend, 6) AS trend,
               round(r.slist[CAST(r.t % {m} AS INT) + 1], 6) AS seasonal
        FROM rec r
        JOIN series s ON s.event_type = r.event_type AND s.t = r.t
        WHERE r.t >= 2 * {m}
    ),
    terminal AS (
        SELECT r.* FROM rec r
        JOIN (SELECT event_type, max(t) AS t FROM rec GROUP BY 1) x
          ON r.event_type = x.event_type AND r.t = x.t
    ),
    lastday AS (
        SELECT s.event_type, max(s.day) AS last_day,
               max(s.t) AS last_t
        FROM series s JOIN eligible e USING (event_type)
        GROUP BY 1
    ),
    fc AS (
        SELECT t.event_type,
               l.last_day + CAST(h.h AS INT) AS day,
               'forecast' AS kind, CAST(NULL AS BIGINT) AS y,
               round(t.level + h.h * t.trend
                     + t.slist[CAST((l.last_t + h.h) % {m} AS INT) + 1],
                     6) AS yhat,
               CAST(NULL AS DOUBLE) AS level,
               CAST(NULL AS DOUBLE) AS trend,
               CAST(NULL AS DOUBLE) AS seasonal
        FROM terminal t
        JOIN lastday l USING (event_type)
        CROSS JOIN (SELECT unnest(generate_series(1, {horizon})) AS h) h
    )
    SELECT * FROM fits
    UNION ALL
    SELECT * FROM fc
    ORDER BY event_type, day
    """


def holt_winters_anomaly(
    events: DataFrame,
    m: int = 7,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Forecast-residual anomaly flags: the Holt–Winters one-step fits
    become an expectation, and days whose residual (y − ŷ) z-scores
    beyond ``z_thresh`` against the per-type residual distribution are
    flagged — the forecasting upgrade of the static z-score
    (anomaly_flags) and the robust census (mad_anomaly): a traffic
    level that is normal on Monday can be anomalous on Sunday, and only
    a seasonal expectation sees that.

    Output: (event_type, day, y, yhat, residual, z, is_anomaly) over
    the in-sample fit rows. Residuals derive from the 6-dp-rounded
    fits (bit-equal on both engines); z rounds at 4 dp BEFORE the
    threshold so the flag itself is engine-deterministic (the
    volume_zscore convention for double aggregates).

    Scale: holt_winters_daily's one daily-grain shuffle + per-type
    pandas recurrence, then one type-keyed window for the residual
    moments — day-grain data throughout.
    """
    hw = holt_winters_daily(events, m=m).filter(F.col("kind") == "fit")
    resid = F.col("y") - F.col("yhat")
    w = Window.partitionBy("event_type")
    scored = hw.select(
        "event_type",
        "day",
        "y",
        "yhat",
        F.round(resid, 6).alias("residual"),
        F.round(
            (resid - F.avg(resid).over(w))
            / (F.stddev_pop(resid).over(w) + F.lit(1e-9)),
            4,
        ).alias("z"),
    )
    return scored.select(
        "event_type",
        "day",
        "y",
        "yhat",
        "residual",
        "z",
        (F.abs(F.col("z")) > F.lit(float(z_thresh))).alias("is_anomaly"),
    ).orderBy("event_type", "day")


def holt_winters_anomaly_oracle_sql(
    m: int = 7, z_thresh: float = 3.0
) -> str:
    """DuckDB twin: the full HW recursive-CTE oracle wrapped as a CTE,
    then the same residual moments per type (window aggregates over
    doubles; z rounded 4 dp before the threshold on both engines)."""
    inner = holt_winters_oracle_sql(m=m)
    return f"""
    WITH hw AS ({inner})
    SELECT event_type, day, y, yhat,
           round(y - yhat, 6) AS residual,
           round((y - yhat - avg(y - yhat) OVER w)
                 / (stddev_pop(y - yhat) OVER w
                    + CAST('1e-9' AS DOUBLE)), 4) AS z,
           abs(round((y - yhat - avg(y - yhat) OVER w)
                 / (stddev_pop(y - yhat) OVER w
                    + CAST('1e-9' AS DOUBLE)), 4))
               > CAST({z_thresh!r} AS DOUBLE) AS is_anomaly
    FROM hw
    WHERE kind = 'fit'
    WINDOW w AS (PARTITION BY event_type)
    ORDER BY event_type, day
    """


def ewma_control_chart(
    events: DataFrame, alpha: float = 0.2, L: float = 3.0
) -> DataFrame:
    """EWMA control chart per event type over the daily volume series
    (Roberts 1959; the SPC standard for detecting SMALL sustained
    shifts that a Shewhart/z chart misses): the smoothed statistic
    s_t = α·y_t + (1−α)·s_{t−1} (s_0 = y_0) is flagged when it leaves
    the asymptotic control band mu ± L·sigma·sqrt(α/(2−α)).

    Engine-exact parity: mu and sigma derive from EXACT BIGINT daily
    counts (n, Σy, Σy²) in one fixed double-op order (mu = Σy/n,
    var = Σy²/n − mu², sigma = sqrt(var)); the recurrence runs the
    identical op sequence on both engines; displayed values round 6 dp,
    the flag compares UNROUNDED doubles that share every upstream op.

    Output: (event_type, day, y, ewma, ucl, lcl, flag).

    Scale: ONE daily-grain shuffle (map-side combined count); the
    recurrence runs per type over a |days|-length pandas frame inside
    applyInPandas (the holt_winters_daily judgment call: genuinely
    sequential, vocabulary-keyed, series-sized — never corpus-sized).
    """
    import math

    import pandas as pd

    daily = events.groupBy(
        F.col("event_type"), F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))

    schema = (
        "event_type string, day date, y bigint, ewma double, "
        "ucl double, lcl double, flag boolean"
    )
    factor = math.sqrt(alpha / (2.0 - alpha))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        ys = [int(v) for v in pdf["y"]]
        n = len(ys)
        total = sum(ys)
        sumsq = sum(v * v for v in ys)
        mu = total / n
        var = sumsq / n - mu * mu
        sigma = math.sqrt(var if var > 0 else 0.0)
        ucl = mu + L * sigma * factor
        lcl = mu - L * sigma * factor
        out, s = [], None
        for t in range(n):
            y = float(ys[t])
            s = y if s is None else alpha * y + (1.0 - alpha) * s
            out.append(
                (
                    pdf["event_type"].iloc[0], pdf["day"].iloc[t], ys[t],
                    round(s, 6), round(ucl, 6), round(lcl, 6),
                    bool(s > ucl or s < lcl),
                )
            )
        return pd.DataFrame(
            out,
            columns=["event_type", "day", "y", "ewma", "ucl", "lcl", "flag"],
        )

    return (
        daily.groupBy("event_type")
        .applyInPandas(run, schema=schema)
        .orderBy("event_type", "day")
    )


def ewma_control_chart_oracle_sql(alpha: float = 0.2, L: float = 3.0) -> str:
    """DuckDB twin: the recurrence as a RECURSIVE CTE; every float
    coefficient interpolated with repr() and CAST AS DOUBLE (bare
    decimal literals evaluate in DECIMAL arithmetic — the known trap),
    mu/sigma from the SAME exact BIGINT aggregates in the same op
    order, flag compared on unrounded doubles."""
    a_ = f"CAST({alpha!r} AS DOUBLE)"
    a1 = f"CAST({1.0 - alpha!r} AS DOUBLE)"
    l_ = f"CAST({L!r} AS DOUBLE)"
    two = "CAST(2.0 AS DOUBLE)"
    return f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type, day, y,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   - 1 AS t
        FROM daily
    ),
    stats AS (
        SELECT event_type,
               count(*) AS n,
               CAST(sum(y) AS BIGINT) AS total,
               CAST(sum(y * y) AS BIGINT) AS sumsq
        FROM series GROUP BY 1
    ),
    lim AS (
        SELECT event_type,
               total / n AS mu,
               sqrt(CASE WHEN sumsq / n - (total / n) * (total / n) > 0
                         THEN sumsq / n - (total / n) * (total / n)
                         ELSE CAST(0.0 AS DOUBLE) END) AS sigma
        FROM stats
    ),
    band AS (
        SELECT event_type, mu,
               mu + {l_} * sigma * sqrt({a_} / ({two} - {a_})) AS ucl,
               mu - {l_} * sigma * sqrt({a_} / ({two} - {a_})) AS lcl
        FROM lim
    ),
    rec AS (
        SELECT s.event_type, s.t, s.day, s.y, CAST(s.y AS DOUBLE) AS s
        FROM series s WHERE s.t = 0
        UNION ALL
        SELECT sr.event_type, sr.t, sr.day, sr.y,
               {a_} * sr.y + {a1} * r.s AS s
        FROM rec r JOIN series sr
          ON sr.event_type = r.event_type AND sr.t = r.t + 1
    )
    SELECT r.event_type, r.day, r.y,
           round(r.s, 6) AS ewma,
           round(b.ucl, 6) AS ucl,
           round(b.lcl, 6) AS lcl,
           (r.s > b.ucl OR r.s < b.lcl) AS flag
    FROM rec r JOIN band b USING (event_type)
    ORDER BY r.event_type, r.day
    """


def forecast_backtest_report(events: DataFrame, m: int = 7) -> DataFrame:
    """Forecast-accuracy backtest: per event type, MASE and sMAPE of
    the Holt–Winters one-step in-sample fits against the seasonal-naive
    baseline y_{t−m} (Hyndman & Koehler 2006 — MASE is THE
    scale-free forecast metric: < 1 means the model beats naive). The
    missing evaluation half of holt_winters_daily: a forecaster you
    never score against naive is a dashboard, not a model.

    Output: (event_type, n_days, mae_hw, mae_naive, mase, smape) over
    the fit region (t ≥ 2m). The MASE denominator Σ|y_t − y_{t−m}|
    sums EXACT BIGINTs; the numerator sums |y − ŷ| over the
    6-dp-rounded fits (the holt_winters_anomaly parity convention for
    double aggregates).

    Scale: holt_winters_daily's daily-grain shuffle + tiny per-type
    recurrence, one more day-grain lag window and a per-type aggregate
    — nothing corpus-sized.
    """
    hw = holt_winters_daily(events, m=m).filter(F.col("kind") == "fit")
    daily = events.groupBy(
        F.col("event_type"), F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y0"))
    w = Window.partitionBy("event_type").orderBy("day")
    naive = daily.select(
        "event_type", "day", F.lag("y0", m).over(w).alias("y_naive")
    )
    joined = hw.join(naive, ["event_type", "day"]).select(
        "event_type",
        F.abs(F.col("y") - F.col("yhat")).alias("ae_hw"),
        F.abs(F.col("y") - F.col("y_naive")).cast("bigint").alias("ae_nv"),
        # sMAPE term, guarded: when y = yhat = 0 the ratio is 0/0 —
        # defined as 0 (a zero forecast of a zero actual is perfect),
        # the same CASE on the DuckDB side. Unreachable on real daily
        # counts (y ≥ 1 by construction) but keeps degenerate fixtures
        # engine-identical instead of NULL-vs-nan divergent.
        F.when(
            (F.abs(F.col("y")) + F.abs(F.col("yhat"))) > 0,
            F.lit(2.0)
            * F.abs(F.col("y") - F.col("yhat"))
            / (F.abs(F.col("y")) + F.abs(F.col("yhat"))),
        )
        .otherwise(F.lit(0.0))
        .alias("sm"),
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.sum("ae_hw") / F.count(F.lit(1)), 6).alias("mae_hw"),
            F.round(
                F.sum("ae_nv").cast("double") / F.count(F.lit(1)), 6
            ).alias("mae_naive"),
            # MASE denominator guarded: an exactly-periodic series makes
            # the seasonal-naive baseline perfect (Σ|y_t − y_{t−m}| = 0);
            # Spark non-ANSI division would yield NULL while DuckDB can
            # yield inf/nan — so BOTH engines return NULL explicitly
            # (when / NULLIF), "MASE undefined against a perfect naive".
            F.when(
                F.sum("ae_nv") > 0,
                F.round(
                    F.sum("ae_hw") / F.sum("ae_nv").cast("double"), 6
                ),
            ).alias("mase"),
            F.round(F.avg("sm"), 6).alias("smape"),
        )
        .orderBy("event_type")
    )


def forecast_backtest_oracle_sql(m: int = 7) -> str:
    """DuckDB twin: the HW recursive-CTE oracle wrapped as a CTE (the
    holt_winters_anomaly pattern), the same lag-m naive baseline and
    the same aggregate op order."""
    inner = holt_winters_oracle_sql(m=m)
    return f"""
    WITH hw AS MATERIALIZED ({inner}),
    daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS y0
        FROM events GROUP BY 1, 2
    ),
    naive AS (
        SELECT event_type, day,
               lag(y0, {m}) OVER (PARTITION BY event_type ORDER BY day)
                   AS y_naive
        FROM daily
    ),
    joined AS (
        SELECT hw.event_type,
               abs(hw.y - hw.yhat) AS ae_hw,
               CAST(abs(hw.y - n.y_naive) AS BIGINT) AS ae_nv,
               CASE WHEN abs(hw.y) + abs(hw.yhat) > 0
                    THEN CAST(2.0 AS DOUBLE) * abs(hw.y - hw.yhat)
                         / (abs(hw.y) + abs(hw.yhat))
                    ELSE CAST(0.0 AS DOUBLE) END AS sm
        FROM hw JOIN naive n
          ON hw.event_type = n.event_type AND hw.day = n.day
        WHERE hw.kind = 'fit'
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(sum(ae_hw) / count(*), 6) AS mae_hw,
           round(CAST(sum(ae_nv) AS DOUBLE) / count(*), 6) AS mae_naive,
           round(sum(ae_hw) / NULLIF(CAST(sum(ae_nv) AS DOUBLE), 0), 6)
               AS mase,
           round(avg(sm), 6) AS smape
    FROM joined
    GROUP BY 1
    ORDER BY 1
    """
