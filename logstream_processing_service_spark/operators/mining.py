"""Market-basket association mining over event streams: which event
types co-occur in the same user's history, scored with the classic
support / confidence / lift triple (Agrawal & Srikant 1994's Apriori
measures at the pair grain — the 2-itemset pass that dominates real
basket workloads).

Reference tie: the reference's pattern mining (src/db/log_ops.py's
frequent-pair query family) stops at raw pair counts; this adds the
normalized rule scores a recommendation / anomaly pipeline consumes.

Scale shape: baskets are DISTINCT (user_id, event_type) rows — one
map-side-combined aggregate off the scan. Pair candidates come from a
per-user self-join of that distinct table; per-user cost is quadratic
in the user's DISTINCT TYPE count, which is bounded by the event-type
vocabulary (tens), never by the user's raw event count (millions) —
the distinct-first discipline is what makes the self-join safe at
100 TB. ``basket_cap`` is the loud backstop for pathological
vocabularies (a user with thousands of distinct types would make the
self-join quadratic; capping mirrors the dedup df-cap pattern). Rule
scoring joins the tiny per-item count table back by BROADCAST — no
exchange on the pair table beyond its own aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    events: DataFrame,
    min_pair_users: int = 2,
    basket_cap: int = 1000,
) -> DataFrame:
    """Ordered rules (ante → cons) over per-user distinct event types.

    Output: (ante, cons, n_ante, n_cons, n_both, support, confidence,
    lift), one row per ORDERED pair with ≥ ``min_pair_users`` common
    users; ratios are exact BIGINT divisions rounded 6 dp.

      support    = n_both / n_users
      confidence = n_both / n_ante        (P(cons | ante))
      lift       = confidence / (n_cons / n_users)

    ``basket_cap`` drops users with more distinct types than the cap
    (loudly quadratic baskets; none exist in any sane event schema).
    """
    baskets = events.select("user_id", "event_type").distinct()
    sizes = baskets.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("_n_types")
    )
    capped = (
        baskets.join(
            F.broadcast(sizes.filter(F.col("_n_types") > basket_cap)),
            "user_id",
            "left_anti",
        )
        if basket_cap
        else baskets
    )
    n_users = capped.select("user_id").distinct().count()

    item = capped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_item")
    )
    a = capped.select("user_id", F.col("event_type").alias("ante"))
    b = capped.select("user_id", F.col("event_type").alias("cons"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .filter(F.col("n_both") >= min_pair_users)
    )
    ni = F.broadcast(item)
    return (
        pairs.join(
            ni.select(F.col("event_type").alias("ante"), F.col("n_item").alias("n_ante")),
            "ante",
        )
        .join(
            ni.select(F.col("event_type").alias("cons"), F.col("n_item").alias("n_cons")),
            "cons",
        )
        .select(
            "ante",
            "cons",
            "n_ante",
            "n_cons",
            "n_both",
            F.round(F.col("n_both") / F.lit(float(n_users)), 6).alias(
                "support"
            ),
            F.round(F.col("n_both") / F.col("n_ante"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_both") / F.col("n_ante"))
                / (F.col("n_cons") / F.lit(float(n_users))),
                6,
            ).alias("lift"),
        )
        .orderBy("ante", "cons")
    )


def association_rules_oracle_sql(
    min_pair_users: int = 2, basket_cap: int = 1000
) -> str:
    """DuckDB twin: identical distinct-basket derivation; every ratio
    divides exact BIGINTs in DOUBLE (same IEEE ops, same 6-dp round).
    A falsy ``basket_cap`` disables the cap on BOTH engines (the Spark
    side skips the anti-join entirely — ADVICE-r8: the oracle must
    mirror that conditional, not emit ``HAVING count(*) > 0``)."""
    big_cte = (
        f"""big AS (
        SELECT user_id FROM baskets0
        GROUP BY user_id HAVING count(*) > {basket_cap}
    ),
    baskets AS (
        SELECT * FROM baskets0
        WHERE user_id NOT IN (SELECT user_id FROM big)
    ),"""
        if basket_cap
        else "baskets AS (SELECT * FROM baskets0),"
    )
    return f"""
    WITH baskets0 AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    {big_cte}
    nu AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n FROM baskets),
    item AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_item
        FROM baskets GROUP BY 1
    ),
    pairs AS (
        SELECT a.event_type AS ante, b.event_type AS cons,
               CAST(count(*) AS BIGINT) AS n_both
        FROM baskets a JOIN baskets b
          ON a.user_id = b.user_id AND a.event_type <> b.event_type
        GROUP BY 1, 2
        HAVING count(*) >= {min_pair_users}
    )
    SELECT ante, cons,
           ia.n_item AS n_ante, ic.n_item AS n_cons, n_both,
           round(n_both / nu.n, 6) AS support,
           round(n_both * 1.0 / ia.n_item, 6) AS confidence,
           round((n_both * 1.0 / ia.n_item)
                 / (ic.n_item * 1.0 / nu.n), 6) AS lift
    FROM pairs
    JOIN item ia ON pairs.ante = ia.event_type
    JOIN item ic ON pairs.cons = ic.event_type
    CROSS JOIN nu
    ORDER BY ante, cons
    """


def purchase_attribution(
    events: DataFrame, lookback_s: int = 7 * 24 * 3600
) -> DataFrame:
    """Last-touch / first-touch attribution: for every ``purchase``
    event, the user's latest click BEFORE it within ``lookback_s``
    seconds, and the user's first click PRECEDING the purchase (the
    running window is UNBOUNDED PRECEDING → 1 PRECEDING, so a user
    whose only clicks come after the purchase gets NULL for both
    models) — the two classic marketing-attribution models, as one
    pass.

    Output: (event_id, user_id, purchase_ts_us, last_click_id,
    last_click_lag_s, first_click_id) — last_click_* NULL when no click
    precedes the purchase inside the window.

    Engine-portable determinism: the "latest preceding click" is a
    running window MAX over a zero-padded ``ts:event_id`` string (both
    engines order the same strings identically; packing into one
    BIGINT would overflow at microsecond scale). Equal-timestamp events
    order by event_id — the same total order on both engines.

    Scale: ONE user-keyed window pass over the event stream (ROWS
    UNBOUNDED PRECEDING → 1 PRECEDING running max is O(1) per row) —
    no self-join of purchases against clicks, which is the naive
    quadratic form. The purchase filter prunes output AFTER the window
    but the shuffle is the single user partition exchange either way.
    """
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    tagged = events.select(
        "event_id",
        "user_id",
        "event_type",
        ts_us.alias("ts_us"),
        F.when(
            F.col("event_type") == "click",
            F.concat_ws(
                ":",
                F.lpad(ts_us.cast("string"), 20, "0"),
                F.lpad(F.col("event_id").cast("string"), 12, "0"),
            ),
        ).alias("click_key"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    enriched = tagged.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.max("click_key").over(w).alias("last_ck"),
        F.min("click_key").over(w).alias("first_ck"),
    )
    lag_s = (
        F.col("ts_us") - F.split(F.col("last_ck"), ":")[0].cast("bigint")
    ) / F.lit(1000000.0)
    out = (
        enriched.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            F.when(
                F.col("last_ck").isNotNull()
                & (lag_s <= F.lit(float(lookback_s))),
                F.split(F.col("last_ck"), ":")[1].cast("bigint"),
            ).alias("last_click_id"),
            F.when(
                F.col("last_ck").isNotNull()
                & (lag_s <= F.lit(float(lookback_s))),
                F.round(lag_s, 6),
            ).alias("last_click_lag_s"),
            F.split(F.col("first_ck"), ":")[1]
            .cast("bigint")
            .alias("first_click_id"),
        )
        .orderBy("event_id")
    )
    return out


def purchase_attribution_oracle_sql(lookback_s: int = 7 * 24 * 3600) -> str:
    """DuckDB twin: the same packed-string running window max/min; lag
    divides exact BIGINT microseconds by 1e6 in double, 6-dp round."""
    return f"""
    WITH tagged AS (
        SELECT event_id, user_id, event_type,
               epoch_us(ts) AS ts_us,
               CASE WHEN event_type = 'click' THEN
                   lpad(CAST(epoch_us(ts) AS VARCHAR),
                        20, '0')
                   || ':' || lpad(CAST(event_id AS VARCHAR), 12, '0')
               END AS click_key
        FROM events
    ),
    enriched AS (
        SELECT event_id, user_id, event_type, ts_us,
               max(click_key) OVER w AS last_ck,
               min(click_key) OVER w AS first_ck
        FROM tagged
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_id, user_id, ts_us AS purchase_ts_us,
           CASE WHEN last_ck IS NOT NULL AND
                     (ts_us - CAST(string_split(last_ck, ':')[1] AS BIGINT))
                     / CAST(1000000 AS DOUBLE) <= {float(lookback_s)!r}
                THEN CAST(string_split(last_ck, ':')[2] AS BIGINT)
           END AS last_click_id,
           CASE WHEN last_ck IS NOT NULL AND
                     (ts_us - CAST(string_split(last_ck, ':')[1] AS BIGINT))
                     / CAST(1000000 AS DOUBLE) <= {float(lookback_s)!r}
                THEN round((ts_us -
                     CAST(string_split(last_ck, ':')[1] AS BIGINT))
                     / CAST(1000000 AS DOUBLE), 6)
           END AS last_click_lag_s,
           CAST(string_split(first_ck, ':')[2] AS BIGINT) AS first_click_id
    FROM enriched
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """


def event_path_trigrams(
    events: DataFrame, min_count: int = 5
) -> DataFrame:
    """Frequent 3-step user paths (sequential pattern mining, the
    PrefixSpan k=3 slice): consecutive event-type trigrams per user
    under the (ts, event_id) total order, counted corpus-wide — the
    "what do users do next" flow report the reference's pattern mining
    (pattern_ops.py:28-65) begs for at path grain.

    Output: (step1, step2, step3, n_paths) for trigrams with
    ≥ ``min_count`` occurrences; exact BIGINT counts.

    Scale: ONE user-keyed window exchange (two leads over the same
    window spec collapse into one Window node), then a map-side-combined
    count keyed by the trigram — cardinality bounded by |event_type|³,
    a vocabulary, not the corpus.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = events.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
    ).filter(F.col("step3").isNotNull())
    return (
        tri.groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
        .filter(F.col("n_paths") >= min_count)
        .orderBy("step1", "step2", "step3")
    )


def event_path_trigrams_oracle_sql(min_count: int = 5) -> str:
    """DuckDB twin: identical (ts, event_id)-ordered leads per user."""
    return f"""
    WITH tri AS (
        SELECT event_type AS step1,
               lead(event_type, 1) OVER w AS step2,
               lead(event_type, 2) OVER w AS step3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
    FROM tri
    WHERE step3 IS NOT NULL
    GROUP BY 1, 2, 3
    HAVING count(*) >= {min_count}
    ORDER BY 1, 2, 3
    """
