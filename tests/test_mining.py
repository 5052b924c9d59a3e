"""Association-rule mining over per-user event baskets — r9 catalog
candidate `association_rules`. Exact BIGINT counts; support/confidence/
lift divide them in double on both engines. A planted fixture pins the
measures by hand."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.mining import (
    association_rules,
    association_rules_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_rules_hash_match_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "association_rules",
        lambda s, sf: association_rules(load_table(s, sf, "events")),
        association_rules_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, event_type string",
    )


def test_hand_computed_measures(spark):
    """4 users: {a,b} ×3, {a} ×1 → n_users=4, n_a=4, n_b=3, n_ab=3.
    support(ab)=0.75; conf(a→b)=3/4=0.75; conf(b→a)=3/3=1.0;
    lift(a→b)=0.75/(3/4)=1.0; lift(b→a)=1.0/(4/4)=1.0."""
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
            (4, "a"),
            # duplicate raw events must not change distinct baskets
            (1, "a"), (1, "b")]
    got = {(r["ante"], r["cons"]): r
           for r in association_rules(_ev(spark, rows)).collect()}
    ab, ba = got[("a", "b")], got[("b", "a")]
    assert ab["n_ante"] == 4 and ab["n_cons"] == 3 and ab["n_both"] == 3
    assert ab["support"] == 0.75 and ab["confidence"] == 0.75
    assert ab["lift"] == 1.0
    assert ba["confidence"] == 1.0 and ba["lift"] == 1.0
    assert ba["support"] == 0.75


def test_min_pair_users_and_basket_cap(spark):
    # a pair seen by ONE user is dropped at min_pair_users=2
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "c"), (3, "a"), (3, "c")]
    got = association_rules(_ev(spark, rows)).collect()
    keys = {(r["ante"], r["cons"]) for r in got}
    assert ("a", "c") in keys and ("c", "a") in keys
    assert ("a", "b") not in keys  # support 1 < 2
    # a degenerate basket above the cap is excluded entirely (loud
    # quadratic guard) and its user leaves the denominator
    wide = [(9, f"t{i}") for i in range(30)] + rows
    capped = association_rules(_ev(spark, wide), basket_cap=10).collect()
    assert {(r["ante"], r["cons"]) for r in capped} == keys
    assert all(r["n_ante"] <= 3 for r in capped)


def test_rules_plan_no_cartesian_broadcast_scoring(spark):
    ev = load_table(spark, SF_DIR, "events")
    plan = (
        association_rules(ev)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # the per-item count table rides as a broadcast, never reshuffling
    # the pair table
    assert "BroadcastHashJoin" in plan


def test_rules_basket_cap_disabled_oracle_parity(spark):
    """ADVICE-r8 (low): basket_cap=0 disables the cap on the Spark side;
    the oracle must mirror the conditional (its old HAVING count(*) > 0
    dropped every 2+-type user — an engine divergence)."""
    con = duckdb_conn(SF_DIR)
    r = compare_one(
        spark,
        con,
        "association_rules_nocap",
        lambda s, sf: association_rules(
            load_table(s, sf, "events"), basket_cap=0
        ),
        association_rules_oracle_sql(basket_cap=0),
        SF_DIR,
    )
    assert r["status"] == "OK", r


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_path_trigrams_hash_match_oracle(spark, sf_dir):
    from logstream_processing_service_spark.operators.mining import (
        event_path_trigrams,
        event_path_trigrams_oracle_sql,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "event_path_trigrams",
        lambda s, sf: event_path_trigrams(load_table(s, sf, "events")),
        event_path_trigrams_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_path_trigrams_hand_fixture(spark):
    """User 1: a->b->c->b => trigrams (a,b,c),(b,c,b); user 2: a->b->c
    => (a,b,c). min_count=2 keeps only (a,b,c)."""
    from datetime import datetime

    from logstream_processing_service_spark.operators.mining import (
        event_path_trigrams,
    )

    rows = [
        (1, 1, "a", datetime(2024, 1, 1, 0, 0, 0)),
        (2, 1, "b", datetime(2024, 1, 1, 0, 0, 1)),
        (3, 1, "c", datetime(2024, 1, 1, 0, 0, 2)),
        (4, 1, "b", datetime(2024, 1, 1, 0, 0, 3)),
        (5, 2, "a", datetime(2024, 1, 1, 0, 0, 0)),
        (6, 2, "b", datetime(2024, 1, 1, 0, 0, 1)),
        (7, 2, "c", datetime(2024, 1, 1, 0, 0, 2)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = event_path_trigrams(ev, min_count=2).collect()
    assert [(r["step1"], r["step2"], r["step3"], r["n_paths"])
            for r in got] == [("a", "b", "c", 2)]
