"""Round-3 training-pipeline operators: weighted sampling, shard order,
charclass/PII scans, graded contamination, quality-keeper dedup, int8
quantization audit — semantics on constructed fixtures + plan shapes."""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # tiered run: see pytest.ini (r13 VERDICT #1)

from pyspark.sql import functions as F

from .conftest import SF_DIR
from logstream_processing_service_spark.sources.tables import load_table


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_weighted_sample_deterministic_and_weight_biased(spark):
    from logstream_processing_service_spark.operators.sampling import (
        weighted_sample,
    )

    docs = _docs(spark).select("doc_id", "n_chars")
    a = weighted_sample(docs, "doc_id", "n_chars", 30).collect()
    b = weighted_sample(docs, "doc_id", "n_chars", 30).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 30
    # weight bias: the sampled mean weight must exceed the corpus mean
    # (inclusion probability ∝ n_chars)
    mean_all = docs.agg(F.avg("n_chars")).collect()[0][0]
    mean_sample = sum(r["n_chars"] for r in a) / len(a)
    assert mean_sample > mean_all
    # the top-k is TakeOrdered, never a global sort
    plan = _plan(weighted_sample(docs, "doc_id", "n_chars", 30))
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_zero_weight_excluded(spark):
    from logstream_processing_service_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10), (4, 10)], "id long, w long"
    )
    got = {r["id"] for r in weighted_sample(df, "id", "w", 10).collect()}
    assert got == {3, 4}


def test_shard_assignment_dense_and_stable(spark):
    from logstream_processing_service_spark.operators.sampling import (
        shard_assignment,
    )

    docs = _docs(spark).select("doc_id")
    out = shard_assignment(docs, "doc_id", n_shards=8)
    rows = out.collect()
    assert len(rows) == docs.count()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # stability: a second run yields the identical assignment
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in out.collect()}
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in rows} == again


def test_shard_assignment_per_shard_volume_guard(spark):
    """Each shard sorts in ONE task, so undersized n_shards must fail
    loudly instead of handing a multi-TB sort to a single task."""
    from logstream_processing_service_spark.operators.sampling import (
        shard_assignment,
    )

    docs = _docs(spark).select("doc_id")
    with pytest.raises(ValueError, match="rows/shard"):
        shard_assignment(docs, "doc_id", n_shards=2, max_rows_per_shard=10)
    # explicit override admits the same sizing
    assert (
        shard_assignment(
            docs, "doc_id", n_shards=2, max_rows_per_shard=10**9
        ).count()
        == docs.count()
    )


def test_charclass_profile_hand_check(spark):
    from logstream_processing_service_spark.operators.textanalysis import (
        charclass_profile,
    )

    df = spark.createDataFrame(
        [(1, "ab1 c!"), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in charclass_profile(df).collect()}
    r = got[1]
    assert (r["n_chars"], r["n_alpha"], r["n_digit"], r["n_space"],
            r["n_other"]) == (6, 3, 1, 1, 1)
    assert got[2]["n_chars"] == 0 and got[2]["alpha_ratio"] == 0.0


def test_pii_scan_counts_and_redaction(spark):
    from logstream_processing_service_spark.operators.textanalysis import (
        pii_scan,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d@e.org call 555-1234"),
            (2, "nothing here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert got[1]["n_emails"] == 2 and got[1]["n_phones"] == 1
    assert got[2]["n_emails"] == 0 and got[2]["n_phones"] == 0
    # redaction changes the fingerprint only where PII was found
    from logstream_processing_service_spark.functions.text import hash48_sql

    plain = df.select(
        "doc_id", F.expr(hash48_sql("text")).alias("fp")
    ).collect()
    plain_fp = {r["doc_id"]: r["fp"] for r in plain}
    assert got[1]["redacted_fp"] != plain_fp[1]
    assert got[2]["redacted_fp"] == plain_fp[2]


def test_contamination_overlap_planted_copy(spark):
    """A train doc that verbatim-copies an eval doc must score ~1.0; an
    unrelated doc scores 0. Split membership is forced via doc_ids chosen
    by probing the real md5 split."""
    from logstream_processing_service_spark.operators.dedup import (
        contamination_overlap,
    )
    from logstream_processing_service_spark.operators.sampling import (
        deterministic_split,
    )

    ids = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    split = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(ids, "doc_id").collect()
    }
    eval_id = next(i for i in sorted(split) if split[i] == "test")
    train_copy = next(i for i in sorted(split) if split[i] == "train")
    train_clean = next(
        i for i in sorted(split) if split[i] == "train" and i != train_copy
    )
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (eval_id, shared),
        (train_copy, shared),
        (train_clean, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in contamination_overlap(df, n=5).collect()}
    assert got[train_copy]["overlap_ratio"] == 1.0
    assert got[train_clean]["overlap_ratio"] == 0.0
    assert eval_id not in got  # eval docs are not scored


def test_dedup_keep_table_quality_keeper(spark):
    from logstream_processing_service_spark.operators.dedup import (
        dedup_keep_table,
    )

    docs = _docs(spark)
    out = dedup_keep_table(docs)
    rows = out.collect()
    assert len(rows) == docs.count()  # full partition of the corpus
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    quality = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    for cid, members in by_cluster.items():
        keepers = [r for r in members if r["keep"]]
        assert len(keepers) == 1, cid
        if len(members) > 1:
            # the keeper carries the max quality (doc_id tie-break asc)
            best = max(
                members, key=lambda r: (quality[r["doc_id"]], -r["doc_id"])
            )
            assert keepers[0]["doc_id"] == best["doc_id"], cid
    plan = _plan(out)
    assert "CartesianProduct" not in plan


def test_embedding_int8_quantization_bound(spark):
    """Reconstruction error of symmetric int8 must respect the half-step
    bound: |x - q*scale| <= scale/2 (+ float slack)."""
    from logstream_processing_service_spark.operators.similarity import (
        embedding_int8_report,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    out = embedding_int8_report(emb)
    bad = out.filter(
        F.col("max_abs_err") > F.col("scale") / 2 + F.lit(1e-7)
    ).count()
    assert bad == 0
    assert out.count() == emb.count()


def test_new_scan_ops_zero_exchange(spark):
    """charclass_profile and pii_scan are pure scan projections."""
    from logstream_processing_service_spark.operators.textanalysis import (
        charclass_profile,
        pii_scan,
    )

    docs = _docs(spark)
    for df in (charclass_profile(docs), pii_scan(docs)):
        assert "Exchange" not in _plan(df)


def test_subword_token_counts_hand_check(spark):
    from logstream_processing_service_spark.operators.textanalysis import (
        subword_token_counts,
    )

    df = spark.createDataFrame(
        [(1, "it's 42 words, ok"), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in subword_token_counts(df).collect()}
    # it | 's | " 42" | " words" | "," | " ok"  -> 6 segments
    assert got[1]["pretoken_segments"] == 6
    assert got[1]["ws_tokens"] == 4
    assert got[2]["pretoken_segments"] == 0


def test_dataset_card_shape(spark):
    from logstream_processing_service_spark.operators.textanalysis import (
        dataset_card,
    )

    docs = _docs(spark)
    out = dataset_card(docs)
    rows = out.collect()
    assert len(rows) == docs.select("source").distinct().count()
    for r in rows:
        assert 0.0 <= r["exact_dup_frac"] < 1.0
        assert r["n_docs"] > 0 and r["total_chars"] > 0
        assert r["p50_chars"] <= r["n_docs"] * 0  or r["p50_chars"] > 0


def test_robust_anomaly_stats_planted_outlier(spark):
    from logstream_processing_service_spark.operators.relational import (
        robust_anomaly_stats,
    )

    rows = [("a", float(v)) for v in range(1, 22)] + [("a", 1000.0)]
    rows += [("b", 5.0)] * 10
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {r["event_type"]: r for r in robust_anomaly_stats(df).collect()}
    a = got["a"]
    assert a["med"] == 11.5  # median of 1..21 + outlier
    assert a["n_outliers"] == 1 and a["n"] == 22
    b = got["b"]
    assert b["mad"] == 0.0 and b["n_outliers"] == 0


def test_funnel_stages_strict_order(spark):
    from logstream_processing_service_spark.operators.relational import (
        funnel_stages,
    )

    rows = [
        # user 1: full ordered funnel
        (1, "2024-01-01 00:00:00", 1, "signup"),
        (1, "2024-01-01 01:00:00", 2, "view"),
        (1, "2024-01-01 02:00:00", 3, "purchase"),
        # user 2: purchase BEFORE signup — must stop at stage 1
        (2, "2024-01-01 00:00:00", 4, "purchase"),
        (2, "2024-01-01 01:00:00", 5, "signup"),
        # user 3: signup then purchase (no view) — stage 1 only
        (3, "2024-01-01 00:00:00", 6, "signup"),
        (3, "2024-01-01 01:00:00", 7, "purchase"),
        # user 4: never enters the funnel
        (4, "2024-01-01 00:00:00", 8, "error"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {r["stage"]: r["n_users"] for r in funnel_stages(df).collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_funnel_stages_empty_slice_reports_zero(spark):
    """A slice with NO funnel events must still report every stage with
    0 users (a global agg over an empty frame sums to NULL, not 0)."""
    from logstream_processing_service_spark.operators.relational import (
        funnel_stages,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "error")],
        "user_id long, ts string, event_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {r["stage"]: r["n_users"] for r in funnel_stages(df).collect()}
    assert got == {1: 0, 2: 0, 3: 0}


def test_cross_source_dup_matrix_consistent_with_pairs(spark):
    from logstream_processing_service_spark.operators.dedup import (
        cross_source_dup_matrix,
        minhash_lsh_pairs,
    )

    docs = _docs(spark)
    mat = cross_source_dup_matrix(docs)
    rows = mat.collect()
    n_pairs = minhash_lsh_pairs(docs, threshold=0.8).count()
    assert sum(r["n_dup_pairs"] for r in rows) == n_pairs
    for r in rows:
        assert r["source_a"] <= r["source_b"]


def test_bloom_decontamination_mechanics(spark):
    """The bloom prefilter must (a) never miss a true eval n-gram (no
    false negatives — the filter is exact-by-construction on inserted
    keys), (b) keep the false-positive rate in the expected envelope,
    and (c) produce a report identical to the exact semi-join form."""
    from pyspark.sql import functions as F

    from logstream_processing_service_spark.operators.dedup import (
        decontaminate_report,
        decontaminate_report_bloom,
    )

    docs = _docs(spark)
    a = sorted(map(tuple, decontaminate_report(docs).collect()))
    b = sorted(map(tuple, decontaminate_report_bloom(docs).collect()))
    assert a == b
    # tiny filter → measurable fp rate, but still exact after verify
    c = sorted(
        map(
            tuple,
            decontaminate_report_bloom(docs, m_bits=1 << 12, k_hashes=3).collect(),
        )
    )
    assert a == c


def test_bloom_high_bit_words_no_numpy_deprecation(spark):
    """Spark's ``bit_or`` returns SIGNED longs, so a filter word with bit
    63 set arrives as a negative Python int; ``np.uint64(negative)`` is
    deprecated on numpy 1.26 and an OverflowError on numpy >= 2.0. Force
    the failure mode deterministically — a 256-bit filter saturates under
    the fixture's eval shingles, so EVERY word has bit 63 set — and
    assert no DeprecationWarning escapes the driver-side word assembly."""
    import warnings

    from logstream_processing_service_spark.operators.dedup import (
        decontaminate_report,
        decontaminate_report_bloom,
    )

    docs = _docs(spark)
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        got = sorted(
            map(
                tuple,
                decontaminate_report_bloom(
                    docs, m_bits=1 << 8, k_hashes=5
                ).collect(),
            )
        )
    assert got == sorted(map(tuple, decontaminate_report(docs).collect()))


def test_hll_registry_rollup_accuracy(spark):
    """Union-of-daily-sketches estimates must land within 5% of exact
    distinct counts, per key and for the grand total."""
    from logstream_processing_service_spark.operators.sketches import (
        hll_daily_registry,
        hll_rollup,
    )
    from logstream_processing_service_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    got = {
        r["key"]: r["approx_distinct"]
        for r in hll_rollup(hll_daily_registry(ev)).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact[None] = ev.select("user_id").distinct().count()
    for k, e in exact.items():
        assert abs(got[k] - e) / e < 0.05, (k, got[k], e)
    # the registry itself is tiny: one row per (key, day)
    reg = hll_daily_registry(ev)
    assert reg.count() == ev.select(
        "event_type", F.to_date("ts")
    ).distinct().count()


def test_hll_rolling_distinct_tracks_exact_twin(spark):
    """The sketch form of the trailing-7-day distinct report must land
    within 5% of trends.rolling_distinct_users (the exact set-union
    twin) on every (key, day) cell — the documented 100 TB swap,
    accuracy-tested against its oracle."""
    from logstream_processing_service_spark.operators.sketches import (
        hll_daily_registry,
        hll_rolling_distinct,
    )
    from logstream_processing_service_spark.operators.trends import (
        rolling_distinct_users,
    )
    from logstream_processing_service_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    approx = {
        (r["key"], r["day"]): (r["approx_day"], r["approx_win"])
        for r in hll_rolling_distinct(hll_daily_registry(ev)).collect()
    }
    exact = {
        (r["event_type"], r["day"]): (r["uniq_day"], r["uniq_win"])
        for r in rolling_distinct_users(ev).collect()
    }
    assert set(approx) == set(exact)
    for k, (ed, ew) in exact.items():
        ad, aw = approx[k]
        assert abs(ad - ed) / ed <= 0.05, (k, ad, ed)
        assert abs(aw - ew) / ew <= 0.05, (k, aw, ew)


def test_substring_containment_planted_fixture(spark):
    """Hand-computable containment set: word-grain containment found,
    word-boundary fragment NOT matched, identical texts resolve to the
    lower-id container, sub-n-word docs excluded from the contained side."""
    from logstream_processing_service_spark.operators.dedup import (
        substring_containment_pairs,
    )

    rows = [
        (1, "alpha beta gamma delta"),                  # contained in 2, 4
        (2, "intro alpha beta gamma delta outro"),      # container
        (3, "xalpha beta gamma delta boundary check"),  # 'xalpha' != 'alpha'
        (4, "intro alpha beta gamma delta outro"),      # == 2 → (4, 2)
        (5, "alpha beta"),                              # < 3 words: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["contained_id"], r["container_id"])
        for r in substring_containment_pairs(df).collect()
    }
    assert got == {(1, 2), (1, 4), (4, 2)}


def test_leakage_safe_split_no_straddling_families(spark):
    """No near-dup pair may straddle the split, and every doc's side is
    decided by its split_unit_id hash (cluster canonical or own id)."""
    import hashlib

    from logstream_processing_service_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from logstream_processing_service_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = _docs(spark)
    out = {r["doc_id"]: r for r in leakage_safe_split(docs).collect()}
    assert len(out) == docs.count()
    pairs = minhash_lsh_pairs(docs, threshold=0.8).collect()
    assert pairs, "fixture corpus must contain near-dups"
    for p in pairs:
        assert out[p["d1"]]["split"] == out[p["d2"]]["split"], p
        assert out[p["d1"]]["split_unit_id"] == out[p["d2"]]["split_unit_id"]
    for r in out.values():
        h = hashlib.md5(f"split-v1:{r['split_unit_id']}".encode()).hexdigest()
        assert r["split"] == ("test" if h < "1a" else "train")


def test_kll_registry_rollup_accuracy(spark):
    """Merged-registry quantile estimates must land within ~1% RANK error
    of exact: the exact rank of each estimated quantile value is close to
    the requested rank (value-space deltas can be large in sparse tails —
    rank space is KLL's actual guarantee)."""
    from logstream_processing_service_spark.operators.sketches import (
        kll_daily_registry,
        kll_rollup,
    )
    from logstream_processing_service_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    got = {
        r["key"]: r for r in kll_rollup(kll_daily_registry(ev)).collect()
    }
    vals = sorted(
        r["value"]
        for r in ev.select("value").collect()
        if r["value"] is not None
    )
    n = len(vals)
    import bisect

    for q in (0.5, 0.9, 0.99):
        est = got[None][f"p{int(q * 100)}"]
        rank = bisect.bisect_right(vals, est) / n
        assert abs(rank - q) <= 0.015, (q, est, rank)
    assert got[None]["n_values"] == n


def test_perplexity_buckets_tercile_balance(spark):
    """Every language splits into three non-empty buckets with roughly
    tercile mass (KLL rank error + boundary ties allow slack), and bucket
    order respects the surprisal order (head <= middle <= tail)."""
    from logstream_processing_service_spark.operators.curation import (
        perplexity_buckets,
    )

    rows = perplexity_buckets(_docs(spark)).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        if n < 30:
            continue
        frac = {
            b: sum(1 for r in rs if r["bucket"] == b) / n
            for b in ("head", "middle", "tail")
        }
        for b, f in frac.items():
            assert 0.2 <= f <= 0.47, (lang, b, frac)
        hi = {b: max(r["avg_surprisal"] for r in rs if r["bucket"] == b)
              for b in ("head", "middle", "tail")}
        lo = {b: min(r["avg_surprisal"] for r in rs if r["bucket"] == b)
              for b in ("head", "middle", "tail")}
        assert hi["head"] <= lo["middle"] and hi["middle"] <= lo["tail"]


def test_theta_retention_accuracy(spark):
    """Theta-intersection retention estimates must track the exact
    day-over-day distinct-actor intersection within 5% relative error."""
    from logstream_processing_service_spark.operators.sketches import (
        retention_report,
        theta_daily_registry,
    )
    from logstream_processing_service_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    got = {
        r["day"]: r
        for r in retention_report(theta_daily_registry(ev)).collect()
    }
    assert got, "events span multiple days"
    rows = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct().collect()
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    days = sorted(by_day)
    checked = 0
    for d, nxt in zip(days, days[1:], strict=False):
        if d not in got:
            continue
        exact = len(by_day[d] & by_day[nxt])
        est = got[d]["n_retained"]
        assert abs(est - exact) <= max(0.05 * exact, 2), (d, est, exact)
        checked += 1
    assert checked >= 3


def test_curate_corpus_manifest_consistency(spark):
    """The manifest contains exactly one member per kept near-dup cluster,
    only train-side clusters, dense per-shard positions, and no document
    that fails the funnel rules."""
    import hashlib

    from logstream_processing_service_spark.operators.curation import (
        curate_corpus,
    )

    docs = _docs(spark)
    rows = curate_corpus(docs).collect()
    assert rows
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))  # keeper uniqueness
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        # train side only, decided at cluster grain
        h = hashlib.md5(f"split-v1:{r['cluster_id']}".encode()).hexdigest()
        assert h >= "1a", r
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # at most one manifest row per cluster (the quality keeper)
    clusters = [r["cluster_id"] for r in rows]
    assert len(clusters) == len(set(clusters))


def test_json_shred_profile_adversarial_vs_duckdb(spark):
    """Classification parity on the adversarial JSON shapes the events
    table never exercises: mixed int/float keys, quoted numerics, bools,
    nulls, nested objects/arrays, all-null keys."""
    import duckdb

    from logstream_processing_service_spark.operators.analytics import (
        json_shred_profile,
        json_shred_profile_oracle_sql,
    )

    rows = [
        '{"a": 1, "b": "x", "c": 1.5, "d": true, "e": null, '
        '"f": {"g": 2}, "h": [1, 2], "i": "123"}',
        '{"a": 2.0, "b": "x", "e": null}',
        '{"a": -7, "d": false, "j": "1e3"}',
    ]
    df = spark.createDataFrame([(r,) for r in rows], "props string")
    got = [r.asDict() for r in json_shred_profile(df, "props").collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (props VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(r,) for r in rows])
    exp = con.sql(json_shred_profile_oracle_sql("t", "props")).fetchall()
    cols = [d[0] for d in con.sql(
        json_shred_profile_oracle_sql("t", "props")).description]
    exp_dicts = [dict(zip(cols, r)) for r in exp]
    assert len(got) == len(exp_dicts)
    for g, e in zip(got, exp_dicts):
        assert g == e, (g, e)
    by_key = {g["key"]: g for g in got}
    # spot-checks of the inference rules themselves
    assert by_key["a"]["n_int"] == 2 and by_key["a"]["n_float"] == 1
    assert by_key["e"]["n_null"] == 2 and by_key["e"]["n_int"] == 0
    assert by_key["i"]["n_int"] == 1          # quoted "123" is numeric text
    assert by_key["j"]["n_float"] == 1        # scientific notation
    assert by_key["f"]["n_object"] == 1 and by_key["h"]["n_array"] == 1
    assert by_key["d"]["n_bool"] == 2
    assert by_key["b"]["n_distinct_scalar"] == 1


def test_drift_report_detects_planted_drift(spark):
    """Identical halves -> PSI ~ 0 / small KS; a shifted second half ->
    large PSI and KS, positive mean shift."""
    import datetime

    from logstream_processing_service_spark.operators.analytics import (
        drift_report,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def rows(shift):
        out = []
        for i in range(400):
            # first half identical; second half shifted by `shift`
            half = 0 if i < 200 else 1
            v = float(10 + (i * 7) % 50 + shift * half)
            out.append(("a", t0 + datetime.timedelta(minutes=i), 1, v, "{}"))
        return out

    schema = "event_type string, ts timestamp, user_id long, value double, props string"
    calm = drift_report(
        spark.createDataFrame(
            [(r[0], r[1], r[2], r[3], r[4]) for r in rows(0)], schema
        ).selectExpr("1 as event_id", "*")
    ).collect()[0]
    assert calm["psi"] < 0.05 and calm["ks_stat"] < 0.1, calm

    drifted = drift_report(
        spark.createDataFrame(
            [(r[0], r[1], r[2], r[3], r[4]) for r in rows(100)], schema
        ).selectExpr("1 as event_id", "*")
    ).collect()[0]
    assert drifted["psi"] > 1.0, drifted
    assert drifted["ks_stat"] > 0.9, drifted
    assert drifted["mean_shift"] > 90, drifted


def test_drift_report_ks_ties_and_degenerate_range(spark):
    """Two ADVICE-r5 defects: (a) cross-half ties must NOT inflate KS —
    both ECDFs jump together at a shared value, so identical halves made
    of duplicated values give ks_stat = 0 exactly (the old row-grain
    running sum read the gap mid-jump and reported 1.0 for ref={1,1},
    cur={1,1}); (b) a constant value column (hi_v == lo_v) must not
    divide by zero in the bin width — bin 0, psi 0, no NaN/Inf."""
    import datetime

    from logstream_processing_service_spark.operators.analytics import (
        drift_report,
    )

    t0 = datetime.datetime(2024, 1, 1)
    schema = (
        "event_type string, ts timestamp, user_id long, value double,"
        " props string"
    )

    # (a) ref half = {1,1,2,2}, cur half = {1,1,2,2} — all-tied values
    tied = [
        ("a", t0 + datetime.timedelta(minutes=i), 1, v, "{}")
        for i, v in enumerate([1.0, 1.0, 2.0, 2.0, 1.0, 1.0, 2.0, 2.0])
    ]
    row = drift_report(
        spark.createDataFrame(tied, schema).selectExpr("1 as event_id", "*")
    ).collect()[0]
    assert row["ks_stat"] == 0.0, row
    assert row["mean_shift"] == 0.0, row

    # (b) constant column: degenerate global range
    const = [
        ("a", t0 + datetime.timedelta(minutes=i), 1, 5.0, "{}")
        for i in range(10)
    ]
    row = drift_report(
        spark.createDataFrame(const, schema).selectExpr("1 as event_id", "*")
    ).collect()[0]
    assert row["ks_stat"] == 0.0 and row["psi"] == 0.0, row
    import math

    assert math.isfinite(row["psi"]) and math.isfinite(row["ks_stat"])


def test_constraint_report_planted_violations(spark):
    from logstream_processing_service_spark.operators.analytics import (
        constraint_report,
    )

    child = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (2, "zz", None), (None, "a", 3.0)],
        "id long, cat string, v double",
    )
    parent = spark.createDataFrame([(1,), (2,)], "id long")
    rules = [
        {"kind": "not_null", "table": "child", "column": "id"},
        {"kind": "unique", "table": "child", "columns": ["id"]},
        {"kind": "range", "table": "child", "column": "v", "lo": 0, "hi": 10},
        {"kind": "in_set", "table": "child", "column": "cat",
         "values": ["a", "b"]},
        {"kind": "fk", "table": "child", "column": "id",
         "ref_table": "parent", "ref_column": "id"},
    ]
    got = {
        r["rule"]: (r["n_checked"], r["n_violations"], r["passed"])
        for r in constraint_report(
            {"child": child, "parent": parent}, rules
        ).collect()
    }
    assert got["not_null:child.id"] == (4, 1, False)
    # 4 rows, 3 distinct ids (1, 2, NULL->excluded by count_distinct):
    # duplicates beyond first + the null key row
    assert got["unique:child.['id']"] == (4, 2, False)
    assert got["range:child.v"] == (4, 2, False)   # -1.0 and NULL
    assert got["in_set:child.cat"] == (4, 1, False)  # "zz"
    assert got["fk:child.id"] == (4, 1, False)     # NULL id is an orphan
