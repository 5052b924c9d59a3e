"""Misra-Gries frequent-items: bounds + coverage vs exact counts.

The MG invariants hold for ANY stream order and partitioning:
  * est_lower ≤ true count ≤ est_upper for every reported item
  * any item with true count > N/(k+1) appears in the summary
Both are asserted against exact word counts; a planted boilerplate
corpus checks the hot item surfaces with tight bounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from logstream_processing_service_spark.functions import text as T
from logstream_processing_service_spark.operators import sketches as SK
from logstream_processing_service_spark.sources import load_table


def _exact_counts(docs):
    return {
        r["word"]: r["n"]
        for r in docs.select(F.explode(T.words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_mg_bounds_and_coverage_real_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    k = 64
    got = {
        r["item"]: (r["est_lower"], r["est_upper"])
        for r in SK.heavy_hitter_words(docs, k=k).collect()
    }
    exact = _exact_counts(docs)
    n_stream = sum(exact.values())
    for item, (lo, hi) in got.items():
        assert lo <= exact[item] <= hi, (item, lo, exact[item], hi)
    # coverage guarantee: share > 1/(k+1) ⇒ the merged summary holds it.
    # (top-k display truncation cannot drop one: its merged lower bound
    # beats any non-frequent item's upper bound for k·P ≪ N/(k+1))
    must_have = {w for w, n in exact.items() if n > n_stream / (k + 1)}
    assert must_have <= set(got), must_have - set(got)


def test_mg_planted_boilerplate(spark):
    rows = [(i, "cookie banner accept terms " + f"unique{i} filler{i}") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["item"]: r for r in SK.heavy_hitter_words(docs, k=8).collect()}
    for w in ("cookie", "banner", "accept", "terms"):
        assert w in out
        assert out[w]["est_lower"] <= 400 <= out[w]["est_upper"]


def test_mg_partials_bounded_size(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(T.words(F.col("text"))).alias("word"))
    n_parts = words.rdd.getNumPartitions()
    partials = SK.mg_partials(words, "word", k=32)
    # ≤ k item rows + 1 error row per partition — the shuffle stays KB-sized
    assert partials.count() <= (32 + 1) * n_parts


def test_mg_topk_per_group_bounds_and_coverage(spark):
    """Per-group MG: bounds bracket the exact count in every group, and
    any item above the 1/(k+1) share inside ITS group is reported."""
    from collections import Counter

    from logstream_processing_service_spark.operators.sketches import (
        mg_topk_per_group,
    )

    rows = []
    rows += [("a", "hot")] * 500 + [("a", f"w{i % 97}") for i in range(400)]
    rows += [("b", "cold")] * 30 + [("b", f"v{i % 7}") for i in range(70)]
    df = spark.createDataFrame(rows, "src STRING, item STRING")
    out = mg_topk_per_group(df.repartition(16), "src", "item", k=8)
    exact = {
        g: Counter(i for s, i in rows if s == g) for g in ("a", "b")
    }
    per_group = {}
    for r in out.collect():
        per_group.setdefault(r["src"], {})[r["item"]] = (
            r["est_lower"], r["est_upper"]
        )
        true = exact[r["src"]][r["item"]]
        assert r["est_lower"] <= true <= r["est_upper"], (r, true)
    # coverage: 'hot' is 55% of group a, 'cold' is 30% of group b — both
    # far above 1/(k+1) = 1/9 of their groups
    assert "hot" in per_group["a"]
    assert "cold" in per_group["b"]
    # dominant items' lower bounds dominate their group's reports
    assert per_group["a"]["hot"][0] == max(v[0] for v in per_group["a"].values())
