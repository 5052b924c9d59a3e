"""End-to-end web-corpus curation: the composed pipeline a crawl-to-
training-data system runs, built ENTIRELY from this repo's lanes —
HTML extraction (htmlextract), URL normalization + registered domains
(urls), quality gating, exact dedup on the EXTRACTED text, and
per-domain caps (the domain-mixing discipline). The ``curate_corpus``
pattern (operators/curation.py) applied to the web lanes, with a
closed-form composed oracle: every stage is deterministic from
(doc_id, text), so DuckDB recomputes the whole funnel without parsing
a byte of HTML or a single URL.

Stage rules (identical on both engines):
  00_raw        every fetched page
  01_extracted  content_ratio ≥ 0.65 (main text vs nav/footer boilerplate
                — drops boilerplate-dominated stubs)
  02_quality    ≥ 20 words of extracted main text
  03_deduped    exact dedup on md5(extracted text), min doc_id kept
  04_domain_cap ≤ ``domain_cap`` docs per registered domain, lowest
                doc_ids kept (deterministic; swap in quality-ranked
                keepers via dedup.py's keep-table for production)

Scale: extraction and URL parsing are zero-shuffle JVM expressions;
dedup is one hash-keyed window; the cap is one domain-keyed window —
three exchanges total for the whole funnel, each at doc grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .htmlextract import html_text_extract, with_synthetic_html_payload
from .urls import parse_urls, with_synthetic_url_column

MIN_CONTENT_RATIO = 0.65
MIN_WORDS = 20
DOMAIN_CAP = 30


def curate_web_corpus(
    documents: DataFrame,
    min_content_ratio: float = MIN_CONTENT_RATIO,
    min_words: int = MIN_WORDS,
    domain_cap: int = DOMAIN_CAP,
) -> DataFrame:
    """Funnel report: (stage, kept) per stage, ordered."""
    pages = html_text_extract(
        with_synthetic_html_payload(documents), include_text=True
    )
    doms = parse_urls(with_synthetic_url_column(documents)).select(
        "doc_id", "registered_domain"
    )
    # cache: caller-owned (repo contract — bench/driver clear per query)
    base = pages.join(doms, "doc_id").persist()

    s1 = base.filter(F.col("content_ratio") >= min_content_ratio)
    s2 = s1.filter(F.size(F.split("main_text", " ")) >= min_words)
    s3 = s2.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("text_md5").orderBy("doc_id")
        ),
    ).filter(F.col("_rn") == 1).drop("_rn")
    s4 = s3.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("registered_domain").orderBy("doc_id")
        ),
    ).filter(F.col("_rn") <= domain_cap).drop("_rn")

    out = None
    for name, frame in (
        ("00_raw", base),
        ("01_extracted", s1),
        ("02_quality", s2),
        ("03_deduped", s3),
        ("04_domain_cap", s4),
    ):
        c = frame.agg(
            F.count(F.lit(1)).cast("bigint").alias("kept")
        ).select(F.lit(name).alias("stage"), "kept")
        out = c if out is None else out.unionByName(c)
    return out.orderBy("stage")


def curate_web_corpus_oracle_sql(
    min_content_ratio: float = MIN_CONTENT_RATIO,
    min_words: int = MIN_WORDS,
    domain_cap: int = DOMAIN_CAP,
) -> str:
    """Composed closed-form twin: the htmlextract and urls oracles'
    derivations inlined (including htmlextract's collapse+trim
    normalization of main_text, r7 ADVICE), then the same four gates."""
    from .htmlextract import FOOTER_TEXT, NAV_BASE, NAV_EXTRA
    from .urls import HOSTS, _dom_sql

    hosts = ", ".join(f"'{h}'" for h in HOSTS)
    return f"""
    WITH built AS (
        SELECT doc_id,
               trim(regexp_replace(
                   text || CASE WHEN doc_id % 5 > 0
                       THEN ' ' || array_to_string(
                           list_transform(
                               range(1, CAST(doc_id % 5 AS INT) + 1),
                               i -> 'link ' || CAST(i AS VARCHAR)
                           ), ' ')
                       ELSE '' END,
                   '\\s+', ' ', 'g')) AS main_text,
               '{NAV_BASE}'
                   || CASE WHEN doc_id % 2 = 1 THEN '{NAV_EXTRA}'
                      ELSE '' END
                   || ' ' || '{FOOTER_TEXT}' AS boiler_text,
               lower(([{hosts}])[CAST(doc_id % 5 AS INT) + 1]) AS host
        FROM documents
    ),
    base AS (
        SELECT doc_id, main_text,
               round(length(main_text) * 1.0
                     / (length(main_text) + length(boiler_text)), 6)
                   AS content_ratio,
               md5(main_text) AS text_md5,
               {_dom_sql("host")} AS registered_domain
        FROM built
    ),
    s1 AS (SELECT * FROM base WHERE content_ratio >= {min_content_ratio!r}),
    s2 AS (SELECT * FROM s1
           WHERE len(string_split(main_text, ' ')) >= {min_words}),
    s3 AS (SELECT * EXCLUDE (rn) FROM (
               SELECT *, row_number() OVER (
                   PARTITION BY text_md5 ORDER BY doc_id) AS rn
               FROM s2) WHERE rn = 1),
    s4 AS (SELECT * EXCLUDE (rn) FROM (
               SELECT *, row_number() OVER (
                   PARTITION BY registered_domain ORDER BY doc_id) AS rn
               FROM s3) WHERE rn <= {domain_cap})
    SELECT '00_raw' AS stage, CAST(count(*) AS BIGINT) AS kept FROM base
    UNION ALL
    SELECT '01_extracted', CAST(count(*) AS BIGINT) FROM s1
    UNION ALL
    SELECT '02_quality', CAST(count(*) AS BIGINT) FROM s2
    UNION ALL
    SELECT '03_deduped', CAST(count(*) AS BIGINT) FROM s3
    UNION ALL
    SELECT '04_domain_cap', CAST(count(*) AS BIGINT) FROM s4
    ORDER BY stage
    """
