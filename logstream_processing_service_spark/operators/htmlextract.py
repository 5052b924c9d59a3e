"""HTML text extraction for training-data pipelines: the CommonCrawl
WET step — strip script/style, isolate main content from nav/footer
boilerplate, extract the title, count links, and produce the cleaned
text a curation pipeline tokenizes.

Synthetic-lane discipline (the png/jpeg/gif recipe): the corpus has no
real HTML, so ``with_synthetic_html_payload`` wraps each document's
text in a deterministic page structure — title from the first words,
varying nav boilerplate, the text chunked into ``<p>`` blocks inside a
main div, ``doc_id % 5`` anchor links, a ``<script>`` block containing
an angle bracket (``x < 2``) that breaks naive tag-stripping unless
script removal happens FIRST, a ``<style>`` block, and a footer. Both
the generator and the extractor are pure Spark SQL expressions —
JVM-side, zero shuffle, zero Python — and the DuckDB oracle recomputes
the expected outputs CLOSED-FORM from (doc_id, text) without parsing
any HTML, so the driver hash proves the extractor end to end.

Reference tie: the reference service ingests pre-extracted log text
(src/db/log_ops.py); this lane is the upstream extraction step its
corpus implicitly assumes, made explicit for the 100 TB pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

TITLE_WORDS = 3
PARA_WORDS = 10
NAV_BASE = "home about"
NAV_EXTRA = " products"  # only on odd doc_ids
FOOTER_TEXT = "contact (c) example"


def with_synthetic_html_payload(documents: DataFrame) -> DataFrame:
    """(doc_id, html) — deterministic page per document, built entirely
    with JVM string expressions (no UDF)."""
    words = F.split(F.col("text"), " ")
    title = F.array_join(F.slice(words, 1, TITLE_WORDS), " ")
    n_para = F.greatest(
        F.lit(1),
        F.ceil(F.size(words) / F.lit(PARA_WORDS)).cast("int"),
    )
    paras = F.transform(
        F.sequence(F.lit(0), n_para - 1),
        lambda i: F.concat(
            F.lit("<p>"),
            F.array_join(
                F.slice(words, i * PARA_WORDS + 1, PARA_WORDS), " "
            ),
            F.lit("</p>"),
        ),
    )
    n_links = (F.col("doc_id") % 5).cast("int")
    links = F.when(
        n_links > 0,
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_links),
                lambda i: F.concat(
                    F.lit('<a href="https://ex.test/'),
                    F.col("doc_id").cast("string"),
                    F.lit("/"),
                    i.cast("string"),
                    F.lit('">link '),
                    i.cast("string"),
                    F.lit("</a>"),
                ),
            ),
            " ",
        ),
    ).otherwise(F.lit(""))
    nav = F.concat(
        F.lit("<nav>" + NAV_BASE),
        F.when(F.col("doc_id") % 2 == 1, F.lit(NAV_EXTRA)).otherwise(
            F.lit("")
        ),
        F.lit("</nav>"),
    )
    html = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title><style>p { color: red; }</style></head><body>\n"),
        nav,
        F.lit('\n<div id="main">\n  '),
        F.array_join(paras, "\n  "),
        F.when(n_links > 0, F.concat(F.lit("\n  "), links)).otherwise(
            F.lit("")
        ),
        F.lit("\n</div>\n<script>var x = 1; if (x < 2) { x++; }</script>\n"),
        F.lit("<footer>" + FOOTER_TEXT + "</footer></body></html>"),
    )
    return documents.select("doc_id", html.alias("html"))


def _strip(c: Column) -> Column:
    """Tag-strip + whitespace collapse (tags become spaces so adjacent
    block contents never fuse into one token)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(c, "<[^>]*>", " "), r"\s+", " "
        )
    )


def html_text_extract(
    pages: DataFrame, html_col: str = "html", include_text: bool = False
) -> DataFrame:
    """Real extraction over the html column: script/style removal FIRST
    (their bodies may contain ``<`` that breaks tag-stripping), then
    title / main-content / boilerplate isolation, tag-strip, whitespace
    collapse, link count, and the boilerplate ratio quality signal.

    Output: (doc_id, title, n_links, main_chars, boiler_chars,
    boiler_ratio, text_md5) — text_md5 proves byte-exact extraction
    without shipping the text.

    Scale: every column is a JVM regex/string expression — per-row,
    zero shuffle, whole-stage-codegen friendly; exactly what you want
    running over 100 TB of raw crawl.
    """
    h = F.col(html_col)
    clean = F.regexp_replace(
        F.regexp_replace(h, "(?s)<script[^>]*>.*?</script>", " "),
        "(?s)<style[^>]*>.*?</style>",
        " ",
    )
    title = F.regexp_extract(clean, "<title>([^<]*)</title>", 1)
    nav = F.regexp_extract(clean, "(?s)<nav[^>]*>(.*?)</nav>", 1)
    footer = F.regexp_extract(clean, "(?s)<footer[^>]*>(.*?)</footer>", 1)
    main = F.regexp_extract(clean, '(?s)<div id="main">(.*?)</div>', 1)
    main_text = _strip(main)
    boiler_text = _strip(F.concat_ws(" ", nav, footer))
    n_links = (F.size(F.split(main, "<a href", -1)) - 1).cast("int")
    main_chars = F.length(main_text).cast("bigint")
    boiler_chars = F.length(boiler_text).cast("bigint")
    cols = [
        F.col("doc_id"),
        title.alias("title"),
        n_links.alias("n_links"),
        main_chars.alias("main_chars"),
        boiler_chars.alias("boiler_chars"),
        F.round(
            main_chars / (main_chars + boiler_chars).cast("double"), 6
        ).alias("content_ratio"),
        F.md5(main_text).alias("text_md5"),
    ]
    if include_text:
        # downstream curation consumes the extracted text itself
        cols.append(main_text.alias("main_text"))
    return pages.select(*cols)


def html_extract_oracle_sql() -> str:
    """Closed-form DuckDB twin: expected outputs recomputed from
    (doc_id, text) directly — title is the first TITLE_WORDS words, the
    main text is the original text plus the link anchor texts, the
    boilerplate is the nav/footer constants — no HTML touched, so a
    hash match proves the Spark extractor reversed the generator
    exactly (the gif/jpeg closed-form-lane recipe).

    The expected main_text is whitespace-collapsed + trimmed exactly
    like the Spark side's ``_strip`` (r7 ADVICE): without it, an
    empty-text document (expected = the bare link anchors, but the
    naive concat keeps a leading space) or a doubled space inside
    ``text`` would mismatch a correct extractor."""
    return f"""
    WITH base AS (
        SELECT doc_id,
               string_split(text, ' ') AS w,
               CAST(doc_id % 5 AS INT) AS nl
        FROM documents
    ),
    built AS (
        SELECT doc_id, nl,
               array_to_string(w[1:{TITLE_WORDS}], ' ') AS title,
               trim(regexp_replace(
                   text
                       || CASE WHEN nl > 0
                          THEN ' ' || array_to_string(
                              list_transform(
                                  range(1, nl + 1),
                                  i -> 'link ' || CAST(i AS VARCHAR)
                              ), ' ')
                          ELSE '' END,
                   '\\s+', ' ', 'g')) AS main_text,
               '{NAV_BASE}'
                   || CASE WHEN doc_id % 2 = 1 THEN '{NAV_EXTRA}'
                      ELSE '' END
                   || ' ' || '{FOOTER_TEXT}' AS boiler_text
        FROM base JOIN documents USING (doc_id)
    )
    SELECT doc_id, title, nl AS n_links,
           CAST(length(main_text) AS BIGINT) AS main_chars,
           CAST(length(boiler_text) AS BIGINT) AS boiler_chars,
           round(length(main_text) * 1.0
                 / (length(main_text) + length(boiler_text)), 6)
               AS content_ratio,
           md5(main_text) AS text_md5
    FROM built
    ORDER BY doc_id
    """
