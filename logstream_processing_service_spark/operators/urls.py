"""URL parsing, normalization, and registered-domain rollups — the
crawl-curation steps upstream of dedup (URL-level dedup, per-domain
quality priors, domain mixing) that a 100 TB web corpus needs before
any text is read.

Synthetic-lane discipline (the htmlextract recipe): the corpus has no
URLs, so ``with_synthetic_url_column`` derives a deterministic, messy
URL per document from ``doc_id`` arithmetic — mixed case, optional
``www.``, default and non-default ports, query params in varying
order, optional fragment. The parser/normalizer is real (pure JVM
regex/string expressions); the DuckDB oracle recomputes the expected
normalized forms CLOSED-FORM from doc_id, so a hash match proves the
normalizer end to end without the oracle parsing anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOSTS = (
    "example.com",
    "data.example.com",
    "archive.org",
    "news.co.uk",
    "blog.news.co.uk",
)
# minimal public-suffix handling: two-level suffixes that make the
# registered domain three labels instead of two
TWO_LEVEL_SUFFIXES = ("co.uk", "com.au", "co.jp")


def with_synthetic_url_column(documents: DataFrame) -> DataFrame:
    """(doc_id, url) — deterministic messy URL per document."""
    d = F.col("doc_id")
    scheme = F.when(d % 3 == 0, F.lit("http")).otherwise(F.lit("https"))
    host = F.element_at(
        F.array(*[F.lit(h) for h in HOSTS]), (d % 5 + 1).cast("int")
    )
    host = F.when(d % 9 == 0, F.upper(host)).otherwise(host)
    sub = F.when(d % 2 == 1, F.lit("www.")).otherwise(F.lit(""))
    port = (
        F.when((d % 7 == 0) & (d % 3 != 0), F.lit(":443"))
        .when((d % 7 == 1) & (d % 3 == 0), F.lit(":80"))
        .when(d % 7 == 2, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/p"), (d % 11).cast("string"),
        F.lit("/item"), (d % 13).cast("string"),
    )
    qa = F.concat(F.lit("a="), (d % 4).cast("string"))
    qb = F.concat(F.lit("b="), (d % 3).cast("string"))
    query = F.when(
        d % 2 == 1, F.concat(F.lit("?"), qb, F.lit("&"), qa)
    ).otherwise(F.concat(F.lit("?"), qa, F.lit("&"), qb))
    frag = F.when(d % 6 == 0, F.lit("#frag")).otherwise(F.lit(""))
    url = F.concat(
        scheme, F.lit("://"), sub, host, port, path, query, frag
    )
    return documents.select("doc_id", url.alias("url"))


def _registered_domain(host: Column) -> Column:
    """Last two labels, or three when the two-label tail is a known
    two-level public suffix (co.uk style)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # greatest(.., 1): element_at is 1-based and throws on 0, and the
    # when() CONDITION below evaluates last2 even for single-label
    # hosts — clamp, then the n >= 2 guards pick the right branch
    last2 = F.concat_ws(
        ".",
        F.element_at(labels, F.greatest(n - 1, F.lit(1))),
        F.element_at(labels, n),
    )
    is2 = last2.isin(*TWO_LEVEL_SUFFIXES)
    return F.when(
        is2 & (n >= 3),
        F.concat_ws(
            ".", F.element_at(labels, F.greatest(n - 2, F.lit(1))), last2
        ),
    ).otherwise(F.when(n >= 2, last2).otherwise(host))


def parse_urls(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Parse + normalize: lowercase host, strip one leading ``www.``,
    drop default ports (80 for http, 443 for https — non-default ports
    survive), drop the fragment, sort query params byte-wise, and
    derive the registered domain. Every column is a JVM regex/string
    expression: per-row, zero shuffle at any scale.

    Output: (doc_id, scheme, host, port, registered_domain, path,
    norm_query, norm_url).
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.regexp_extract(u, r"^[^:]+://([^/?#]*)", 1)
    raw_host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    host = F.regexp_replace(raw_host, r"^www\.", "")
    port_s = F.regexp_extract(authority, r":(\d+)$", 1)
    default = F.when(scheme == "http", F.lit("80")).otherwise(
        F.when(scheme == "https", F.lit("443")).otherwise(F.lit(""))
    )
    port = F.when(
        (port_s != "") & (port_s != default), port_s.cast("int")
    ).otherwise(F.lit(None).cast("int"))
    path = F.regexp_extract(u, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    norm_query = F.when(query == "", F.lit("")).otherwise(
        F.array_join(F.array_sort(F.split(query, "&")), "&")
    )
    norm_url = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(port.isNotNull(), F.concat(F.lit(":"), port.cast("string")))
        .otherwise(F.lit("")),
        path,
        F.when(norm_query != "", F.concat(F.lit("?"), norm_query)).otherwise(
            F.lit("")
        ),
    )
    return pages.select(
        "doc_id",
        scheme.alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        _registered_domain(host).alias("registered_domain"),
        path.alias("path"),
        norm_query.alias("norm_query"),
        norm_url.alias("norm_url"),
    )


def url_domain_report(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain rollup: doc count, distinct hosts,
    distinct normalized URLs — the domain-prior table a curation
    pipeline joins quality scores against. One map-side-combined
    aggregate over the per-row parse."""
    p = parse_urls(pages, url_col)
    return (
        p.groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("host").cast("bigint").alias("n_hosts"),
            F.countDistinct("norm_url").cast("bigint").alias("n_urls"),
        )
        .orderBy("registered_domain")
    )


def _dom_sql(host_expr: str) -> str:
    """DuckDB registered-domain over a lowercase host expression."""
    two = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    return f"""
    CASE WHEN array_to_string(string_split({host_expr}, '.')[-2:], '.')
              IN ({two})
          AND len(string_split({host_expr}, '.')) >= 3
         THEN array_to_string(string_split({host_expr}, '.')[-3:], '.')
         ELSE array_to_string(string_split({host_expr}, '.')[-2:], '.')
    END
    """


def url_parse_oracle_sql() -> str:
    """Closed-form twin: every output recomputed from doc_id arithmetic
    (the generator's own formulas) — no URL string is parsed, so a hash
    match proves the Spark parser/normalizer reverses the generator."""
    hosts = ", ".join(f"'{h}'" for h in HOSTS)
    return f"""
    WITH base AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END
                   AS scheme,
               ([{hosts}])[CAST(doc_id % 5 AS INT) + 1] AS host,
               CASE WHEN doc_id % 7 = 2 THEN 8080 END AS port,
               '/p' || CAST(doc_id % 11 AS VARCHAR)
                   || '/item' || CAST(doc_id % 13 AS VARCHAR) AS path,
               'a=' || CAST(doc_id % 4 AS VARCHAR)
                   || '&b=' || CAST(doc_id % 3 AS VARCHAR) AS norm_query
        FROM documents
    )
    SELECT doc_id, scheme, host, port,
           {_dom_sql("host")} AS registered_domain,
           path, norm_query,
           scheme || '://' || host
               || CASE WHEN port IS NOT NULL
                  THEN ':' || CAST(port AS VARCHAR) ELSE '' END
               || path || '?' || norm_query AS norm_url
    FROM base
    ORDER BY doc_id
    """


def url_domain_report_oracle_sql() -> str:
    return f"""
    WITH parsed AS ({url_parse_oracle_sql().replace("ORDER BY doc_id", "")})
    SELECT registered_domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(count(DISTINCT norm_url) AS BIGINT) AS n_urls
    FROM parsed
    GROUP BY 1
    ORDER BY registered_domain
    """
