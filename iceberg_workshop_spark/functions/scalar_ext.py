"""Scalar-function extensions: URL parsing and locale-style number /
string formatting.

Closes the remaining everyday warehouse-function surface after
functions/scalar.py's string/date/math/array/json waves: Spark's
``parse_url``/``url_encode``/``url_decode`` and
``format_number``/``format_string`` families. DuckDB has no
``parse_url``; the oracles rebuild each component with regexes and a
replace-chain percent-codec over the same deterministic inputs —
value-exact, which is the point: the CONTRACT of these functions is
pinned, not their engine-specific spelling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_workshop_spark.registry import register
from iceberg_workshop_spark.sources.tables import load

# Deterministic per-supplier URL: scheme/host/port/path/query/fragment
# all vary with the key, so every parse_url component is exercised.
_URL_SQL = """
    CASE WHEN s_suppkey % 2 = 0 THEN 'https://' ELSE 'http://' END ||
    'Host' || CAST(s_suppkey % 5 AS VARCHAR) || '.Example.org' ||
    CASE WHEN s_suppkey % 3 = 0 THEN ':8080' ELSE '' END ||
    '/cat/' || CAST(s_suppkey % 7 AS VARCHAR) ||
    CASE WHEN s_suppkey % 4 = 0 THEN '?q=' || CAST(s_suppkey AS VARCHAR)
         ELSE '' END ||
    CASE WHEN s_suppkey % 6 = 0 THEN '#frag' ELSE '' END
"""


@register(
    "q_fn_url",
    oracle=f"""
    WITH u AS (
      SELECT s_suppkey, {_URL_SQL} AS url FROM supplier
    ), parts AS (
      SELECT s_suppkey,
             regexp_extract(url, '^([a-z]+)://', 1) AS proto,
             regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
             regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
             CASE WHEN url LIKE '%?%'
                  THEN regexp_extract(url, '[?]([^#]*)', 1) END AS query
      FROM u
    )
    SELECT proto, host,
           COUNT(*) AS n_urls,
           COUNT(query) AS n_with_query,
           MIN(path) AS min_path,
           MAX(path) AS max_path
    FROM parts
    GROUP BY proto, host
    ORDER BY proto, host
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url component extraction (PROTOCOL/HOST/PATH/QUERY) over
    deterministic per-key URLs, rolled up per (proto, host). The
    oracle rebuilds each component with regexes — pinning the
    function's CONTRACT (host excludes port, query excludes fragment,
    missing query is NULL) rather than trusting a same-named
    builtin."""
    u = load(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey", f"{_URL_SQL.replace('VARCHAR', 'STRING')} AS url"
    )
    parts = u.select(
        "s_suppkey",
        F.lower(F.expr("parse_url(url, 'PROTOCOL')")).alias("proto"),
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY')").alias("query"),
    )
    return (
        parts.groupBy("proto", "host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count("query").alias("n_with_query"),
            F.min("path").alias("min_path"),
            F.max("path").alias("max_path"),
        )
        .orderBy("proto", "host")
    )


@register(
    "q_fn_format",
    oracle="""
    WITH f AS (
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS total
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus,
           format('{:,}', CAST(floor(total) AS BIGINT)) || '.' ||
             lpad(CAST(CAST(round((total - floor(total)) * 100) AS BIGINT)
                       AS VARCHAR), 2, '0') AS pretty_total,
           printf('%08d', CAST(floor(total) AS BIGINT)) AS padded,
           printf('%x', CAST(floor(total) AS BIGINT)) AS hex_total,
           lpad(o_orderstatus, 4, '*') || rpad(o_orderstatus, 4, '-')
             AS decorated,
           repeat(o_orderstatus, 3) AS repeated
    FROM f
    ORDER BY o_orderstatus
    """,
)
def q_fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Display formatting: thousands-grouped money (format_number),
    zero-padded and hex renderings (format_string), pad/repeat string
    decoration. Aggregates are exact decimals first; formatting is a
    final projection — the engine never groups or joins on a
    formatted string (formatting is presentation, not a key)."""
    f = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total")
        )
    )
    return f.selectExpr(
        "o_orderstatus",
        "format_number(total, 2) AS pretty_total",
        "format_string('%08d', CAST(floor(total) AS BIGINT)) AS padded",
        "format_string('%x', CAST(floor(total) AS BIGINT)) AS hex_total",
        "lpad(o_orderstatus, 4, '*') || rpad(o_orderstatus, 4, '-')"
        " AS decorated",
        "repeat(o_orderstatus, 3) AS repeated",
    ).orderBy("o_orderstatus")
