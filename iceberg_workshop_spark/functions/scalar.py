"""Scalar-function surface — dialect closure of A19.

The reference's literal scalar expression is
``cast(to_date(concat(cast(year AS STRING),"-",...)) AS TIMESTAMP)``
(``/root/reference/README.md:207``); these queries close over the
string/date/math/conditional/array/JSON families, each function
existing under the same (or directly aliasable) name in Spark SQL and
DuckDB so the oracle can mirror it exactly.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_workshop_spark.registry import register
from iceberg_workshop_spark.sources.tables import fan_out, load


@register(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           concat(c_name, '|', c_mktsegment) AS tagged,
           substr(c_name, 1, 8) AS prefix,
           upper(c_mktsegment) AS seg_up,
           lower(c_name) AS name_lo,
           trim(concat(' ', c_name, ' ')) AS trimmed,
           length(c_name) AS name_len,
           replace(c_name, 'Customer', 'C') AS name_short,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
           split_part(c_name, '#', 1) AS name_stem
    FROM customer
    ORDER BY c_custkey
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/substr/upper/lower/trim/length/replace/lpad/split_part (A19)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment")).alias("tagged"),
            F.substring("c_name", 1, 8).alias("prefix"),
            F.upper("c_mktsegment").alias("seg_up"),
            F.lower("c_name").alias("name_lo"),
            F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
            F.length("c_name").alias("name_len"),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("name_short"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_pad"),
            F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_stem"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           date_trunc('day', o_orderdate) AS oday_ts,
           CAST(year(o_orderdate) AS INT) AS oyear,
           CAST(month(o_orderdate) AS INT) AS omonth,
           CAST(dayofmonth(o_orderdate) AS INT) AS oday,
           date_trunc('month', o_orderdate) AS omonth_start,
           date_trunc('day', o_orderdate) + INTERVAL 7 DAY AS week_later,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_date/year/month/day/date_trunc/date_add/datediff/unix epoch
    (A19 — the reference's cast+to_date+concat expression family).

    DATE values are materialized as day-truncated TIMESTAMPs: Spark
    hands pandas ``datetime.date`` objects for DateType while DuckDB
    hands ``datetime64`` — stringified forms differ, so DATE outputs
    would break any value-hash. Day-truncated timestamps are identical
    in both engines (SURVEY §5.3 rule 4 extended).
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.date_trunc("day", "o_orderdate").alias("oday_ts"),
            F.year("o_orderdate").alias("oyear"),
            F.month("o_orderdate").alias("omonth"),
            F.dayofmonth("o_orderdate").alias("oday"),
            F.date_trunc("month", "o_orderdate").alias("omonth_start"),
            (F.date_trunc("day", "o_orderdate") + F.expr("INTERVAL 7 DAY")).alias(
                "week_later"
            ),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("days_since_95"),
            F.unix_timestamp("o_orderdate").alias("unix_sec"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * 10, 0) AS BIGINT) AS price_decicents,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           pow(l_quantity, 2) AS qty_sq,
           sqrt(l_quantity) AS qty_sqrt,
           l_orderkey % 7 AS key_mod,
           l_orderkey // 7 AS key_div
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/pow/sqrt/modulo/integer division (A19).

    Rounding happens on an exact decimal (never a double) so both
    engines agree on ties. sqrt is IEEE-754 correctly-rounded
    (bit-identical everywhere); ln/log are NOT — engines' libm differ
    in the last ulp — so transcendental outputs are deliberately
    excluded from exact-oracle queries.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice").cast("decimal(18,2)") * 10, 0)
            .cast("bigint")
            .alias("price_decicents"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.ceil("l_quantity").alias("qty_ceil"),
            F.floor("l_quantity").alias("qty_floor"),
            F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
            F.sqrt("l_quantity").alias("qty_sqrt"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
            F.expr("l_orderkey div 7").alias("key_div"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q_fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'big'
                WHEN o_totalprice > 50000  THEN 'mid'
                ELSE 'small' END AS size_band,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label,
           least(o_totalprice, 100000.0) AS capped,
           greatest(o_totalprice, 1000.0) AS floored
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / least / greatest."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 150000, "big")
            .when(F.col("o_totalprice") > 50000, "mid")
            .otherwise("small")
            .alias("size_band"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
                "status_label"
            ),
            F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("capped"),
            F.greatest(F.col("o_totalprice"), F.lit(1000.0)).alias("floored"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_dims,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[64] AS DOUBLE) AS last_val,
           list_contains(embedding, embedding[1]) AS has_first
    FROM embeddings
    ORDER BY vec_id
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column: size, element access,
    membership. Elements are float32 in storage; cast to double for the
    comparison (exact widening, no precision change)."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("n_dims"),
            F.element_at("embedding", 1).cast("double").alias("first_val"),
            F.element_at("embedding", 64).cast("double").alias("last_val"),
            F.array_contains("embedding", F.element_at("embedding", 1)).alias("has_first"),
        )
        .orderBy("vec_id")
    )


@register(
    "q_fn_map_json",
    oracle="""
    SELECT json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           COUNT(*) AS n
    FROM events
    GROUP BY k_str, k_int
    ORDER BY k_int, k_str
    """,
)
def q_fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props parsing (events.props, FIXTURES.md): string-path
    extraction + typed from_json map access, grouped.

    ``from_json`` is the scale path — one parse per row into a typed
    map, pruned by Catalyst's JSON-expression optimization — vs
    per-field ``get_json_object`` re-parses.
    """
    ev = fan_out(load(spark, sf_dir, "events"))
    parsed = ev.select(
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))["k"].alias(
            "k_int"
        ),
    )
    return (
        parsed.groupBy("k_str", "k_int")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k_int", "k_str")
    )


@register(
    "q_fn_variant",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) % 10 = 0
    GROUP BY k_int, k_str
    ORDER BY k_int
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType: ``parse_json`` once into a Variant column,
    then typed ``variant_get`` path extraction — the semi-structured
    scale path (binary Variant encoding decodes fields lazily; no
    per-access JSON re-parse, unlike get_json_object chains).
    """
    ev = load(spark, sf_dir, "events").select(
        F.parse_json("props").alias("v")
    )
    extracted = ev.select(
        F.variant_get("v", "$.k", "int").alias("k_int"),
        F.variant_get("v", "$.k", "string").alias("k_str"),
    )
    return (
        extracted.filter(F.col("k_int") % 10 == 0)
        .groupBy("k_int", "k_str")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k_int")
    )


@register(
    "q_fn_higher_order",
    oracle="""
    SELECT vec_id,
           ROUND(list_reduce(list_transform(CAST(embedding AS DOUBLE[]),
                                            x -> x * x),
                             (a, b) -> a + b), 4) AS sum_sq,
           len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
             AS n_positive,
           ROUND(CAST(embedding[1] AS DOUBLE) + CAST(embedding[64] AS DOUBLE), 4)
             AS first_plus_last
    FROM embeddings
    ORDER BY vec_id
    """,
)
def q_fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/aggregate/filter +
    element access) — the JVM-side lambda surface that keeps array math
    out of Python. Accumulation is left-to-right in both engines, so
    float64 results match bit-for-bit (rounded for hash stability)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(
                F.transform("v", lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("sum_sq"),
        F.size(F.filter("v", lambda x: x > 0)).alias("n_positive"),
        F.round(F.element_at("v", 1) + F.element_at("v", 64), 4).alias(
            "first_plus_last"
        ),
    ).orderBy("vec_id")


@register(
    "q_fn_levenshtein",
    oracle="""
    SELECT n_name,
           levenshtein(n_name, 'GERMANY') AS dist_germany,
           levenshtein(lower(n_name), reverse(lower(n_name))) AS dist_palindrome
    FROM nation
    ORDER BY n_name
    """,
)
def q_fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (fuzzy string matching — entity resolution's
    cheap first pass), plus reverse for a self-similarity measure."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.levenshtein("n_name", F.lit("GERMANY")).alias("dist_germany"),
        F.levenshtein(F.lower("n_name"), F.reverse(F.lower("n_name"))).alias(
            "dist_palindrome"
        ),
    ).orderBy("n_name")


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT l_linenumber,
           COUNT(*) AS n,
           CAST(SUM(l_partkey & 1023) AS BIGINT) AS sum_and,
           CAST(SUM(l_partkey | 7) AS BIGINT) AS sum_or,
           CAST(SUM(xor(l_partkey, l_suppkey)) AS BIGINT) AS sum_xor,
           CAST(SUM(l_suppkey << 2) AS BIGINT) AS sum_shl,
           CAST(SUM(l_orderkey >> 3) AS BIGINT) AS sum_shr
    FROM lineitem
    GROUP BY l_linenumber
    ORDER BY l_linenumber
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator closure (& | ^ << >>) — integer-exact in both
    engines (Spark `^` = DuckDB `xor()`; DuckDB `^` is power), all
    codegen'd JVM-side, one narrow shuffle on the group key."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("l_partkey & 1023")).alias("sum_and"),
            F.sum(F.expr("l_partkey | 7")).alias("sum_or"),
            F.sum(F.expr("l_partkey ^ l_suppkey")).alias("sum_xor"),
            F.sum(F.expr("shiftleft(l_suppkey, 2)")).alias("sum_shl"),
            F.sum(F.expr("shiftright(l_orderkey, 3)")).alias("sum_shr"),
        )
        .orderBy("l_linenumber")
    )


@register(
    "q_fn_try",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(CASE WHEN l_extendedprice / NULLIF(l_quantity - 25, 0)
                      IS NULL THEN 1 END) AS n_div_null,
           ROUND(MIN(l_extendedprice / NULLIF(l_quantity - 25, 0)), 4)
             AS min_ratio,
           ROUND(MAX(l_extendedprice / NULLIF(l_quantity - 25, 0)), 4)
             AS max_ratio,
           COUNT(TRY_CAST(l_returnflag AS INT)) AS n_cast_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe (`try_`) function family — Spark 4 runs ANSI mode by
    default, where division-by-zero and overflow THROW; `try_divide`/
    `try_cast` give the permissive NULL semantics back per-expression
    (DuckDB mirror: NULLIF guard / TRY_CAST). min/max of the ratio are
    order-independent (unlike a float sum), so the oracle is exact."""
    li = fan_out(load(spark, sf_dir, "lineitem"))
    ratio = F.expr("try_divide(l_extendedprice, l_quantity - 25)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(ratio.isNull(), 1)).alias("n_div_null"),
            F.round(F.min(ratio), 4).alias("min_ratio"),
            F.round(F.max(ratio), 4).alias("max_ratio"),
            F.count(F.expr("try_cast(l_returnflag AS INT)")).alias("n_cast_ok"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_fn_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '[a-z]+') AS first_word,
           regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devoweled,
           CAST(regexp_matches(p_name, '^(red|blue)') AS INT) AS is_colored,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels
    FROM part
    ORDER BY p_partkey
    """,
)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-expression family: extract / global replace / match /
    count. Spark `regexp_replace` is global by default — the DuckDB
    mirror needs the explicit 'g' option; `regexp_extract` needs group
    0 for group-less patterns (Spark defaults to group 1). All four
    run JVM-side inside one codegen'd projection."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "[a-z]+", 0).alias("first_word"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("devoweled"),
        F.col("p_name").rlike("^(red|blue)").cast("int").alias("is_colored"),
        F.regexp_count(F.col("p_name"), F.lit("[aeiou]")).alias("n_vowels"),
    ).orderBy("p_partkey")


@register(
    "q_fn_interval",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 MONTH AS plus_3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           quarter(o_orderdate) AS qtr,
           isodow(o_orderdate) - 1 AS wd_mon0,
           week(o_orderdate) AS iso_week,
           dayofyear(o_orderdate) AS doy
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + calendar parts (A19 closure): month-add,
    month-end, quarter, Monday-based weekday, ISO week, day-of-year.
    Dialect notes: Spark `weekday` (Mon=0) == DuckDB `isodow - 1`;
    Spark `weekofyear` == DuckDB `week` (both ISO); `add_months` ==
    `+ INTERVAL 3 MONTH` (both clamp to month end)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3m"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekday("o_orderdate").alias("wd_mon0"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofyear("o_orderdate").alias("doy"),
    ).orderBy("o_orderkey")


@register(
    "q_fn_generators",
    oracle="""
    SELECT o_orderkey, 'm' AS kind,
           CAST(unnest(generate_series(1, 3)) AS INT) AS pos,
           NULL AS metric, CAST(NULL AS DOUBLE) AS val
    FROM orders WHERE o_orderkey < 10
    UNION ALL
    SELECT o_orderkey, 's', NULL,
           'price', o_totalprice
    FROM orders WHERE o_orderkey < 10
    UNION ALL
    SELECT o_orderkey, 's', NULL,
           'priority_len', CAST(length(o_orderpriority) AS DOUBLE)
    FROM orders WHERE o_orderkey < 10
    ORDER BY o_orderkey, kind, pos, metric
    """,
)
def q_fn_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-generator closure: ``sequence``+``explode`` (lateral range
    expansion) and ``stack`` (inline unpivot of N expressions into
    rows) — the two built-in generators beyond explode-of-column. The
    DuckDB mirror writes both as plain UNION ALL, proving the
    generators are declarative sugar with relational semantics."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 10)
    seq = o.select(
        "o_orderkey",
        F.lit("m").alias("kind"),
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("pos"),
        F.lit(None).cast("string").alias("metric"),
        F.lit(None).cast("double").alias("val"),
    )
    stacked = o.selectExpr(
        "o_orderkey",
        "'s' AS kind",
        "CAST(NULL AS INT) AS pos",
        "stack(2, 'price', o_totalprice, 'priority_len', CAST(length(o_orderpriority) AS DOUBLE)) AS (metric, val)",
    )
    return seq.unionByName(stacked).orderBy("o_orderkey", "kind", "pos", "metric")


@register(
    "q_fn_string2",
    oracle="""
    SELECT p_partkey,
           translate(p_name, 'aeiou', 'AEIOU') AS trans,
           reverse(p_name) AS rev,
           repeat(p_brand, 2) AS rep,
           left(p_name, 3) AS l3,
           right(p_name, 3) AS r3,
           CAST(strpos(p_name, ' ') AS INT) AS sep_pos,
           CAST(contains(p_name, 'gear') AS INT) AS has_gear,
           CAST(starts_with(p_name, 'red') AS INT) AS is_red,
           CAST(ends_with(p_name, 'bolt') AS INT) AS is_bolt,
           ascii(p_name) AS first_code,
           chr(65 + p_size % 26) AS size_chr
    FROM part
    ORDER BY p_partkey
    """,
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function closure wave (A19): translate, reverse,
    repeat, left/right, position, contains/starts/ends predicates,
    ascii/chr round trip — each under the same name in both engines
    (Spark `instr` == DuckDB `strpos`; booleans cast to INT for
    dtype-stable hashing)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("trans"),
        F.reverse("p_name").alias("rev"),
        F.repeat("p_brand", 2).alias("rep"),
        F.substring("p_name", 1, 3).alias("l3"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.instr("p_name", " ").alias("sep_pos"),
        F.col("p_name").contains("gear").cast("int").alias("has_gear"),
        F.col("p_name").startswith("red").cast("int").alias("is_red"),
        F.col("p_name").endswith("bolt").cast("int").alias("is_bolt"),
        F.ascii("p_name").alias("first_code"),
        F.chr(F.lit(65) + F.col("p_size") % 26).alias("size_chr"),
    ).orderBy("p_partkey")


@register(
    "q_fn_array2",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
               FROM documents)
    SELECT doc_id,
           COALESCE(array_to_string(
               list_sort(list_intersect(array_distinct(toks),
                         ['key', 'value', 'row'])), '|'), '') AS kw_hits,
           COALESCE(array_to_string(list_slice(toks, 2, 4), '|'), '')
               AS mid3,
           CAST(COALESCE(list_position(toks, 'the'), 0) AS INT) AS pos_the,
           CAST(list_contains(toks, 'key') AS INT) AS has_key,
           CAST(length(list_distinct(toks)) AS INT) AS n_uniq,
           COALESCE(array_to_string(flatten([list_slice(toks, 1, 2),
                                    list_slice(toks, 3, 4)]), '|'), '')
               AS stitched
    FROM t
    ORDER BY doc_id
    """,
)
def q_fn_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array-function wave: intersect (sorted — Spark preserves
    left order, DuckDB right, so both sides normalize through a sort),
    slice (Spark's (start, LENGTH) vs DuckDB's inclusive (begin, end)),
    position (DuckDB returns NULL where Spark returns 0 — COALESCEd),
    contains, distinct-size, and flatten over an array-of-arrays.

    All three array-valued columns are serialized to '|'-joined strings
    on BOTH sides (`F.array_join` / DuckDB `array_to_string`): the
    driver's canonicalizer lexsorts the result frame with pandas, which
    raises ``TypeError: unhashable type: 'list'`` on raw ARRAY columns
    (round-8 CORRECTNESS failure). Tokens come from a space-split so
    they cannot contain the delimiter. DuckDB's ``array_to_string``
    yields NULL for an EMPTY list where Spark's ``array_join`` yields
    ``''`` — the oracle COALESCEs to ``''`` to match."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.array_join(
                F.sort_array(
                    F.array_intersect(
                        F.array_distinct("toks"),
                        F.array(F.lit("key"), F.lit("value"), F.lit("row")),
                    )
                ),
                "|",
            ).alias("kw_hits"),
            F.array_join(F.slice("toks", 2, 3), "|").alias("mid3"),
            F.array_position("toks", "the").cast("int").alias("pos_the"),
            F.array_contains("toks", "key").cast("int").alias("has_key"),
            F.size(F.array_distinct("toks")).alias("n_uniq"),
            F.array_join(
                F.flatten(
                    F.array(F.slice("toks", 1, 2), F.slice("toks", 3, 2))
                ),
                "|",
            ).alias("stitched"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_fn_json_roundtrip",
    oracle="""
    SELECT n_nationkey,
           n_name AS name_back,
           n_regionkey AS region_back
    FROM nation
    ORDER BY n_nationkey
    """,
)
def q_fn_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct → to_json → from_json round trip: the serialization path
    a JSON sink/source pair exercises. The oracle compares the
    round-tripped FIELD VALUES, not the JSON text (key order and
    whitespace are engine-defined serialization detail; the values are
    the contract)."""
    n = load(spark, sf_dir, "nation")
    js = n.select(
        "n_nationkey",
        F.to_json(F.struct("n_name", "n_regionkey")).alias("j"),
    )
    back = js.select(
        "n_nationkey",
        F.from_json(
            "j", "n_name string, n_regionkey int"
        ).alias("s"),
    )
    return back.select(
        "n_nationkey",
        F.col("s.n_name").alias("name_back"),
        F.col("s.n_regionkey").alias("region_back"),
    ).orderBy("n_nationkey")


@register(
    "q_fn_collation",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN lower(c_mktsegment) = lower('bUiLdInG')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_lcase_eq,
      CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
        AS BIGINT) AS n_binary_eq,
      CAST(COUNT(DISTINCT lower(c_mktsegment)) AS BIGINT)
        AS n_distinct_lcase
    FROM customer
    """,
)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string collations: the same predicate under the binary
    collation and UTF8_LCASE — case-insensitive equality and DISTINCT
    become COLLATION SEMANTICS instead of scattered lower() calls (the
    collation travels with the type, so every comparison, join key and
    aggregate key downstream inherits it; lower() replicates it for
    the oracle). At scale a collated column keeps whole-stage codegen
    — no per-row lower() materialization on the hot path."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment"),
        F.expr("CAST(c_mktsegment AS STRING COLLATE UTF8_LCASE)").alias(
            "seg_ci"
        ),
    )
    return cust.agg(
        F.sum(F.when(F.col("seg_ci") == "bUiLdInG", 1).otherwise(0))
        .cast("long")
        .alias("n_lcase_eq"),
        F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0))
        .cast("long")
        .alias("n_binary_eq"),
        F.countDistinct("seg_ci").cast("long").alias("n_distinct_lcase"),
    )
