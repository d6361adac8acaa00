"""Projection / filter / predicate queries.

Maps the reference's filter surface: string equality
(``/root/reference/README.md:106-107``), int equality (``:222-224``),
BETWEEN on timestamps (``:214-216``), conjunctions
(``/root/reference/sql/hive_partitioning_examples.sql:52-54``), and
the dialect closure (IN / LIKE / IS NULL). All of these push down to
the Parquet scan (Catalyst `PushDownPredicates` + parquet filter
pushdown) — verified in tests via the physical plan's PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_workshop_spark.exprs import SQL_REVENUE, revenue_expr
from iceberg_workshop_spark.registry import register
from iceberg_workshop_spark.sources.tables import load


@register("q_select_star", oracle="SELECT * FROM region ORDER BY r_regionkey")
def q_select_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * (A18)."""
    return load(spark, sf_dir, "region").orderBy("r_regionkey")


@register(
    "q_project_rename",
    oracle=f"""
    SELECT l_orderkey,
           l_linenumber,
           CAST({SQL_REVENUE} AS DOUBLE) AS revenue,
           'ref' AS src
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + computed column + literal column (A7's 29-column
    projection with literal ``2022`` — ``/root/reference/README.md:145-177``)."""
    return (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            revenue_expr().cast("double").alias("revenue"),
            F.lit("ref").alias("src"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q_filter_eq_str",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_mktsegment = 'BUILDING'
    ORDER BY c_custkey
    """,
)
def q_filter_eq_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String equality filter (A12: ``WHERE code = "ABC"``)."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "q_filter_eq_int",
    oracle="""
    SELECT p_partkey, p_name, p_size FROM part WHERE p_size = 15
    ORDER BY p_partkey
    """,
)
def q_filter_eq_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int equality filter (A13: ``WHERE year = 2008``)."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_name", "p_size")
        .orderBy("p_partkey")
    )


@register(
    "q_filter_between_ts",
    oracle="""
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31'
    ORDER BY o_orderkey
    """,
)
def q_filter_between_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN on timestamp (A14: ``/root/reference/README.md:214-216``)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").between(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("1995-12-31").cast("timestamp"),
            )
        )
        .select("o_orderkey", "o_orderdate")
        .orderBy("o_orderkey")
    )


@register(
    "q_filter_conj_disj",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
    FROM lineitem
    WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
      AND NOT (l_quantity < 10.0)
      AND l_discount >= 0.05
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_filter_conj_disj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT mix (A15)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            ((F.col("l_returnflag") == "R") | (F.col("l_linestatus") == "F"))
            & ~(F.col("l_quantity") < 10.0)
            & (F.col("l_discount") >= 0.05)
        )
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q_filter_in_like_null",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderpriority IS NOT NULL
    UNION ALL
    SELECT p_partkey AS o_orderkey, p_type AS o_orderpriority
    FROM part WHERE p_type LIKE '%ECO%'
    ORDER BY o_orderkey, o_orderpriority
    """,
)
def q_filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / LIKE / IS NULL closure of A12-A16."""
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    a = (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_orderpriority").isNotNull()
        ).select("o_orderkey", "o_orderpriority")
    )
    b = part.filter(F.col("p_type").like("%ECO%")).select(
        F.col("p_partkey").alias("o_orderkey"),
        F.col("p_type").alias("o_orderpriority"),
    )
    return a.unionAll(b).orderBy("o_orderkey", "o_orderpriority")
