"""Sorts, limits, and set operations (SURVEY §2B dialect closure).

Scale notes: global ORDER BY uses Spark's range-partitioned sort
(sampled boundaries, no single-task sort); ORDER BY + LIMIT k becomes
TakeOrderedAndProject (per-partition top-k, merge on driver — O(k)
driver memory, not O(n)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_workshop_spark.registry import register
from iceberg_workshop_spark.sources.tables import load


@register(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key total-order sort with unique-key tiebreak."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )


@register(
    "q_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — plans as TakeOrderedAndProject, never a full sort."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "q_set_union_all",
    oracle="""
    WITH a AS (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ), b AS (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1996-01-01'
    )
    SELECT 'all' AS mode, o_custkey
    FROM (SELECT o_custkey FROM a UNION ALL SELECT o_custkey FROM b)
    UNION ALL
    SELECT 'dist' AS mode, o_custkey
    FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
    ORDER BY mode, o_custkey
    """,
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag) vs UNION (distinct) of two overlapping slices.

    UNION ALL is a free concatenation; UNION adds a shuffle for the
    distinct — keep that distinction in mind at 100 TB.
    """
    orders = load(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_custkey")
    bag = a.unionAll(b).select(F.lit("all").alias("mode"), "o_custkey")
    dist = a.union(b).distinct().select(F.lit("dist").alias("mode"), "o_custkey")
    return bag.unionAll(dist).orderBy("mode", "o_custkey")


@register(
    "q_set_intersect_except",
    oracle="""
    WITH with_orders AS (
      SELECT DISTINCT c_custkey FROM customer
      JOIN orders ON o_custkey = c_custkey
    ), building AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT 'intersect' AS mode, c_custkey
    FROM (SELECT c_custkey FROM with_orders INTERSECT SELECT c_custkey FROM building)
    UNION ALL
    SELECT 'except' AS mode, c_custkey
    FROM (SELECT c_custkey FROM with_orders EXCEPT ALL SELECT c_custkey FROM building)
    ORDER BY mode, c_custkey
    """,
)
def q_set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) + EXCEPT ALL — planned as left-semi /
    left-anti joins by Catalyst, so the same broadcast/shuffle
    machinery applies."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    with_orders = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey")
        .distinct()
    )
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    inter = with_orders.intersect(building).select(
        F.lit("intersect").alias("mode"), "c_custkey"
    )
    exc = with_orders.exceptAll(building).select(
        F.lit("except").alias("mode"), "c_custkey"
    )
    return inter.unionAll(exc).orderBy("mode", "c_custkey")


@register(
    "q_sort_nulls",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
    FROM customer
    ORDER BY bal DESC NULLS LAST, c_custkey ASC
    """,
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null ordering — the classic cross-engine trap: Spark
    defaults to NULLS FIRST on ASC, DuckDB to NULLS LAST, so portable
    sorts must always spell it out (``desc_nulls_last`` here). Nulls
    are manufactured from negative balances to exercise the path."""
    customer = load(spark, sf_dir, "customer")
    return (
        customer.select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, None)
            .otherwise(F.col("c_acctbal"))
            .alias("bal"),
        )
        .orderBy(F.col("bal").desc_nulls_last(), F.col("c_custkey").asc())
    )


@register(
    "q_set_union_by_name",
    oracle="""
    SELECT src, COUNT(*) AS n, CAST(SUM(acctbal_c) AS DOUBLE) AS sum_bal
    FROM (
      SELECT 'cust' AS src, c_name AS name,
             CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal_c, NULL AS segment
      FROM customer
      UNION ALL BY NAME
      SELECT 'supp' AS src, s_name AS name,
             CAST(s_acctbal AS DECIMAL(18,2)) AS acctbal_c,
             NULL AS segment
      FROM supplier
    )
    GROUP BY src
    ORDER BY src
    """,
)
def q_set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligning union (`unionByName` with missing columns —
    DuckDB's UNION ALL BY NAME): the ingestion-time shape for merging
    heterogeneous feeds. Column resolution happens by NAME at plan
    time, so re-ordered or partially-overlapping schemas stay
    correct; missing columns null-fill without a projection pass."""
    cust = load(spark, sf_dir, "customer").select(
        F.lit("cust").alias("src"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("acctbal_c"),
        F.col("c_mktsegment").alias("segment"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.lit("supp").alias("src"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").cast("decimal(18,2)").alias("acctbal_c"),
    )
    merged = cust.unionByName(supp, allowMissingColumns=True)
    return (
        merged.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("acctbal_c").cast("double").alias("sum_bal"),
        )
        .orderBy("src")
    )


@register(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 20
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: ORDER BY ... LIMIT k OFFSET m (deterministic via
    the unique-key tiebreak). Spark plans offset+limit as a single
    TakeOrdered of m+k rows — no full sort, no skew; at scale
    deep-offset pagination should switch to keyset pagination
    (WHERE key > last_seen), which is the q_filter/q_sort surface."""
    orders = load(spark, sf_dir, "orders")
    return spark.sql(
        "SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price "
        "FROM {o} ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20",
        o=orders,
    )


@register(
    "q_set_intersect_all",
    oracle="""
    SELECT o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    ORDER BY o_custkey
    """,
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each custkey appears
    min(count_left, count_right) times — the multiplicity-preserving
    sibling of the distinct INTERSECT in q_set_intersect_except.
    Spark plans it as a counted hash semi-difference, one shuffle per
    side."""
    o = load(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    right = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return left.intersectAll(right).orderBy("o_custkey")
