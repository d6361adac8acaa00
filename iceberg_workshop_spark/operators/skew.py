"""Skew-mitigation operators: salted joins and salted aggregation.

At 100 TB a handful of hot keys (one power user, one default value)
can put an entire shuffle partition on one executor. Two standard
mitigations, both pure DataFrame ops with unchanged semantics:

- **salted join**: the skewed (big) side gets a deterministic salt in
  [0, N); the small side is exploded ×N so every (key, salt) pair
  still meets its match; the join key becomes (key, salt), splitting
  each hot key's rows across N reducers. Results are provably
  identical to the unsalted join — the oracle is the plain SQL join.
- **two-phase (salted) aggregation**: partial agg on (key, salt),
  then final agg on key — the manual form of what Spark's partial
  aggregation + AQE skew handling do, kept explicit so the pattern is
  visible and testable.

AQE (``spark.sql.adaptive.skewJoin``) handles sort-merge skew
automatically; explicit salting remains the tool for hash aggregates
and for joins AQE can't split (e.g. broadcast-ineligible dimension
under a hot key). Reference exercises none of this (single-node SQL
workshop); this is north-star scale posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_workshop_spark.exprs import dsum
from iceberg_workshop_spark.registry import register
from iceberg_workshop_spark.sources.tables import load

N_SALT = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = N_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted on a deterministic hash and
    the small side exploded across all salt values. Output columns =
    big ∪ small (minus the duplicate key), same as df.join(small, key).

    Only inner/left/left_semi are salting-safe: the small side exists
    N_SALT times, so right/full/left_anti would duplicate or drop its
    unmatched rows — refuse rather than silently corrupt.
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(f"salted_join does not support how={how!r}")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(key)), F.lit(n_salt)).cast("int")
    )
    exploded_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_big.join(exploded_small, [key, "__salt"], how).drop("__salt")


@register(
    "q_join_skew_salted",
    oracle="""
    SELECT e.user_id,
           c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY e.user_id, c.c_mktsegment
    ORDER BY e.user_id
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join (events×customer on user_id), then agg.

    The salt splits each user's events across N_SALT reducers before
    the join; the post-join aggregation re-combines per user. The
    oracle is the unsalted join — identical answers prove salting is
    semantics-free.
    """
    events = load(spark, sf_dir, "events").select("user_id", "value")
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(events, customer, "user_id")
    return (
        joined.groupBy("user_id", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .orderBy("user_id")
    )


@register(
    "q_agg_skew_salted",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase aggregation over a low-cardinality (hot) key: partial
    agg on (event_type, salt), final agg on event_type. Decimal sums
    re-merge exactly, so the plain GROUP BY is the oracle."""
    events = load(spark, sf_dir, "events")
    partial = (
        events.withColumn(
            "__salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALT)).cast("int")
        )
        .groupBy("event_type", "__salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("psum"),
        )
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("psum").cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )
