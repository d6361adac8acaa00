"""The generic pandas co-group asof_join must agree with the
window-based q_join_asof formulation (same semantics, two plans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_asof_operator_matches_window_query(spark):
    from iceberg_workshop_spark.operators.joins import asof_join, q_join_asof
    from iceberg_workshop_spark.sources.tables import load

    events = load(spark, SF_DIR, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), F.col("ts").alias("e_ts")
    )
    via_pandas = asof_join(
        purchases,
        errors,
        by="user_id",
        left_on="p_ts",
        right_on="e_ts",
        left_keep=["purchase_id"],
        right_keep=["err_id"],
        right_tiebreak="err_id",
    )
    got = {(r.purchase_id, r.err_id) for r in via_pandas.collect()}
    want = {(r.purchase_id, r.err_id) for r in q_join_asof(spark, SF_DIR).collect()}
    assert got == want and len(want) > 0
