"""Event-time window operators — batch-exact forms (SURVEY §2B).

The reference has no streams; these instantiate the streaming-shape
capability surface on the ``events`` fixture as *batch* queries whose
semantics are identical to the Structured Streaming stateful forms in
``streaming/stateful.py`` (which replay them as true streams and must
converge to the same final state).

Scale notes: ``F.window`` is a plain projection (no shuffle of its
own) — the only shuffle is the groupBy on (window, keys), with partial
aggregation map-side. A sliding window with size = 2× slide expands
each row into exactly 2 rows before the agg (Spark's Expand), so the
shuffle volume is 2× the input — bounded, not quadratic. The session
window batch form is a window-function cumsum: one shuffle on user_id,
then a streaming-friendly sort within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_workshop_spark.exprs import dsum
from iceberg_workshop_spark.registry import register
from iceberg_workshop_spark.sources.tables import load

# 15-minute tumbling / 30-minute sliding grids (seconds).
_T15 = "15 minutes"
_T30 = "30 minutes"
# Session gap: strictly-greater-than 30 minutes, compared in µs so both
# engines use identical integer arithmetic.
_GAP_US = 30 * 60 * 1_000_000


@register(
    "q_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY window_start
    ORDER BY window_start
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-15-min tumbling window count+sum over events.

    ``F.window`` emits a struct; we surface ``window.start`` as the
    hash-stable grouping key (equals DuckDB ``time_bucket``).
    """
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", _T15).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


@register(
    "q_stream_sliding",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             time_bucket(INTERVAL '15 minutes', ts) AS b,
             value
      FROM events
    ), expanded AS (
      SELECT event_type, b AS window_start, value FROM ev
      UNION ALL
      SELECT event_type, b - INTERVAL '15 minutes' AS window_start, value FROM ev
    )
    SELECT event_type,
           window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM expanded
    GROUP BY event_type, window_start
    ORDER BY event_type, window_start
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min windows sliding every 15 min, per event_type.

    Each event lands in exactly 2 windows (size = 2 × slide): the one
    starting at its 15-min bucket and the one 15 min earlier — the
    oracle expresses that as a 2-way shifted-tumbling union.
    """
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", _T30, _T15).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("event_type", "window_start")
    )


@register(
    "q_stream_session",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ), marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN gap_us IS NULL OR gap_us > {_GAP_US} THEN 1 ELSE 0 END
               AS new_session
      FROM seq
    ), sessions AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id,
           session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a strict 30-min inactivity gap.

    Batch form of ``F.session_window``: a new session starts when the
    gap to the previous event (same user, event-time order) exceeds 30
    minutes; session_id is the running count of session starts. Gap is
    compared in integer microseconds so Spark and DuckDB agree exactly.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.unix_micros("ts").alias("us")
    )
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("us").over(w).isNull() | (F.col("us") - F.lag("us").over(w) > _GAP_US),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )
