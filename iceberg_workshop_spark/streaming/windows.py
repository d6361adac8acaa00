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


_DRIFT_WIN_PPM = 150000


@register(
    "q_stream_drift_window",
    oracle=f"""
    WITH w AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
             CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    counts AS (SELECT ws, v, COUNT(*) AS c FROM w GROUP BY ws, v),
    grid AS (
      SELECT s.ws, xs.v, COALESCE(c.c, 0) AS c
      FROM (SELECT DISTINCT ws FROM counts) s
      CROSS JOIN (SELECT DISTINCT v FROM counts) xs
      LEFT JOIN counts c ON c.ws = s.ws AND c.v = xs.v
    ),
    cum1 AS (
      SELECT ws, v,
             CAST(SUM(c) OVER (PARTITION BY ws ORDER BY v) AS BIGINT)
               AS cum_w
      FROM grid
    ),
    cum_all AS (
      SELECT v, CAST(SUM(cum_w) AS BIGINT) AS cum_tot FROM cum1 GROUP BY v
    ),
    tot AS (SELECT ws, CAST(COUNT(*) AS BIGINT) AS n_win FROM w GROUP BY ws),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM w),
    stat AS (
      SELECT c1.ws, t.n_win, n.n_all - t.n_win AS n_rest,
             MAX(ABS(c1.cum_w * (n.n_all - t.n_win)
                     - (ca.cum_tot - c1.cum_w) * t.n_win)) AS d_num
      FROM cum1 c1
      JOIN cum_all ca ON ca.v = c1.v
      JOIN tot t ON t.ws = c1.ws, n
      GROUP BY c1.ws, t.n_win, n.n_all
    )
    SELECT ws AS window_start, n_win, n_rest,
           CAST(d_num AS BIGINT) AS d_num,
           CAST(CAST(1000000 AS HUGEINT) * d_num
                // (CAST(n_win AS HUGEINT) * n_rest) AS BIGINT) AS d_ppm,
           CAST(CAST(CAST(1000000 AS HUGEINT) * d_num
                // (CAST(n_win AS HUGEINT) * n_rest) AS BIGINT)
                >= {_DRIFT_WIN_PPM} AS INT) AS drifted
    FROM stat
    ORDER BY window_start
    """,
)
def q_stream_drift_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window distribution-drift monitor (batch-exact streaming
    shape): each 1-hour event-time window's value distribution vs the
    REST of the stream, scored with the integer two-sample KS
    construction of ``q_llm_drift_ks`` — the alert a metrics pipeline
    raises when one ingest hour's distribution shifts (bad deploy,
    bot burst) rather than when a source drifts.

    Same engine-portable integer arithmetic (cross-multiplied CDF gap
    in ppm) and the same no-global-window trick: the stream-wide CDF
    is the per-value SUM of per-WINDOW partitioned cumsums. The value
    axis is binned to WHOLE UNITS (floor(value)) — the statistic is
    KS over the histogram at that grain, which is exactly what a
    streaming monitor keeps as state (a histogram sketch, never raw
    values); unbinned cents would cross a ~n-sized value dim with the
    window dim (measured 12M grid rows at sf0.1). In the true-stream
    deployment the per-window counts come from the watermarked
    tumbling aggregate (q_stream_tumbling's state) and the
    rest-of-stream reference is the previous epoch's sketch; the
    scoring join is identical."""
    ev = load(spark, sf_dir, "events").select(
        F.window("ts", "1 hour").start.alias("ws"),
        F.expr("CAST(floor(value) AS BIGINT)").alias("v"),
    )
    from iceberg_workshop_spark.registry import guard_axis

    counts = ev.groupBy("ws", "v").agg(F.count(F.lit(1)).alias("c"))
    wins = counts.select("ws").distinct()
    # same bounded-axis enforcement as q_llm_drift_ks/q_agg_mannwhitney:
    # whole-unit binning keeps the axis small, but the precondition is
    # now asserted in-plan, not assumed.
    vs = guard_axis(
        counts.select("v").distinct(), "q_stream_drift_window", 100_000
    )
    grid = (
        wins.crossJoin(F.broadcast(vs))
        .join(counts, ["ws", "v"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    w = Window.partitionBy("ws").orderBy("v")
    cum1 = grid.withColumn("cum_w", F.sum("c").over(w).cast("long"))
    cum_all = cum1.groupBy("v").agg(
        F.sum("cum_w").cast("long").alias("cum_tot")
    )
    tot = ev.groupBy("ws").agg(F.count(F.lit(1)).alias("n_win"))
    n_all = ev.agg(F.count(F.lit(1)).alias("n_all"))
    stat = (
        cum1.join(cum_all, "v")
        .join(tot, "ws")
        .crossJoin(F.broadcast(n_all))
        .withColumn("n_rest", F.col("n_all") - F.col("n_win"))
        .groupBy("ws", "n_win", "n_rest")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_w") * F.col("n_rest")
                    - (F.col("cum_tot") - F.col("cum_w")) * F.col("n_win")
                )
            ).alias("d_num")
        )
    )
    return stat.select(
        F.col("ws").alias("window_start"),
        F.col("n_win").cast("long").alias("n_win"),
        F.col("n_rest").cast("long").alias("n_rest"),
        F.col("d_num").cast("long").alias("d_num"),
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * d_num"
            " div (CAST(n_win AS DECIMAL(38,0)) * n_rest) AS BIGINT)"
        ).alias("d_ppm"),
        F.expr(
            "CAST(CAST(CAST(1000000 AS DECIMAL(38,0)) * d_num"
            " div (CAST(n_win AS DECIMAL(38,0)) * n_rest) AS BIGINT)"
            f" >= {_DRIFT_WIN_PPM} AS INT)"
        ).alias("drifted"),
    ).orderBy("window_start")
