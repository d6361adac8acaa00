"""Statistical-aggregate extensions: grouping introspection, exact
bivariate regression, sketch-certificated percentiles, and
time-interval window frames.

The reference's workshop engines (Hive/Impala — ``/root/reference/
README.md:48-66``) expose GROUPING__ID, regr_* and percentile
families as everyday warehouse surface; these close that tail with
hash-stable contracts:

- regression moments are EXACT decimal sums (DECIMAL(18,2) per
  factor, products at (38,4)) converted to float64 only at the final
  scalar expression, so both engines materialize bit-identical
  doubles (SURVEY.md §5.3);
- ``approx_percentile`` follows the q_agg_approx_cd certificate
  pattern: the sketch VALUE is engine-specific, so the contract is
  the exact quantile plus an in-query *rank-error bound* proof that
  the sketch landed within its published guarantee;
- the 24 h trailing window uses ``rangeBetween`` over epoch seconds —
  numeric range frames are the engine-portable form of RANGE BETWEEN
  INTERVAL, partitioned by user (no global window).

Scale: every query is scan → one grouped agg (map-side partials) →
scalar finish; the window is partitioned on ``user_id``. Nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_workshop_spark.registry import register
from iceberg_workshop_spark.sources.tables import load

DAY_S = 86400


@register(
    "q_agg_grouping_id",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
    """,
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING_ID over a rollup: disambiguates "real NULL group" from
    "subtotal row" — the introspection bit warehouse reports rely on.
    Bit order (first grouping column = most significant) matches ANSI,
    Spark, and DuckDB alike, so the id is value-portable."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "total_price",
        )
        .orderBy("gid", "status", "priority")
    )


# The regression formula, written ONCE and rendered into both engines:
# slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)   over exact decimal sums
# cast to float64 — the same IEEE expression tree on both sides.
_REGR_FINISH = """
    ROUND(({num}) / ({denx}), 4) AS slope,
    ROUND((sy - (({num}) / ({denx})) * sx) / n, 4) AS intercept,
    ROUND((({num}) * ({num})) / (({denx}) * ({deny})), 4) AS r2
""".format(
    num="n * sxy - sx * sy",
    denx="n * sxx - sx * sx",
    deny="n * syy - sy * sy",
)


@register(
    "q_agg_corr_regr",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           {_REGR_FINISH}
    FROM m
    ORDER BY l_returnflag
    """,
)
def q_agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope/intercept and r² of extended price on
    quantity per return flag — regr_slope/regr_intercept/corr²
    semantics with EXACT decimal moments (float only at the finish,
    identical expression both engines). One grouped agg; the five
    moments combine map-side, so the shuffle carries 3 rows."""
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    m = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(qty).cast("double").alias("sx"),
            F.sum(price).cast("double").alias("sy"),
            F.sum(qty * qty).cast("double").alias("sxx"),
            F.sum(price * price).cast("double").alias("syy"),
            F.sum(qty * price).cast("double").alias("sxy"),
        )
    )
    return m.selectExpr(
        "l_returnflag", "CAST(n AS BIGINT) AS n_rows", *_REGR_FINISH.split(",\n")
    ).orderBy("l_returnflag")


@register(
    "q_agg_approx_percentile",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
           true AS rank_err_ok
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile with an in-query rank-error certificate — the
    100 TB quantile path (GK sketch, constant memory per group; exact
    percentile re-sorts the group). The sketch VALUE differs across
    engines, so the portable contract is q_agg_approx_cd's: emit the
    exact p50 plus proof that the sketch's rank error stayed within
    the accuracy=1000 guarantee (|rank(approx) − n/2| ≤ n/1000 + 1,
    counted against the data itself)."""
    orders = load(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("exact_p50"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("_ap"),
    )
    rank_of_ap = (
        orders.join(
            F.broadcast(g.select("o_orderstatus", "_ap")), "o_orderstatus"
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.when(F.col("o_totalprice") <= F.col("_ap"), 1)).alias(
                "_rank_le"
            )
        )
    )
    return (
        g.join(F.broadcast(rank_of_ap), "o_orderstatus")
        .select(
            "o_orderstatus",
            "n_orders",
            "exact_p50",
            (
                F.abs(F.col("_rank_le") - F.col("n_orders") / 2)
                <= F.col("n_orders") / 1000 + 1
            ).alias("rank_err_ok"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_win_range_interval",
    oracle=f"""
    WITH e AS (
      SELECT user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec
      FROM events
    ),
    t AS (
      SELECT user_id,
             COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts_sec
               RANGE BETWEEN {DAY_S - 1} PRECEDING AND CURRENT ROW
             ) AS trail
      FROM e
    )
    SELECT user_id, MAX(trail) AS max_events_24h, COUNT(*) AS n_events
    FROM t
    GROUP BY user_id
    ORDER BY max_events_24h DESC, user_id
    LIMIT 25
    """,
)
def q_win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-hour activity (burstiness top-25): a RANGE window
    frame over an interval, expressed as ``rangeBetween`` on epoch
    seconds — the engine-portable spelling of RANGE BETWEEN INTERVAL
    '24' HOUR PRECEDING. Value frames (not row frames) so ties at the
    same second count all peers. Partitioned by user_id — no global
    window; the top-25 finish is a TakeOrdered, not a full sort."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-(DAY_S - 1), 0)
    )
    return (
        e.withColumn("trail", F.count(F.lit(1)).over(w))
        .groupBy("user_id")
        .agg(
            F.max("trail").alias("max_events_24h"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.desc("max_events_24h"), "user_id")
        .limit(25)
    )


_MANNWHITNEY = """
WITH ev AS (
  SELECT event_type AS g,
         CAST(floor(value * 100) AS BIGINT) {div} {grain} AS v
  FROM {t}events
),
counts AS (SELECT g, v, COUNT(*) AS c FROM ev GROUP BY g, v),
c_all AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM counts GROUP BY v),
cumv AS (
  SELECT v, cv,
         CAST(SUM(cv) OVER (ORDER BY v) - cv AS BIGINT) AS cum_before
  FROM c_all
),
r2 AS (SELECT v, cv, 2 * cum_before + cv + 1 AS rank2 FROM cumv),
grp AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS n1,
         CAST(SUM(CAST(c AS HUGEINT) * r2.rank2) AS HUGEINT) AS rsum2
  FROM counts JOIN r2 USING (v) GROUP BY g
),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM counts)
SELECT g AS event_type, n1, n.n_all - n1 AS n2,
       CAST(rsum2 - n1 * (n1 + 1) AS BIGINT) AS u2,
       CAST(CAST(1000000 AS HUGEINT) * (rsum2 - n1 * (n1 + 1))
            {div} (CAST(2 AS HUGEINT) * n1 * (n.n_all - n1))
            AS BIGINT) AS cl_ppm
FROM grp, n
ORDER BY event_type
"""


MWU_MAX_GRID = 100_000  # dense-grid cap on the distinct-value axis


@register(
    "q_agg_mannwhitney",
    oracle=_MANNWHITNEY.format(t="", div="//", grain=1),
)
def q_agg_mannwhitney(
    spark: SparkSession,
    sf_dir: str,
    *,
    grain: int = 1,
    max_grid: int = MWU_MAX_GRID,
) -> DataFrame:
    """Mann–Whitney U rank-sum test per event type vs the rest of the
    stream — the nonparametric location-shift check (does this event
    type's value distribution sit higher/lower?) that complements
    q_llm_drift_ks's shape test. ``cl_ppm`` is the common-language
    effect size U/(n1·n2) in ppm (500000 = no shift).

    Integer-exact with ties: tie-averaged ranks are carried DOUBLED
    (2·avg_rank = 2·cum_before + tie_count + 1, always integer), so
    rank sums, U2 = 2U, and the ppm effect size are pure integer
    arithmetic in both engines; ALL corpus-scale products — the
    rank-sum accumulator rsum2 ≲ 2n², the 1e6 scaling, and the n1·n2
    denominator — run in DECIMAL(38,0) / HUGEINT (no silent BIGINT
    wrap at any stream size), and the one BIGINT output that is not
    logically bounded (u2 = 2U, > 2^63 past n ≈ 4e9 events) is
    narrowed under an in-plan ``assert_true`` that fails loudly
    instead of wrapping. Scale
    shape: one groupBy builds (group, value) counts; ranking happens
    over the bounded distinct-VALUE dimension, not the event stream —
    a precondition now ENFORCED by an in-plan ``assert_true``: a
    value axis beyond ``max_grid`` distinct points fails loudly with
    a hint to bucket via ``grain`` (PSI's ``div`` pattern) instead of
    OOMing on the grid. The global cumulative count needs no
    unpartitioned window on the Spark side — it is the per-value SUM
    of per-group PARTITIONED cumsums (the q_llm_drift_ks
    construction)."""
    from iceberg_workshop_spark.registry import guard_axis

    ev = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        # FLOOR division, not Spark's truncate-toward-zero `div`:
        # value can be negative, and the DuckDB oracle's `//` floors —
        # (v - pmod(v, g)) div g is exact integer floor division for
        # any sign (pmod's remainder is non-negative), so both engines
        # bucket negative values identically at any grain
        F.expr(
            "CAST((CAST(floor(value * 100) AS BIGINT)"
            f" - pmod(CAST(floor(value * 100) AS BIGINT), {int(grain)}))"
            f" div {int(grain)} AS BIGINT)"
        ).alias("v"),
    )
    counts = ev.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    groups = counts.select("g").distinct()
    vs = guard_axis(
        counts.select("v").distinct(), "q_agg_mannwhitney", int(max_grid)
    )
    grid = (
        groups.crossJoin(F.broadcast(vs))
        .join(counts, ["g", "v"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    w = Window.partitionBy("g").orderBy("v")
    cum_g = grid.withColumn("cum_incl", F.sum("c").over(w).cast("long"))
    cum_all = cum_g.groupBy("v").agg(
        F.sum("cum_incl").cast("long").alias("cum_all_incl")
    )
    c_all = counts.groupBy("v").agg(F.sum("c").cast("long").alias("cv"))
    r2 = (
        cum_all.join(c_all, "v")
        .withColumn("cum_before", F.col("cum_all_incl") - F.col("cv"))
        .withColumn("rank2", 2 * F.col("cum_before") + F.col("cv") + 1)
        .select("v", "rank2")
    )
    grp = (
        counts.join(F.broadcast(r2), "v")
        .groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n1"),
            # rank-sum accumulator in DECIMAL(38,0): rsum2 ~ 2n² wraps
            # BIGINT past n ≈ 2·10^9 events — the last documented
            # BIGINT bound of the round-10 ppm sweep, closed here (the
            # per-term product c·rank2 is cast BEFORE multiplying so
            # no intermediate ever runs in long)
            F.sum(
                F.col("c").cast("decimal(38,0)") * F.col("rank2")
            ).alias("rsum2"),
        )
    )
    n_all = counts.agg(F.sum("c").cast("long").alias("n_all"))
    # u2 is computed in DECIMAL and only then narrowed to the BIGINT
    # output column; the in-plan assert makes the narrowing LOUD if a
    # stream ever pushes u2 = 2·U past 2^63 (n ≳ 4·10^9 events) —
    # same guard discipline as the dense-grid axis check
    u2_dec = (
        "(rsum2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1))"
    )
    return (
        grp.crossJoin(F.broadcast(n_all))
        .where(
            F.assert_true(
                F.expr(f"abs({u2_dec}) <= 9223372036854775807"),
                F.lit(
                    "q_agg_mannwhitney: u2 = 2U exceeds BIGINT — report "
                    "cl_ppm only or widen the output contract"
                ),
            ).isNull()
        )
        .select(
            F.col("g").alias("event_type"),
            "n1",
            (F.col("n_all") - F.col("n1")).alias("n2"),
            F.expr(f"CAST({u2_dec} AS BIGINT)").alias("u2"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0))"
                f" * {u2_dec}"
                " div (CAST(2 AS DECIMAL(38,0)) * n1 * (n_all - n1))"
                " AS BIGINT)"
            ).alias("cl_ppm"),
        )
        .orderBy("event_type")
    )
