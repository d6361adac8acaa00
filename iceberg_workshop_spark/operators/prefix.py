"""Distributed prefix aggregation: global running SUM / previous-row
LAG in a total order WITHOUT an unpartitioned ``OVER (ORDER BY …)``.

Spark compiles a partition-less ordered window to a single-partition
WindowExec — every row of the input serializes through one task (the
"No Partition Defined for Window operation" warning). Even on frames
bounded by calendar/bucket cardinality that is the one non-scalable
node in an otherwise distributed plan, so these helpers replace it
with the classic two-level scan:

1. split the total order into coarse groups via a caller-supplied
   group key that is MONOTONE in the order (year of a day column,
   ``floor(bucket / 64)`` of an integer bucket, …);
2. run the window PARTITIONED by that group (parallel, bounded state);
3. patch group boundaries with a per-group summary frame — one row per
   group, broadcast, combined with a theta join on the group key.

The per-group frame is metadata-scale (|groups| rows), so the theta
join's O(|groups|²) pairs are trivial and nothing data-sized moves.
This is the same decomposition ``llm/curation.py`` uses for the
distributed global NTILE (range repartition + per-partition offsets);
here the split key is semantic (caller-chosen) instead of sampled.

No reference counterpart: the reference workshop
(``/root/reference/README.md``) never runs global-order windows; these
exist so OUR dashboard/histogram queries hold the engine-wide rule
that every Window node is partitioned (SURVEY.md §5.4 plan gates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_G = "_pfx_grp"


def prefix_sum(
    df: DataFrame,
    grp: Column,
    order_cols: list[str],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Running SUM of ``value_col`` over the total order
    ``(grp, *order_cols)`` — equivalent to
    ``SUM(value) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`` when
    ``grp`` is monotone non-decreasing in that order.

    Within-group running sums come from a PARTITIONED window; each
    group then adds the total of all strictly-earlier groups, computed
    on the broadcast per-group totals frame.
    """
    d = df.withColumn(_G, grp)
    w = (
        Window.partitionBy(_G)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = d.withColumn("_pfx_within", F.sum(value_col).over(w))
    totals = d.groupBy(_G).agg(F.sum(value_col).alias("_pfx_total"))
    offsets = (
        totals.select(F.col(_G).alias("_ga"))
        .join(
            F.broadcast(
                totals.select(
                    F.col(_G).alias("_gb"), F.col("_pfx_total")
                )
            ),
            F.col("_gb") < F.col("_ga"),
            "left",
        )
        .groupBy("_ga")
        .agg(F.coalesce(F.sum("_pfx_total"), F.lit(0)).alias("_pfx_offset"))
        .withColumnRenamed("_ga", _G)
    )
    return (
        within.join(F.broadcast(offsets), _G)
        .withColumn(out_col, F.col("_pfx_within") + F.col("_pfx_offset"))
        .drop(_G, "_pfx_within", "_pfx_offset")
    )


def prefix_lag(
    df: DataFrame,
    grp: Column,
    order_cols: list[str],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Previous-row value over the total order ``(grp, *order_cols)``
    — equivalent to ``LAG(value) OVER (ORDER BY …)`` when ``grp`` is
    monotone non-decreasing in that order.

    Within-group LAG runs partitioned; each group's first row patches
    from the LAST row of the nearest preceding non-empty group (tiny
    per-group last-value frame, broadcast; robust to gaps in the group
    key). The overall first row stays NULL, as LAG does.
    """
    d = df.withColumn(_G, grp)
    w = Window.partitionBy(_G).orderBy(*order_cols)
    # Track the true first row per group explicitly: a NULL within-group
    # lag is ambiguous between "first row of group" and "previous row's
    # value was NULL", and only the former may take the boundary patch —
    # coalescing every NULL would resurrect the prior group's last value
    # mid-group, diverging from global LAG on NULL-bearing value_cols.
    within = d.withColumn("_pfx_lag", F.lag(value_col).over(w)).withColumn(
        "_pfx_first", F.row_number().over(w) == 1
    )
    wd = Window.partitionBy(_G).orderBy(*[F.col(c).desc() for c in order_cols])
    last = (
        d.withColumn("_pfx_rn", F.row_number().over(wd))
        .filter(F.col("_pfx_rn") == 1)
        .select(_G, F.col(value_col).alias("_pfx_lastval"))
    )
    prev_grp = (
        last.select(F.col(_G).alias("_ga"))
        .join(
            F.broadcast(last.select(F.col(_G).alias("_gb"))),
            F.col("_gb") < F.col("_ga"),
        )
        .groupBy("_ga")
        .agg(F.max("_gb").alias("_gprev"))
    )
    patch = (
        prev_grp.join(
            F.broadcast(last.withColumnRenamed(_G, "_gprev")), "_gprev"
        )
        .select(
            F.col("_ga").alias(_G), F.col("_pfx_lastval").alias("_pfx_patch")
        )
    )
    return (
        within.join(F.broadcast(patch), _G, "left")
        .withColumn(
            out_col,
            F.when(F.col("_pfx_first"), F.col("_pfx_patch")).otherwise(
                F.col("_pfx_lag")
            ),
        )
        .drop(_G, "_pfx_lag", "_pfx_patch", "_pfx_first")
    )
