"""Property test for changelog-driven aggregate maintenance: for ANY
sequence of appends / CoW deletes / MoR key deletes, applying the
signed changelog deltas to the aggregate materialized at the starting
snapshot must reproduce a full recompute at the final snapshot.
Exercises the algebra behind q_cdc_agg_maintain far beyond its single
scripted scenario — especially update pairs (delete+insert of the same
group) and groups that drain to zero."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from iceberg_workshop_spark.icetbl import IceTable


def _agg(df):
    return df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_delta_applied_aggregate_equals_recompute(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = IceTable.create(
        spark, str(tmp_path / f"cdcagg{seed}"), "k bigint, g bigint, v bigint"
    )
    next_k = 0

    def fresh_rows(n):
        nonlocal next_k
        rows = [(next_k + i, rng.randint(0, 4), rng.randint(1, 100)) for i in range(n)]
        next_k += n
        return rows

    t.append(spark.createDataFrame(fresh_rows(30), "k bigint, g bigint, v bigint"))
    s1 = t.meta.current_snapshot_id
    base = _agg(t.read(snapshot_id=s1))

    for _ in range(5):
        op = rng.choice(["append", "cow_delete", "mor_delete"])
        if op == "append":
            t.append(
                spark.createDataFrame(
                    fresh_rows(rng.randint(1, 10)), "k bigint, g bigint, v bigint"
                )
            )
        elif op == "cow_delete":
            g = rng.randint(0, 4)
            cut = rng.randint(1, 100)
            t.delete_where(f"g = {g} AND v <= {cut}")
        else:
            live = [r["k"] for r in t.read().select("k").collect()]
            if not live:
                continue
            doomed = rng.sample(live, min(len(live), rng.randint(1, 5)))
            t.delete_where_mor(
                "k IN (" + ",".join(str(k) for k in doomed) + ")", keys=["k"]
            )

    sign = F.when(F.col("_change_type") == "delete", -1).otherwise(1)
    delta = (
        t.changelog(from_snapshot_id=s1)
        .groupBy("g")
        .agg(F.sum(sign).alias("dn"), F.sum(F.col("v") * sign).alias("ds"))
    )
    maintained = (
        base.join(delta, "g", "full_outer")
        .select(
            "g",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias("s"),
        )
        .filter(F.col("n") > 0)
    )
    got = {(r["g"], r["n"], r["s"]) for r in maintained.collect()}
    want = {(r["g"], r["n"], r["s"]) for r in _agg(t.read()).collect()}
    assert got == want


def test_changelog_across_mor_update_and_merge(spark, tmp_path):
    """The net changelog must see through the one-commit MoR UPDATE /
    MERGE flavor: old images as deletes (reached via the positional
    delete file), new images as inserts."""
    from pyspark.sql import functions as F

    from iceberg_workshop_spark.icetbl import IceTable

    t = IceTable.create_as(
        spark,
        str(tmp_path / "cdcmor"),
        spark.range(0, 10).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("v"),
        ),
    )
    s0 = t.meta.current_snapshot_id
    t.update_where_mor("k < 3", {"v": "v + 1"})
    t.merge_into_mor(
        spark.createDataFrame([(5, 999), (50, 500)], "k long, v long"),
        on=["k"],
    )
    ch = [
        (r.k, r.v, r._change_type)
        for r in t.changelog(from_snapshot_id=s0).collect()
    ]
    expect = {
        (0, 0, "delete"), (0, 1, "insert"),
        (1, 10, "delete"), (1, 11, "insert"),
        (2, 20, "delete"), (2, 21, "insert"),
        (5, 50, "delete"), (5, 999, "insert"),
        (50, 500, "insert"),
    }
    assert set(ch) == expect and len(ch) == len(expect)
