"""Property check for simsearch._topk_per_group: on random frames the
two-level bucketed top-k must equal the naive single-window form
exactly — same surviving rows AND same ranks — for any k, group
count, and tie pattern (ties broken by the unique tiebreak column,
as the helper's contract requires)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_topk_per_group_matches_single_window(spark):
    from iceberg_workshop_spark.llm.simsearch import _topk_per_group

    rng = random.Random(77)
    for trial in range(4):
        n_groups = rng.randint(1, 5)
        n_rows = rng.randint(30, 120)
        k = rng.choice([1, 3, 7])
        rows = [
            (
                rng.randrange(n_groups),          # g
                i,                                 # item (unique)
                rng.randrange(6),                  # score: many ties
            )
            for i in range(n_rows)
        ]
        df = spark.createDataFrame(rows, "g int, item bigint, score int")
        order = [F.col("score").desc(), F.col("item")]
        got = {
            (r["g"], r["item"], r["rk"])
            for r in _topk_per_group(df, ["g"], order, k, "item", "rk")
            .collect()
        }
        w = Window.partitionBy("g").orderBy(*order)
        want = {
            (r["g"], r["item"], r["rk"])
            for r in df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .collect()
        }
        assert got == want, f"trial {trial} k={k} groups={n_groups}"


def test_topk_per_group_skewed_group_and_bucket_counts(spark):
    """A single dominant group (the 100 TB shape: one probe scoring
    the whole corpus) must (a) return the same exact top-k under any
    bucket count and (b) actually split the dominant group across
    level-1 partitions — the per-task row bound the fan-out parameter
    exists to enforce."""
    from iceberg_workshop_spark.llm.simsearch import _topk_per_group

    rng = random.Random(123)
    # group 0 holds 95% of rows; scores heavily tied
    rows = [
        (0 if i % 20 else 1, i, rng.randrange(4)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "g int, item bigint, score int")
    order = [F.col("score").desc(), F.col("item")]
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        (r["g"], r["item"], r["rk"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 7)
        .collect()
    }
    for buckets in (2, 32, 256):
        got = {
            (r["g"], r["item"], r["rk"])
            for r in _topk_per_group(
                df, ["g"], order, 7, "item", "rk", buckets=buckets
            ).collect()
        }
        assert got == want, f"buckets={buckets}"
    # level-1 partition bound: with B buckets the dominant group's
    # largest (group, bucket) slice must be far below the whole group
    big = sum(1 for g, _i, _s in rows if g == 0)
    per_bucket = (
        df.filter(F.col("g") == 0)
        .groupBy(F.pmod(F.xxhash64("item"), F.lit(32)).alias("b"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_bucket < big / 8, (per_bucket, big)


def test_topk_per_group_rejects_non_unique_order_tail(spark):
    """The unique-tiebreak contract is enforced, not just documented:
    an order list whose last expression does not reference the
    bucketing row-id fails loudly instead of silently returning
    nondeterministic results under ties."""
    import pytest

    from iceberg_workshop_spark.llm.simsearch import _topk_per_group

    df = spark.createDataFrame(
        [(1, 1, 1.0)], "g int, item bigint, score double"
    )
    with pytest.raises(ValueError, match="unique tiebreak"):
        _topk_per_group(
            df, ["g"], [F.col("score").desc()], 3, "item", "rk"
        )
    # the match is an exact token, not a substring: an order tail that
    # merely CONTAINS the bucket column's name is rejected too
    df2 = spark.createDataFrame(
        [(1, 1, 1, 1.0)], "g int, item bigint, item2 bigint, score double"
    )
    with pytest.raises(ValueError, match="unique tiebreak"):
        _topk_per_group(
            df2, ["g"], [F.col("score").desc(), F.col("item2")], 3,
            "item", "rk",
        )
    # and the legitimate exact-column tail still passes under asc/desc
    assert (
        _topk_per_group(
            df2, ["g"], [F.col("score").desc(), F.col("item").desc()], 3,
            "item", "rk",
        ).count()
        == 1
    )
