"""Property check for simsearch._topk_per_group: on random frames the
two-level bucketed top-k must equal the naive single-window form
exactly — same surviving rows AND same ranks — for any k, group
count, and tie pattern. The unique tiebreak (``bucket_on`` ascending)
is appended by the helper ITSELF, so determinism under ties is part of
its construction, not a caller obligation."""

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
        got = {
            (r["g"], r["item"], r["rk"])
            for r in _topk_per_group(
                df, ["g"], [F.col("score").desc()], k, "item", "rk"
            ).collect()
        }
        # naive form replicates the helper's full order: semantic
        # ordering + the appended bucket_on ascending tiebreak
        w = Window.partitionBy("g").orderBy(
            F.col("score").desc(), F.col("item").asc()
        )
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
    w = Window.partitionBy("g").orderBy(
        F.col("score").desc(), F.col("item").asc()
    )
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
                df, ["g"], [F.col("score").desc()], 7, "item", "rk",
                buckets=buckets,
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


def test_topk_per_group_ties_broken_by_bucket_on_structurally(spark):
    """All-tied scores: the appended bucket_on tiebreak alone must
    produce the deterministic ascending-id ranking — the case the old
    repr-parsed guard existed to protect, now guaranteed by
    construction (no caller can forget the tiebreak)."""
    from iceberg_workshop_spark.llm.simsearch import _topk_per_group

    df = spark.createDataFrame(
        [(1, i, 5) for i in range(40)], "g int, item bigint, score int"
    )
    rows = (
        _topk_per_group(df, ["g"], [F.col("score").desc()], 5, "item", "rk")
        .orderBy("rk")
        .collect()
    )
    assert [(r["item"], r["rk"]) for r in rows] == [
        (i, i + 1) for i in range(5)
    ]
    # qualified / derived orderings are fine now — no repr parsing
    df2 = df.alias("t")
    got = _topk_per_group(
        df2, ["g"], [(F.col("t.score") * 2).desc()], 3, "item", "rk"
    ).count()
    assert got == 3
