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
