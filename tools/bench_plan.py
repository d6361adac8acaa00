"""Scan PLAN-cost certificate (VERDICT r13 "what's wrong" #1).

BENCH_meta.json certified COMMIT cost; this tool certifies the other
metadata-scale planner dimension: deciding which of N live file
entries survive a multi-disjunct DNF predicate. The driver-side
CPython loop is sound but single-core — at 100 TB (10^5-10^6 files)
it is minutes of driver time per query. Past
``pruning.PRUNE_DISTRIBUTED_THRESHOLD`` the same pure survival
function (``pruning.survives_dnf``) runs distributed over executors
(``prune_files_distributed``), which is what this tool measures:
driver-loop wall vs distributed wall at 100k and 300k synthetic
entries under a 3-disjunct DNF (partition + bounds + bucket terms),
asserting the two paths keep the same files.

Merges a ``plan_cost`` block into BENCH_meta.json; prints one JSON
line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIERS = [100_000, 300_000, 1_000_000]
PASSES = 3


def _entries(n: int) -> list[dict]:
    """Synthetic manifest entries shaped like current_files() output:
    hour-grain identity partition dirs, per-column bounds, a bucket
    partition field on a second spec for 1/3 of the files."""
    from iceberg_workshop_spark.icetbl.bucketing import bucket_value

    out = []
    for i in range(n):
        sid = i % 3  # 0: unpartitioned, 1: day dir, 2: bucket dir
        day = (i // 24) % 365 + 1
        part = {}
        if sid == 1:
            part = {"ts_day": f"2024-{(day - 1) // 31 + 1:02d}-{(day - 1) % 31 + 1:02d}"}
        elif sid == 2:
            part = {"kb": str(bucket_value(i % 1000, 16))}
        out.append(
            {
                "path": f"data/part-{i:08d}.parquet",
                "spec_id": sid,
                "partition": part,
                "bounds": {
                    "v": [float(i % 500), float(i % 500 + 50)],
                    "k": [i % 1000, i % 1000],
                },
                "file_size": 4_194_304,
            }
        )
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    from iceberg_workshop_spark.icetbl.bucketing import bucket_value
    from iceberg_workshop_spark.icetbl.pruning import (
        Pred,
        bucket_survives,
        prune_files,
        prune_files_distributed,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.enabled", "false")
        .appName("iws-bench-plan")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec_by_id = {
        0: [],
        1: [{"source": "ts_day", "transform": "identity", "name": "ts_day"}],
        2: [{"source": "k", "transform": "bucket[16]", "name": "kb"}],
    }
    # 3-disjunct DNF: a bounds range, a partition eq, a bucket eq
    dnf = [
        [Pred("v", "between", (100.0, 140.0))],
        [Pred("ts_day", "=", "2024-03-05"), Pred("v", ">=", 400.0)],
        [Pred("k", "=", 123)],
    ]
    exps = []
    for d in dnf:
        eq = {p.col: p.value for p in d if p.op == "="}
        exp = {}
        if "k" in eq:
            exp[(2, "kb")] = str(bucket_value(eq["k"], 16))
        exps.append(exp)

    results: dict[str, dict] = {}
    for tier in TIERS:
        files = _entries(tier)

        def _driver() -> set:
            kept = set()
            for d, exp in zip(dnf, exps):
                k, _ = prune_files(files, spec_by_id, d)
                if exp:
                    k = [f for f in k if bucket_survives(f, exp)]
                kept.update(f["path"] for f in k)
            return kept

        def _dist() -> set:
            return {
                f["path"]
                for f in prune_files_distributed(
                    spark, files, spec_by_id, dnf, exps
                )
            }

        d_walls, x_walls = [], []
        want = got = None
        for _ in range(PASSES):
            t0 = time.perf_counter()
            want = _driver()
            d_walls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            got = _dist()
            x_walls.append(time.perf_counter() - t0)
        assert got == want, "distributed planner diverged from driver loop"
        results[str(tier)] = {
            "driver_loop_sec": round(statistics.median(d_walls), 3),
            "distributed_sec": round(statistics.median(x_walls), 3),
            "kept_files": len(want),
            "dnf_disjuncts": len(dnf),
        }
        print(json.dumps({"tier": tier, **results[str(tier)]}))

    block = {
        "plan_cost": {
            "tiers": results,
            "note": (
                "survival decision for N live entries under a "
                "3-disjunct DNF; distributed = "
                "pruning.prune_files_distributed (same pure function "
                "as the driver loop, equality asserted per pass); "
                "threshold IWS_PRUNE_DISTRIBUTED_THRESHOLD"
            ),
        }
    }
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_meta.json",
    )
    if os.path.exists(dest):
        with open(dest) as f:
            prev = json.load(f)
        block = {**prev, **block}
    with open(dest, "w") as f:
        json.dump(block, f, indent=1, sort_keys=True)
    print(json.dumps({"metric": "plan_cost", **results}))


if __name__ == "__main__":
    main()
