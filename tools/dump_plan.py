"""Dump ``explain("formatted")`` for registry queries to files.

Usage: python tools/dump_plan.py --out plans/r14 --suffix _after q_x q_y

Queries that eagerly ``localCheckpoint`` their result would otherwise
explain as a bare ExistingRDD scan; ``--no-ckpt`` (default on)
monkeypatches ``DataFrame.localCheckpoint`` to identity so the dumped
plan shows the actual computation the checkpoint executes. Timings are
NOT meaningful under this flag — it exists only for plan artifacts.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--keep-ckpt", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import DataFrame

    from iceberg_workshop_spark.registry import queries
    from iceberg_workshop_spark.session import get_spark

    if not args.keep_ckpt:
        # Spark 4 routes pyspark.sql.DataFrame to the classic
        # implementation subclass; patch the class whose method
        # actually dispatches.
        try:
            from pyspark.sql.classic.dataframe import DataFrame as _CDF
        except ImportError:
            _CDF = DataFrame
        _CDF.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
        # Queries unpersist their intermediates after the eager
        # checkpoint; with the checkpoint no-op'd that would drop the
        # cache entries before explain, hiding the InMemoryRelation
        # reuse the real execution gets. Keep them for the dump.
        _CDF.unpersist = lambda self, blocking=False: self  # type: ignore[method-assign]

    spark = get_spark("iws-dump-plan")
    qs = queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(path, len(txt.splitlines()), "lines")


if __name__ == "__main__":
    main()
