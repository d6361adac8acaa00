"""Per-query profiling harness for the optimization rounds.

Usage:
    python tools/profile_query.py [--reps N] [--explain DIR] q_name [q_name ...]

For each named registry query: runs ``reps`` construction+noop cycles
(same methodology as bench.py — construction time and noop-write time
reported separately, since many queries do eager work such as
``localCheckpoint`` during construction), prints per-rep and best
times, and optionally dumps ``explain("formatted")`` for the returned
DataFrame to ``<DIR>/<name>.txt`` (the judge-checkable plan artifact).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for explain('formatted') dumps")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from iceberg_workshop_spark.registry import queries
    from iceberg_workshop_spark.session import get_spark

    spark = get_spark("iws-profile")
    qs = queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    if not args.no_warm:
        # Same JIT/py-worker warmup families as bench.py, trimmed.
        for warm in ("q_join_multiway", "q_udf_pandas"):
            try:
                qs[warm](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    for name in args.names:
        rows = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            rows.append((t1 - t0, t2 - t1))
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        best = min(a + b for a, b in rows)
        detail = "  ".join(f"[{a:.3f}+{b:.3f}]" for a, b in rows)
        print(f"{name}: best={best:.3f}s  reps(construct+noop): {detail}", flush=True)


if __name__ == "__main__":
    main()
