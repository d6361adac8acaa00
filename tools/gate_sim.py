"""Local simulation of the driver's CORRECTNESS gate.

Runs the FIRST N (default 50) registry rows — exactly the sample the
driver takes — in a fresh SparkSession against the DuckDB oracle at
sf0.01, using the same compare discipline (row count + column names +
order-insensitive exact values; see tests/helpers.py). Prints one
status line per query and a final tally.

Usage:  python tools/gate_sim.py [N]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import duckdb  # noqa: E402

SF_DIR = os.environ.get("IWS_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from tests.helpers import assert_driver_sortable, assert_frames_match

    from iceberg_workshop_spark.registry import oracle_sql, queries
    from iceberg_workshop_spark.session import get_spark

    spark = get_spark("iws-gate-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = queries()
    oracles = oracle_sql()
    names = list(qs)[:n]
    n_pass = n_fail = 0
    for name in names:
        t0 = time.monotonic()
        try:
            spark_pdf = qs[name](spark, SF_DIR).toPandas()
            sql = oracles.get(name)
            if sql is None:
                assert len(spark_pdf) > 0, "rows-only query returned empty"
                assert_driver_sortable(spark_pdf, name)
                status = "rows_only_ok"
            else:
                oracle_pdf = con.execute(sql).df()
                assert_frames_match(spark_pdf, oracle_pdf, name)
                status = "exact"
            n_pass += 1
            print(f"PASS {name} ({status}, {time.monotonic() - t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001 - report and continue
            n_fail += 1
            print(f"FAIL {name}: {exc}")
            traceback.print_exc(limit=3)
    print(f"\ngate sim: {n_pass}/{len(names)} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
