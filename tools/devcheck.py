"""Interactive dev loop: one warm SparkSession + DuckDB oracle.

Usage: ``python -i tools/devcheck.py`` then ``check("q_name", reload_mod=
"iceberg_workshop_spark.operators.stats_ext")`` after each edit.
"""

from __future__ import annotations

import importlib
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from iceberg_workshop_spark import registry  # noqa: E402
from iceberg_workshop_spark.session import get_spark  # noqa: E402
from tests.helpers import assert_frames_match  # noqa: E402

SF = os.environ.get("IWS_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

spark = get_spark("devcheck")
con = duckdb.connect()
for _t in TABLES:
    con.execute(
        f"CREATE VIEW {_t} AS SELECT * FROM read_parquet('{SF}/{_t}.parquet')"
    )
registry.load_all()


def check(name: str, reload_mod: str | None = None) -> bool:
    if reload_mod:
        importlib.reload(importlib.import_module(reload_mod))
    t0 = time.time()
    try:
        df = registry.QUERIES[name](spark, SF)
        spdf = df.toPandas()
        sql = registry.ORACLES.get(name)
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows "
                  f"cols={list(spdf.columns)} ({time.time()-t0:.1f}s)")
            return len(spdf) > 0
        opdf = con.execute(sql).df()
        assert_frames_match(spdf, opdf, name)
        print(f"PASS {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
        return True
    except Exception:
        traceback.print_exc()
        print(f"FAIL {name} ({time.time()-t0:.1f}s)")
        return False
