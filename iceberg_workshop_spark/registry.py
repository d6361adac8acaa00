"""Query + oracle registry — the driver contract's backbone.

Every operator from SURVEY.md §2B registers itself here with
``@register("q_name", oracle="SELECT ...")``. ``__spark_entry__.py``
exposes the dicts to the driver; tests iterate them to assert DuckDB
hash-parity locally before the driver does.

Hash-stability conventions (SURVEY.md §5.3):
- money aggregates: ``CAST(x AS DECIMAL(18,2))`` before SUM, result
  cast back to DOUBLE so both engines materialize bit-identical
  float64;
- AVG expressed as ``round(sum/count, 4)``;
- every computed column aliased identically in Spark and SQL;
- ORDER BY / window orderBy always ends in a unique key;
- timestamps truncated to seconds at comparison points.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Modules that define queries; imported lazily by load_all() so that
# `import iceberg_workshop_spark` stays cheap.
_QUERY_MODULES = [
    "iceberg_workshop_spark.operators.scans",
    "iceberg_workshop_spark.operators.filters",
    "iceberg_workshop_spark.operators.joins",
    "iceberg_workshop_spark.operators.aggregates",
    "iceberg_workshop_spark.operators.windows",
    "iceberg_workshop_spark.operators.setops",
    "iceberg_workshop_spark.operators.skew",
    "iceberg_workshop_spark.operators.catalog",
    "iceberg_workshop_spark.operators.bucketing",
    "iceberg_workshop_spark.sources.pysource",
    "iceberg_workshop_spark.operators.analytics",
    "iceberg_workshop_spark.operators.subqueries",
    "iceberg_workshop_spark.operators.tpch_shapes",
    "iceberg_workshop_spark.operators.sequences",
    "iceberg_workshop_spark.operators.graph",
    "iceberg_workshop_spark.operators.sketches",
    "iceberg_workshop_spark.functions.scalar",
    "iceberg_workshop_spark.functions.udfs",
    "iceberg_workshop_spark.plans.lifecycle",
    "iceberg_workshop_spark.streaming.windows",
    "iceberg_workshop_spark.streaming.stateful",
    "iceberg_workshop_spark.llm.dedup",
    "iceberg_workshop_spark.llm.simsearch",
    "iceberg_workshop_spark.llm.textstats",
    "iceberg_workshop_spark.llm.multimodal",
    "iceberg_workshop_spark.llm.curation",
]


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` means rows-only driver check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module (idempotent)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
