"""icetbl — a PySpark-native versioned table layer (Iceberg v1 semantics).

Reimplements, thin and Spark-first, the table-format capabilities the
reference workshop exercises on Apache Iceberg (snapshots, time
travel, rollback, hidden/transform partitioning, partition-spec
evolution, schema evolution, copy-on-write DML, snapshot expiration,
compaction, metadata retention) — because no Iceberg runtime jar is
available offline (SURVEY.md §0). Layout mirrors the structure shown
at /root/reference/pyspark-iceberg/interoperability.md:76-83:

    <table>/data/snap-<uuid>/...parquet   (immutable per-commit files)
    <table>/metadata/v<N>.json            (full table state per version)
    <table>/version-hint.text             (read accelerator; the commit
                                           point is the atomic claim of
                                           v<N>.json — see meta.commit)

Per-file min/max bounds are collected from parquet footers at commit
time (the manifest ``lower_bounds/upper_bounds`` mechanics of
/root/reference/limitations.md:82-105); files adopted in-place may
lack bounds and are then always scanned (the ``limitations.md:39-73``
rule).
"""

from iceberg_workshop_spark.icetbl.meta import CommitConflict  # noqa: F401
from iceberg_workshop_spark.icetbl.pruning import Pred  # noqa: F401
from iceberg_workshop_spark.icetbl.table import IceTable, spec_field  # noqa: F401
from iceberg_workshop_spark.icetbl import dml as _dml  # noqa: F401  (binds methods)
from iceberg_workshop_spark.icetbl import maintenance as _maint  # noqa: F401  (binds methods)
