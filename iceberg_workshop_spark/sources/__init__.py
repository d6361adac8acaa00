"""Sources & sinks: parquet / CSV / binary readers and table loaders."""

from iceberg_workshop_spark.sources.tables import load, load_all_tables  # noqa: F401
