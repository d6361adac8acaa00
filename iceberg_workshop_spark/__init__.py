"""iceberg_workshop_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the capability surface exercised by the
maxhardt/iceberg-workshop reference (a SQL workshop over Apache
Iceberg tables on Hive/Impala/PySpark engines), plus LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB scale.

Layout:
- ``session``    — SparkSession factory (UTC, AQE, Arrow).
- ``registry``   — query + oracle-SQL registration (driver contract).
- ``sources``    — readers/writers (parquet, csv, binary).
- ``operators``  — relational operators (scans, filters, joins, aggs,
                   windows, set ops).
- ``functions``  — scalar function surface + UDF/UDAF/UDTF family.
- ``icetbl``     — PySpark-native versioned table layer (snapshots,
                   time travel, DML, partition evolution, pruning,
                   maintenance) — Iceberg v1 semantics over Parquet.
- ``plans``      — table-lifecycle queries built on icetbl.
- ``streaming``  — windowed/stateful event processing (batch-exact
                   forms + Structured Streaming).
- ``llm``        — LLM-training-data pipeline operators.
"""

__version__ = "0.1.0"
