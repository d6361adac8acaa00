"""Custom data sources via the Spark 4 Python Data Source API.

The reference's source surface is CSV/Parquet/Iceberg DDL
(`/root/reference/sql/airlines.sql:36-55`); beyond those built-ins,
Spark 4 lets an engine define new sources in pure Python
(``pyspark.sql.datasource``) — the extension point a training-data
platform uses for feeds with no built-in reader (crawl manifests,
proprietary shard formats, service APIs).

Two sources here:

- ``iws_seq`` (batch): a deterministic partitioned generator — N rows
  of (i, md5(i)) split across P ``InputPartition``s. Each partition
  reads independently on executors (true parallel scan); md5 makes
  the output engine-checkable, so the query over it has an exact
  DuckDB oracle (generate_series + md5).
- ``iws_ticks`` (streaming): a micro-batch source with explicit
  offset bookkeeping (``initialOffset``/``latestOffset``/``read``) —
  the shape of a real feed adapter; drained with availableNow and
  checked exactly (offsets → deterministic rows).

Scale notes: partitions() is the parallelism contract — each executor
task pulls only its slice; nothing is materialized on the driver. For
a remote feed, partitions map to shard/offset ranges the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from iceberg_workshop_spark.registry import register

SEQ_ROWS = 10_000
SEQ_PARTS = 8
TICKS_PER_BATCH = 100
TICK_BATCHES = 3


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _SeqReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("rows", SEQ_ROWS))
        self.parts = int(options.get("partitions", SEQ_PARTS))

    def partitions(self) -> list[InputPartition]:
        step = -(-self.n // self.parts)  # ceil
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        import hashlib

        for i in range(partition.start, partition.end):
            yield (i, hashlib.md5(str(i).encode()).hexdigest())


class SeqDataSource(DataSource):
    """``spark.read.format("iws_seq").option("rows", N)`` — see module
    docstring."""

    @classmethod
    def name(cls) -> str:
        return "iws_seq"

    def schema(self) -> str:
        return "i bigint, h string"

    def reader(self, schema) -> DataSourceReader:
        return _SeqReader(self.options)


class _TicksStreamReader(DataSourceStreamReader):
    """Bounded micro-batch feed: TICK_BATCHES batches of
    TICKS_PER_BATCH rows, offsets tracked as plain row counts."""

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        return {"offset": TICKS_PER_BATCH * TICK_BATCHES}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return [_RangePartition(start["offset"], end["offset"])]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, i % 7, float(i) / 10.0)

    def commit(self, end: dict) -> None:
        pass


class TicksDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iws_ticks"

    def schema(self) -> str:
        return "tick bigint, bucket bigint, v double"

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _TicksStreamReader()


def _register_sources(spark: SparkSession) -> None:
    """Idempotent registration of both custom formats."""
    spark.dataSource.register(SeqDataSource)
    spark.dataSource.register(TicksDataSource)


@register(
    "q_source_python",
    oracle=f"""
    SELECT i, md5(CAST(i AS VARCHAR)) AS h
    FROM generate_series(0, {SEQ_ROWS - 1}) AS t(i)
    ORDER BY i
    """,
)
def q_source_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the custom Python batch source: 8 independent partitions
    generating (i, md5(i)) on executors; md5 parity with DuckDB gives
    the custom-source path an exact oracle."""
    _register_sources(spark)
    return (
        spark.read.format("iws_seq")
        .option("rows", str(SEQ_ROWS))
        .option("partitions", str(SEQ_PARTS))
        .load()
        .orderBy("i")
    )


@register(
    "q_source_python_stream",
    oracle=f"""
    SELECT bucket,
           COUNT(*) AS n_ticks,
           CAST(SUM(tick) AS BIGINT) AS sum_tick
    FROM (
      SELECT i AS tick, i % 7 AS bucket
      FROM generate_series(0, {TICKS_PER_BATCH * TICK_BATCHES - 1}) AS t(i)
    )
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q_source_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream from the custom Python micro-batch source (explicit
    offset management), aggregate per bucket, drain with availableNow
    — offsets are deterministic, so the final state has an exact
    oracle."""
    from iceberg_workshop_spark.streaming.stateful import _drain

    _register_sources(spark)
    ticks = spark.readStream.format("iws_ticks").load()
    agg = ticks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum("tick").alias("sum_tick"),
    )
    sink = _drain(agg, "complete")
    return sink.orderBy("bucket")
