"""Custom Python data source (Spark 4 DataSource API): a deterministic
server-metrics generator, batch AND streaming.

This is the in-repo, broker-less stand-in for the reference's Kafka
producer (reference producer/producer.py — random psutil-style metrics
pushed to a topic): the same (server, cpu, mem) record stream, but
generated inside Spark's own source API so the whole ingest path runs
and is testable with no external service. Where the reference relies on
``random``, this source derives every field from the row index through
an LCG hash (glibc constants), so any row range is reproducible on any
executor — the property that makes the batch query ORACLE-checkable
(DuckDB ``range()`` replays the formula) and the streaming side
exactly-once under replay (re-reading offsets [a, b) regenerates
byte-identical rows).

Scale: ``partitions()`` splits the row range, so N executors generate
in parallel with zero coordination; a Python data source runs in Python
workers (the documented slow path), which is the honest trade for a
custom source — real deployments swap this class for the JVM Kafka
connector, and everything downstream of ``load()`` is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SERVER_METRICS_SCHEMA = (
    "event_id BIGINT, server_id INT, ts_offset BIGINT, cpu_pct DOUBLE, mem_pct DOUBLE"
)

# glibc rand() LCG constants — public-domain arithmetic, exact in int64
# and replayable as BIGINT math in any SQL engine (the oracle contract).
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 1 << 31


def metrics_row(i: int, n_servers: int) -> tuple:
    """Row ``i`` of the deterministic stream. Integer ops only until the
    final /100.0 (an exact IEEE division of a small int), so Python,
    Spark and DuckDB produce bit-identical doubles."""
    h = (i * _LCG_A + _LCG_C) % _LCG_M
    return (
        i,
        i % n_servers,
        i // n_servers,
        (h % 10000) / 100.0,
        ((h // 10000) % 10000) / 100.0,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


def _opts(options) -> tuple[int, int, int]:
    n_rows = int(options.get("n_rows", 10_000))
    n_servers = int(options.get("n_servers", 50))
    rows_per_part = int(options.get("rows_per_partition", 4096))
    # Fail at PLANNING time with the option named — a bad option must not
    # surface as a ZeroDivisionError/ValueError inside a Python worker.
    if n_rows < 0:
        raise ValueError(f"server_metrics: n_rows must be >= 0, got {n_rows}")
    if n_servers < 1:
        raise ValueError(f"server_metrics: n_servers must be >= 1, got {n_servers}")
    if rows_per_part < 1:
        raise ValueError(
            f"server_metrics: rows_per_partition must be >= 1, got {rows_per_part}"
        )
    return n_rows, n_servers, rows_per_part


class _MetricsBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows, self.n_servers, self.rows_per_part = _opts(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _RangePartition(s, min(s + self.rows_per_part, self.n_rows))
            for s in range(0, self.n_rows, self.rows_per_part)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield metrics_row(i, self.n_servers)


class _MetricsStreamReader(DataSourceStreamReader):
    """Micro-batch reader over the same row space: offsets are row
    indices, each trigger advances by ``batch_rows`` until ``n_rows`` is
    exhausted. Offset ranges are half-open and derived purely from the
    index, so replaying a committed range after restart regenerates the
    identical rows — exactly-once composes with any idempotent sink."""

    def __init__(self, options) -> None:
        self.n_rows, self.n_servers, self.rows_per_part = _opts(options)
        self.batch_rows = int(options.get("batch_rows", 1000))
        self._current = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        self._current = min(self._current + self.batch_rows, self.n_rows)
        return {"index": self._current}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["index"]), int(end["index"])
        self._current = max(self._current, hi)
        return [
            _RangePartition(s, min(s + self.rows_per_part, hi))
            for s in range(lo, hi, self.rows_per_part)
        ] or [_RangePartition(lo, hi)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield metrics_row(i, self.n_servers)

    def commit(self, end: dict) -> None:
        pass


class ServerMetricsDataSource(DataSource):
    """``spark.read.format("server_metrics")`` /
    ``spark.readStream.format("server_metrics")`` after registration.

    Options: ``n_rows`` (total stream length), ``n_servers``,
    ``rows_per_partition`` (generation parallelism), ``batch_rows``
    (streaming rows per trigger)."""

    @classmethod
    def name(cls) -> str:
        return "server_metrics"

    def schema(self) -> str:
        return SERVER_METRICS_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _MetricsBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _MetricsStreamReader(self.options)


def register_server_metrics(spark) -> None:
    """Idempotent registration (re-registering overwrites, by API design)."""
    spark.dataSource.register(ServerMetricsDataSource)
