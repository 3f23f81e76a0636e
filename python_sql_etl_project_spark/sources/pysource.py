"""Custom Python data source (Spark 4 ``DataSource`` API).

The last extension surface the source matrix lacked: when a feed has no
built-in connector (an internal REST API, a message queue without a
Spark driver, a bespoke binary log), Spark 4 lets the connector be
written in PYTHON and registered like any format — partition planning
on the driver, per-partition generators on the executors, Arrow-batched
back into the JVM. This module ships a deterministic reference source
(`SyntheticDocsSource`) exercising the full lifecycle: options,
schema declaration, partition planning, and executor-side row
generation — the skeleton a real REST/queue connector drops its I/O
into.

The reference's closest analog is the provider-SDK fetch
(``/root/reference/src/extract.py:46-83``), which SURVEY §2.1 scopes to
a pluggable opener; this is the engine-grade version of that plug
point: the custom source parallelizes across executors instead of
streaming through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..registry import query

# Ship this module's classes BY VALUE when pickled: the streaming
# source's planner runs in a FRESH driver-side Python process spawned by
# the JVM (python_streaming_source_runner) whose import path is fixed at
# JVM launch — if the harness's working directory isn't the repo root,
# a by-reference pickle fails to re-import this module there (observed:
# drive_contract launched from /tmp). By-value pickling makes the
# source self-contained; neither addPyFile nor call-time PYTHONPATH
# reaches that process.
try:  # pragma: no cover - availability guard
    from pyspark import cloudpickle as _cp
    import sys as _sys

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; repo-cwd runs never need it
    pass

N_ROWS = 1000
N_PARTS = 8


class _Part(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    """Partition-parallel generator: each partition yields its own id
    range — rows are born distributed, never funneled through the
    driver (the property that separates a real connector from a
    ``createDataFrame`` of collected API pages)."""

    def __init__(self, n_rows: int, n_parts: int) -> None:
        self.n_rows = n_rows
        self.n_parts = n_parts

    def partitions(self) -> list[InputPartition]:
        step = -(-self.n_rows // self.n_parts)
        return [
            _Part(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Part):
        # executor-side; md5 matches the oracle's md5('doc:' || i)
        import hashlib

        for i in range(partition.start, partition.end):
            fp = hashlib.md5(f"doc:{i}".encode()).hexdigest()
            yield (i, fp, len(fp))


class SyntheticDocsSource(DataSource):
    """``spark.read.format("synthetic_docs")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "id bigint, fingerprint string, fp_len int"

    def reader(self, schema) -> SyntheticDocsReader:
        n_rows = int(self.options.get("n_rows", N_ROWS))
        n_parts = int(self.options.get("n_parts", N_PARTS))
        return SyntheticDocsReader(n_rows, n_parts)


@query(
    "src_python_datasource",
    oracle=f"""
    SELECT CAST(i AS BIGINT) AS id,
           md5('doc:' || i) AS fingerprint,
           CAST(32 AS INT) AS fp_len
    FROM range({N_ROWS}) t(i)
    """,
)
def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom-connector lifecycle end to end: register a Python
    ``DataSource``, read it as a named format, and hash-gate every
    generated row against an independent relational reconstruction.
    The source plans 8 partitions on the driver and generates rows on
    the executors (Arrow-batched into the JVM) — the scaling shape a
    REST/queue/bespoke-log connector needs at 100 TB, where the feed
    must enter the cluster already parallel. Registration is
    session-scoped and idempotent.
    """
    spark.dataSource.register(SyntheticDocsSource)
    return (
        spark.read.format("synthetic_docs")
        .option("n_rows", N_ROWS)
        .option("n_parts", N_PARTS)
        .load()
    )


STREAM_N = 600


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked Python streaming source: ``read(start)`` returns
    everything available past the start offset plus the new offset (the
    Kafka-consumer contract in miniature); ``readBetweenOffsets``
    regenerates any committed range deterministically, which is what
    makes checkpoint REPLAY exact — the engine may re-ask for a batch
    after recovery and must get bit-identical rows."""

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, lo: int, hi: int):
        import hashlib

        # list-backed iterator, NOT a generator: the engine's prefetch
        # cache copy.copy()s the iterator, which generators don't support
        return iter(
            [
                (i, fp, int(fp[:2], 16))
                for i in range(lo, hi)
                for fp in (hashlib.md5(f"evt:{i}".encode()).hexdigest(),)
            ]
        )

    def read(self, start: dict):
        pos = start["pos"]
        return (self._rows(pos, STREAM_N), {"pos": STREAM_N})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["pos"], end["pos"])


class SyntheticEventsStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return "id bigint, fingerprint string, bucket int"

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader()


@query(
    "strm_python_stream_source",
    oracle=f"""
    WITH rows_src AS (
        SELECT CAST(i AS BIGINT) AS id,
               md5('evt:' || i) AS fp
        FROM range({STREAM_N}) t(i)
    )
    SELECT CAST(strpos('0123456789abcdef', substring(fp, 2, 1)) - 1
                AS INT) AS bucket_mod,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(id) AS BIGINT) AS id_checksum
    FROM rows_src
    GROUP BY 1
    """,
)
def strm_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON STREAMING source (Spark 4 ``simpleStreamReader``) —
    the connector shape for feeds with no built-in stream driver (a
    REST poll loop, an internal queue): offset state lives in the
    checkpoint, ``read`` advances it, and ``readBetweenOffsets`` makes
    committed batches exactly replayable after recovery. The stream is
    drained with AvailableNow into a memory sink and censused by
    fingerprint bucket; the oracle regenerates the same rows
    relationally, so the hash gate proves offset-complete, duplicate-
    free delivery (count + id checksum per bucket).
    """
    import shutil
    import tempfile

    spark.dataSource.register(SyntheticEventsStreamSource)
    ck = tempfile.mkdtemp(prefix="ck_pysrc_")
    try:
        q = (
            spark.readStream.format("synthetic_events_stream")
            .load()
            .writeStream.format("memory")
            .queryName("strm_python_stream_source")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        # memory sink holds the rows; offsets/commits are dead after the
        # AvailableNow run — reclaim per invocation
        shutil.rmtree(ck, ignore_errors=True)
    from pyspark.sql import functions as F

    return (
        spark.table("strm_python_stream_source")
        .groupBy((F.col("bucket") % 16).alias("bucket_mod"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("id").cast("bigint").alias("id_checksum"),
        )
    )
