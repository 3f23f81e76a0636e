"""Incremental materialized rollup — the continuous-aggregate refresh.

The 100 TB pattern behind ``ts_hourly_rollup_gapfill``: a dashboard never
re-aggregates history. The rollup table is materialized once, and each
refresh aggregates ONLY the hours not yet present, appending them — the
same anti-join-then-append discipline as the row-level incremental load
(``load/incremental.py``), lifted to aggregate grain.

Closed-hour semantics: the *current* (maximum) event hour is never
materialized — events for it may still be arriving, and an appended
aggregate row is immutable. Each refresh therefore covers
``(last materialized hour, max complete hour]``; re-running with no new
data appends nothing (idempotent), and new landing data extends the
rollup forward without touching existing rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import read_table
from .incremental import Warehouse

ROLLUP_TABLE = "events_hourly_rollup"


def _hourly(events: DataFrame) -> DataFrame:
    return (
        events.select(
            F.date_trunc("hour", "ts").alias("hour"), "event_type", "value"
        )
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def refresh_hourly_rollup(
    spark: SparkSession, sf_dir: str, wh: Warehouse
) -> int:
    """Materialize hours missing from the rollup table; return how many
    (hour, event_type) rows were appended.

    Plan shape: the source scan is FILTERED to hours past the high-water
    mark before aggregation — at scale, with an hour/date-partitioned
    landing zone, that filter prunes partitions and the refresh cost is
    proportional to new data, not history. The high-water mark is a
    1-row aggregate of the (small) rollup table, joined as a broadcast
    filter, never collected.
    """
    events = read_table(spark, sf_dir, "events")
    # the current hour is still open — exclude it from materialization
    closed = events.agg(
        F.date_trunc("hour", F.max("ts")).alias("open_hour")
    )
    fresh = events.join(
        F.broadcast(closed),
        F.date_trunc("hour", F.col("ts")) < F.col("open_hour"),
    ).drop("open_hour")

    if wh.exists(ROLLUP_TABLE):
        hwm = wh.read(ROLLUP_TABLE).agg(F.max("hour").alias("hwm"))
        fresh = fresh.join(
            F.broadcast(hwm),
            F.date_trunc("hour", F.col("ts")) > F.col("hwm"),
        ).drop("hwm")

    new_rows = _hourly(fresh).persist()
    n = new_rows.count()
    if n:
        new_rows.write.mode("append").parquet(wh.path(ROLLUP_TABLE))
    new_rows.unpersist()
    return n
