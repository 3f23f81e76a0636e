"""Incremental idempotent load (replaces ``/root/reference/src/load.py``).

The reference pulls every warehouse PK into a driver-side Python set and
filters with ``isin`` (``load.py:13-15,51``) — O(warehouse) driver memory,
the single worst 100 TB anti-pattern in the source system. Here the same
semantics are a distributed ``left_anti`` join against a key-only scan of
the target table: the planner broadcasts the smaller side or shuffles on
the key, the driver never sees a row.

Warehouse format: parquet directories (one per table) under a base dir —
the fact table partitioned by order date so the report queries get
partition pruning. :mod:`.jdbc` provides the JDBC mirror (S4/S5 parity):
the same contract with JDBC storage primitives.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import anti_join

logger = logging.getLogger(__name__)

#: Table → primary key (``/root/reference/src/load.py:30-36``).
PK_MAP = {
    "dim_sedes": "id_sede",
    "dim_tipo_transaccion": "id_tipo_trx",
    "dim_distribuidores": "id_distribuidor",
    "dim_clientes": "id_cliente",
    "fct_transacciones": "id_trx",
}

#: Fact tables get date partitioning → dynamic partition pruning for the
#: report queries (SURVEY §7.2 step 4).
PARTITION_MAP = {"fct_transacciones": ("fecha_trx", "_fecha_dt")}


@dataclass
class LoadResult:
    table: str
    inserted: int
    ignored: int
    ok: bool


class Warehouse:
    """Parquet warehouse rooted at ``base_dir``."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir

    def path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def exists(self, table: str) -> bool:
        """Parquet 'table exists' = committed files under the table root.

        Partitioned tables keep their data files under partition
        subdirectories, so check the _SUCCESS commit marker first and fall
        back to a recursive scan.
        """
        p = self.path(table)
        if not os.path.isdir(p):
            return False
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            return True
        for _, _, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def read(self, table: str) -> DataFrame:
        df = self.spark.read.parquet(self.path(table))
        part = PARTITION_MAP.get(table)
        if part and part[1] in df.columns:
            df = df.drop(part[1])
        return df

    def existing_keys(self, table: str, pk: str) -> DataFrame | None:
        """Key-only scan of the target (S4 analog: ``SELECT pk FROM t``,
        ``/root/reference/src/load.py:13``) — column-pruned at the parquet
        footer, distributed, never collected."""
        if not self.exists(table):
            return None
        return self.spark.read.parquet(self.path(table)).select(pk)

    def incremental_append(self, df: DataFrame, table: str) -> LoadResult:
        """PK-idempotent append (``/root/reference/src/load.py:20-68``).

        1. key-only scan of existing rows (missing table → everything new)
        2. distributed left-anti join on the PK
        3. append-mode parquet write (fact: date-partitioned)

        Single-writer assumption as in the reference (daily batch); a
        concurrent-writer warehouse would use Delta MERGE instead.
        """
        try:
            pk = PK_MAP.get(table)
            if pk is None:
                logger.warning("table %s has no PK mapping; direct append", table)
                self._write(df, table)
                return LoadResult(table, -1, 0, True)

            existing = self.existing_keys(table, pk)
            new_rows = df if existing is None else anti_join(df, existing, pk)

            # Persist so the reported count and the write observe ONE
            # materialization of the anti-join — without it the plan runs
            # twice and a nondeterministic source could make the count
            # disagree with what was actually written.
            new_rows = new_rows.persist()
            try:
                inserted = new_rows.count()
                total = df.count()
                if inserted:
                    self._write(new_rows, table)
            finally:
                new_rows.unpersist()
            return LoadResult(table, inserted, total - inserted, True)
        except Exception:
            logger.exception("incremental load failed for %s", table)
            return LoadResult(table, 0, 0, False)

    def _write(self, df: DataFrame, table: str) -> None:
        part = PARTITION_MAP.get(table)
        writer = df.write.mode("append")
        if part is not None:
            src, part_col = part
            df = df.withColumn(part_col, F.to_date(F.col(src)))
            writer = df.write.mode("append").partitionBy(part_col)
        writer.parquet(self.path(table))

    def load_ordered(self, tables: dict[str, DataFrame]) -> list[LoadResult]:
        """Ordered load with per-table failure isolation
        (``/root/reference/src/main.py:72-94``): parent dims → child dim →
        fact; one failing table doesn't stop the rest."""
        results = []
        for name, df in tables.items():
            if df.isEmpty():
                logger.info("table %s: source empty, skipping", name)
                results.append(LoadResult(name, 0, 0, True))
                continue
            results.append(self.incremental_append(df, name))
        return results

    def register_views(self) -> None:
        for table in PK_MAP:
            if self.exists(table):
                self.read(table).createOrReplaceTempView(table)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and sorted) by its join key.

    Bucketing pre-shuffles data at WRITE time: two tables bucketed on the
    same key with the same bucket count join with NO exchange and (if
    sorted) no sort — the join cost a repeated fact⋈fact query pays once
    instead of per query. This is the co-located-join strategy for keys
    too large to broadcast; at 100 TB it's the difference between a
    full-cluster shuffle per join and a local merge per bucket.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)
