"""JDBC warehouse mirror (S4 key scan + S5 SQL-sink append parity).

The reference's load layer talks to Postgres through SQLAlchemy: it reads
the existing primary keys (``/root/reference/src/load.py:13-14``) and
appends new rows with ``to_sql(..., if_exists='append')``
(``/root/reference/src/load.py:58``). This module is the Spark-native
mirror — the same :class:`~.incremental.Warehouse` contract (idempotent
PK-anti-join append, ordered load, failure isolation) over any JDBC
database instead of the parquet lake:

* **S4 key scan** → ``spark.read.jdbc`` with a pushed-down key-only
  projection: the database sends only the PK column, the executors never
  see a full row, and nothing is collected to the driver (unlike the
  reference's driver-side ``set`` of every key).
* **S5 append sink** → ``DataFrameWriter.jdbc(mode='append')``, which
  batches inserts per partition (``batchsize``) — the distributed
  equivalent of ``to_sql``.

Scale notes (100 TB posture): a JDBC source has no split metadata, so
Spark reads it as ONE partition unless told otherwise — pass
``num_partitions`` (with the PK as ``partitionColumn``) to fan the read
out across executors; writes parallelize per input partition already.
The integration tests run against embedded Apache Derby because its
driver ships inside Spark's own classpath — the code path is identical
for Postgres/MySQL given their driver jar.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

from .incremental import Warehouse

logger = logging.getLogger(__name__)

#: Embedded Derby — bundled with the Spark distribution (derby-*.jar on
#: the default classpath), so local-mode tests need no extra jars.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str) -> str:
    """Connection URL for an embedded Derby database at ``db_dir``
    (created on first use)."""
    return f"jdbc:derby:{db_dir};create=true"


class JdbcWarehouse(Warehouse):
    """The :class:`Warehouse` contract over a JDBC database.

    Storage primitives (``exists`` / ``read`` / ``existing_keys`` /
    ``_write``) are JDBC; the idempotent anti-join append, ordered load
    and per-table failure isolation are inherited unchanged — the load
    semantics do not care which sink they talk to.
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        driver: str = DERBY_DRIVER,
        num_partitions: int | None = None,
        batchsize: int = 10_000,
    ):
        super().__init__(spark, base_dir=url)
        self.url = url
        self.driver = driver
        self.num_partitions = num_partitions
        self.batchsize = batchsize

    # -- storage primitives -------------------------------------------------

    def _props(self) -> dict[str, str]:
        return {"driver": self.driver}

    def exists(self, table: str) -> bool:
        """JDBC 'table exists' = the schema query succeeds.

        ``spark.read.jdbc`` fetches only metadata at plan time (a
        ``SELECT * WHERE 1=0`` probe), so this costs one round-trip and
        zero rows.
        """
        try:
            self.spark.read.jdbc(self.url, table, properties=self._props())
            return True
        except Exception:
            return False

    def read(self, table: str) -> DataFrame:
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("driver", self.driver)
        )
        if self.num_partitions:
            from .incremental import PK_MAP

            pk = PK_MAP.get(table)
            if pk is not None:
                # Fan the scan out: executors issue range-bounded queries
                # on the PK instead of one session streaming every row.
                # Spark's JDBC writer quotes identifiers at CREATE time, so
                # the probe must quote them too (Derby/Postgres fold
                # unquoted names otherwise). Positional access — alias
                # case-folding differs per database.
                bounds = (
                    self.spark.read.jdbc(
                        self.url,
                        f'(SELECT min("{pk}") lo, max("{pk}") hi '
                        f"FROM {table}) b",
                        properties=self._props(),
                    ).first()
                )
                if bounds is not None and bounds[0] is not None:
                    reader = (
                        reader.option("partitionColumn", pk)
                        .option("lowerBound", int(bounds[0]))
                        .option("upperBound", int(bounds[1]) + 1)
                        .option("numPartitions", self.num_partitions)
                    )
        return reader.load()

    def existing_keys(self, table: str, pk: str) -> DataFrame | None:
        """Key-only scan, projection pushed to the database (S4)."""
        if not self.exists(table):
            return None
        return self.read(table).select(pk)

    def _write(self, df: DataFrame, table: str) -> None:
        """Append-mode JDBC write (S5): per-partition batched INSERTs;
        the table is created from the DataFrame schema on first write,
        mirroring ``to_sql(if_exists='append')``."""
        (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("driver", self.driver)
            .option("batchsize", str(self.batchsize))
            .mode("append")
            .save()
        )
