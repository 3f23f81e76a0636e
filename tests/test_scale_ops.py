"""Scale-posture operators: salting, streaming incremental load."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from python_sql_etl_project_spark.load.incremental import Warehouse
from python_sql_etl_project_spark.operators.relational import salted_join
from python_sql_etl_project_spark.streaming.windows import stream_incremental_load

SF_DIR = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join semantics — only the shuffle layout."""
    # skewed fact: 90% of rows share nationkey 1 (the hot key)
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", F.when(F.col("c_custkey") % 10 < 9, 1).otherwise(
            F.col("c_nationkey")
        ).alias("c_nationkey")
    )
    n = spark.read.parquet(f"{SF_DIR}/nation.parquet").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    plain = c.join(n, "c_nationkey").select("c_custkey", "n_name")
    salted = salted_join(c, n, "c_nationkey", num_salts=8).select(
        "c_custkey", "n_name"
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_stream_incremental_load_is_idempotent(spark):
    """Replaying the whole stream must insert zero new rows."""
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_stream_"))
    first = stream_incremental_load(spark, SF_DIR, wh)
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert first == n_events
    # second replay: new checkpoint (fresh stream), same warehouse → all
    # rows hit the PK anti-join
    second = stream_incremental_load(spark, SF_DIR, wh)
    assert second == 0
    assert wh.read("events_wh").count() == n_events
