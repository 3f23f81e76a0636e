"""SCD type-2 merge operator: unit semantics + fold equivalence.

The strong property: folding ``scd2_merge`` over a change log's date
batches must equal the one-shot windowed history build
(``scd2_customer_status_history``'s shape). If the incremental path and
the batch path ever disagree, the dimension silently forks.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from python_sql_etl_project_spark.load.scd import scd2_merge


def _updates(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "seg", "d"])
    return spark.createDataFrame(pdf)


def _state(df):
    return sorted(
        (r.k, r.seg, r.effective_from, r.effective_to, r.is_current)
        for r in df.collect()
    )


def test_first_batch_builds_intervals(spark):
    dim = scd2_merge(
        None,
        _updates(spark, [(1, "A", "d1"), (1, "B", "d2"), (2, "X", "d1")]),
        "k", ["seg"], "d",
    )
    assert _state(dim) == [
        (1, "A", "d1", "d2", 0),
        (1, "B", "d2", None, 1),
        (2, "X", "d1", None, 1),
    ]


def test_noop_update_leaves_dim_untouched(spark):
    dim = scd2_merge(None, _updates(spark, [(1, "A", "d1")]), "k", ["seg"], "d")
    dim2 = scd2_merge(
        dim, _updates(spark, [(1, "A", "d2")]), "k", ["seg"], "d"
    )
    assert _state(dim2) == [(1, "A", "d1", None, 1)]


def test_change_closes_old_and_opens_new(spark):
    dim = scd2_merge(None, _updates(spark, [(1, "A", "d1")]), "k", ["seg"], "d")
    dim2 = scd2_merge(
        dim, _updates(spark, [(1, "B", "d3")]), "k", ["seg"], "d"
    )
    assert _state(dim2) == [
        (1, "A", "d1", "d3", 0),
        (1, "B", "d3", None, 1),
    ]


def test_new_key_inserts_open_row(spark):
    dim = scd2_merge(None, _updates(spark, [(1, "A", "d1")]), "k", ["seg"], "d")
    dim2 = scd2_merge(
        dim, _updates(spark, [(2, "Z", "d2")]), "k", ["seg"], "d"
    )
    assert _state(dim2) == [
        (1, "A", "d1", None, 1),
        (2, "Z", "d2", None, 1),
    ]


def test_multi_change_batch_chains_intervals(spark):
    dim = scd2_merge(None, _updates(spark, [(1, "A", "d1")]), "k", ["seg"], "d")
    dim2 = scd2_merge(
        dim,
        _updates(spark, [(1, "A", "d2"), (1, "B", "d3"), (1, "C", "d4")]),
        "k", ["seg"], "d",
    )
    # the d2 'A' is a no-op continuation; B and C become chained versions
    assert _state(dim2) == [
        (1, "A", "d1", "d3", 0),
        (1, "B", "d3", "d4", 0),
        (1, "C", "d4", None, 1),
    ]


def test_new_key_with_null_tracked_value(spark):
    """A brand-new key whose tracked value is NULL must still insert (the
    left-join-miss null-match guard)."""
    dim = scd2_merge(None, _updates(spark, [(1, "A", "d1")]), "k", ["seg"], "d")
    dim2 = scd2_merge(
        dim, _updates(spark, [(2, None, "d2")]), "k", ["seg"], "d"
    )
    assert (2, None, "d2", None, 1) in _state(dim2)


@pytest.mark.slow
def test_fold_equals_one_shot_history(spark, sf_dir):
    """Folding scd2_merge over per-date order batches == the one-shot
    windowed build of scd2_customer_status_history."""
    from python_sql_etl_project_spark import registry
    from python_sql_etl_project_spark.session import read_table

    one_shot = registry.all_queries()["scd2_customer_status_history"](
        spark, sf_dir
    )
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderstatus").alias("seg"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        F.col("o_orderkey").alias("tb"),
    )
    dates = sorted(r.d for r in o.select("d").distinct().collect())
    # fold in 3 coarse batches (every date boundary would be 100s of
    # rounds; 3 covers dim=None, dim-nonempty, and multi-change batches)
    cuts = [dates[len(dates) // 3], dates[2 * len(dates) // 3], None]
    dim, lo = None, None
    for hi in cuts:
        batch = o
        if lo is not None:
            batch = batch.filter(F.col("d") >= lo)
        if hi is not None:
            batch = batch.filter(F.col("d") < hi)
        dim = scd2_merge(dim, batch, "k", ["seg"], "d", tiebreak="tb")
        dim = spark.createDataFrame(dim.toPandas())  # materialize each fold
        lo = hi
    got = sorted(
        (r.k, r.seg, r.effective_from, r.effective_to, r.is_current)
        for r in dim.collect()
    )
    want = sorted(
        (r.custkey, r.status, r.effective_from, r.effective_to, r.is_current)
        for r in one_shot.collect()
    )
    assert got == want
