"""Direct equivalence test for ``_sharded_running`` (round 7).

The four rewritten pack operators are already oracle-gated at three
SFs, but the helper is a shared primitive future operators will reuse —
so pin its contract directly: for every frame shape it supports
(id-ordered running sum, value-DESC running sum, ascending and
value-ordered row numbering), its output must be bit-identical to the
naive single ``Window.partitionBy(source)`` frame, on data built to
stress the shard seams (shard-boundary-straddling runs, duplicate sort
values across shards, sources of very different sizes, an empty-ish
source with a single row).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from python_sql_etl_project_spark.operators.sampling import (
    PACK_SHARD_SPAN,
    PACK_TOK_SPAN,
    _sharded_running,
)


def _synthetic(spark):
    # deterministic, seam-stressing layout: doc_ids straddle the 4096
    # shard span; n_tokens collide across shards (duplicate sort keys);
    # source sizes are wildly skewed (4000 / 300 / 1)
    rows = []
    for i in range(4000):
        rows.append((i * 3 + 1, "big", 1 + (i * 7) % 40))
    for i in range(300):
        rows.append((i * 37 + 5, "small", 1 + (i * 11) % 40))
    rows.append((9999999, "singleton", 17))
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, n_tokens bigint"
    )


def _assert_same(df, value, order_cols, shard, naive_order, **kw):
    got = _sharded_running(df, value, order_cols, shard, **kw).select(
        "doc_id", "source", "run"
    )
    naive_w = (
        Window.partitionBy("source")
        .orderBy(*naive_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select(
        "doc_id", "source", F.sum(value).over(naive_w).alias("run")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_id_ordered_running_sum(spark):
    df = _synthetic(spark)
    _assert_same(
        df,
        F.col("n_tokens"),
        ["doc_id"],
        F.expr(f"doc_id div {PACK_SHARD_SPAN}"),
        ["doc_id"],
    )


def test_value_desc_running_sum(spark):
    df = _synthetic(spark)
    _assert_same(
        df,
        F.col("n_tokens"),
        [F.desc("n_tokens"), "doc_id"],
        F.expr(f"n_tokens div {PACK_TOK_SPAN}"),
        [F.desc("n_tokens"), "doc_id"],
        shard_desc=True,
    )


def test_row_number_asc(spark):
    df = _synthetic(spark)
    _assert_same(
        df,
        F.lit(1),
        ["doc_id"],
        F.expr(f"doc_id div {PACK_SHARD_SPAN}"),
        ["doc_id"],
    )


def test_row_number_value_ordered(spark):
    df = _synthetic(spark)
    _assert_same(
        df,
        F.lit(1),
        ["n_tokens", "doc_id"],
        F.expr(f"n_tokens div {PACK_TOK_SPAN}"),
        ["n_tokens", "doc_id"],
    )


def test_tiny_span_thousands_of_shards(spark):
    """The documented offsets-frame bound (N/span rows per source) is a
    SIZE bound, not a correctness condition: force >1k shards with a
    pathologically tiny span (doc_id div 8 over ids spanning ~12000) and
    the output must still be bit-identical to the naive window."""
    df = _synthetic(spark)
    _assert_same(
        df,
        F.col("n_tokens"),
        ["doc_id"],
        F.expr("doc_id div 8"),
        ["doc_id"],
    )
    n_shards = df.select(
        "source", F.expr("doc_id div 8").alias("s")
    ).distinct().count()
    assert n_shards > 1000
