"""Direct equivalence tests for ``operators/ranking.py`` (round 8).

The five rewritten customer-grain queries are oracle-gated end-to-end,
but the helper is a shared primitive — pin its contract directly:

* ``sharded_global_running`` must be bit-identical to the naive
  unpartitioned window for ascending, descending and multi-value
  frames, on seam-stressing data (shard-straddling runs, duplicate sort
  keys across shards, a span forcing >1k shards);
* ``ntile_from_rank`` must reproduce Spark's native ``ntile`` for every
  n in a range crossing all remainder classes (n mod 4 ∈ {0,1,2,3} and
  n < k), and DuckDB's ``ntile`` on the same frames.

The sharded-plan tests pass ``small_frame_rows=None`` explicitly: the
test frames are small, so the round-9 runtime fast path would otherwise
silently replace the plan under test with the naive window. The fast
path has its own tests below (equality to the sharded plan, threshold
boundary in both directions, and plan-shape assertions both ways).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import Window
from pyspark.sql import functions as F

from python_sql_etl_project_spark.operators.ranking import (
    ntile_from_rank,
    sharded_global_running,
    sharded_global_row_number,
)


def _synthetic(spark):
    # duplicate sort keys across shard seams + a skewed value range
    rows = [(i, (i * 7) % 97, 1 + (i * 13) % 5) for i in range(5000)]
    rows += [(10_000 + i, 96, 3) for i in range(50)]  # heavy tied key
    return spark.createDataFrame(rows, "id bigint, v bigint, w bigint")


def test_running_sums_match_naive_window(spark):
    df = _synthetic(spark)
    got = sharded_global_running(
        df,
        F.expr("v div 8"),
        ["v", "id"],
        [(F.lit(1), "r"), (F.col("w"), "wsum")],
        small_frame_rows=None,
    )
    naive = Window.orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # grain: test-only naive reference
    want = df.select(
        "id",
        F.count(F.lit(1)).over(naive).alias("r"),
        F.sum("w").over(naive).alias("wsum"),
    )
    assert got.select("id", "r", "wsum").exceptAll(want).count() == 0
    assert want.exceptAll(got.select("id", "r", "wsum")).count() == 0


def test_desc_row_number_matches_naive_window(spark):
    df = _synthetic(spark)
    got = sharded_global_row_number(
        df, F.expr("v div 8"), [F.desc("v"), "id"], shard_desc=True,
        small_frame_rows=None,
    )
    naive = Window.orderBy(F.desc("v"), "id")
    # grain: test-only naive reference
    want = df.select("id", F.row_number().over(naive).alias("r"))
    assert got.select("id", "r").exceptAll(want).count() == 0
    assert want.exceptAll(got.select("id", "r")).count() == 0


def test_tiny_span_forces_many_shards(spark):
    df = _synthetic(spark)
    got = sharded_global_row_number(
        df, F.expr("id div 4"), ["id"], small_frame_rows=None
    )
    n_shards = df.select(F.expr("id div 4")).distinct().count()
    assert n_shards > 1000
    naive = Window.orderBy("id")  # grain: test-only naive reference
    want = df.select("id", F.row_number().over(naive).alias("r"))
    assert got.select("id", "r").exceptAll(want).count() == 0


def test_null_shard_key_raises_instead_of_dropping(spark):
    """ADVICE r8: a NULL shard key must raise, not silently lose the
    row through the inner offsets join."""
    import pytest

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id bigint, v bigint"
    )
    got = sharded_global_row_number(
        df, F.expr("v div 8"), ["v", "id"], small_frame_rows=None
    )
    with pytest.raises(Exception, match="NULL shard key"):
        got.collect()


def test_all_null_value_shard_does_not_null_later_prefixes(spark):
    """ADVICE r8: per-shard partials coalesce to 0, so an all-NULL
    shard's exclusive prefix carries through to later shards instead of
    poisoning them with NULL."""
    rows = [(1, 0, 5), (2, 10, None), (3, 20, 7)]  # shard 1 all-NULL w
    df = spark.createDataFrame(rows, "id bigint, v bigint, w bigint")
    got = {
        r["id"]: r["ws"]
        for r in sharded_global_running(
            df, F.expr("v div 10"), ["v", "id"], [(F.col("w"), "ws")],
            small_frame_rows=None,
        ).collect()
    }
    assert got[1] == 5 and got[3] == 12  # later shard carries 5, not NULL


def test_small_frame_fast_path_matches_sharded_plan(spark):
    """Round 9 (verdict item 7): when the runtime probe proves the frame
    fits one task, the helper must return the plain global window —
    value-identical to the sharded plan, with the census/offsets stages
    absent from the physical plan."""
    df = _synthetic(spark)
    fast = sharded_global_running(
        df,
        F.expr("v div 8"),
        ["v", "id"],
        [(F.lit(1), "r"), (F.col("w"), "wsum")],
        small_frame_rows=1_000_000,
    )
    sharded = sharded_global_running(
        df,
        F.expr("v div 8"),
        ["v", "id"],
        [(F.lit(1), "r"), (F.col("w"), "wsum")],
        small_frame_rows=None,
    )
    cols = ["id", "r", "wsum"]
    assert fast.select(*cols).exceptAll(sharded.select(*cols)).count() == 0
    assert sharded.select(*cols).exceptAll(fast.select(*cols)).count() == 0
    fast_plan = fast._jdf.queryExecution().executedPlan().toString()
    sharded_plan = sharded._jdf.queryExecution().executedPlan().toString()
    assert "_shard" not in fast_plan  # no census, no offsets join
    assert "_shard" in sharded_plan


def test_small_frame_threshold_boundary(spark):
    """probed <= threshold takes the fast path; probed > threshold takes
    the sharded plan (detected by plan shape); both produce the same
    ranks."""
    df = _synthetic(spark)  # exactly 5050 rows
    n = df.count()
    at = sharded_global_row_number(
        df, F.expr("v div 8"), ["v", "id"], small_frame_rows=n
    )
    below = sharded_global_row_number(
        df, F.expr("v div 8"), ["v", "id"], small_frame_rows=n - 1
    )
    assert "_shard" not in at._jdf.queryExecution().executedPlan().toString()
    assert "_shard" in below._jdf.queryExecution().executedPlan().toString()
    assert at.select("id", "r").exceptAll(below.select("id", "r")).count() == 0


def test_fast_path_null_sort_value_raises_like_sharded(spark):
    """ADVICE r9: the NULL-shard contract must fail at ANY scale — the
    fast path evaluates the same guard through its value columns, so a
    caller bug (nullable key, missing coalesce) can't pass every
    small-SF test and only surface above the threshold in production."""
    import pytest

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id bigint, v bigint"
    )
    got = sharded_global_row_number(
        df, F.expr("v div 8"), ["v", "id"], small_frame_rows=100
    )
    with pytest.raises(Exception, match="NULL shard key"):
        got.collect()


def test_null_values_treated_as_zero_on_both_paths(spark):
    """ADVICE r9: NULL values coalesce to 0 uniformly, so the fast and
    sharded paths agree even through an all-NULL region (previously the
    fast path carried the prior prefix while the sharded path yielded
    NULL inside an all-NULL shard — a size-dependent divergence)."""
    rows = [(1, 0, 5), (2, 10, None), (3, 20, 7)]  # shard 1 all-NULL w
    df = spark.createDataFrame(rows, "id bigint, v bigint, w bigint")
    for fast in (None, 1_000_000):
        got = {
            r["id"]: r["ws"]
            for r in sharded_global_running(
                df, F.expr("v div 10"), ["v", "id"], [(F.col("w"), "ws")],
                small_frame_rows=fast,
            ).collect()
        }
        assert got == {1: 5, 2: 5, 3: 12}, fast


def test_frame_fits_short_circuits_probe(spark):
    """ADVICE r9 (chained passes): frame_fits=True/False must pin the
    path with NO probe job over df, so callers probing once on a cheap
    persisted grain don't re-execute chained rank lineage."""
    from python_sql_etl_project_spark.operators.ranking import (
        frame_fits_one_task,
    )

    df = _synthetic(spark)
    assert frame_fits_one_task(df, 1_000_000) is True
    assert frame_fits_one_task(df, 10) is False
    assert frame_fits_one_task(df, 0) is False  # forced-sharded sentinel
    forced_fast = sharded_global_row_number(
        df, F.expr("v div 8"), ["v", "id"], frame_fits=True
    )
    forced_sharded = sharded_global_row_number(
        df, F.expr("v div 8"), ["v", "id"], frame_fits=False
    )
    fast_plan = forced_fast._jdf.queryExecution().executedPlan().toString()
    shard_plan = forced_sharded._jdf.queryExecution().executedPlan().toString()
    assert "_shard" not in fast_plan
    assert "_shard" in shard_plan
    cols = ["id", "r"]
    assert (
        forced_fast.select(*cols)
        .exceptAll(forced_sharded.select(*cols))
        .count()
        == 0
    )


def test_small_frame_threshold_env_read_at_call_time(spark, monkeypatch):
    """ADVICE r9: SPARK_GRAFT_SMALL_FRAME_ROWS must be honored at CALL
    time — setting it after import (as a probe harness does) switches
    the plan."""
    import python_sql_etl_project_spark.operators.ranking as rk

    df = _synthetic(spark)
    monkeypatch.setenv("SPARK_GRAFT_SMALL_FRAME_ROWS", "0")
    assert rk.default_small_frame_rows() == 0
    forced = sharded_global_row_number(df, F.expr("v div 8"), ["v", "id"])
    assert "_shard" in forced._jdf.queryExecution().executedPlan().toString()
    monkeypatch.setenv("SPARK_GRAFT_SMALL_FRAME_ROWS", "1000000")
    assert rk.default_small_frame_rows() == 1_000_000
    fast = sharded_global_row_number(df, F.expr("v div 8"), ["v", "id"])
    assert "_shard" not in fast._jdf.queryExecution().executedPlan().toString()


def test_sharded_running_property_vs_python_prefix(spark):
    """Hypothesis sweep: for arbitrary small frames (duplicate and
    NEGATIVE sort values — `div` truncates toward zero, which is still
    monotone nondecreasing, the shard contract), any span, and both
    paths (sharded / fast), the running count and running sum must
    equal a pure-Python prefix over the (v, id) total order — a
    reference independent of Spark's own window."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=-50, max_value=50),
                st.integers(min_value=0, max_value=9),
            ),
            min_size=1,
            max_size=40,
        ),
        span=st.sampled_from([1, 3, 8]),
        fast=st.sampled_from([None, 1_000_000]),
    )
    def check(rows, span, fast):
        data = [(i, v, w) for i, (v, w) in enumerate(rows)]
        df = spark.createDataFrame(data, "id bigint, v bigint, w bigint")
        got = sharded_global_running(
            df,
            F.expr(f"v div {span}"),
            ["v", "id"],
            [(F.lit(1), "r"), (F.col("w"), "ws")],
            small_frame_rows=fast,
        ).collect()
        order = sorted(data, key=lambda t: (t[1], t[0]))
        want_r = {t[0]: i + 1 for i, t in enumerate(order)}
        want_ws, cum = {}, 0
        for t in order:
            cum += t[2]
            want_ws[t[0]] = cum
        assert len(got) == len(data)
        for row in got:
            assert row["r"] == want_r[row["id"]], (span, fast, data)
            assert row["ws"] == want_ws[row["id"]], (span, fast, data)

    check()


def test_ntile_from_rank_rejects_non_identifier():
    import pytest

    for bad in ("r + 1", "n; DROP", "`r`", "", "1r"):
        with pytest.raises(ValueError, match="plain column name"):
            ntile_from_rank(bad, "n", 4)
    with pytest.raises(ValueError, match="positive int"):
        ntile_from_rank("r", "n", 0)


def test_ntile_matches_both_engines(spark):
    for n in (1, 2, 3, 4, 5, 7, 8, 101, 1000):
        rows = [(i + 1,) for i in range(n)]
        df = spark.createDataFrame(rows, "x bigint")
        w = Window.orderBy("x")  # grain: test-only native-ntile reference
        native = {
            r["x"]: r["t"]
            for r in df.select(
                "x", F.ntile(4).over(w).alias("t")
            ).collect()
        }
        derived = {
            r["x"]: r["t"]
            for r in df.select(
                "x",
                F.row_number().over(w).alias("r"),
            )
            .crossJoin(df.agg(F.count(F.lit(1)).alias("n")))
            .select("x", ntile_from_rank("r", "n", 4).alias("t"))
            .collect()
        }
        assert native == derived, f"spark ntile mismatch at n={n}"
        duck = dict(
            duckdb.sql(
                f"SELECT x, ntile(4) OVER (ORDER BY x) FROM "
                f"(SELECT unnest(range(1, {n + 1})) AS x)"
            ).fetchall()
        )
        assert {k: v for k, v in native.items()} == {
            int(k): int(v) for k, v in duck.items()
        }, f"duckdb ntile mismatch at n={n}"


def test_ntile_remainder_rule_property_vs_duckdb():
    """Engine-free property sweep: the pure remainder rule behind
    ``ntile_from_rank`` must match DuckDB's native ntile for every rank
    across a wide (n, k) grid covering all remainder classes, n < k,
    n = k, and large-n cases — pinning the arithmetic itself, not just
    the k=4 shapes the queries use."""

    def rule(r: int, n: int, k: int) -> int:
        q, rem = divmod(n, k)
        head = rem * (q + 1)
        if r <= head:
            return (r + q) // (q + 1)
        return rem + 1 + (r - head - 1) // q

    for n in (1, 2, 3, 4, 5, 6, 7, 8, 9, 15, 16, 17, 100, 101, 997):
        for k in (1, 2, 3, 4, 5, 7, 8, 16):
            duck = dict(
                duckdb.sql(
                    f"SELECT x, ntile({k}) OVER (ORDER BY x) FROM "
                    f"(SELECT unnest(range(1, {n + 1})) AS x)"
                ).fetchall()
            )
            for r in range(1, n + 1):
                assert rule(r, n, k) == duck[r], (n, k, r)
