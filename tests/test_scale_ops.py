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


def test_stateful_profile_accumulates_across_micro_batches(spark):
    """GroupState must carry across batches: feed the stream 4 files with
    maxFilesPerTrigger=1 (4 micro-batches) and check the FINAL emitted
    profile per user equals the all-data batch aggregate."""
    import os

    from python_sql_etl_project_spark.streaming.windows import (
        _run_to_table,
        stream_events,
        user_profile_stream,
    )

    landing = tempfile.mkdtemp(prefix="events_multi_")
    # re-written files keep whatever physical ts type the batch read
    # surfaces — stream_events derives its schema from the files, so the
    # landing dir always matches; 4 output files → 4 micro-batches
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(4).write.mode(
        "overwrite"
    ).parquet(landing)
    n_files = len([f for f in os.listdir(landing) if f.endswith(".parquet")])
    assert n_files == 4

    ev = stream_events(spark, SF_DIR, landing_dir=landing, max_files_per_trigger=1)
    out = _run_to_table(
        spark, user_profile_stream(ev), "test_multibatch_profile", "update"
    )
    # update-mode memory sink appends one row per (batch, user); the
    # final state per user is the row with the highest n_events
    final = (
        out.groupBy("user_id")
        .agg(
            F.max(F.struct("n_events", "total_value", "max_value")).alias("s")
        )
        .select("user_id", "s.n_events", "s.total_value", "s.max_value")
    )
    expected = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
           for r in final.collect()}
    want = {r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
            for r in expected.collect()}
    assert got == want
    # multi-batch actually happened: some user must appear in >1 update
    multi = out.groupBy("user_id").count().filter(F.col("count") > 1).count()
    assert multi > 0


def test_fact_table_partition_pruning(spark, tmp_path):
    """A date-filtered query on the partitioned fact table must prune
    partitions at plan time (dynamic/static partition pruning is the
    payoff of date-partitioning the fact — SURVEY §7.2 step 4)."""
    from python_sql_etl_project_spark.plans.star_schema import build_star_schema
    from python_sql_etl_project_spark.sources.ingest import spark_df_from_pandas

    from . import fixtures

    tables = build_star_schema(
        spark_df_from_pandas(spark, fixtures.clientes_pdf()),
        spark_df_from_pandas(spark, fixtures.transacciones_pdf()),
        spark_df_from_pandas(spark, fixtures.varios_pdf_normal()),
        spark_df_from_pandas(spark, fixtures.recomendados_records()),
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.load_ordered(tables)
    fct = wh.read("fct_transacciones")
    one_day = fct.filter(F.col("_fecha_dt") == "2025-06-10")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "_fecha_dt" in plan.split("PartitionFilters")[1][:200]
    assert one_day.count() >= 0  # pruned plan executes


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key must join without any shuffle
    (no Exchange operators in the physical plan) — the write-time
    co-location payoff of write_bucketed."""
    from python_sql_etl_project_spark.load.incremental import write_bucketed

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(o, "bt_orders", "o_orderkey", num_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bt_lineitem",
        "o_orderkey",
        num_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # test tables are tiny → the planner would broadcast and skip the
        # bucketed path entirely; force the sort-merge regime bucketing
        # exists for (at real scale both sides exceed any threshold)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("bt_orders")
            .join(spark.table("bt_lineitem"), "o_orderkey")
            .select("o_orderkey", "o_totalprice", "l_extendedprice")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # sanity: the join actually produces rows
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed aggregation must drop events that arrive
    after the watermark has passed their window — the bounded-state
    guarantee every 100 TB stream relies on."""
    import os
    import time

    from pyspark.sql import types as T

    from python_sql_etl_project_spark.streaming.windows import (
        _run_to_table,
        stream_events,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    NS = 1_000_000_000
    DAY = 86400 * NS

    def write_batch(name, rows):
        import glob
        import shutil

        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.LongType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
        # the file source monitors the landing dir non-recursively: stage
        # the write, then move the part file in as a single flat file
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.move(part, f"{landing}/{name}.parquet")

    # batch 1: three day-1 events and one day-3 event (advances the
    # watermark far past day-1's window end)
    write_batch(
        "b1",
        [
            (1, 1 * DAY + 10, 1, "view", 1.0, "{}"),
            (2, 1 * DAY + 20, 1, "view", 1.0, "{}"),
            (3, 1 * DAY + 30, 1, "view", 1.0, "{}"),
            (4, 3 * DAY + 10, 1, "view", 1.0, "{}"),
        ],
    )
    time.sleep(1.1)  # file source orders batches by modification time
    # batch 2: fresh data only — its end-of-batch eviction pass closes
    # and emits the day-1 window (watermark passed its end after batch 1)
    write_batch("b2", [(5, 3 * DAY + 20, 1, "view", 1.0, "{}")])
    time.sleep(1.1)
    # batch 3: one LATE day-1 event — its window's state is already
    # evicted and its event time is behind the watermark → dropped
    write_batch(
        "b3",
        [
            (6, 1 * DAY + 40, 1, "view", 1.0, "{}"),
            (7, 3 * DAY + 30, 1, "view", 1.0, "{}"),
        ],
    )

    ev = stream_events(
        spark, SF_DIR, landing_dir=landing, max_files_per_trigger=1
    ).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").cast("long").alias("ws"), "n")
    )
    out = _run_to_table(spark, agg, "test_watermark_drop", "append")
    rows = {r["ws"]: r["n"] for r in out.collect()}
    # day-1 window closed after batch 1 with exactly the 3 on-time
    # events; the late 4th arrival in batch 2 was dropped
    assert rows.get(86400) == 3, rows


def test_single_shuffle_window_queries(spark, sf_dir):
    """The key-partitioned window queries promise ONE shuffle end to end
    (both window scans and the final aggregate reuse the same hash
    partitioning) — if a refactor introduces a second Exchange, the
    scale posture silently regresses."""
    from python_sql_etl_project_spark import registry

    qs = registry.all_queries()
    for name in ("scd2_customer_status_history", "win_sessionize_events"):
        plan = (
            qs[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_exchanges = plan.count("Exchange")
        assert n_exchanges == 1, f"{name}: {n_exchanges} exchanges\n{plan}"


def test_corpus_curation_single_scan(spark, sf_dir):
    """pipe_corpus_curation's whole value is FUSION: gate + fingerprint +
    split assignment must all ride the one documents scan, with shuffles
    only for the dedup window and the final audit aggregate. A refactor
    that materializes a stage would show up here as a second scan."""
    from python_sql_etl_project_spark import registry

    spark.catalog.clearCache()  # a cached input would mask the scan count
    qs = registry.all_queries()
    plan = (
        qs["pipe_corpus_curation"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_scans = plan.count("Scan parquet")
    assert n_scans == 1, f"{n_scans} scans (stage got materialized?)\n{plan}"
    n_exchanges = plan.count("Exchange")
    # repartition (read_table_parallel) + window-by-fingerprint + final agg
    assert n_exchanges <= 3, f"{n_exchanges} exchanges\n{plan}"


def test_graph_edge_build_no_self_join(spark, sf_dir):
    """The co-purchase edge list comes from collect_set + double-explode:
    ONE lineitem scan and ONE shuffle (on l_orderkey) before the
    distinct — never a lineitem⋈lineitem self-join (two scans)."""
    from python_sql_etl_project_spark.operators.graph import _copurchase_pairs

    spark.catalog.clearCache()  # a cached input would mask the scan count

    plan = (
        _copurchase_pairs(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan


def test_session_window_merges_across_micro_batches(spark, tmp_path):
    """F.session_window state must MERGE across micro-batches: a session
    whose events arrive in two different batches (within the gap) must
    come out as ONE merged session identical to the all-data batch
    answer — the stateful-merge guarantee sessionization at scale rides
    on."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import types as T

    from python_sql_etl_project_spark.streaming.windows import (
        SESSION_GAP,
        _run_to_table,
        stream_events,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    US = 1_000_000
    MIN = 60 * US
    BASE = 1_700_000_000 * US  # epoch µs

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def write_batch(name, rows):
        stage = str(tmp_path / f"stage_{name}")
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.timestamp_micros("ts")
        )
        df.coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.move(part, f"{landing}/{name}.parquet")

    # batch 1: two events 10 min apart (one open session for user 1)
    write_batch(
        "b1",
        [
            (1, BASE, 1, "view", 1.0, "{}"),
            (2, BASE + 10 * MIN, 1, "view", 2.0, "{}"),
        ],
    )
    time.sleep(1.1)  # file source orders batches by modification time
    # batch 2: a third event 10 min later — within the 30-min gap, so it
    # must MERGE into the batch-1 session, not open a new one; plus a
    # second user far away (independent session)
    write_batch(
        "b2",
        [
            (3, BASE + 20 * MIN, 1, "view", 4.0, "{}"),
            (4, BASE + 500 * MIN, 2, "view", 8.0, "{}"),
        ],
    )

    ev = stream_events(
        spark, SF_DIR, landing_dir=landing, max_files_per_trigger=1
    ).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").cast("long").alias("s"),
            "n_events",
            "total_value",
        )
    )
    out = _run_to_table(spark, agg, "test_session_merge", "complete")
    rows = {r.user_id: r for r in out.collect()}
    assert len(rows) == 2
    # user 1: ONE merged session spanning all three events
    assert rows[1].n_events == 3
    assert rows[1].total_value == 7.0
    assert rows[1].s == BASE // 1_000_000
    # user 2: independent single-event session
    assert rows[2].n_events == 1


def test_incremental_rollup_refresh(spark, tmp_path):
    """Continuous-aggregate refresh: first run materializes all closed
    hours, a re-run appends nothing, new landing data extends the rollup
    forward only — and the final table equals the from-scratch aggregate
    over the same closed span (history rows untouched and correct)."""
    import shutil

    from python_sql_etl_project_spark.load.rollup import (
        ROLLUP_TABLE,
        refresh_hourly_rollup,
    )
    from python_sql_etl_project_spark.session import read_table

    # stage a mutable copy of the events table AS A DIRECTORY (the
    # testdata ships a single file; Spark appends need a dir target)
    sf = str(tmp_path / "sf")
    import os as _os

    _os.makedirs(f"{sf}/events.parquet")
    shutil.copy(
        f"{SF_DIR}/events.parquet", f"{sf}/events.parquet/part-00000.parquet"
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    first = refresh_hourly_rollup(spark, sf, wh)
    assert first > 0
    # idempotent: nothing new → nothing appended
    assert refresh_hourly_rollup(spark, sf, wh) == 0

    # append future events: two new closed hours + one open hour
    ev = read_table(spark, sf, "events")
    mx = ev.agg(F.max("ts")).first()[0]
    new = spark.createDataFrame(
        [
            (90001, None, 1, "late", 5.0, "{}"),
            (90002, None, 2, "late", 7.0, "{}"),
            (90003, None, 3, "late", 9.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).withColumn(
        "ts",
        F.lit(mx).cast("timestamp")
        + F.when(F.col("event_id") == 90001, F.expr("interval 1 hour"))
        .when(F.col("event_id") == 90002, F.expr("interval 2 hour"))
        .otherwise(F.expr("interval 3 hour")),
    )
    new.coalesce(1).write.mode("append").parquet(f"{sf}/events.parquet")

    second = refresh_hourly_rollup(spark, sf, wh)
    assert second > 0

    # ground truth: from-scratch aggregate over all CLOSED hours
    ev2 = read_table(spark, sf, "events")
    open_hour = ev2.agg(F.date_trunc("hour", F.max("ts"))).first()[0]
    truth = (
        ev2.filter(F.date_trunc("hour", F.col("ts")) < F.lit(open_hour))
        .select(F.date_trunc("hour", "ts").alias("hour"), "event_type", "value")
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    got = wh.read(ROLLUP_TABLE)
    assert got.count() == truth.count()
    assert got.exceptAll(truth).count() == 0
    assert truth.exceptAll(got).count() == 0


def test_rollup_reconcile_detects_late_data(spark, tmp_path):
    """Late events below the high-water mark are invisible to the
    hwm-gated refresh (by design) but must surface in the reconciliation
    drift report, pinpointing exactly the drifted (hour, event_type)."""
    import shutil

    from python_sql_etl_project_spark.load.rollup import (
        refresh_hourly_rollup,
        reconcile_hourly_rollup,
    )
    from python_sql_etl_project_spark.session import read_table

    sf = str(tmp_path / "sf")
    import os as _os

    _os.makedirs(f"{sf}/events.parquet")
    shutil.copy(
        f"{SF_DIR}/events.parquet", f"{sf}/events.parquet/part-00000.parquet"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert refresh_hourly_rollup(spark, sf, wh) > 0
    # clean state: reconciliation over the full materialized span is empty
    assert reconcile_hourly_rollup(spark, sf, wh, last_hours=10**6).count() == 0

    # a LATE event lands 2 hours below the hwm — refresh must ignore it,
    # reconcile must flag exactly that one (hour, event_type) row
    ev = read_table(spark, sf, "events")
    mx = ev.agg(F.max("ts")).first()[0]
    late = spark.createDataFrame(
        [(91001, None, 4, "purchase", 11.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).withColumn(
        "ts", F.lit(mx).cast("timestamp") - F.expr("interval 2 hours")
    )
    late.coalesce(1).write.mode("append").parquet(f"{sf}/events.parquet")

    assert refresh_hourly_rollup(spark, sf, wh) == 0
    drift = reconcile_hourly_rollup(spark, sf, wh, last_hours=6).toPandas()
    assert len(drift) == 1
    row = drift.iloc[0]
    assert row["event_type"] == "purchase"
    import pandas as pd

    stored_n = (
        0 if pd.isna(row["n_events_stored"]) else int(row["n_events_stored"])
    )
    assert int(row["n_events_actual"]) == stored_n + 1


def test_decode_image_raises_cleanly_without_codec():
    """The decode boundary is explicit: no codec → NotImplementedError
    with an actionable message (never a bare ImportError surprise)."""
    import pytest

    from python_sql_etl_project_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("codec present — covered by test_decode_image_via_pillow")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="codec|Pillow|opaque"):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_decode_image_via_pillow():
    """Real decode path, exercised wherever Pillow exists (skipped in
    codec-less containers): a generated 1-pixel PNG round-trips to its
    true dimensions."""
    import io

    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")

    from python_sql_etl_project_spark.operators.multimodal import decode_image

    buf = io.BytesIO()
    PIL_Image.new("RGB", (3, 2)).save(buf, format="PNG")
    assert decode_image(buf.getvalue()) == (3, 2)


def test_shared_shingle_stage_parity(spark, monkeypatch):
    """SPARK_GRAFT_SHARED_SHINGLES=1 memoizes the shingle stage per
    (session, sf_dir) — results must be identical to the cold path and
    the second call must reuse the exact same DataFrame object."""
    from python_sql_etl_project_spark.operators import dedup

    cold = dedup.dd_shingle_jaccard_pairs(spark, SF_DIR).collect()

    monkeypatch.setenv("SPARK_GRAFT_SHARED_SHINGLES", "1")
    dedup._SHINGLE_MEMO.clear()
    try:
        warm1 = dedup.shingles(spark, SF_DIR)
        warm2 = dedup.shingles(spark, SF_DIR)
        assert warm1 is warm2
        shared = dedup.dd_shingle_jaccard_pairs(spark, SF_DIR).collect()
    finally:
        dedup._SHINGLE_MEMO.clear()
    assert sorted(map(tuple, cold)) == sorted(map(tuple, shared))


def test_compact_parquet_reduces_files_losslessly(spark, tmp_path):
    """Compaction must hit the exact predicted file count and keep every
    row (the small-files pathology → scan-bandwidth regime)."""
    from python_sql_etl_project_spark.load.layout import compact_parquet

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n = li.count()
    small = str(tmp_path / "small")
    li.repartition(32).write.parquet(small)
    res = compact_parquet(
        spark, small, str(tmp_path / "big"), target_rows_per_file=2000
    )
    assert res.files_before == 32
    assert res.files_after == -(-n // 2000)
    assert res.rows == n
    assert spark.read.parquet(str(tmp_path / "big")).count() == n


def test_compact_parquet_by_bytes(spark, tmp_path):
    from python_sql_etl_project_spark.load.layout import (
        compact_parquet,
        list_data_files,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    small = str(tmp_path / "small")
    li.repartition(32).write.parquet(small)
    total = sum(sz for _, sz in list_data_files(spark, small))
    res = compact_parquet(
        spark, small, str(tmp_path / "big"), target_file_bytes=total // 4 + 1
    )
    assert res.files_after <= 4 < res.files_before
    assert res.rows == li.count()


def test_zorder_layout_tightens_per_file_ranges(spark, tmp_path):
    """Z-order writing must cluster BOTH interleaved dimensions: the mean
    per-file min/max span of each key has to shrink vs a round-robin
    layout — that span is exactly what parquet row-group stats prune by."""
    from python_sql_etl_project_spark.load.layout import morton_col, zorder_write

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .withColumn(
            "zval",
            morton_col(F.col("l_orderkey") % 256, F.col("l_partkey") % 256, 8),
        )
    )
    zdir, ndir = str(tmp_path / "z"), str(tmp_path / "n")
    zorder_write(li, "zval", zdir, n_files=32)
    li.repartition(32).write.parquet(ndir)

    def mean_span(path: str, col: str) -> float:
        per_file = (
            spark.read.parquet(path)
            .withColumn("c", F.col(col) % 256)
            .groupBy(F.input_file_name())
            .agg((F.max("c") - F.min("c")).alias("span"))
        )
        return per_file.agg(F.avg("span")).first()[0]

    for key in ("l_orderkey", "l_partkey"):
        z_span, n_span = mean_span(zdir, key), mean_span(ndir, key)
        # round-robin files see ~the whole 0..255 range; z-ordered files
        # must cover well under half of it on BOTH dimensions
        assert z_span < 0.5 * n_span, (key, z_span, n_span)


def test_morton_sql_matches_morton_col(spark):
    """The generated SQL text and the Column expression come from the
    same loop — pin that they agree on real keys."""
    from python_sql_etl_project_spark.load.layout import morton_col, morton_sql

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(500)
    via_col = li.select(
        morton_col(F.col("l_partkey") % 64, F.col("l_suppkey") % 64, 6).alias("z")
    )
    via_sql = li.selectExpr(
        f"CAST({morton_sql('l_partkey % 64', 'l_suppkey % 64', 6)} AS BIGINT) AS z"
    )
    assert via_col.collect() == via_sql.collect()


def test_bloom_has_no_false_negatives(spark):
    """Every true member must pass the Bloom probe — the invariant that
    makes the prefilter safe in front of any equi-join."""
    from python_sql_etl_project_spark.operators.sketch import (
        _pos_sql,
        bloom_build,
    )

    keys = (
        spark.read.parquet(f"{SF_DIR}/supplier.parquet")
        .filter("s_nationkey < 5")
        .select(F.col("s_suppkey").alias("k"))
        .distinct()
    )
    bloom = bloom_build(keys, "k", spark)
    probes = keys.selectExpr(
        "k",
        f"CAST({_pos_sql('k', 0, 'STRING')} AS BIGINT) AS pos0",
        f"CAST({_pos_sql('k', 1, 'STRING')} AS BIGINT) AS pos1",
    )
    g0 = bloom.select(F.col("idx").alias("idx0"), F.col("w").alias("w0"))
    g1 = bloom.select(F.col("idx").alias("idx1"), F.col("w").alias("w1"))
    missed = (
        probes.withColumn("idx0", F.floor(F.col("pos0") / 64).cast("int"))
        .withColumn("idx1", F.floor(F.col("pos1") / 64).cast("int"))
        .join(g0, "idx0")
        .join(g1, "idx1")
        .filter(
            ~F.expr(
                "(shiftright(w0, CAST(pos0 % 64 AS INT)) & 1) = 1 "
                "AND (shiftright(w1, CAST(pos1 % 64 AS INT)) & 1) = 1"
            )
        )
        .count()
    )
    assert missed == 0


def test_bloom_audit_query_invariants(spark):
    """The registered audit row must show pass ⊇ truth and a small
    false-positive sliver (m=4096 over a few dozen keys)."""
    from python_sql_etl_project_spark import registry

    registry.load_all()
    row = registry.QUERIES["flt_bloom_prefilter"](spark, SF_DIR).first()
    assert row.n_pass_bloom == row.n_true_match + row.n_false_pos
    assert row.n_true_match > 0
    assert row.n_false_pos < 0.05 * row.n_total


def test_incremental_minhash_decisions_cover_batch(spark):
    """Every new-batch doc gets exactly one decision; dup_of is set iff
    the decision is drop; dup_of always points into the corpus side."""
    from python_sql_etl_project_spark import registry

    registry.load_all()
    out = registry.QUERIES["dd_incremental_minhash"](spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_batch = docs.filter("doc_id % 10 = 0").count()
    rows = out.collect()
    assert len(rows) == n_batch
    for r in rows:
        assert (r.decision == "drop") == (r.dup_of is not None)
        if r.dup_of is not None:
            assert r.dup_of % 10 != 0
            assert r.jaccard >= 0.8


def test_partition_pruned_scan_uses_dpp(spark, tmp_path):
    """The partitioned-fact ⋈ runtime-dim query must carry a
    dynamicpruningexpression on the fact scan — the partition-filter
    injection ld_partition_pruned_scan's docstring promises. Without it
    the join degenerates to a full scan of every partition."""
    from python_sql_etl_project_spark.session import read_table

    target = str(tmp_path / "dpp_fact")
    orders = read_table(spark, SF_DIR, "orders").withColumn(
        "month",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM"),
    )
    orders.write.mode("overwrite").partitionBy("month").parquet(target)
    fact = spark.read.parquet(target)
    dim = (
        fact.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderstatus") == "F")
        )
        .select("month")
        .distinct()
        .orderBy("month")
        .limit(3)
    )
    q = fact.join(dim, "month").groupBy("month").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
