"""Landing-zone staging utility (S3 remote-fetch parity semantics)."""

from __future__ import annotations

import io
import os

from python_sql_etl_project_spark.sources.staging import stage_file, stage_sources


def test_stage_local_and_file_url(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"payload-123")
    land = tmp_path / "landing"

    p1 = stage_file(str(src), str(land))
    assert p1 is not None and open(p1, "rb").read() == b"payload-123"

    p2 = stage_file(f"file://{src}", str(land), file_name="via_url.bin")
    assert p2 is not None and p2.endswith("via_url.bin")
    assert open(p2, "rb").read() == b"payload-123"


def test_stage_is_idempotent(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"v1")
    land = tmp_path / "landing"
    p1 = stage_file(str(src), str(land))
    src.write_bytes(b"v2-changed")
    p2 = stage_file(str(src), str(land))  # reused, not re-fetched
    assert p1 == p2 and open(p2, "rb").read() == b"v1"
    p3 = stage_file(str(src), str(land), overwrite=True)
    assert open(p3, "rb").read() == b"v2-changed"


def test_stage_failure_returns_none_and_leaves_no_partial(tmp_path):
    land = tmp_path / "landing"
    assert stage_file(str(tmp_path / "missing.bin"), str(land)) is None
    assert not any(f.endswith(".part") for f in os.listdir(land))


def test_stage_custom_opener(tmp_path):
    """Provider-client injection point (Drive/object-store analog)."""
    blobs = {"remote://bucket/a.xlsx": b"excel-bytes"}

    def opener(url):
        return io.BytesIO(blobs[url])

    p = stage_file("remote://bucket/a.xlsx", str(tmp_path), opener=opener)
    assert p is not None and open(p, "rb").read() == b"excel-bytes"


def test_stage_sources_all_or_nothing(tmp_path):
    ok = tmp_path / "ok.json"
    ok.write_bytes(b"{}")
    land = tmp_path / "landing"
    out = stage_sources(
        {"a.json": str(ok), "b.json": str(tmp_path / "missing")}, str(land)
    )
    assert out is None  # one miss aborts the batch
    out2 = stage_sources({"a.json": str(ok)}, str(land))
    assert out2 is not None and set(out2) == {"a.json"}


def test_write_partitioned_cardinality_boundary(spark, tmp_path):
    """r13: the partitioned-write helper distributes by the partition
    column only when its cardinality reaches writer parallelism (the
    r12-measured boundary), and both sides round-trip value-identically."""
    from pyspark.sql import functions as F

    from python_sql_etl_project_spark.load.layout import write_partitioned

    par = spark.sparkContext.defaultParallelism
    df = spark.range(400).select(
        F.col("id"), (F.col("id") % (par * 2)).alias("hi"), (F.col("id") % 2).alias("lo")
    )

    # cardinality >= parallelism -> hash-distributed: exactly one file
    # per partition directory
    hi_dir = str(tmp_path / "hi")
    write_partitioned(df, "hi", hi_dir, par * 2)
    for d in os.listdir(hi_dir):
        if d.startswith("hi="):
            files = [
                f
                for f in os.listdir(os.path.join(hi_dir, d))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, (d, files)
    back = spark.read.parquet(hi_dir)
    assert back.count() == 400
    assert back.agg(F.sum("id")).first()[0] == sum(range(400))

    # cardinality < parallelism -> direct write (parallel writers, so
    # more than one file per partition at this row count)
    lo_dir = str(tmp_path / "lo")
    write_partitioned(df, "lo", lo_dir, 2)
    multi = any(
        len([f for f in os.listdir(os.path.join(lo_dir, d)) if f.endswith(".parquet")]) > 1
        for d in os.listdir(lo_dir)
        if d.startswith("lo=")
    )
    assert multi, "direct write should keep per-task parallelism"
    back = spark.read.parquet(lo_dir)
    assert back.count() == 400
    assert back.agg(F.sum("id")).first()[0] == sum(range(400))


def test_write_partitioned_passes_writer_options(spark, tmp_path):
    """partitionOverwriteMode=dynamic must reach the writer: a second
    dynamic write of ONE partition leaves the others untouched."""
    from pyspark.sql import functions as F

    from python_sql_etl_project_spark.load.layout import write_partitioned

    df = spark.range(100).select("id", (F.col("id") % 4).alias("p"))
    d = str(tmp_path / "dyn")
    write_partitioned(df, "p", d, 4)
    fix = df.filter(F.col("p") == 1).withColumn("id", F.col("id") + 1000)
    write_partitioned(fix, "p", d, 1, partitionOverwriteMode="dynamic")
    back = spark.read.parquet(d)
    assert back.count() == 100
    assert back.filter("p = 1").agg(F.min("id")).first()[0] >= 1000
    assert back.filter("p = 0").agg(F.max("id")).first()[0] < 1000
