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
