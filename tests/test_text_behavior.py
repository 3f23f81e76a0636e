"""Behavioral checks for the corpus-hygiene text operators on crafted
inputs (the synthetic corpus contains little real PII / repetition, so
oracle parity alone would pass vacuously)."""

from __future__ import annotations

import pandas as pd
import pytest

from python_sql_etl_project_spark import registry

registry.load_all()


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    rows = [
        # doc_id, text
        (1, "contact me at alice.smith@example.com or +1 555-123-4567 now"),
        (2, "server 192.168.10.42 answered; backup at 10.0.0.7 did not"),
        (3, "spam spam spam spam spam spam ham"),
        (4, "all tokens here are fully distinct words friend"),
        (5, ""),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["crafted"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    d = tmp_path_factory.mktemp("crafted_docs")
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_pii_scrub_counts_and_redacts(spark, docs_dir):
    out = {
        r.doc_id: r
        for r in registry.QUERIES["txt_pii_scrub"](spark, docs_dir).collect()
    }
    assert out[1].n_emails == 1 and out[1].n_phones == 1
    assert out[2].n_ips == 2 and out[2].n_emails == 0
    assert out[4].n_emails == out[4].n_ips == out[4].n_phones == 0
    # scrubbed text of a clean doc hashes to the original text's md5
    import hashlib

    assert out[4].scrubbed_md5 == hashlib.md5(
        b"all tokens here are fully distinct words friend"
    ).hexdigest()
    # scrubbed text of a dirty doc differs from the original's md5
    assert out[1].scrubbed_md5 != hashlib.md5(
        b"contact me at alice.smith@example.com or +1 555-123-4567 now"
    ).hexdigest()


def test_repetition_profile_flags_repeats(spark, docs_dir):
    out = {
        r.doc_id: r
        for r in registry.QUERIES["txt_repetition_profile"](
            spark, docs_dir
        ).collect()
    }
    # doc 3: 'spam' x6 + 'ham' → high top-token mass, duplicated 3-grams
    assert out[3].top_token_frac == pytest.approx(6 / 7, abs=1e-4)
    assert out[3].dup_3gram_frac > 0.5
    # doc 4: all distinct → zero duplication, top token 1/8
    assert out[4].dup_3gram_frac == 0.0
    assert out[4].top_token_frac == pytest.approx(1 / 8, abs=1e-4)


@pytest.fixture(scope="module")
def skewed_docs_dir(spark, tmp_path_factory):
    """400 docs in 'big', 100 in 'mid', 25 in 'small' — actual skew, so
    temperature resampling has something to rebalance."""
    n = {"big": 400, "mid": 100, "small": 25}
    rows = []
    i = 0
    for src, k in n.items():
        for _ in range(k):
            rows.append((i, f"doc number {i} from {src}", "en", src, 20))
            i += 1
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = tmp_path_factory.mktemp("skewed_docs")
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_temperature_resample_rebalances_skew(spark, skewed_docs_dir):
    out = {
        r.source: r
        for r in registry.QUERIES["smp_temperature_resample"](
            spark, skewed_docs_dir
        ).collect()
    }
    # smallest source kept whole; larger sources downsampled by sqrt ratio
    assert out["small"].keep_rate == 1.0
    assert out["small"].n_kept == 25
    assert out["mid"].keep_rate == pytest.approx((25 / 100) ** 0.5, abs=1e-3)
    assert out["big"].keep_rate == pytest.approx((25 / 400) ** 0.5, abs=1e-3)
    # kept counts should land near rate * n (hash uniformity, wide tolerance)
    assert abs(out["big"].n_kept - 0.25 * 400) < 40
    # post-resample sizes are closer together than the raw 16x spread
    kept = [out[s].n_kept for s in ("big", "mid", "small")]
    assert max(kept) / max(1, min(kept)) < 6


def test_udtf_chunker_matches_sql_chunker(spark):
    """The Python UDTF surface (§2.11) must produce EXACTLY the chunks
    the production pure-SQL plan derives — same geometry, same text —
    so the lateral-join escape hatch is verified against the scale path
    it mirrors."""
    import pyspark.sql.functions as F

    from python_sql_etl_project_spark import registry
    from python_sql_etl_project_spark.functions.udtfs import register_udtfs

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    register_udtfs(spark)
    docs = spark.read.parquet(f"{sf}/documents.parquet").limit(50)
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_tokens,
               md5(c.chunk_text) AS chunk_md5
        FROM udtf_docs d, LATERAL chunk_document(d.text) c
        """
    )
    sql_side = (
        registry.QUERIES["pack_chunk_overlap"](spark, sf)
        .join(docs.select("doc_id"), "doc_id")
    )
    got = sorted(map(tuple, via_udtf.collect()))
    want = sorted(map(tuple, sql_side.collect()))
    assert got == want and len(got) > 50
