"""Invariants for the round-9 wave beyond the oracle hash gate.

* ``decon_exact_substring_runs`` — reported pairs must respect the
  bench/train split derivation, the tokens/shingles arithmetic must be
  exact (run of L shingles = L + K - 1 tokens), and for the top pairs
  the reported run must be a TRUE LOWER BOUND of the exact longest
  common contiguous token run (the frequency-blocking caps can only
  shorten detected runs, never lengthen them).
* ``fn_unpivot_measures`` — the melt must multiply rows exactly 4x and
  each metric's profile must equal the directly-computed aggregate on
  the wide frame.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from python_sql_etl_project_spark import registry
from python_sql_etl_project_spark.operators.sampling import (
    BENCH_UPPER,
    DECON_K,
    DECON_RUN_TOP,
)
from python_sql_etl_project_spark.session import read_table

SF = "/root/testdata/sf0.001"
#: the decon corpus needs enough documents for shared 8-gram runs to
#: exist at all — sf0.001's ~600 docs yield zero qualifying pairs, so
#: those tests run at sf0.01 (2 pairs, 24-25 token runs).
SF_DECON = "/root/testdata/sf0.01"

registry.load_all()


def _bench_flags(spark):
    return {
        r["doc_id"]: r["is_bench"]
        for r in read_table(spark, SF_DECON, "documents")
        .select(
            "doc_id",
            (
                F.substring(
                    F.md5(F.concat(F.lit("bench:"), F.col("doc_id"))), 1, 2
                )
                < BENCH_UPPER
            ).alias("is_bench"),
        )
        .collect()
    }


def test_decon_runs_sides_and_arithmetic(spark):
    rows = registry.QUERIES["decon_exact_substring_runs"](
        spark, SF_DECON
    ).collect()
    assert 0 < len(rows) <= DECON_RUN_TOP
    flags = _bench_flags(spark)
    lens = [r["run_shingles"] for r in rows]
    assert lens == sorted(lens, reverse=True)  # ordered, longest first
    for r in rows:
        assert flags[r["bench_doc"]] is True
        assert flags[r["train_doc"]] is False
        assert r["run_tokens"] == r["run_shingles"] + DECON_K - 1
        assert r["run_tokens"] >= DECON_K  # a run is >= one k-gram


def _longest_common_token_run(a: list[str], b: list[str]) -> int:
    """Exact longest common contiguous run (O(|a|*|b|) DP — test docs
    are tiny)."""
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


def test_decon_runs_are_lower_bounds_of_exact_runs(spark):
    out = registry.QUERIES["decon_exact_substring_runs"](spark, SF_DECON)
    top = out.limit(3).collect()
    assert top  # sf0.01 must yield qualifying pairs, else the test is vacuous
    ids = {r["bench_doc"] for r in top} | {r["train_doc"] for r in top}
    texts = {
        r["doc_id"]: r["text"].split()
        for r in read_table(spark, SF_DECON, "documents")
        .filter(F.col("doc_id").isin(list(ids)))
        .select("doc_id", F.trim("text").alias("text"))
        .collect()
    }
    for r in top:
        exact = _longest_common_token_run(
            texts[r["train_doc"]], texts[r["bench_doc"]]
        )
        # blocking caps can only shorten a detected run, never lengthen
        assert DECON_K <= r["run_tokens"] <= exact, (
            r["bench_doc"],
            r["train_doc"],
            r["run_tokens"],
            exact,
        )


def test_unpivot_profile_matches_wide_aggregates(spark):
    out = {
        r["metric"]: r
        for r in registry.QUERIES["fn_unpivot_measures"](spark, SF).collect()
    }
    assert set(out) == {"quantity", "extendedprice", "discount", "tax"}
    li = read_table(spark, SF, "lineitem")
    n = li.count()
    for metric, col in (
        ("quantity", "l_quantity"),
        ("extendedprice", "l_extendedprice"),
        ("discount", "l_discount"),
        ("tax", "l_tax"),
    ):
        want = li.agg(
            F.round(F.sum(F.col(col).cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("total"),
            F.min(F.col(col).cast("decimal(14,2)")).cast("double").alias("mn"),
            F.max(F.col(col).cast("decimal(14,2)")).cast("double").alias("mx"),
        ).collect()[0]
        got = out[metric]
        assert got["n_rows"] == n, metric
        assert got["total"] == want["total"], metric
        assert got["min_val"] == want["mn"], metric
        assert got["max_val"] == want["mx"], metric
