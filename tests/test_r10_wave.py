"""Invariants for the round-10 wave beyond the oracle hash gate.

* ``decon_minhash_train_eval`` — every reported pair must respect the
  bench/train split derivation, the reported Jaccard must EQUAL the
  exact Jaccard recomputed from the raw (hot-capped) shingle sets, the
  ``contaminated`` flag must be the threshold predicate, and every
  reported pair must genuinely collide on at least one LSH band (the
  candidate-generation contract: no pair reaches verification without a
  band bucket collision).
* ``fn_lateral_topk_orders`` — per customer at most k rows, values
  equal the true top-k recomputed from the raw orders table, customers
  outside the nation filter never appear, and the physical plan is the
  decorrelated form (WindowGroupLimit + join, no nested-loop / cartesian
  per-row re-scan).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from python_sql_etl_project_spark import registry
from python_sql_etl_project_spark.operators.dedup import (
    DECON_MH_BENCH_UPPER,
    DECON_MH_TOP,
    JACCARD_THRESHOLD,
    N_BANDS,
    _band_frame,
    shingles,
)
from python_sql_etl_project_spark.functions.sqlfuncs import (
    LATERAL_NATION,
    LATERAL_TOPK,
)
from python_sql_etl_project_spark.session import read_table

#: sf0.001's corpus yields 9 cross-split LSH candidates at the 12.5%
#: bench slice — enough for every invariant below.
SF = "/root/testdata/sf0.001"

registry.load_all()


def _mh_flags(spark):
    return {
        r["doc_id"]: r["is_bench"]
        for r in read_table(spark, SF, "documents")
        .select(
            "doc_id",
            (
                F.substring(
                    F.md5(F.concat(F.lit("bench:"), F.col("doc_id"))), 1, 2
                )
                < DECON_MH_BENCH_UPPER
            ).alias("is_bench"),
        )
        .collect()
    }


def test_decon_minhash_sides_jaccard_and_flag(spark):
    rows = registry.QUERIES["decon_minhash_train_eval"](spark, SF).collect()
    assert rows, "sf0.001 must yield cross-split candidates"
    flags = _mh_flags(spark)
    # exact shingle sets (post hot-cap — the same universe the op scores)
    sets = defaultdict(set)
    for r in shingles(spark, SF).collect():
        sets[r["doc_id"]].add(r["s"])
    per_bench = defaultdict(int)
    for r in rows:
        assert flags[r["bench_doc"]] is True
        assert flags[r["train_doc"]] is False
        a, b = sets[r["bench_doc"]], sets[r["train_doc"]]
        inter = len(a & b)
        exact = round(inter / (len(a) + len(b) - inter), 4)
        assert r["jaccard"] == exact, (r["bench_doc"], r["train_doc"])
        assert r["contaminated"] == (r["jaccard"] >= JACCARD_THRESHOLD)
        assert r["overflow"] >= 0
        per_bench[r["bench_doc"]] += 1
    assert all(c <= DECON_MH_TOP for c in per_bench.values())


def test_decon_minhash_pairs_are_band_collisions(spark):
    rows = registry.QUERIES["decon_minhash_train_eval"](spark, SF).collect()
    bands = defaultdict(set)
    for r in _band_frame(shingles(spark, SF)).collect():
        bands[r["doc_id"]].add((r["band_id"], r["band_key"]))
    for r in rows:
        hit = bands[r["bench_doc"]] & bands[r["train_doc"]]
        assert hit, "reported pair without an LSH band collision"
        assert len(bands[r["bench_doc"]]) == N_BANDS


def test_lateral_topk_values_and_bounds(spark):
    rows = registry.QUERIES["fn_lateral_topk_orders"](spark, SF).collect()
    assert rows
    # ground truth from the raw tables
    nk = {
        r["n_nationkey"]
        for r in read_table(spark, SF, "nation")
        .filter(F.col("n_name") == LATERAL_NATION)
        .collect()
    }
    cust = {
        r["c_custkey"]
        for r in read_table(spark, SF, "customer")
        .filter(F.col("c_nationkey").isin(list(nk)))
        .collect()
    }
    orders = defaultdict(list)
    for r in (
        read_table(spark, SF, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .collect()
    ):
        orders[r["o_custkey"]].append((r["o_orderkey"], r["o_totalprice"]))
    want = set()
    for ck in cust:
        top = sorted(orders.get(ck, ()), key=lambda t: (-t[1], t[0]))
        for ok, price in top[:LATERAL_TOPK]:
            want.add((ck, ok, price))
    got = {(r["c_custkey"], r["o_orderkey"], r["o_totalprice"]) for r in rows}
    assert got == want
    per_cust = defaultdict(int)
    for ck, _, _ in got:
        assert ck in cust
        per_cust[ck] += 1
    assert all(c <= LATERAL_TOPK for c in per_cust.values())


def test_lateral_topk_decorrelated_plan(spark):
    df = registry.QUERIES["fn_lateral_topk_orders"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # map-side top-k pushdown
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"per-row re-scan shape in plan: {bad}"
