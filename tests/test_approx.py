"""Approximate sketches must land within their advertised error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_sql_etl_project_spark import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.01"


def test_sketch_estimates_within_bounds(spark):
    """The accuracy-contract booleans must hold and the exact side must
    equal a direct computation (the round-5 rebuild gates the CONTRACT,
    not the engine-private estimates — see the query docstring)."""
    approx = {
        r["l_returnflag"]: r
        for r in registry.QUERIES["agg_approx_sketches"](spark, SF_DIR).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .groupBy("l_returnflag")
            .agg(
                F.countDistinct("l_orderkey").alias("orders"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for flag, e in exact.items():
        a = approx[flag]
        assert a["exact_orders"] == e["orders"]
        assert a["n"] == e["n"]
        assert a["hll_within_6pct"] is True
        assert a["median_rank_within_1pct"] is True


def test_pandas_udf_knn_matches_jvm_ranking(spark):
    """The vectorized Pandas-UDF kernel must reproduce the JVM fold's
    k-NN ranking (values may differ in the last float bits; the induced
    ranking may not)."""
    jvm = registry.QUERIES["sim_knn_brute"](spark, SF_DIR).select(
        "query_id", "rank", "neighbor_id"
    )
    pdf = registry.QUERIES["sim_knn_pandas_udf"](spark, SF_DIR).select(
        "query_id", "rank", "neighbor_id"
    )
    assert sorted(jvm.collect()) == sorted(pdf.collect())
