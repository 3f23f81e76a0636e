"""Approximate sketches must land within their advertised error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_sql_etl_project_spark import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.01"


def test_sketch_estimates_within_bounds(spark):
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
                F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
            )
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for flag, e in exact.items():
        a = approx[flag]
        # HLL++ rsd=2%: allow 4 sigma
        assert abs(a["approx_orders"] - e["orders"]) <= 0.08 * e["orders"]
        # percentile_approx accuracy=10000 → tight on 60k rows
        assert abs(a["approx_median_price"] - e["median"]) <= 0.02 * e["median"]


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
