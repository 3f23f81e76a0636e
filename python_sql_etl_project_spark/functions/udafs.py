"""Grouped-aggregate Pandas UDAFs (§2.11's third UDF shape).

The scalar Pandas UDF (``operators/similarity.cosine_batch_udf``) and the
Python UDTF (``functions/udtfs``) cover the 1→1 and 1→N shapes; this
module adds the N→1 shape: ``pandas_udf`` with an aggregate signature,
Arrow-batched per group, running a numpy kernel no built-in aggregate
expresses directly (log-space and reciprocal-space means). The plan is a
normal partial-less grouped aggregation — each group's values stream to
one Arrow batch — so it scales like any groupBy whose groups fit memory;
for pathological group sizes the docstringed fallback is the pure-SQL
``exp(avg(ln(x)))`` rewrite, which partial-aggregates map-side.

Determinism: kernels return raw float64; rounding to 4 dp happens
JVM-side (``F.round``) after the UDF, the same collapse rule as
``sim_knn_pandas_udf`` (numpy pairwise summation vs a sequential fold
differs at ~1e-15 relative; 4 dp on O(1e3) values absorbs it).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import read_table


def _geomean_udaf():
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    return F.pandas_udf(geomean, "double")


def _harmonic_udaf():
    def harmonic(v: pd.Series) -> float:
        import numpy as np

        x = v.to_numpy(dtype="float64")
        return float(len(x) / (1.0 / x).sum())

    return F.pandas_udf(harmonic, "double")


def _count_udaf():
    def n(v: pd.Series) -> int:
        return int(len(v))

    return F.pandas_udf(n, "long")


@query(
    "fn_grouped_means_udaf",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(exp(avg(ln(CAST(n_chars AS DOUBLE)))), 4) AS geomean_chars,
           round(count(*) / sum(1.0 / n_chars), 4) AS harmonic_chars
    FROM documents
    WHERE n_chars > 0
    GROUP BY source
    """,
)
def fn_grouped_means_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source geometric and harmonic mean document length via
    grouped-aggregate Pandas UDAFs — the document-length statistics a
    curation report wants (geomean is the right central tendency for
    the log-normal-ish length distribution; harmonic mean weights short
    docs). All three aggregates in the ``agg`` are pandas UDAFs (Spark
    cannot mix pandas and JVM aggregates in one pass), and the oracle is
    the pure-SQL log/reciprocal-space rewrite, so this query is ALSO the
    equivalence pin between the UDAF path and the scalable SQL path.
    """
    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select("source", F.col("n_chars").cast("double").alias("x"))
    )
    return docs.groupBy("source").agg(
        _count_udaf()("x").cast("bigint").alias("n_docs"),
        F.round(_geomean_udaf()("x"), 4).alias("geomean_chars"),
        F.round(_harmonic_udaf()("x"), 4).alias("harmonic_chars"),
    )
