"""SQL scalar user-defined functions (``CREATE FUNCTION ... RETURN``).

The third leg of the UDF surface (§2.11): pandas UDAFs (``udafs.py``) and
Python UDTFs (``udtfs.py``) cover the Python extension points; SQL scalar
functions cover the case where a shared business expression should live
IN the catalog and stay entirely JVM-side — Catalyst inlines the body at
plan time, so a SQL UDF costs exactly nothing versus writing the
expression inline (no serialization boundary, full codegen, pushdown
through it). That makes it the right home for pricing formulas, unit
conversions and naming conventions shared across dozens of queries.

The reference keeps such logic as inline SQL strings
(``/root/reference/src/bot_ventas.py:39-58``); the catalog function is
the engine-grade upgrade: one definition, every query, no drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..session import read_table


@query(
    "fn_sql_scalar_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS disc_revenue,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))
                          * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS charged_revenue
    FROM lineitem
    GROUP BY 1
    """,
)
def fn_sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H's pricing formulas registered as catalog SQL functions and
    applied through ``spark.sql`` — proving the definitions are inlined
    (the oracle is the raw expression; a hash match means the UDF route
    computed bit-for-bit the same DECIMAL sums). DECIMAL in, DECIMAL
    out: the functions preserve exactness end to end, so the only
    rounding is the final 2-dp on the sums.

    Scale note: because Catalyst inlines SQL UDF bodies before
    optimization, filters THROUGH a SQL UDF still push down to the scan
    — unlike any Python UDF, which fences pushdown at the serialization
    boundary. This is why shared business logic belongs here first.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price("
        "p DECIMAL(14,2), d DECIMAL(4,2)) RETURNS DECIMAL(18,4) "
        "RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged_price("
        "p DECIMAL(14,2), d DECIMAL(4,2), t DECIMAL(4,2)) "
        "RETURNS DECIMAL(20,6) RETURN p * (1 - d) * (1 + t)"
    )
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "li_sqlfunc"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(round(sum(disc_price(CAST(l_extendedprice AS
                                              DECIMAL(14,2)),
                                         CAST(l_discount AS
                                              DECIMAL(4,2)))), 2)
                    AS DOUBLE) AS disc_revenue,
               CAST(round(sum(charged_price(CAST(l_extendedprice AS
                                                 DECIMAL(14,2)),
                                            CAST(l_discount AS
                                                 DECIMAL(4,2)),
                                            CAST(l_tax AS
                                                 DECIMAL(4,2)))), 2)
                    AS DOUBLE) AS charged_revenue
        FROM li_sqlfunc
        GROUP BY l_returnflag
        """
    )
