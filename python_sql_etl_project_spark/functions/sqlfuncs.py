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


#: The SQL:1999 recursive query run VERBATIM on both engines — Spark 4's
#: newest SQL surface (recursive CTEs, SPARK-24497) hash-checked against
#: DuckDB executing the IDENTICAL text. UNION ALL only (Spark's current
#: limitation), so the recursion walks an ACYCLIC structure: the
#: lead()-derived next-order pointer chain per customer (disjoint linked
#: lists; depth = max orders per customer ≈ 25, far under Spark's
#: default 100-level recursion limit).
RECURSIVE_CHAIN_SQL = """
    WITH RECURSIVE nxt AS (
        SELECT o_custkey, o_orderkey,
               lead(o_orderkey) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
                   AS next_okey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ),
    seq AS (
        SELECT o_custkey, o_orderkey, next_okey, CAST(1 AS BIGINT) AS pos
        FROM nxt WHERE rn = 1
        UNION ALL
        SELECT n.o_custkey, n.o_orderkey, n.next_okey, s.pos + 1
        FROM seq s JOIN nxt n ON n.o_orderkey = s.next_okey
    )
    SELECT o_custkey, o_orderkey, pos FROM seq
"""


@query("fn_recursive_cte_chain", oracle=RECURSIVE_CHAIN_SQL)
def fn_recursive_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:1999 recursive CTE — Spark 4's newly-landed surface
    (SPARK-24497), exercised on a real traversal: each customer's
    orders walked as a linked list (first order → lead()-pointer →
    ...), emitting the 1-based position along the chain. The ORACLE IS
    THE SAME SQL TEXT run by DuckDB, so the gate proves the two
    engines' recursive execution semantics agree on this query class —
    the strongest possible parity statement for a brand-new engine
    feature. (Spark currently supports UNION ALL recursion only, so
    the walked structure must be acyclic; the pointer chain is, by
    construction. The same position is derivable from one window —
    that is deliberate: it makes the recursion independently
    verifiable, and the invariant test pins seq == row_number.)

    Scale shape: the pointer table is one window over the orders
    shuffle; each recursion level is an equi-join of the frontier
    (|customers| rows) against it, depth bounded by the longest chain.
    """
    from ..session import register_testdata_views

    register_testdata_views(spark, sf_dir)
    return spark.sql(RECURSIVE_CHAIN_SQL)
