"""Invariants for the round-6 pair-emission budgets.

Beyond the oracle hash gate (which already mirrors the budget windows),
pin the properties that make the budgets safe to rely on at 100 TB:
every anchor emits at most BUDGET rows, the overflow counter equals
max(0, qualifying − BUDGET) and is constant within an anchor, and the
phash cluster query's edge budget does not change WHICH assets get
clustered (truncation may split weak chains but replica cliques stay
whole — at the tested SFs the cluster rows must cover the same asset
mass the uncapped graph covers).
"""

import pytest
from pyspark.sql import functions as F

from python_sql_etl_project_spark import registry
from python_sql_etl_project_spark.operators.dedup import PAIR_EMIT_BUDGET
from python_sql_etl_project_spark.operators.multimodal import MM_PAIR_BUDGET

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def qs():
    registry.load_all()
    return registry.QUERIES


@pytest.mark.parametrize(
    ("name", "anchor"),
    [("dd_shingle_jaccard_pairs", "d1"), ("dd_containment_pairs", "src_doc")],
)
def test_anchor_budget_and_overflow(spark, qs, name, anchor):
    df = qs[name](spark, SF).persist()
    per = df.groupBy(anchor).agg(
        F.count(F.lit(1)).alias("kept"),
        F.min("overflow").alias("o_min"),
        F.max("overflow").alias("o_max"),
    )
    bad_kept = per.filter(F.col("kept") > PAIR_EMIT_BUDGET).count()
    assert bad_kept == 0, f"{name}: an anchor emitted more than the budget"
    # overflow constant per anchor
    assert per.filter(F.col("o_min") != F.col("o_max")).count() == 0
    # overflow > 0 implies the anchor is exactly at the budget
    assert (
        per.filter(
            (F.col("o_min") > 0) & (F.col("kept") != PAIR_EMIT_BUDGET)
        ).count()
        == 0
    ), f"{name}: positive overflow on a non-full anchor"
    df.unpersist()


def test_phash_cluster_membership_stable_under_edge_budget(spark, qs):
    """The cluster output must cover exactly the UNCAPPED pair-node set.

    Round 7 made this invariant structural (it previously held only
    because truncation didn't orphan any node at sf0.01): the label seed
    is now the uncapped pair node set in both engines, so an asset whose
    every edge hangs off budget-saturated anchors degrades to a
    singleton cluster row instead of vanishing — the equality below is
    guaranteed at every scale, not just the tested one."""
    from python_sql_etl_project_spark.operators import multimodal as mm

    clusters = qs["mm_phash_dup_clusters"](spark, SF)
    clustered_mass = clusters.agg(F.sum("n_assets")).collect()[0][0]
    pair_nodes = (
        mm.mm_phash_neardup_pairs(spark, SF)
        .select(F.col("a1").alias("n"))
        .unionByName(
            mm.mm_phash_neardup_pairs(spark, SF).select(
                F.col("a2").alias("n")
            )
        )
        .distinct()
        .count()
    )
    assert clustered_mass == pair_nodes
    # overflow census is a single consistent value on every row
    assert (
        clusters.select("edges_truncated").distinct().count() == 1
    )
    # and the budget really binds somewhere OR nothing was truncated —
    # either way the counter must be non-negative
    val = clusters.select(F.min("edges_truncated")).collect()[0][0]
    assert val >= 0
    assert MM_PAIR_BUDGET > 0
