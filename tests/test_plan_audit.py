"""Physical-plan audit: the 100 TB posture, enforced by test.

Every registered query's physical plan is checked for the two
cluster-killers: cartesian products and *unintended* broadcast
nested-loop joins. Queries whose semantics genuinely need a non-equi
join against a broadcast-small side are allowlisted explicitly, so any
new accidental cross join fails CI instead of failing at scale.
"""

from __future__ import annotations

import pytest

from python_sql_etl_project_spark import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"

#: name → reason a BroadcastNestedLoopJoin is intended and bounded.
BNLJ_ALLOWED = {
    "sim_knn_brute": "tiny query set broadcast against corpus (k-NN baseline)",
    "q22_dormant_rich_customers": "1-row scalar subquery broadcast",
    "sim_ivf_topk": "KB-scale codebook broadcast for cell assignment",
    "sim_knn_pandas_udf": "tiny query set broadcast against corpus",
    "q11_revenue_concentration": "1-row global-total broadcast",
}

#: Streaming queries execute eagerly on .explain of the memory table;
#: audit their batch-equivalent cost via the strm tests instead.
SKIP = {name for name in registry.QUERIES if name.startswith("strm_")}


@pytest.mark.parametrize(
    "name", sorted(n for n in registry.QUERIES if n not in SKIP)
)
def test_no_unbounded_join_strategies(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unintended nested-loop join"
        )
