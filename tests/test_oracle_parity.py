"""Every registered query must hash-match its DuckDB oracle.

This mirrors the driver's t2 correctness gate. Default scale is sf0.001
for speed; set PARITY_SF_DIR=/root/testdata/sf0.01 to run the driver's
actual scale.
"""

from __future__ import annotations

import os

import pytest

from python_sql_etl_project_spark import registry

from .parity import assert_query_matches_oracle

registry.load_all()

PARITY_SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_query_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name, PARITY_SF_DIR)


def test_every_query_runs(spark):
    """Queries without an oracle still must run and return a schema."""
    for name, fn in registry.QUERIES.items():
        df = fn(spark, PARITY_SF_DIR)
        assert df.columns, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
