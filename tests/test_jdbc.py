"""JDBC warehouse round-trip (S4 key scan + S5 append sink parity).

Runs against embedded Apache Derby — its driver ships in Spark's own
classpath, so this is a REAL ``spark.read.jdbc`` / ``write.jdbc`` path,
not a mock. Mirrors the reference's SQLAlchemy load semantics
(``/root/reference/src/load.py:13-14,58``): idempotent PK append.
"""

from __future__ import annotations

import pytest

from python_sql_etl_project_spark.load.jdbc import JdbcWarehouse, derby_url
from python_sql_etl_project_spark.plans.star_schema import build_star_schema
from python_sql_etl_project_spark.sources.ingest import spark_df_from_pandas

from . import fixtures


def _tables(spark):
    return build_star_schema(
        spark_df_from_pandas(spark, fixtures.clientes_pdf()),
        spark_df_from_pandas(spark, fixtures.transacciones_pdf()),
        spark_df_from_pandas(spark, fixtures.varios_pdf_normal()),
        spark_df_from_pandas(spark, fixtures.recomendados_records()),
    )


@pytest.fixture(scope="module")
def jdbc_wh(spark, tmp_path_factory):
    db_dir = str(tmp_path_factory.mktemp("derby") / "wh")
    wh = JdbcWarehouse(spark, derby_url(db_dir))
    results = wh.load_ordered(_tables(spark))
    return wh, results


def test_jdbc_first_load_inserts_everything(jdbc_wh):
    _, results = jdbc_wh
    by_table = {r.table: r for r in results}
    assert all(r.ok for r in results), results
    assert by_table["fct_transacciones"].inserted == 5
    assert by_table["dim_clientes"].inserted == 4


def test_jdbc_rerun_is_idempotent(spark, jdbc_wh):
    """Second run of the same batch inserts nothing (S4 key scan feeds the
    anti-join; duplicates never reach the INSERT)."""
    wh, _ = jdbc_wh
    results2 = wh.load_ordered(_tables(spark))
    assert all(r.ok for r in results2)
    assert all(r.inserted == 0 for r in results2)
    assert wh.read("fct_transacciones").count() == 5


def test_jdbc_incremental_appends_only_new(spark, jdbc_wh):
    wh, _ = jdbc_wh
    batch = _tables(spark)["fct_transacciones"]
    result = wh.incremental_append(batch, "fct_transacciones")
    assert result.inserted == 0 and result.ignored == 5


def test_jdbc_readback_matches_parquet_semantics(spark, jdbc_wh):
    """Values survive the JDBC round-trip: same ids and montos the parquet
    warehouse tests pin."""
    wh, _ = jdbc_wh
    rows = {r.id_trx: r for r in wh.read("fct_transacciones").collect()}
    assert set(rows) == {1001, 1002, 1003, 1004, 1005}
    assert float(rows[1001].monto) == 100.50


def test_jdbc_partitioned_read(spark, jdbc_wh):
    """num_partitions fans the scan out via PK range predicates — the
    cluster-scale read path (each executor issues a bounded query)."""
    wh, _ = jdbc_wh
    par = JdbcWarehouse(spark, wh.url, num_partitions=3)
    df = par.read("fct_transacciones")
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 5
