"""Incremental load idempotency + report SQL parity (SURVEY §5.2 items 2-3)."""

from __future__ import annotations

from decimal import Decimal

import pytest

from python_sql_etl_project_spark.load.incremental import Warehouse
from python_sql_etl_project_spark.plans.star_schema import build_star_schema
from python_sql_etl_project_spark.report import format_message, get_sales_data
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
def loaded_warehouse(spark, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("warehouse")))
    results = wh.load_ordered(_tables(spark))
    return wh, results


def test_first_load_inserts_everything(loaded_warehouse):
    _, results = loaded_warehouse
    by_table = {r.table: r for r in results}
    assert all(r.ok for r in results)
    assert by_table["fct_transacciones"].inserted == 5
    assert by_table["dim_sedes"].inserted == 2
    assert by_table["dim_tipo_transaccion"].inserted == 3
    assert by_table["dim_clientes"].inserted == 4
    assert by_table["dim_distribuidores"].inserted == 3


def test_rerun_is_idempotent(spark, loaded_warehouse):
    """Re-running the load inserts nothing (PK anti-join, load.py:47-62)."""
    wh, _ = loaded_warehouse
    results2 = wh.load_ordered(_tables(spark))
    assert all(r.ok for r in results2)
    assert all(r.inserted == 0 for r in results2)
    assert {r.table: r.ignored for r in results2}["fct_transacciones"] == 5
    assert wh.read("fct_transacciones").count() == 5


def test_incremental_batch_appends_only_new(spark, loaded_warehouse):
    wh, _ = loaded_warehouse
    batch = _tables(spark)["fct_transacciones"]
    # simulate next day's batch: 1 known id + nothing else changed
    result = wh.incremental_append(batch.limit(5), "fct_transacciones")
    assert result.inserted == 0 and result.ignored == 5


def test_report_queries_and_rendering(spark, loaded_warehouse):
    wh, _ = loaded_warehouse
    wh.register_views()
    metrics, distribuidores = get_sales_data(spark, "2025-06-14")
    # diaria: trx 1001 (100.50) + 1002 (200.25) + 1004 (75.10) on 06-14
    assert metrics["diaria"] == Decimal("375.85")
    # acumulado: month-to-date includes 06-13's 50.00
    assert metrics["acumulado_mes"] == Decimal("425.85")

    by_dist = {r.nombre_distribuidor: r.total_prestamos for r in distribuidores}
    # client 5 unknown → 'Venta Directa' (COALESCE path)
    assert by_dist["Venta Directa"] == Decimal("75.10")
    assert by_dist["Distribuidora Alfa"] == Decimal("300.75")

    text = format_message(metrics, distribuidores, "2025-06-14")
    assert "14 JUN, 2025" in text
    assert "$375.85" in text
    assert "Venta Directa: $75.10" in text


def test_metrics_cut_day_inclusive_deviation(spark, loaded_warehouse):
    """Pin the DELIBERATE divergence from the reference's metrics query
    (``/root/reference/src/bot_ventas.py:44``): the reference compares the
    raw timestamp against midnight of the cut date (``fecha_trx <= %s``),
    so intraday rows ON the cut day fall outside its month-to-date sum and
    its 'diaria' CASE arm can never match them (diaria would be 0 here).
    This engine compares on the DATE cast and includes the full cut day.

    Every 2025-06-14 fixture row is intraday (10:00/11:30/12:00) — exactly
    the case where the two semantics differ — so this test fails if the
    query ever silently reverts to the reference's midnight comparison.
    """
    wh, _ = loaded_warehouse
    wh.register_views()
    metrics, _ = get_sales_data(spark, "2025-06-14")
    # Reference semantics would give diaria=0, acumulado_mes=50.00 (only
    # the 06-13 row survives `ts <= 2025-06-14 00:00:00`).
    assert metrics["diaria"] == Decimal("375.85")
    assert metrics["acumulado_mes"] == Decimal("425.85")


def test_report_orders_by_total_desc(spark, loaded_warehouse):
    wh, _ = loaded_warehouse
    wh.register_views()
    _, distribuidores = get_sales_data(spark, "2025-06-14")
    totals = [float(r.total_prestamos) for r in distribuidores]
    assert totals == sorted(totals, reverse=True)


def test_incremental_curation_manifest_is_conserved(spark):
    """The per-source manifest must partition the batch exactly:
    n_batch == quality_fail + dup_drop + kept per source, and the
    source-level n_batch sums to the true batch size."""
    from python_sql_etl_project_spark import registry

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["pipe_incremental_curation"](spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_batch_true = docs.filter("doc_id % 10 = 0").count()
    assert sum(r.n_batch for r in rows) == n_batch_true
    for r in rows:
        assert r.n_batch == r.n_quality_fail + r.n_dup_drop + r.n_kept
        assert min(r.n_quality_fail, r.n_dup_drop, r.n_kept) >= 0
