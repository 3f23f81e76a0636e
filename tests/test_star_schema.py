"""End-to-end reference-pipeline replay (SURVEY §5.2 plan item 2).

Synthetic source fixtures → build_star_schema → assert the five output
tables, covering every transform.py branch: mixed-sheet variants, orphan
repair, keep-first dedup, lenient casts, dirty-row drops.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from python_sql_etl_project_spark.plans.star_schema import build_star_schema
from python_sql_etl_project_spark.sources.ingest import (
    split_mixed_sheet,
    spark_df_from_pandas,
)

from . import fixtures


@pytest.fixture(scope="module")
def star(spark):
    tables = build_star_schema(
        spark_df_from_pandas(spark, fixtures.clientes_pdf()),
        spark_df_from_pandas(spark, fixtures.transacciones_pdf()),
        spark_df_from_pandas(spark, fixtures.varios_pdf_normal()),
        spark_df_from_pandas(spark, fixtures.recomendados_records()),
    )
    return {name: df.collect() for name, df in tables.items()}


def test_dim_sedes(star):
    rows = {r.id_sede: r.nombre_sede for r in star["dim_sedes"]}
    # 'junk' id and header rows dropped
    assert rows == {1: "Sede Norte", 2: "Sede Sur"}


def test_dim_tipos_with_orphan_repair(star):
    rows = {r.id_tipo_trx: r.descripcion_tipo for r in star["dim_tipo_transaccion"]}
    # catalog rows kept (null-id row dropped), orphan 99 repaired; the
    # null fact tipo is NOT repaired (pd.notna filter parity)
    assert rows == {
        10: "Deposito",
        11: "Retiro",
        99: "Tipo Desconocido (Sistema)",
    }


def test_dim_distribuidores_keep_first(star):
    rows = {r.id_distribuidor: r.nombre_distribuidor for r in star["dim_distribuidores"]}
    # duplicate 100 keeps the FIRST file-order name
    assert rows == {
        100: "Distribuidora Alfa",
        200: "Distribuidora Beta",
        300: "Distribuidora Gamma",
    }


def test_dim_clientes_enrichment_and_lenient_dates(star):
    by_id = {r.id_cliente: r for r in star["dim_clientes"]}
    assert set(by_id) == {1, 2, 3, 4}
    assert by_id[1].fecha_afiliacion == dt.date(2024, 1, 10)
    assert by_id[3].fecha_afiliacion is None  # 'garbage' → null (coerce)
    assert by_id[2].fecha_primera_trx is None
    assert by_id[1].id_distribuidor == 100
    assert by_id[1].categoria == "Oro"
    assert by_id[1].telefono == 5551000
    # client 4 has no JSON record → enrichment nulls
    assert by_id[4].id_distribuidor is None
    assert by_id[4].categoria is None


def test_fct_transacciones_types_and_casts(star):
    by_id = {r.id_trx: r for r in star["fct_transacciones"]}
    assert set(by_id) == {1001, 1002, 1003, 1004, 1005}
    r = by_id[1001]
    assert r.monto == Decimal("100.50")
    assert r.fee == Decimal("1.50")
    assert r.fecha_trx == dt.datetime(2025, 6, 14, 10, 0)
    assert by_id[1005].fecha_trx is None  # 'not-a-ts' → null
    assert by_id[1004].id_tipo_trx is None  # nan tipo stays null
    assert by_id[1002].id_tipo_trx == 99


@pytest.mark.parametrize(
    "fixture_fn,expected_sedes,expected_tipos",
    [
        (fixtures.varios_pdf_normal, 3, 3),  # raw slices incl. dirty rows
        (fixtures.varios_pdf_single_header_row0, 2, 0),
        (fixtures.varios_pdf_single_header_mid, 2, 1),
        (fixtures.varios_pdf_no_headers, 0, 0),
    ],
)
def test_split_mixed_sheet_branches(spark, fixture_fn, expected_sedes, expected_tipos):
    varios = spark_df_from_pandas(spark, fixture_fn())
    sedes, tipos = split_mixed_sheet(varios)
    assert sedes.count() == expected_sedes
    assert tipos.count() == expected_tipos
    assert sedes.columns[:2] == ["id_sede", "nombre_sede"]
    assert tipos.columns[:2] == ["id_tipo_trx", "descripcion_tipo"]


def test_split_two_header_preamble_dropped(spark):
    """Pin the documented deviation from the reference's two-header slice
    (``/root/reference/src/transform.py`` iloc[1:cut]): preamble rows above
    the first 'ID' header are DROPPED here, not leaked into table1."""
    varios = spark_df_from_pandas(
        spark, fixtures.varios_pdf_preamble_before_first_header()
    )
    sedes, tipos = split_mixed_sheet(varios)
    names = {r.nombre_sede for r in sedes.collect()}
    assert names == {"Sede Norte", "Sede Sur"}  # no 'hoja varios'/'2025-06-14'
    assert tipos.count() == 1
