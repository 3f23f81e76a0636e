"""Star-schema build: the reference's transform layer as one lazy plan.

Re-expresses ``/root/reference/src/transform.py:8-134`` (steps 1-6) as
composable DataFrame transformations. Nothing materializes until the load
layer writes: Catalyst sees the full five-table plan, prunes columns
through the joins and pushes the cleanup predicates into the scans —
the eager whole-intermediate materialization of the pandas version
(SURVEY §4.1) disappears structurally.

Type discipline follows the DDL (``/root/reference/sql/ddl_tienda_pago_bi.sql``):
monetary columns are carried as DECIMAL(12,2) *in flight*, not only at the
sink boundary (SURVEY §1.2), ids as INT, telefono as BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import (
    coercion_filter,
    dedupe_first,
    enrich_left,
    repair_orphan_keys,
)
from ..sources.ingest import INGEST_ORDER_COL, split_mixed_sheet

#: Ordinal schema imposed on the fact source (F8, ``transform.py:109-111``).
FACT_COLUMNS = [
    "id_cliente",
    "fecha_trx",
    "id_tipo_trx",
    "id_trx",
    "monto",
    "fee",
    "id_sede",
]

UNKNOWN_TYPE_LABEL = "Tipo Desconocido (Sistema)"
MONEY = "decimal(12,2)"


def _drop_order(df: DataFrame) -> DataFrame:
    return df.drop(INGEST_ORDER_COL) if INGEST_ORDER_COL in df.columns else df


def build_star_schema(
    clientes: DataFrame,
    transacciones: DataFrame,
    varios: DataFrame,
    recomendados: DataFrame,
) -> dict[str, DataFrame]:
    """Four source frames → five star-schema tables (lazy).

    Inputs carry ``_ingest_order`` from the ingest adapters; outputs don't.
    """
    # --- 1. mixed-sheet positional split (transform.py:23-55) ---
    sedes_raw, tipos_raw = split_mixed_sheet(varios)

    # --- 2. tipos cleanup + orphan repair (transform.py:57-76) ---
    tipos = tipos_raw.na.drop(subset=["id_tipo_trx"])
    tipos = coercion_filter(tipos, "id_tipo_trx", "int")
    tipos = _drop_order(tipos).select("id_tipo_trx", "descripcion_tipo")

    fact_source_cols = [c for c in transacciones.columns if c != INGEST_ORDER_COL]
    fact_type_keys = transacciones.select(
        F.col(fact_source_cols[2]).cast("int").alias("id_tipo_trx")
    )
    dim_tipos = repair_orphan_keys(
        fact_type_keys, tipos, "id_tipo_trx", {"descripcion_tipo": UNKNOWN_TYPE_LABEL}
    )

    # --- 3. distributor dimension: keep-FIRST dedup (transform.py:79-80) ---
    dim_dist = dedupe_first(
        recomendados.select(
            "IDDISTRIBUIDOR", F.col("NOMBRE DISTRIBUIDOR"), F.col(INGEST_ORDER_COL)
        ),
        "IDDISTRIBUIDOR",
        INGEST_ORDER_COL,
    )
    dim_dist = _drop_order(dim_dist).select(
        F.col("IDDISTRIBUIDOR").cast("int").alias("id_distribuidor"),
        F.col("NOMBRE DISTRIBUIDOR").alias("nombre_distribuidor"),
    )

    # --- 4. client dimension: rename + enrich join (transform.py:83-106) ---
    clientes_base = _drop_order(clientes).withColumnsRenamed(
        {
            "IDCLIENTE": "id_cliente",
            "fechaafiliacion": "fecha_afiliacion",
            "fechaprimertrx": "fecha_primera_trx",
        }
    )
    json_subset = _drop_order(recomendados).select(
        "IDCLIENTE", "IDDISTRIBUIDOR", "TELEFONO", F.col("categoría"), "recomendados"
    )
    dim_clientes = enrich_left(clientes_base, json_subset, "id_cliente", "IDCLIENTE")
    dim_clientes = dim_clientes.withColumnsRenamed(
        {
            "IDDISTRIBUIDOR": "id_distribuidor",
            "TELEFONO": "telefono",
            "categoría": "categoria",
        }
    )

    # --- 5. fact: ordinal schema imposition (transform.py:109-111) ---
    fct = (
        transacciones.select(*fact_source_cols)
        .toDF(*FACT_COLUMNS)
    )

    # --- 6. lenient casts per DDL types (transform.py:114-124) ---
    dim_clientes = dim_clientes.select(
        F.col("id_cliente").cast("int"),
        F.col("fecha_afiliacion").cast("date"),
        F.col("fecha_primera_trx").cast("date"),
        F.col("telefono").cast("bigint"),
        F.col("categoria").cast("string"),
        F.col("recomendados").cast("int"),
        F.col("id_distribuidor").cast("int"),
    )

    dim_sedes = sedes_raw.na.drop(subset=["id_sede"])
    dim_sedes = coercion_filter(dim_sedes, "id_sede", "int")
    dim_sedes = _drop_order(dim_sedes).select(
        "id_sede", F.col("nombre_sede").cast("string")
    )

    fct = fct.select(
        F.col("id_trx").cast("int"),
        F.col("id_cliente").cast("int"),
        F.col("id_sede").cast("int"),
        F.col("id_tipo_trx").cast("int"),
        F.col("fecha_trx").cast("timestamp"),
        F.col("monto").cast(MONEY),
        F.col("fee").cast(MONEY),
    )

    # ordered dict: parents before children before fact — the load layer
    # preserves this ordering for FK integrity (src/main.py:70-80)
    return {
        "dim_sedes": dim_sedes,
        "dim_tipo_transaccion": dim_tipos,
        "dim_distribuidores": dim_dist,
        "dim_clientes": dim_clientes,
        "fct_transacciones": fct,
    }
