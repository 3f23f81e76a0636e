"""Synthetic source fixtures per FIXTURES.md §A.

pandas frames mimicking what the reference's extraction yields
(`pd.read_excel` / JSON records), exercising every transform branch:
orphan fact keys, duplicate distributors, unparseable dates/ids, null
keys, clients missing from either side, and all mixed-sheet variants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def clientes_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "IDCLIENTE": [1, 2, 3, 4],
            "fechaafiliacion": ["2024-01-10", "2024-02-20", "garbage", "2024-03-05"],
            "fechaprimertrx": ["2024-01-15", None, "2024-03-01", "2024-03-10"],
        }
    )


def transacciones_pdf() -> pd.DataFrame:
    # 7 positional columns (consumed by ordinal, FIXTURES A2):
    # id_cliente, fecha_trx, id_tipo_trx, id_trx, monto, fee, id_sede
    return pd.DataFrame(
        {
            "c0": [1, 1, 2, 5, 3],  # id 5 absent from clientes → left-join null
            "c1": [
                "2025-06-14 10:00:00",
                "2025-06-14 11:30:00",
                "2025-06-13 09:00:00",
                "2025-06-14 12:00:00",
                "not-a-ts",  # lenient timestamp → null
            ],
            "c2": [10.0, 99.0, 10.0, np.nan, 11.0],  # 99 orphan, nan tipo
            "c3": [1001, 1002, 1003, 1004, 1005],
            "c4": [100.50, 200.25, 50.00, 75.10, 20.00],
            "c5": [1.50, 2.25, 0.50, 1.10, 0.20],
            "c6": [1, 2, 1, 2, 1],
        }
    )


def varios_pdf_normal() -> pd.DataFrame:
    """Two stacked tables, each headed by an 'ID' row (FIXTURES A3 #1),
    plus dirty rows (#5) inside both tables."""
    return pd.DataFrame(
        {
            0: ["ID", 1, 2, "junk", "ID", 10, 11, None],
            1: [
                "SEDE",
                "Sede Norte",
                "Sede Sur",
                "Sede Fantasma",  # non-numeric id → dropped
                "TIPO",
                "Deposito",
                "Retiro",
                "Sin Id",  # null id → dropped
            ],
        }
    )


def varios_pdf_single_header_row0() -> pd.DataFrame:
    return pd.DataFrame(
        {0: ["ID", 1, 2], 1: ["SEDE", "Sede Norte", "Sede Sur"]}
    )


def varios_pdf_single_header_mid() -> pd.DataFrame:
    return pd.DataFrame(
        {0: [1, 2, "ID", 10], 1: ["Sede Norte", "Sede Sur", "TIPO", "Deposito"]}
    )


def varios_pdf_no_headers() -> pd.DataFrame:
    return pd.DataFrame({0: [1, 2], 1: ["Sede Norte", "Sede Sur"]})


def varios_pdf_preamble_before_first_header() -> pd.DataFrame:
    """Two-header sheet with junk ABOVE the first 'ID' header — the case
    where this engine's slice (h0+1..cut) deviates from the reference's
    iloc[1:cut] (which would leak 'nota:'/'exportado' into table1)."""
    return pd.DataFrame(
        {
            0: ["nota:", "exportado", "ID", 1, 2, "ID", 10],
            1: ["hoja varios", "2025-06-14", "SEDE", "Sede Norte",
                "Sede Sur", "TIPO", "Deposito"],
        }
    )


def recomendados_records() -> pd.DataFrame:
    # duplicate IDDISTRIBUIDOR with differing names → keep-FIRST dedup;
    # IDCLIENTE 9 absent from clientes; client 4 absent here.
    return pd.DataFrame(
        {
            "IDCLIENTE": [1, 2, 3, 9],
            "IDDISTRIBUIDOR": [100, 100, 200, 300],
            "NOMBRE DISTRIBUIDOR": [
                "Distribuidora Alfa",
                "Distribuidora Alfa DUPLICADA",
                "Distribuidora Beta",
                "Distribuidora Gamma",
            ],
            "TELEFONO": [5551000, 5552000, 5553000, 5559000],
            "categoría": ["Oro", "Plata", "Bronce", "Oro"],
            "recomendados": [3, 1, 0, 7],
        }
    )
