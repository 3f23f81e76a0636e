"""Sales report analytics + rendering (replaces ``/root/reference/src/bot_ventas.py``).

The two SQL strings the reference sent to Postgres
(``bot_ventas.py:39-58``) run verbatim through ``spark.sql`` over the
warehouse views — Catalyst takes the Postgres planner's role (SURVEY
§3.2). The ``%s`` binds become Spark 4 named parameters and the ``::date``
casts become ANSI CAST.

Rendering (ES month names, currency format) and Telegram delivery are
driver-side post-``collect()`` utilities, not engine operators (S7).
"""

from __future__ import annotations

import datetime as dt
import logging
import os

from pyspark.sql import Row, SparkSession

logger = logging.getLogger(__name__)

#: bot_ventas.py:39-45 — conditional daily sum + month-to-date sum.
#: Deliberate deviation: the reference's ``fecha_trx <= %s`` compares the
#: timestamp against the cut DATE (midnight), silently excluding the cut
#: day's intraday rows — so its "diaria" CASE arm can never match them.
#: We compare on the date cast so the cut day is fully included.
QUERY_METRICS = """
    SELECT
        SUM(CASE WHEN CAST(fecha_trx AS DATE) = :fecha_corte
                 THEN monto ELSE 0 END) AS diaria,
        SUM(monto) AS acumulado_mes
    FROM fct_transacciones
    WHERE fecha_trx >= :mes_inicio
      AND CAST(fecha_trx AS DATE) <= :fecha_corte
"""

#: bot_ventas.py:48-58 — 2-way left join + coalesce + grouped sum + sort.
QUERY_DISTRIBUIDORES = """
    SELECT
        COALESCE(d.nombre_distribuidor, 'Venta Directa') AS nombre_distribuidor,
        SUM(f.monto) AS total_prestamos
    FROM fct_transacciones f
    LEFT JOIN dim_clientes c        ON f.id_cliente = c.id_cliente
    LEFT JOIN dim_distribuidores d  ON c.id_distribuidor = d.id_distribuidor
    WHERE CAST(f.fecha_trx AS DATE) = :fecha_corte
    GROUP BY 1
    ORDER BY total_prestamos DESC
"""

MESES_ES = {
    1: "ENE", 2: "FEB", 3: "MAR", 4: "ABR", 5: "MAY", 6: "JUN",
    7: "JUL", 8: "AGO", 9: "SEP", 10: "OCT", 11: "NOV", 12: "DIC",
}


def get_sales_data(
    spark: SparkSession, fecha_corte: str = "2025-06-14"
) -> tuple[Row | None, list[Row]]:
    """Run the two report queries over the registered warehouse views.

    ``fecha_corte`` mirrors the reference's fixed cut date
    (``bot_ventas.py:36``); the month window starts on its first day.
    """
    corte = dt.date.fromisoformat(fecha_corte)
    args = {
        "fecha_corte": corte,
        "mes_inicio": corte.replace(day=1),
    }
    metrics = spark.sql(QUERY_METRICS, args=args).collect()
    distribuidores = spark.sql(QUERY_DISTRIBUIDORES, args=args).collect()
    return (metrics[0] if metrics else None), distribuidores


def format_message(
    metrics: Row, distribuidores: list[Row], fecha_corte: str = "2025-06-14"
) -> str:
    """Report rendering (``bot_ventas.py:74-107``): F10 date formatting with
    Spanish month names + F11 currency formatting, driver-side."""
    fecha_dt = dt.datetime.strptime(fecha_corte, "%Y-%m-%d")
    fecha_formateada = f"{fecha_dt.day} {MESES_ES[fecha_dt.month]}, {fecha_dt.year}"

    diaria = float(metrics["diaria"] or 0)
    acumulado = float(metrics["acumulado_mes"] or 0)
    lines = [
        "REPORTE DE COLOCACIÓN - PRÉSTAMOS",
        f"FECHA DE CORTE: {fecha_formateada}",
        "=" * 30,
        "",
        f"PRÉSTAMOS DEL DÍA: ${diaria:,.2f}",
        f"ACUMULADO MENSUAL: ${acumulado:,.2f}",
        "",
        "RENDIMIENTO POR DISTRIBUIDORA:",
    ]
    for row in distribuidores:
        lines.append(
            f"- {row['nombre_distribuidor']}: ${float(row['total_prestamos']):,.2f}"
        )
    return "\n".join(lines)


def send_to_telegram(text: str) -> bool:
    """Report sink (S7, ``bot_ventas.py:109-121``): driver-side HTTP POST
    after collect(); gated on credentials and the requests package."""
    token = os.getenv("TELEGRAM_TOKEN")
    chat_id = os.getenv("TELEGRAM_CHAT_ID")
    if not token or not chat_id:
        logger.info("telegram credentials absent; report not sent")
        return False
    try:
        import requests
    except ImportError:
        logger.warning("requests not installed; report not sent")
        return False
    resp = requests.post(
        f"https://api.telegram.org/bot{token}/sendMessage",
        json={"chat_id": chat_id, "text": text, "parse_mode": "Markdown"},
        timeout=30,
    )
    resp.raise_for_status()
    return True
