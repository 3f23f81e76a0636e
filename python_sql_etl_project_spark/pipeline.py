"""Pipeline orchestrator (replaces ``/root/reference/src/main.py``).

extract → transform → ordered load → report, with the reference's failure
semantics: all-or-nothing extraction (``extract.py:155-157``),
raise-through transform (``transform.py:136-139``), per-table load
isolation with success counting (``main.py:82-94``), exit 1 on critical
failure (``main.py:96-98``).
"""

from __future__ import annotations

import logging
import sys

from pyspark.sql import SparkSession

from .load.incremental import LoadResult, Warehouse
from .plans.star_schema import build_star_schema
from .report import format_message, get_sales_data, send_to_telegram
from .session import build_spark
from .sources.ingest import extract_sources

logger = logging.getLogger(__name__)


def run_pipeline(
    spark: SparkSession,
    warehouse_dir: str,
    excel_path: str = "data/ClientesMarca.xlsx",
    json_path: str = "data/RecomendadosMarca.json",
) -> list[LoadResult] | None:
    """One ETL run. Returns per-table load results, or None if extraction
    failed (critical)."""
    sources = extract_sources(spark, excel_path=excel_path, json_path=json_path)
    if sources is None:
        logger.critical("extraction failed for one or more sources")
        return None

    tables = build_star_schema(*sources)  # lazy; raises through on error

    warehouse = Warehouse(spark, warehouse_dir)
    results = warehouse.load_ordered(tables)
    ok = sum(r.ok for r in results)
    logger.info("load complete: %d/%d tables ok", ok, len(results))
    return results


def run_report(
    spark: SparkSession, warehouse_dir: str, fecha_corte: str = "2025-06-14"
) -> str | None:
    """Analytics + delivery (entry point 2, ``bot_ventas.py:123-131``)."""
    warehouse = Warehouse(spark, warehouse_dir)
    warehouse.register_views()
    metrics, distribuidores = get_sales_data(spark, fecha_corte)
    if metrics is None:
        logger.error("no data for report")
        return None
    text = format_message(metrics, distribuidores, fecha_corte)
    send_to_telegram(text)
    return text


def main(argv: list[str] | None = None) -> int:
    import argparse

    parser = argparse.ArgumentParser(description="spark ETL pipeline")
    parser.add_argument("--warehouse", required=True)
    parser.add_argument("--excel", default="data/ClientesMarca.xlsx")
    parser.add_argument("--json", default="data/RecomendadosMarca.json")
    parser.add_argument("--report", action="store_true")
    parser.add_argument("--fecha-corte", default="2025-06-14")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s"
    )
    spark = build_spark(app_name="etl_pipeline")
    results = run_pipeline(spark, args.warehouse, args.excel, args.json)
    if results is None or not all(r.ok for r in results):
        return 1
    if args.report:
        text = run_report(spark, args.warehouse, args.fecha_corte)
        if text is None:
            return 1
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
