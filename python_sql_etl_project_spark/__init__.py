"""spark-etl-engine: a PySpark-native analytics / ETL engine.

Re-expresses the capabilities of the reference pipeline
(``antoniomx1/python-sql-etl-project``) Spark-first — lazy DataFrames,
Catalyst-optimized SQL over registered views, distributed anti-join
incremental loads — and extends it with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns), every
operator designed for 100 TB scale.

Layout:
    session         SparkSession construction with pinned semantics
    sources         ingest adapters (parquet, JSON, Excel mixed-sheet)
    operators       relational + LLM-pipeline operators
    plans           full queries (reference parity + TPC-H-style analytics)
    streaming       Structured Streaming window/session operators
    load            incremental anti-join append warehouse
    registry        queries() / oracle_sql() surface consumed by the driver
"""

__version__ = "0.1.0"
