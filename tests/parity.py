"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, canonicalizes both results (columns sorted by name, rows sorted,
values normalized), and asserts exact equality — the strictest possible
stand-in for the driver's order-insensitive value hash.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_value(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return None
    return v


def canonicalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [
        tuple(_norm_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def assert_query_matches_oracle(spark, name: str, sf_dir: str) -> None:
    from python_sql_etl_project_spark import registry

    registry.load_all()
    spark_df = registry.QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    oracle_df = con.execute(registry.ORACLES[name]).df()
    con.close()

    assert sorted(c.lower() for c in spark_df.columns) == sorted(
        c.lower() for c in oracle_df.columns
    ), f"{name}: column sets differ: {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row counts differ: spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    left, right = canonicalize(spark_df), canonicalize(oracle_df)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(left, right)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
