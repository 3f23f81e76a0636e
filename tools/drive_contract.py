"""Standalone driver-contract simulator: vanilla session, fresh process.

Mirrors the external harness: builds a SparkSession with NO engine confs,
imports __spark_entry__, smoke-checks entry(), then runs every queries()
entry at sf0.01 against its oracle_sql() in DuckDB with an
order-insensitive value comparison. Prints RESULT: N ok, M mismatch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
ONLY = set(os.environ.get("ONLY", "").split(",")) - {""}

spark = SparkSession.builder.master("local[8]").appName("drive-contract").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e  # noqa: E402
from tests import parity  # noqa: E402

n = e.entry(spark).count()
assert n > 0, "entry() returned 0 rows"
print(f"entry(): {n} rows ok", flush=True)

qs = e.queries()
oracles = e.oracle_sql()
ok = mismatch = 0
for name in qs:
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        if name in oracles:
            parity.assert_query_matches_oracle(spark, name, SF_DIR)
            tag = "ok"
        else:
            rows = qs[name](spark, SF_DIR).count()
            tag = f"ok(rows-only:{rows})"
        ok += 1
    except Exception as ex:  # noqa: BLE001
        mismatch += 1
        tag = f"MISMATCH: {type(ex).__name__}: {str(ex)[:300]}"
    finally:
        spark.catalog.clearCache()
    print(f"  {name:40s} {tag} ({time.time()-t0:.1f}s)", flush=True)

print(f"RESULT: {ok} ok, {mismatch} mismatch")
sys.exit(1 if mismatch else 0)
