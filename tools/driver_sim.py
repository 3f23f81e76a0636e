"""Simulate the driver's correctness gate locally.

Runs each of the first N registered queries (the driver checks the first
50) at a given scale factor, compares against the DuckDB oracle with the
same canonicalization the local parity suite uses, and prints one status
line per query plus a JSON summary.

Usage::

    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01] [--limit 50]
    python tools/driver_sim.py --names q1_pricing_summary,graph_bfs_levels
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import SparkSession

from python_sql_etl_project_spark import registry
from tests import parity


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument("--names", default=None, help="comma-separated override")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        names = list(qs)[: args.limit]

    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        status = "PASS"
        err = None
        try:
            if name in oracles:
                parity.assert_query_matches_oracle(spark, name, args.sf_dir)
            else:
                rows = qs[name](spark, args.sf_dir).count()
                status = f"PASS(rows-only:{rows})"
        except AssertionError as e:
            status, err = "FAIL", str(e)[:500]
        except Exception as e:  # noqa: BLE001 - report, keep going
            status, err = "ERROR", f"{type(e).__name__}: {e}"[:500]
            traceback.print_exc(limit=3)
        finally:
            spark.catalog.clearCache()
        dt = time.time() - t0
        ok = status.startswith("PASS")
        n_pass += ok
        n_fail += not ok
        results[name] = {"status": status, "sec": round(dt, 2), "err": err}
        print(f"{'✓' if ok else '✗'} {name:40s} {status:12s} {dt:6.2f}s", flush=True)

    print(json.dumps({"pass": n_pass, "fail": n_fail, "sf_dir": args.sf_dir}))
    if n_fail:
        print(json.dumps({k: v for k, v in results.items() if not v["status"].startswith("PASS")}, indent=2))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
