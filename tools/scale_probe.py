"""Empirical scaling probe: how do the headline plans behave at 8x data?

Builds an 8x replica of the largest sf0.1 tables (fact PKs shifted per
copy so keys stay unique; FK columns into the small dimensions are left
unshifted so dim joins still resolve; dimensions are not replicated —
facts grow faster than dims in every real warehouse), then times a
representative query slice at 1x and 8x and prints the wall-clock
scaling factor per query.

A plan whose cost scales ~linearly (factor ≈ 8 or below on a fixed-core
box) is shuffle/partition-healthy; a superlinear factor flags a plan
whose candidate structures blow up with data volume. Results are
summarized in README.md §Scale design.

Usage::

    python tools/scale_probe.py [--mult 8] [--queries q1_pricing_summary,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

#: table -> columns to shift per replica (PK-like, must stay unique).
SHIFT_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: copied as-is (dimensions).
PLAIN = ("region", "nation", "customer", "supplier", "part")

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q9_profit_by_nation_year",
    "q18_large_volume_customers",
    "ref_incremental_antijoin",
    "win_sessionize_events",
    "txt_unigram_lm_score",
    "dd_exact_text",
    "dd_minhash_lsh_pairs",
    "sim_ann_band_lsh",
    "smp_deterministic_shuffle",
]

SHIFT = 1_000_000_000


def build_replica(
    spark,
    mult: int,
    out_dir: str,
    distinct_docs: bool = False,
    shift_custkey: bool = False,
    value_skew: bool = False,
) -> None:
    """``distinct_docs=True`` builds the clique-controlled variant: the
    replica copies of ``documents`` get every TOKEN suffixed with the
    copy index, so copies of the same base doc share NO shingles / text
    hashes (cross-copy near-dup cliques cannot form) while within-copy
    similarity structure is bit-identical to the base — the probe then
    measures how a pair operator's PLAN scales with corpus size when
    clique sizes are a held data property, separating genuine
    superlinear scoring from the replica's clique-inflation artifact
    (a plain replica multiplies every dup clique by ``mult``, which real
    corpus growth does not do).

    ``shift_custkey=True`` also shifts ``o_custkey`` per copy: the plain
    replica reuses customer keys, so the CUSTOMER-grain frame the rank
    rewrites operate on would not grow at all — shifting it makes the
    ranked population itself scale ``mult``×, which is what the sharded
    rank plan must absorb. (Only valid for orders-only queries — the
    shifted keys no longer resolve against the customer dim.)

    ``value_skew=True`` additionally REPLACES ``o_totalprice`` on copies
    ``i >= mult/2`` with a narrow band (900 + (o_orderkey mod 1000)/10),
    clustering ~half of all customers' spend totals into a range one to
    two value-shards wide — the adversarial case for value-range
    sharding, where the hottest shard holds ~50% of the rank frame."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for name in PLAIN:
        src = os.path.join(BASE, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            spark.read.parquet(src).write.mode("overwrite").parquet(dst)
    for name, cols in SHIFT_COLS.items():
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))
        parts = []
        for i in range(mult):
            p = df
            for c in cols:
                p = p.withColumn(c, F.col(c) + F.lit(i * SHIFT))
            if shift_custkey and name == "orders" and i > 0:
                p = p.withColumn(
                    "o_custkey", F.col("o_custkey") + F.lit(i * SHIFT)
                )
            if value_skew and name == "orders" and i >= mult // 2:
                p = p.withColumn(
                    "o_totalprice",
                    (
                        F.lit(900.0)
                        + (F.col("o_orderkey") % 1000).cast("double") / 10.0
                    ),
                )
            if distinct_docs and name == "documents" and i > 0:
                p = p.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), r"\s+"),
                            lambda t: F.concat(t, F.lit(f"_{i}")),
                        ),
                        " ",
                    ),
                )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)


def time_query(spark, fn, sf_dir: str) -> float:
    spark.catalog.clearCache()
    spark.sparkContext._jvm.java.lang.System.gc()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument(
        "--distinct-docs",
        action="store_true",
        help="clique-controlled documents replica (see build_replica)",
    )
    ap.add_argument(
        "--shift-custkey",
        action="store_true",
        help="also shift o_custkey per copy (customer-grain growth; "
        "orders-only queries)",
    )
    ap.add_argument(
        "--value-skew",
        action="store_true",
        help="cluster ~50%% of copies' o_totalprice into a narrow band "
        "(adversarial value-shard skew)",
    )
    args = ap.parse_args()

    from python_sql_etl_project_spark import registry
    from python_sql_etl_project_spark.session import build_spark

    spark = build_spark(app_name="scale-probe", master="local[32]")
    registry.load_all()
    names = (
        [n for n in args.queries.split(",") if n]
        if args.queries
        else DEFAULT_QUERIES
    )

    suffix = (
        ("d" if args.distinct_docs else "")
        + ("c" if args.shift_custkey else "")
        + ("s" if args.value_skew else "")
    )
    rep_dir = os.path.join(args.out, f"x{args.mult}{suffix}")
    build_replica(
        spark,
        args.mult,
        rep_dir,
        distinct_docs=args.distinct_docs,
        shift_custkey=args.shift_custkey,
        value_skew=args.value_skew,
    )

    results = {}
    for name in names:
        fn = registry.QUERIES[name]
        t1 = time_query(spark, fn, BASE)
        t1 = min(t1, time_query(spark, fn, BASE))
        tn = time_query(spark, fn, rep_dir)
        tn = min(tn, time_query(spark, fn, rep_dir))
        factor = round(tn / t1, 2) if t1 > 0 else None
        results[name] = {"t_1x": t1, f"t_{args.mult}x": tn, "factor": factor}
        print(f"{name:32s} 1x={t1:7.2f}s {args.mult}x={tn:7.2f}s factor={factor}", flush=True)

    print(json.dumps({"mult": args.mult, "results": results}))


if __name__ == "__main__":
    main()
