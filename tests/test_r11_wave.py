"""Invariants for the round-11 wave beyond the oracle hash gate.

* ``sk_hash_sample_quantiles`` — the sample is the deterministic
  md5-bottom-p subset (recomputed independently), sample sizes are
  consistent with it, every reported quantile (exact AND estimated) is
  a genuine element of its population at the documented rank, and the
  estimate converges on the exact value when the sample IS the
  population (the merge-audit contract: rank selection, not
  interpolation).
* ``rng_type_burst_neighbors`` — neighbor counts equal a brute-force
  recompute over raw microsecond timestamps (the banded 3-bucket
  rewrite is exact: no double counting across exploded buckets, no
  missed boundary matches), self-pairs are excluded, the relation is
  symmetric (a near b ⇔ b near a), value mass matches the recomputed
  neighbor sum, and zero-neighbor events still appear (LEFT join
  contract).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from python_sql_etl_project_spark import registry
from python_sql_etl_project_spark.operators.sketch import QSAMPLE_UPPER
from python_sql_etl_project_spark.plans.advanced import BURST_HALF_US
from python_sql_etl_project_spark.session import read_table

SF = "/root/testdata/sf0.001"

registry.load_all()


# ---------------------------------------------------------------------------
# sk_hash_sample_quantiles
# ---------------------------------------------------------------------------


def _events(spark):
    return [
        (r["event_id"], r["event_type"], r["value"])
        for r in read_table(spark, SF, "events")
        .select("event_id", "event_type", "value")
        .collect()
    ]


def _in_sample(event_id: int) -> bool:
    return hashlib.md5(str(event_id).encode()).hexdigest()[:2] < QSAMPLE_UPPER


def _rank_element(rows, p_num: int, p_den: int):
    """ceil(p·n)-rank element of rows ordered by (value, event_id)."""
    ordered = sorted(rows, key=lambda r: (r[2], r[0]))
    n = len(ordered)
    idx = (p_num * n + p_den - 1) // p_den  # ceil(p_num*n / p_den), 1-based
    return ordered[idx - 1][2]


def test_sk_sample_membership_and_ranks(spark):
    rows = _events(spark)
    by_type = defaultdict(list)
    samp_by_type = defaultdict(list)
    for r in rows:
        by_type[r[1]].append(r)
        if _in_sample(r[0]):
            samp_by_type[r[1]].append(r)
    out = {
        r["event_type"]: r
        for r in registry.QUERIES["sk_hash_sample_quantiles"](spark, SF).collect()
    }
    assert set(out) == set(by_type)
    for t, r in out.items():
        assert r["n_rows"] == len(by_type[t])
        assert r["n_sample"] == len(samp_by_type[t])
        assert r["exact_p50"] == _rank_element(by_type[t], 1, 2)
        assert r["exact_p90"] == _rank_element(by_type[t], 9, 10)
        if samp_by_type[t]:
            assert r["est_p50"] == _rank_element(samp_by_type[t], 1, 2)
            assert r["est_p90"] == _rank_element(samp_by_type[t], 9, 10)
        else:
            assert r["est_p50"] is None and r["est_p90"] is None
        # every reported quantile is a genuine population element
        vals = {x[2] for x in by_type[t]}
        assert r["exact_p50"] in vals and r["exact_p90"] in vals
        if samp_by_type[t]:
            assert r["est_p50"] in vals and r["est_p90"] in vals


def test_sk_estimate_equals_exact_on_full_population(spark, monkeypatch):
    """Rank selection (not interpolation): if the 'sample' is the whole
    population, the estimator must return the exact elements. Actually
    RUNS the Spark estimator with the sample threshold forced past every
    md5 prefix ('zz' > any hex pair, so sample == population) and
    asserts est_* == exact_* per group — the r11 version compared an
    expression to itself and tested nothing (ADVICE r11)."""
    import python_sql_etl_project_spark.operators.sketch as sk

    monkeypatch.setattr(sk, "QSAMPLE_UPPER", "zz")
    out = registry.QUERIES["sk_hash_sample_quantiles"](spark, SF).collect()
    assert out
    for r in out:
        assert r["n_sample"] == r["n_rows"], r
        assert r["est_p50"] == r["exact_p50"], r
        assert r["est_p90"] == r["exact_p90"], r


# ---------------------------------------------------------------------------
# rng_type_burst_neighbors
# ---------------------------------------------------------------------------


def _raw_events_us(spark):
    return [
        (r["event_id"], r["event_type"], r["us"], r["val"])
        for r in read_table(spark, SF, "events")
        .select(
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("us"),
            F.col("value").cast("decimal(18,2)").alias("val"),
        )
        .collect()
    ]


def test_rng_burst_matches_bruteforce(spark):
    rows = _raw_events_us(spark)
    by_type = defaultdict(list)
    for r in rows:
        by_type[r[1]].append(r)
    expect_n, expect_val = {}, {}
    for t, grp in by_type.items():
        for a in grp:
            near = [
                b
                for b in grp
                if b[0] != a[0] and abs(b[2] - a[2]) <= BURST_HALF_US
            ]
            expect_n[a[0]] = len(near)
            expect_val[a[0]] = sum(b[3] for b in near)
    out = registry.QUERIES["rng_type_burst_neighbors"](spark, SF).collect()
    assert len(out) == len(rows)  # LEFT join: zero-neighbor events appear
    for r in out:
        assert r["n_near"] == expect_n[r["event_id"]], r["event_id"]
        assert abs(r["val_near"] - float(expect_val[r["event_id"]])) < 1e-9
    assert any(r["n_near"] == 0 for r in out)  # sparse corpus really has 0s
    assert any(r["n_near"] > 0 for r in out)  # ...and real neighbors


def test_rng_burst_symmetric_and_no_self(spark):
    rows = _raw_events_us(spark)
    by_id = {r[0]: r for r in rows}
    by_type = defaultdict(list)
    for r in rows:
        by_type[r[1]].append(r)
    # symmetry of the underlying relation: recompute pairs both ways
    for t, grp in by_type.items():
        for a in grp:
            for b in grp:
                near_ab = a[0] != b[0] and abs(a[2] - b[2]) <= BURST_HALF_US
                near_ba = b[0] != a[0] and abs(b[2] - a[2]) <= BURST_HALF_US
                assert near_ab == near_ba
    # self-exclusion: an isolated event (no same-type event within the
    # window) must report 0, never 1-for-itself
    out = {
        r["event_id"]: r
        for r in registry.QUERIES["rng_type_burst_neighbors"](spark, SF).collect()
    }
    for eid, r in out.items():
        a = by_id[eid]
        brute = sum(
            1
            for b in by_type[a[1]]
            if b[0] != eid and abs(b[2] - a[2]) <= BURST_HALF_US
        )
        assert r["n_near"] == brute
