"""Invariants for the round-12 wave beyond the oracle hash gate.

* ``asof_next_purchase_tolerance`` — the forward as-of match equals a
  brute-force recompute over raw microsecond timestamps (first purchase
  strictly after each signup, lowest event_id on simultaneous
  purchases), the tolerance gate is exact at the boundary, lead times
  are the exact integer-floor second difference, unconverted signups
  surface with NULLs rather than vanishing, and the corpus genuinely
  exercises both outcomes.
* ``scd2_rebuild_fold_audit`` — the audit row itself certifies fold ==
  one-shot (both asymmetric-difference counters zero) with exactly one
  current version per customer, and the fixed ``FOLD_YEARS`` batching
  provably covers the order log's span (the failure mode that silently
  shrinks the fold: a change-log row outside every batch is simply
  never merged).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from python_sql_etl_project_spark import registry
from python_sql_etl_project_spark.load.scd import FOLD_YEARS
from python_sql_etl_project_spark.plans.advanced import ASOF_FWD_TOL_S
from python_sql_etl_project_spark.session import read_table

SF = "/root/testdata/sf0.001"

registry.load_all()


# ---------------------------------------------------------------------------
# asof_next_purchase_tolerance
# ---------------------------------------------------------------------------


def _signup_purchase(spark):
    rows = (
        read_table(spark, SF, "events")
        .filter(F.col("event_type").isin("signup", "purchase"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
        )
        .collect()
    )
    signups, purchases = [], defaultdict(list)
    for r in rows:
        if r.event_type == "signup":
            signups.append(r)
        else:
            purchases[r.user_id].append((r.us, r.event_id))
    return signups, purchases


def test_asof_forward_matches_bruteforce(spark):
    signups, purchases = _signup_purchase(spark)
    expect = {}
    for s in signups:
        # strictly-after semantics: an equal-microsecond purchase sorts
        # BEFORE the signup in the window order, so it never matches
        cand = sorted(
            p for p in purchases.get(s.user_id, []) if p[0] > s.us
        )
        if cand and cand[0][0] - s.us <= ASOF_FWD_TOL_S * 1_000_000:
            expect[s.event_id] = (
                cand[0][1],
                (cand[0][0] - s.us) // 1_000_000,
                True,
            )
        else:
            expect[s.event_id] = (None, None, False)
    out = registry.QUERIES["asof_next_purchase_tolerance"](spark, SF).collect()
    assert len(out) == len(signups)  # every signup appears exactly once
    assert len({r.event_id for r in out}) == len(out)
    for r in out:
        want = expect[r.event_id]
        assert (r.purchase_event_id, r.lead_seconds, r.converted) == want, r
    # the corpus really exercises both outcomes
    assert any(r.converted for r in out)
    assert any(not r.converted for r in out)


def test_asof_forward_tolerance_boundary_exact(spark):
    """Every converted lead is within the tolerance; every unconverted
    signup either has no later purchase at all or its first later
    purchase exceeds the tolerance — i.e. the gate is the boundary,
    not an off-by-one of it."""
    signups, purchases = _signup_purchase(spark)
    out = {
        r.event_id: r
        for r in registry.QUERIES["asof_next_purchase_tolerance"](
            spark, SF
        ).collect()
    }
    for s in signups:
        r = out[s.event_id]
        cand = sorted(p for p in purchases.get(s.user_id, []) if p[0] > s.us)
        if r.converted:
            assert 0 <= r.lead_seconds <= ASOF_FWD_TOL_S
        else:
            assert (
                not cand
                or cand[0][0] - s.us > ASOF_FWD_TOL_S * 1_000_000
            )


# ---------------------------------------------------------------------------
# scd2_rebuild_fold_audit
# ---------------------------------------------------------------------------


def test_scd2_fold_audit_certifies_equality(spark):
    row = registry.QUERIES["scd2_rebuild_fold_audit"](spark, SF).first()
    assert row.n_only_in_fold == 0
    assert row.n_only_in_oneshot == 0
    assert row.n_versions_fold == row.n_versions_oneshot > 0
    n_cust = (
        read_table(spark, SF, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    # exactly one current version per customer with any order history
    assert row.n_current_fold == n_cust


def test_fold_years_cover_order_log_span(spark):
    """The audit's fixed calendar-year batches must cover every change
    row: a log date outside FOLD_YEARS would never be merged and the
    fold would silently shrink (exactly the bug the first registration
    attempt had with the 1992-1998 TPC-H assumption)."""
    bounds = (
        read_table(spark, SF, "orders")
        .agg(
            F.min(F.year("o_orderdate")).alias("lo"),
            F.max(F.year("o_orderdate")).alias("hi"),
        )
        .first()
    )
    years = {int(y) for y in FOLD_YEARS}
    assert set(range(bounds.lo, bounds.hi + 1)) <= years
