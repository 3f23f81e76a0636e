"""Pin the driver-facing query ordering contract.

Round 1's external correctness gate walked ``queries()`` in dict order and
stopped at exactly 50 entries, leaving every LLM-pipeline family unverified
(VERDICT.md round 1, finding #1). ``registry.all_queries()`` now emits an
explicit priority order; this test fails if a future registration pushes a
load-bearing family back out of the checked window.
"""

from python_sql_etl_project_spark import registry

CRITICAL_PREFIXES = (
    "ref_", "dd_", "sim_", "txt_", "mm_",
    "smp_", "pack_", "decon_", "strm_",
)


def test_critical_families_inside_first_50():
    """Every ORACLE-BACKED critical query sits in the first 50 slots (the
    window round 1's external gate actually checked). Rows-only entries
    (no oracle) may fall outside — a driver row for them carries the
    least evidence, so they yield their slot when the tiers overflow."""
    names = list(registry.all_queries())
    oracles = registry.all_oracles()
    first_50 = set(names[:50])
    stragglers = [
        n for n in names
        if n.startswith(CRITICAL_PREFIXES) and n in oracles
        and n not in first_50 and n not in registry.SPILL_LAST
    ]
    assert not stragglers, f"critical queries outside the 50-window: {stragglers}"


def test_oracles_follow_query_order():
    qnames = list(registry.all_queries())
    onames = list(registry.all_oracles())
    pos = {n: i for i, n in enumerate(qnames)}
    assert onames == sorted(onames, key=pos.__getitem__)
    assert set(onames) <= set(qnames)


def test_every_query_callable_and_distinct():
    qs = registry.all_queries()
    assert len(qs) == len(set(qs))
    assert all(callable(f) for f in qs.values())
