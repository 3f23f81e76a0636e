"""Value-sharded GLOBAL rank / running-sum plans (round 8).

The unpartitioned companion of ``sampling._sharded_running``: a global
``ORDER BY`` window (``row_number``, ``ntile``, ``percent_rank``,
``cume_dist``, running sums) executes in Spark as a single-partition
sort — one task holding every row. That is fine for provably bounded
grains (days, regions, shards, histograms) but a scale-killer on any
fact-proportional grain: TPC-H customers scale with SF, so "rank the
customers" at the 100 TB north star would push 10^9–10^10 rows through
one window task.

The fix is the ``agg_mann_whitney_u`` two-pass prefix plan, packaged
here once for every global-ranking consumer:

1. shard each row by a contiguous range of the SORT KEY (``cents div
   span`` — any expression monotone in the total order, constant on
   ties);
2. reduce each shard to one map-side-combined partial per running
   value;
3. exclusive-prefix the shard-grain frame (the ONLY remaining
   single-task window — ``N/span`` tiny rows, bound documented in
   ``sampling._sharded_running``);
4. broadcast the offsets back and finish every shard's rows
   independently with a ``partitionBy(_shard)`` window.

Integer-exact: outputs are bit-identical to the single-window form, so
DuckDB oracles keep their plain ``OVER (ORDER BY ...)`` text and the
driver's hash gate is unchanged.

``ntile_from_rank`` then derives NTILE(k) from (row_number, n) with the
standard SQL remainder rule — the first ``n mod k`` buckets take one
extra row — as pure integer arithmetic, so quartile banding never needs
the global window at all.

Skew bound (pinned here so scale audits don't re-derive it): parallelism
is bounded by the VALUE distribution — a value band one shard wide
holding p% of rows puts p% of the frame through one in-shard window task
(the 8× ``--value-skew`` probe measures exactly this). Two escape
hatches: (a) shrink the span — the hot-shard mass is linear in it down
to the tie mass of a single value; (b) for genuinely tied-heavy keys,
nest one level: census the tied value (collapsing ties to one row),
rank the census with this same plan, and break ties per value with a
``partitionBy(value, tiebreak div span2)`` sharded row_number — the
``_sharded_running`` pattern with the value as the partition key. Both
preserve bit-identical output (pure prefix arithmetic).
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Small-frame fast-path default threshold (rows), round-9 verdict item
#: 7: when a bounded runtime probe shows the frame fits one window task,
#: the census + offsets stages are pure overhead (~1 s of fixed stage
#: latency per rank pass at bench scale) and the helper runs the plain
#: global window instead — output identical BY DEFINITION (the naive
#: window is the semantics the sharded plan reproduces). 2^20 narrow
#: rank rows is tens of MB in one sort task — comfortably bounded; above
#: it the sharded plan is mandatory (README crossover table: ratio 0.94
#: at 2^20). The env override exists so ``tools/scale_probe.py`` can
#: force the sharded path (``SPARK_GRAFT_SMALL_FRAME_ROWS=0``) and
#: measure it at any replica factor.
_DEFAULT_SMALL_FRAME_ROWS: int = 1 << 20


def default_small_frame_rows() -> int:
    """The fast-path threshold, honoring ``SPARK_GRAFT_SMALL_FRAME_ROWS``
    AT CALL TIME (ADVICE r9): an import-time read would silently ignore a
    harness that sets the env var after this package is first imported
    (``tools/gen_plans_md.py`` used to have to order its imports around
    exactly that)."""
    return int(
        os.environ.get(
            "SPARK_GRAFT_SMALL_FRAME_ROWS", str(_DEFAULT_SMALL_FRAME_ROWS)
        )
    )


#: Sentinel: "use the module default" (callers that must pin a behavior
#: pass an explicit int or ``None``).
_USE_DEFAULT: int = -1


def frame_fits_one_task(df: DataFrame, threshold: int | None = None) -> bool:
    """Bounded probe: does ``df`` provably fit one window task?

    ``limit(threshold + 1).count()`` over a 1-column projection, so each
    scan task stops after ``threshold + 1`` rows. Callers that feed the
    SAME frame (or frames of the same row count) through several rank
    passes probe ONCE here and pass the decision to each pass via
    ``frame_fits=`` (ADVICE r9: a per-pass probe over an unpersisted
    chained input re-executes the previous pass's plan — limit cannot
    prune below a shuffle or window). Probe ``df`` should be the
    cheapest same-count frame available (a persisted upstream grain).
    """
    if threshold is None:
        threshold = default_small_frame_rows()
    if not threshold:
        return False
    # limit() takes a JVM int: clamp the probe for thresholds beyond
    # 2^31-2 (a caller passing one has declared any frame fits one
    # task — the probe then can never exceed the limit)
    probed = (
        df.select(F.lit(1).alias("_p"))
        .limit(min(threshold + 1, (1 << 31) - 1))
        .count()
    )
    return probed <= threshold


def sharded_global_running(
    df: DataFrame,
    shard: Column,
    order_cols: Sequence,
    values: Sequence[tuple[Column, str]],
    shard_desc: bool = False,
    small_frame_rows: int | None = _USE_DEFAULT,
    frame_fits: bool | None = None,
) -> DataFrame:
    """Add inclusive global running sums over ``ORDER BY order_cols``.

    ``values`` is a sequence of ``(column, out_name)`` pairs; each
    ``out_name`` becomes ``sum(column) OVER (ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` — computed shard-parallel, bit-identical to
    the naive global window (pinned by ``tests/test_global_ranking.py``).

    ``shard`` must be monotone nondecreasing along the total order and
    constant on tied sort keys (pass ``shard_desc=True`` when the order
    is descending, with ``shard`` still ASCENDING in the underlying
    value). ``(F.lit(1), "r")`` yields the global ``row_number``.

    ``shard`` must also be NON-NULL for every row: the offsets return
    via an inner equi-join on ``_shard``, so a null shard key (a null
    sort value) would otherwise silently DROP the row. Every current
    caller derives the shard from a non-null aggregate; a caller ranking
    a nullable key must coalesce it into the key's sort position first
    (SQL sorts NULLS FIRST ascending — ``coalesce(x, <min sentinel>)``).
    The contract is enforced at runtime ON BOTH PATHS: a NULL shard key
    raises ``USER_RAISED_EXCEPTION`` instead of losing rows (ADVICE r8),
    and the fast path evaluates the same guard through its value columns
    (ADVICE r9) so a caller bug with a nullable key fails at ANY scale,
    not only above the threshold.

    NULL ``values`` are treated as 0 on BOTH paths (ADVICE r9): each
    value is coalesced to 0 before any sum, so the fast path and the
    sharded path produce identical output even through an all-NULL
    region (the plain-SQL window would yield NULL there — a caller
    needing that semantics must not use this helper). Current callers
    pass ``lit(1)`` or non-null aggregates, for which this is a no-op.

    ``small_frame_rows`` (round 9): when set (the default,
    :func:`default_small_frame_rows`), the :func:`frame_fits_one_task`
    bounded probe runs first, and if the frame provably fits one window
    task the helper returns the plain global window (no census, no
    offsets join). The probe re-executes ``df``'s lineage once, so
    callers whose input is NOT persisted (and expensive to recompute)
    pass ``None`` to skip straight to the sharded plan; every
    persisted-input caller keeps the default.

    ``frame_fits`` (ADVICE r9): callers chaining SEVERAL rank passes
    over same-count frames probe once with :func:`frame_fits_one_task`
    on the cheapest frame and pass the decision here — ``True`` forces
    the fast path, ``False`` the sharded plan, ``None`` (default)
    probes per ``small_frame_rows``.

    BEHAVIOR CHANGE (round 10, deliberate — ADVICE r9 items 2/4): the
    fast path previously reproduced plain-window semantics below the
    threshold (NULLS FIRST ranking of a null shard key, NULL-propagating
    sums); it now enforces the SAME contract as the sharded plan — NULL
    shard key raises, NULL values coalesce to 0 — so an external caller
    relying on the old fast-path semantics gets an error or zeros where
    it previously got NULL-window results. Scale-invariance of the
    helper's semantics won over back-compat; pinned by
    ``tests/test_global_ranking.py``.
    """
    guard = F.raise_error(
        F.lit(
            "sharded_global_running: NULL shard key (null sort "
            "value?) — coalesce it into its sort position first"
        )
    )
    # NULL-shard raise + NULL-value→0, evaluated per row on either path
    guarded = [
        (F.coalesce(F.when(shard.isNotNull(), v).otherwise(guard), F.lit(0)), name)
        for v, name in values
    ]
    if frame_fits is None:
        if small_frame_rows == _USE_DEFAULT:
            small_frame_rows = default_small_frame_rows()
        frame_fits = small_frame_rows is not None and frame_fits_one_task(
            df, small_frame_rows
        )
    if frame_fits:
        naive = Window.orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )  # grain: caller-probed <= small_frame_rows (runtime-bounded)
        out = df
        for v, name in guarded:
            out = out.withColumn(name, F.sum(v).over(naive))
        return out
    sums = [
        F.coalesce(F.sum(v), F.lit(0)).alias(f"_sw{i}")
        for i, (v, _) in enumerate(guarded)
    ]
    base = df.withColumn(
        "_shard", F.when(shard.isNotNull(), shard).otherwise(guard)
    )
    partials = base.groupBy("_shard").agg(*sums)
    off_w = (
        Window.orderBy(F.desc("_shard") if shard_desc else F.asc("_shard"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )  # grain: shard (N/span rows — the documented bounded offsets frame)
    offs = partials.select(
        "_shard",
        *[
            (F.sum(f"_sw{i}").over(off_w) - F.col(f"_sw{i}")).alias(
                f"_off{i}"
            )
            for i in range(len(values))
        ],
    )
    in_shard = (
        Window.partitionBy("_shard")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = base.join(F.broadcast(offs), "_shard")
    for i, (v, name) in enumerate(guarded):
        out = out.withColumn(
            name, F.col(f"_off{i}") + F.sum(v).over(in_shard)
        )
    return out.drop("_shard", *[f"_off{i}" for i in range(len(values))])


def sharded_global_row_number(
    df: DataFrame,
    shard: Column,
    order_cols: Sequence,
    out: str = "r",
    shard_desc: bool = False,
    small_frame_rows: int | None = _USE_DEFAULT,
    frame_fits: bool | None = None,
) -> DataFrame:
    """Global ``row_number() OVER (ORDER BY order_cols)`` without the
    single-partition sort (running count through the sharded plan)."""
    return sharded_global_running(
        df,
        shard,
        order_cols,
        [(F.lit(1), out)],
        shard_desc=shard_desc,
        small_frame_rows=small_frame_rows,
        frame_fits=frame_fits,
    )


def _quoted_ident(name: str) -> str:
    """Backtick-quote a plain column name; reject anything that is not
    a simple identifier (expressions must be materialized to a named
    column by the caller)."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name or ""):
        raise ValueError(
            f"ntile_from_rank: not a plain column name: {name!r}"
        )
    return f"`{name}`"


def ntile_from_rank(rank: str, n: str, k: int) -> Column:
    """NTILE(k) as integer arithmetic on (global row_number, total n).

    Standard SQL remainder rule (both engines): with ``q = n div k`` and
    ``rem = n mod k``, the first ``rem`` buckets hold ``q + 1`` rows and
    the rest hold ``q``. Rows ``1 .. rem*(q+1)`` land in bucket
    ``ceil(r / (q+1))``; later rows in ``rem + ceil((r - rem*(q+1)) / q)``.
    When ``n < k`` the ELSE branch is unreachable (``rem = n`` covers
    every row), so its ``div q`` with ``q = 0`` never evaluates.

    ``rank`` / ``n`` are COLUMN NAMES (not expressions): validated and
    backtick-quoted before interpolation so an exotic name (or an
    accidental expression string) fails loudly instead of silently
    changing semantics (ADVICE r8).
    """
    rank, n = _quoted_ident(rank), _quoted_ident(n)
    if not isinstance(k, int) or k < 1:
        raise ValueError(f"ntile_from_rank: k must be a positive int: {k!r}")
    q = f"({n} div {k})"
    rem = f"({n} % {k})"
    head = f"({rem} * ({q} + 1))"
    return F.expr(
        f"CASE WHEN {rank} <= {head}"
        f" THEN ({rank} + {q}) div ({q} + 1)"
        f" ELSE {rem} + 1 + ({rank} - {head} - 1) div {q} END"
    )
