"""Structural guard for the round-7 `weak` class: unpartitioned windows
over fact-proportional grains.

An unpartitioned ``Window.orderBy(...)`` (or ``Window.partitionBy()``)
executes as a SINGLE-partition sort/aggregate — one task holding every
input row. That is legitimate only on grains that are provably bounded
independent of fact volume: calendar grains (day/month/hour/minute
census), tiny dims (region/status/source/lang), shard-grain offsets
frames (the ``_sharded_running`` / ``ranking.py`` two-pass bound),
fixed-size histograms/replicates, Heaps-sublinear vocabularies, and
frames already reduced by a LIMIT. Customer/supplier/doc/order grains
are fact-proportional — ranking them must go through the value-sharded
two-pass plan (``operators/ranking.py``), never a bare global window.

This test walks every package source file and fails on any
unpartitioned-window site that is not on the explicit allowlist below —
the same make-the-bug-class-impossible posture as
``tests/test_micro_rate_widening.py``. Every allowlist entry carries its
boundedness proof; adding a new global window means adding a proof here.
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "python_sql_etl_project_spark",
)

_PAT = re.compile(r"(?:Window|W)\.(?:orderBy\(|partitionBy\(\))")

#: ``(relative file, context-substring)`` pairs → boundedness proof.
#: The context substring must appear within ±120 chars of the match.
ALLOWLIST: tuple[tuple[str, str, str], ...] = (
    # -- calendar grains (census bounded by the calendar, not the fact) --
    ("plans/analytics.py", 'Window.orderBy(F.unix_timestamp("d"))',
     "day-grain daily-revenue series (trailing 7d frame)"),
    ("plans/advanced.py", 'Window.orderBy("d")',
     "day-grain daily series (cusum / changepoint prefix)"),
    ("plans/advanced.py", 'Window.orderBy("month")',
     "month-grain series (MoM lag)"),
    ("plans/advanced.py", 'F.min("day").over(Window.partitionBy())',
     "scalar anchor over the day-grain census"),
    ("plans/advanced.py", 'Window.orderBy("t")',
     "day-index regression frame / minute-grain KM duration census"),
    ("plans/advanced.py", 'Window.orderBy("ym")',
     "month-grain index"),
    ("plans/advanced.py", 'Window.orderBy("slope_micro", "i1", "i2")',
     "month-PAIR grain (|months|^2, calendar-bounded)"),
    ("plans/advanced.py", 'Window.orderBy("y")',
     "calendar-day census (Spearman date marginal; docstring bound)"),
    ("plans/advanced.py", 'Window.orderBy("cents").rangeBetween(',
     "skyline frontier over the DAY-MAX census (days, not orders)"),
    # -- tiny-dim grains -------------------------------------------------
    ("plans/advanced.py", 'F.sum("n_orders").over(Window.partitionBy())',
     "order-status census total (|statuses| = 3)"),
    ("plans/advanced.py", 'Window.orderBy("region")',
     "region grain (5 rows)"),
    ("plans/advanced.py", 'Window.orderBy("p_value_micro", "region")',
     "region grain (5 rows, BH rank)"),
    ("plans/advanced.py", "w_all = Window.partitionBy()",
     "month-pair / region census totals (both calendar/dim bounded)"),
    ("operators/sampling.py", "w_all = Window.partitionBy()",
     "source census total (|sources| ~ 5)"),
    ("operators/sampling.py", "total = Window.partitionBy()",
     "source x lang census total (both tiny dims)"),
    ("operators/sampling.py", 'Window.orderBy(F.desc("remainder"), "source")',
     "source-grain largest-remainder apportionment"),
    ("operators/sampling.py", "wall = Window.partitionBy()",
     "source-grain apportionment total"),
    ("operators/sampling.py", 'Window.orderBy(F.desc("rem"), "source")',
     "source-grain largest-remainder apportionment"),
    ("operators/sampling.py", "every = Window.partitionBy()",
     "source census total (|sources| ~ 5)"),
    # -- shard-grain offsets frames (the documented two-pass bound) ------
    ("plans/advanced.py", 'Window.orderBy("shard")',
     "shard-grain exclusive prefix (N/span rows; _sharded_running bound)"),
    ("operators/sampling.py", 'Window.orderBy("shard")',
     "shard-grain exclusive prefix (N/span rows; _sharded_running bound)"),
    ("operators/sampling.py", 'F.sum("shard_w").over(Window.partitionBy())',
     "shard-grain census total (N/span rows)"),
    ("operators/ranking.py", 'F.desc("_shard") if shard_desc',
     "shard-grain exclusive prefix (the helper's documented bound)"),
    # -- fixed-size / sublinear grains -----------------------------------
    ("operators/sampling.py", 'Window.orderBy(F.desc("priority"), "doc_id")',
     "frame already reduced by LIMIT WEIGHTED_SAMPLE_K (top-k bounded)"),
    ("operators/sampling.py", 'Window.orderBy("ttr_micro")',
     "TTR histogram grain (<= 1e6 buckets by construction)"),
    ("operators/sampling.py", 'F.sum("c").over(Window.partitionBy())',
     "TTR histogram census total"),
    ("operators/sampling.py",
     'Window.orderBy("boot_mean_micro", "replicate")',
     "bootstrap replicate grain (fixed replicate count)"),
    ("operators/text.py", 'Window.orderBy(F.desc("cnt"), "t")',
     "vocabulary grain (Heaps-sublinear; documented posture — the "
     "nested census + string-prefix-sharded tiebreak is the hatch if "
     "a corpus ever outgrows it)"),
    ("operators/text.py", 'Window.orderBy(F.desc("score_micro"), "phrase")',
     "frame already reduced by LIMIT RAKE_TOP_K (top-k bounded)"),
    ("load/layout.py", "W.orderBy(",
     "file-manifest census (month x status shelf; lakehouse metadata "
     "grain)"),
)


def _py_files():
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def test_no_unpartitioned_window_over_fact_grain():
    offenders = []
    for path in _py_files():
        rel = os.path.relpath(path, PKG)
        src = open(path).read()
        for m in _PAT.finditer(src):
            lo = max(0, m.start() - 120)
            ctx = src[lo : m.start() + 120]
            if any(
                rel == f and marker in ctx
                for f, marker, _proof in ALLOWLIST
            ):
                continue
            line = src[: m.start()].count("\n") + 1
            offenders.append(
                f"{rel}:{line}: "
                f"{src[m.start(): m.start() + 80]!r}"
            )
    assert not offenders, (
        "Unpartitioned window without a boundedness proof (single-task "
        "sort at scale; use operators/ranking.py's value-sharded plan "
        "for fact-proportional grains, or allowlist with a proof):\n"
        + "\n".join(offenders)
    )


def test_allowlist_entries_all_match():
    """Every allowlist row must still anchor to a real site — stale
    entries get pruned rather than silently shadowing new code."""
    stale = []
    for f, marker, _proof in ALLOWLIST:
        src = open(os.path.join(PKG, f)).read()
        if marker not in src:
            stale.append(f"{f}: {marker!r}")
    assert not stale, "stale allowlist entries:\n" + "\n".join(stale)
