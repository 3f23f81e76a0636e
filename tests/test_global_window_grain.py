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

#: ``(relative file, site-substring, expected matches)`` → boundedness
#: proof. Anchoring is to the MATCHED SITE ITSELF (ADVICE r8): the
#: substring must appear inside the window expression's own text — from
#: the start of the match's line through 160 chars past the match — and
#: each entry pins exactly how many sites it covers, so a NEW window
#: added near an allowlisted one (or a copy of an allowlisted line) can
#: never ride an existing proof silently.
ALLOWLIST: tuple[tuple[str, str, int, str], ...] = (
    ('plans/analytics.py', 'Window.orderBy(F.unix_timestamp("d"))', 1,
     'day-grain daily-revenue series (trailing 7d frame)'),
    ('plans/advanced.py', 'Window.orderBy("d")', 1,
     'day-grain daily series (cusum / changepoint prefix)'),
    ('plans/advanced.py', 'Window.orderBy("month")', 1,
     'month-grain series (MoM lag)'),
    ('plans/advanced.py', 'F.min("day").over(Window.partitionBy())', 1,
     'scalar anchor over the day-grain census'),
    ('plans/advanced.py', 'Window.orderBy("t")', 2,
     'day-index regression frame / minute-grain KM duration census'),
    ('plans/advanced.py', 'Window.orderBy("ym")', 2,
     'month-grain index'),
    ('plans/advanced.py', 'Window.orderBy("slope_micro", "i1", "i2")', 1,
     'month-PAIR grain (|months|^2, calendar-bounded)'),
    ('plans/advanced.py', 'Window.orderBy("y")', 1,
     'calendar-day census (Spearman date marginal; docstring bound)'),
    ('plans/advanced.py', 'Window.orderBy("cents").rangeBetween(', 1,
     'skyline frontier over the DAY-MAX census (days, not orders)'),
    ('plans/advanced.py', 'F.sum("n_orders").over(Window.partitionBy())', 1,
     'order-status census total (|statuses| = 3)'),
    ('plans/advanced.py', 'Window.orderBy("region")', 1,
     'region grain (5 rows)'),
    ('plans/advanced.py', 'Window.orderBy("p_value_micro", "region")', 1,
     'region grain (5 rows, BH rank)'),
    ('plans/advanced.py', 'w_all = Window.partitionBy()', 2,
     'month-pair / region census totals (both calendar/dim bounded)'),
    ('operators/sampling.py', 'w_all = Window.partitionBy()', 1,
     'source census total (|sources| ~ 5)'),
    ('operators/sampling.py', 'total = Window.partitionBy()', 1,
     'source x lang census total (both tiny dims)'),
    ('operators/sampling.py', 'Window.orderBy(F.desc("remainder"), "source")', 1,
     'source-grain largest-remainder apportionment'),
    ('operators/sampling.py', 'wall = Window.partitionBy()', 1,
     'source-grain apportionment total'),
    ('operators/sampling.py', 'Window.orderBy(F.desc("rem"), "source")', 2,
     'source-grain largest-remainder apportionment'),
    ('operators/sampling.py', 'every = Window.partitionBy()', 2,
     'source census total (|sources| ~ 5)'),
    ('plans/advanced.py', 'Window.orderBy("shard")', 3,
     'shard-grain exclusive prefix (N/span rows; _sharded_running bound)'),
    ('operators/sampling.py', 'Window.orderBy("shard")', 1,
     'shard-grain exclusive prefix (N/span rows; _sharded_running bound)'),
    ('operators/sampling.py', 'F.sum("shard_w").over(Window.partitionBy())', 1,
     'shard-grain census total (N/span rows)'),
    ('operators/ranking.py', 'F.desc("_shard") if shard_desc', 1,
     "shard-grain exclusive prefix (the helper's documented bound)"),
    ('operators/ranking.py', 'naive = Window.orderBy(*order_cols)', 1,
     'small-frame fast path: executes ONLY after the runtime probe '
     'proved the frame <= small_frame_rows (<= 2^20 narrow rows in one '
     'task); above the threshold the sharded plan runs instead'),
    ('operators/sampling.py', 'Window.orderBy(F.desc("priority"), "doc_id")', 1,
     'frame already reduced by LIMIT WEIGHTED_SAMPLE_K (top-k bounded)'),
    ('operators/sampling.py', 'Window.orderBy("ttr_micro")', 1,
     'TTR histogram grain (<= 1e6 buckets by construction)'),
    ('operators/sampling.py', 'F.sum("c").over(Window.partitionBy())', 1,
     'TTR histogram census total'),
    ('operators/sampling.py', 'Window.orderBy("boot_mean_micro", "replicate")', 1,
     'bootstrap replicate grain (fixed replicate count)'),
    ('operators/text.py', 'Window.orderBy(F.desc("score_micro"), "phrase")', 1,
     'frame already reduced by LIMIT RAKE_TOP_K (top-k bounded)'),
    ('load/layout.py', 'W.orderBy(', 1,
     'file-manifest census (month x status shelf; lakehouse metadata grain)'),
)


def _py_files():
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def _covered_counts():
    """Map each allowlist entry to the number of window sites it covers
    under the site-anchored rule, and collect uncovered sites."""
    covered: dict[tuple[str, str], int] = {}
    offenders: list[str] = []
    for path in _py_files():
        rel = os.path.relpath(path, PKG)
        src = open(path).read()
        for m in _PAT.finditer(src):
            line_start = src.rfind("\n", 0, m.start()) + 1
            site = src[line_start : m.start() + 160]
            for f, marker, _count, _proof in ALLOWLIST:
                if rel == f and marker in site:
                    covered[(f, marker)] = covered.get((f, marker), 0) + 1
                    break
            else:
                line = src[: m.start()].count("\n") + 1
                offenders.append(
                    f"{rel}:{line}: {src[m.start(): m.start() + 80]!r}"
                )
    return covered, offenders


def test_no_unpartitioned_window_over_fact_grain():
    _covered, offenders = _covered_counts()
    assert not offenders, (
        "Unpartitioned window without a boundedness proof (single-task "
        "sort at scale; use operators/ranking.py's value-sharded plan "
        "for fact-proportional grains, or allowlist with a proof):\n"
        + "\n".join(offenders)
    )


def test_allowlist_counts_exact():
    """Each entry must cover EXACTLY its pinned number of sites: zero →
    stale (prune it); more → a new window is riding an old proof (add
    its own entry with its own boundedness argument)."""
    covered, _offenders = _covered_counts()
    bad = []
    for f, marker, count, _proof in ALLOWLIST:
        got = covered.get((f, marker), 0)
        if got != count:
            bad.append(f"{f}: {marker!r}: expected {count} sites, found {got}")
    assert not bad, "allowlist count drift:\n" + "\n".join(bad)
