"""Structural guard for the round-7 ADVICE class: corpus-grain micro
rates must pre-widen their sums.

Spark ``sum(BIGINT)`` stays int64, so ``1000000 * sum(x)`` silently
wraps past ~9.2e18 (or errors under ANSI) while the DuckDB oracle
widens ``sum()`` to HUGEINT — the exact cross-engine divergence the
round-6 ADVICE flagged in five micro-rate expressions. The fix idiom is
``1000000 * sum(CAST(x AS DECIMAL(38,0)))`` (the HITS pre-widening
pattern). This test walks every package source file and fails on any
NEW Spark-side ``1000000 * sum(`` product that is neither widened nor
on the explicit bounded-grain allowlist — the same
make-the-bug-class-impossible posture as
``tests/test_no_shadowed_constants.py``.

Classification: the engine a match belongs to is decided by which
division marker appears FIRST in the trailing context — ``//`` means
DuckDB oracle SQL (HUGEINT-safe by construction, skipped), `` div ``
means a Spark ``F.expr`` string (must be pre-widened or allowlisted).
The window is wide (600 chars) and marker-ordered rather than a fixed
short prefix, so a long oracle sum expression whose ``//`` falls late
is not misclassified as Spark (round-7 ADVICE); a match with NEITHER
marker is conservatively treated as Spark.
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "python_sql_etl_project_spark",
)

#: ``(filename, context-substring)`` pairs whose sum operands are
#: BOUNDED by construction (never corpus-grain), so int64 headroom is a
#: proven invariant rather than a scale assumption:
ALLOWLIST = (
    # pack_crossdoc_attention_mask.mask_density_micro: operands are
    # per-(source, pack) and pack-bounded (T <= budget + one doc).
    ("operators/sampling.py", "sum(n_tokens * (n_tokens + 1) div 2)"),
    # ld_compaction_planning.fill_micro: per-bin sums are bounded by
    # the shelf rule at ~COMPACT_BIN_TARGET_ROWS + one file.
    ("load/layout.py", "div {COMPACT_BIN_TARGET_ROWS}"),
)

_PAT = re.compile(r"1000000 \* sum\(")


def _py_files():
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def test_corpus_grain_micro_rates_are_prewidened():
    offenders = []
    for path in _py_files():
        rel = os.path.relpath(path, PKG)
        src = open(path).read()
        for m in _PAT.finditer(src):
            ctx = src[m.start() : m.start() + 600]
            floor_div = ctx.find("//")
            spark_div = ctx.find(" div ")
            if floor_div != -1 and (
                spark_div == -1 or floor_div < spark_div
            ):
                continue  # DuckDB oracle SQL: sum() is HUGEINT-safe
            if ctx.startswith("1000000 * sum(CAST("):
                continue  # pre-widened (the HITS pattern)
            if any(
                rel == f and marker in ctx for f, marker in ALLOWLIST
            ):
                continue  # bounded-grain by construction (documented)
            line = src[: m.start()].count("\n") + 1
            offenders.append(f"{rel}:{line}: {ctx[:100]!r}")
    assert not offenders, (
        "Spark-side micro-rate sums without DECIMAL(38,0) pre-widening "
        "(wraps int64 at corpus scale; widen per the HITS pattern or "
        "allowlist with a boundedness proof):\n" + "\n".join(offenders)
    )
