"""Unit tests for the ledger staleness rule (tools/gen_queries_md.py).

Round 8 taught the ceiling that a by-design rows-only query with a
recorded external rows-only row (err == 'no_oracle', spark_rows > 0) is
externally evidenced — the only evidence it can ever earn — so it must
not consume a window slot every round. Pin both directions: evidenced
rows-only names pass without being windowed; unevidenced stale names
still fail.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "gen_queries_md", os.path.join(ROOT, "tools", "gen_queries_md.py")
)
gq = importlib.util.module_from_spec(spec)
sys.modules["gen_queries_md"] = gq
spec.loader.exec_module(gq)


def _run(tmp_path, monkeypatch, rows_only_evidenced):
    first = {"old_rows_only": 3, "fresh": 9}
    reg_path = tmp_path / "first_registered.json"
    reg_path.write_text(json.dumps(first))
    monkeypatch.setattr(gq, "_FIRST_REGISTERED", str(reg_path))
    qs = {"old_rows_only": None, "fresh": None}
    rounds = {8: {"somebody_else": True}}  # current round becomes 9
    return gq._check_staleness(
        qs, rounds, window=set(), rows_only_evidenced=rows_only_evidenced
    )


def test_rows_only_evidence_satisfies_ceiling(tmp_path, monkeypatch):
    assert _run(tmp_path, monkeypatch, {"old_rows_only"}) == 0


def test_unevidenced_stale_name_still_fails(tmp_path, monkeypatch):
    assert _run(tmp_path, monkeypatch, set()) == 1
