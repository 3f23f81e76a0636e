"""Forbid duplicate top-level bindings in query-registering modules.

The bug class this pins (it has bitten twice — round 5's wave-3
constant and round 5's wave-14 ``COMPACT_TARGET_ROWS``, the latter
caught only by the round-6 full-registry contract): appending
``CONST = x`` to an operator module silently REBINDS an earlier
same-named constant. Oracle SQL f-strings interpolate the value in
force at decoration time, while Spark bodies read the module global at
call time — so the two engines silently split, and only at scale
factors where the two values round differently (sf0.001 often can't
tell ceil(n/15000) from ceil(n/8192); sf0.01 can).

The test walks each module's AST and asserts every top-level name is
bound exactly once. Legitimate rebinding patterns (augmented build-up
loops, ``if``-guarded fallbacks) don't occur at module top level in
this codebase; if one ever must, give the second binding a new name.
"""

import ast
import os

import pytest

PKG = os.path.join(os.path.dirname(__file__), "..", "python_sql_etl_project_spark")

MODULES = sorted(
    os.path.join(dirpath, f)
    for dirpath, _, files in os.walk(PKG)
    for f in files
    if f.endswith(".py")
)


def _top_level_bindings(tree: ast.Module) -> list[str]:
    names: list[str] = []
    for node in tree.body:
        targets = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            targets = [node.target]
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.append(node.name)
            continue
        for t in targets:
            if isinstance(t, ast.Name):
                names.append(t.id)
            elif isinstance(t, (ast.Tuple, ast.List)):
                names.extend(
                    e.id for e in t.elts if isinstance(e, ast.Name)
                )
    return names


@pytest.mark.parametrize("path", MODULES, ids=lambda p: os.path.relpath(p, PKG))
def test_no_duplicate_top_level_bindings(path):
    with open(path) as fh:
        tree = ast.parse(fh.read())
    names = _top_level_bindings(tree)
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, (
        f"{os.path.relpath(path, PKG)} rebinds top-level name(s) {dupes}: "
        "oracle f-strings bake the FIRST value at decoration time while "
        "Spark bodies read the LAST at call time — rename the later one."
    )
