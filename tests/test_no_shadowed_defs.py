"""Repo hygiene: no module-level def/class silently shadowed by a later one.

Guards against the round-3 bug class where a dead ``events_sliding`` was
shadowed by a redefinition 130 lines later (VERDICT r3 item #4 / ADVICE low).
"""
import ast
import pathlib

import pytest

PKG = pathlib.Path(__file__).resolve().parents[1] / "yomitoku_ray"


def _module_files():
    return sorted(PKG.rglob("*.py"))


@pytest.mark.parametrize("path", _module_files(), ids=lambda p: str(p.relative_to(PKG)))
def test_no_shadowed_top_level_defs(path):
    tree = ast.parse(path.read_text())
    seen = {}
    dupes = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen:
                dupes.append(f"{node.name} (lines {seen[node.name]} and {node.lineno})")
            seen[node.name] = node.lineno
    assert not dupes, f"{path}: shadowed top-level definitions: {dupes}"
