"""Repo hygiene lints that a generic linter doesn't catch.

VERDICT r5 #2: a public helper (``let_sql``) was defined twice in one
module — the second definition silently shadowed the first, leaving dead
code that read as live documentation. This lint makes any recurrence a
test failure: no module may define the same top-level function or class
name twice (``@overload``-free codebase, so a redefinition is always a
mistake here).
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / (
    "logstream_processing_service_spark"
)


def test_no_shadowed_toplevel_definitions():
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        tree = ast.parse(py.read_text(), filename=str(py))
        seen: dict[str, int] = {}
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                if node.name in seen:
                    offenders.append(
                        f"{py.relative_to(PKG.parent)}:{node.lineno} "
                        f"redefines `{node.name}` "
                        f"(first at line {seen[node.name]})"
                    )
                else:
                    seen[node.name] = node.lineno
    assert not offenders, "\n".join(offenders)


def test_every_persist_states_cache_contract():
    """VERDICT r8 #9: every ``.persist()`` site must state the
    caller-owned cache-lifecycle contract — either in the enclosing
    docstring or as the standard greppable marker line within the 12
    lines above the call. Without it, a long-lived session calling the
    operator repeatedly accumulates corpus-sized cached relations."""
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        lines = py.read_text().splitlines()
        for i, ln in enumerate(lines):
            if ".persist()" not in ln:
                continue
            ctx = "\n".join(lines[max(0, i - 12):i + 2])
            if "caller-owned" not in ctx and "caller owned" not in ctx:
                offenders.append(f"{py.relative_to(PKG.parent)}:{i + 1}")
    assert not offenders, (
        "persist() without a caller-owned cache-contract note:\n"
        + "\n".join(offenders)
    )
