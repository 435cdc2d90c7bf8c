"""Driver-collect hygiene gate (VERDICT r2 "Next round" #7).

Every ``.collect()`` in the engine package must be bounded: either the
call chain itself contains a ``.limit(...)`` (so at most a known number
of rows reaches the driver), or the site is on the explicit allowlist
below with a documented reason why it is bounded by construction.

This is a static AST scan, not a grep: it finds the receiver chain of
each ``collect`` call, so a ``limit`` anywhere earlier in the same
fluent chain qualifies.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "opengemini_spark"

# (relative path, enclosing function) -> why the collect is bounded.
ALLOWLIST = {
    ("api.py", "handle_write"):
        "one row per distinct measurement in the posted batch — bounded by "
        "the batch the client sent, not by stored data",
    ("sources/line_protocol.py", "to_measurement_table"):
        "one row per distinct field name — bounded by schema width",
    ("influxql/planner.py", "plan_show"):
        "SHOW SERIES CARDINALITY: one row per 1-week shard group — "
        "bounded by the data's time span, not its volume",
    ("influxql/planner.py", "_plan_show_meta"):
        "SHOW TAG VALUES: one row per distinct tag value — the same "
        "tag-index materialization the reference's meta layer performs "
        "(show_tag_values_executor.go collects all values to the "
        "coordinator before the limit slice)",
}


def _chain_has_limit(call: ast.Call) -> bool:
    """True if the fluent chain ending in this ``collect`` call contains a
    ``.limit(...)`` / ``.head(n)`` / ``.take(n)`` step."""
    node = call
    while True:
        if isinstance(node, ast.Call):
            node = node.func
        elif isinstance(node, ast.Attribute):
            if node.attr in ("limit", "head", "take"):
                return True
            node = node.value
        else:
            return False


def _enclosing_function(tree: ast.AST, lineno: int) -> str:
    best = ""
    for n in ast.walk(tree):
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if n.lineno <= lineno <= max(
                getattr(c, "end_lineno", n.lineno) or n.lineno
                for c in ast.walk(n)
            ):
                best = n.name
    return best


def test_no_unbounded_collect_in_engine_package():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "collect"
            ):
                if _chain_has_limit(node):
                    continue
                fn = _enclosing_function(tree, node.lineno)
                if (rel, fn) in ALLOWLIST:
                    continue
                offenders.append(f"{rel}:{node.lineno} (in {fn or '<module>'})")
    assert not offenders, (
        "unbounded .collect() outside the allowlist — add a .limit(...) to "
        "the chain or document why it is bounded: " + ", ".join(offenders)
    )
