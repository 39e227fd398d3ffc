"""Static source-hygiene guards (no Spark session needed).

Round-5 post-mortem: a second ``def prefix_filter_jaccard_pairs`` was
appended to operators/dedup.py and silently shadowed the first — 58
lines of dead code whose integer-arithmetic fix the live copy lacked.
Python raises nothing for duplicate top-level definitions, so this is
exactly the class of bug a 10-line AST walk closes for good.
"""
import ast
import pathlib

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / (
    "aws_datalake_framework_ingestion_spark"
)


def _module_files():
    return sorted(PKG.rglob("*.py"))


def _duplicate_toplevel_defs(tree: ast.Module):
    """Names bound more than once at module top level by def/class.

    Plain assignments are excluded (rebinding a variable is normal);
    a name that is BOTH assigned and later def'd (or vice versa) is
    also flagged — that shadowing is just as silent.
    """
    def_seen: dict[str, int] = {}
    assign_seen: dict[str, int] = {}
    dups = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in def_seen:
                dups.append((node.name, def_seen[node.name], node.lineno))
            if node.name in assign_seen:  # assigned earlier, def'd now
                dups.append((node.name, assign_seen[node.name], node.lineno))
            def_seen[node.name] = node.lineno
        else:
            # plain assignments may rebind each other freely, but an
            # assignment shadowing an earlier def/class is flagged
            targets = []
            if isinstance(node, ast.Assign):
                targets = node.targets
            elif isinstance(node, ast.AnnAssign) and node.value is not None:
                targets = [node.target]
            for t in targets:
                if isinstance(t, ast.Name):
                    if t.id in def_seen:
                        dups.append((t.id, def_seen[t.id], node.lineno))
                    assign_seen[t.id] = node.lineno
    return dups


def test_no_duplicate_toplevel_definitions():
    offenders = []
    for path in _module_files():
        tree = ast.parse(path.read_text(), filename=str(path))
        for name, first, second in _duplicate_toplevel_defs(tree):
            offenders.append(f"{path}:{second} redefines {name} (first at :{first})")
    assert not offenders, "\n".join(offenders)


def test_duplicate_def_guard_has_teeth():
    """The guard must actually fire on a planted duplicate."""
    planted = ast.parse("def f():\n    pass\n\ndef f():\n    pass\n")
    assert _duplicate_toplevel_defs(planted) == [("f", 1, 4)]
    # cross-kind shadowing, both orders (r6 ADVICE: the docstring
    # claimed this and the walker didn't do it)
    assert _duplicate_toplevel_defs(
        ast.parse("def f():\n    pass\n\nf = 1\n")
    ) == [("f", 1, 4)]
    assert _duplicate_toplevel_defs(
        ast.parse("f = 1\n\ndef f():\n    pass\n")
    ) == [("f", 1, 3)]
    # plain rebinding of a variable stays allowed
    assert _duplicate_toplevel_defs(ast.parse("x = 1\nx = 2\n")) == []


def test_no_single_definition_is_vacuous():
    """Sanity: the walker sees a real number of definitions."""
    total = 0
    for path in _module_files():
        tree = ast.parse(path.read_text(), filename=str(path))
        total += sum(
            isinstance(n, (ast.FunctionDef, ast.ClassDef)) for n in tree.body
        )
    assert total > 100


def test_operators_md_count_matches_registry():
    """OPERATORS.md's header count is GENERATED (r4/r5 verdicts: the
    hand count drifted twice); this pins doc == registry so the drift
    class is closed."""
    import re

    from aws_datalake_framework_ingestion_spark.plans import REGISTRY

    text = (PKG.parent / "OPERATORS.md").read_text()
    m = re.search(
        r"<!-- GENERATED COUNT --> (\d+) registered queries, (\d+) with",
        text,
    )
    assert m, "generated count line missing from OPERATORS.md"
    n_reg = len(REGISTRY)
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    assert (int(m.group(1)), int(m.group(2))) == (n_reg, n_oracle), (
        "OPERATORS.md header drifted — rerun scratch/gen_operators_md.py"
    )
