"""Smoke checks for every entry-point script (scripts/*.py, bench.py,
run_sim.py, __graft_entry__.py): they must parse, import cleanly, and
reference only names that are bound somewhere in the file.

Motivation (round-3 advisor finding): scripts/bench_strict.py called
`time.perf_counter()` without importing `time` — a NameError that only fired
after a long warm pass, so the artifact the script existed to produce was
never written. The unbound-name scan below catches that class of bug
statically; the import check catches module-level runtime errors.
"""

import ast
import builtins
import importlib.util
import pathlib
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
SCRIPTS = sorted((ROOT / "scripts").glob("*.py")) + [
    ROOT / "bench.py",
    ROOT / "run_sim.py",
    ROOT / "__graft_entry__.py",
]

_IMPLICIT = {
    "__file__", "__name__", "__doc__", "__builtins__", "__spec__",
    "__package__", "__loader__", "__debug__",
}


def _bound_and_loaded(tree: ast.AST):
    """(bound, loaded) name sets over the WHOLE file — a deliberate
    over-approximation of Python scoping (a name bound in any scope counts
    as bound everywhere), so it has no false positives and still catches
    the missing-import class of bug: `time.perf_counter()` with no
    `import time` is a Load of `time` that nothing in the file binds."""
    bound, loaded = set(), []
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                bound.add(name)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            bound.add(node.name)
        elif isinstance(node, ast.arg):
            bound.add(node.arg)
        elif isinstance(node, ast.Name):
            if isinstance(node.ctx, (ast.Store, ast.Del)):
                bound.add(node.id)
            else:
                loaded.append(node)
        elif isinstance(node, (ast.Global, ast.Nonlocal)):
            bound.update(node.names)
        elif isinstance(node, ast.ExceptHandler) and node.name:
            bound.add(node.name)
        elif isinstance(node, ast.MatchAs) and node.name:
            bound.add(node.name)
    return bound, loaded


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: p.name)
def test_script_has_no_unbound_names(path):
    tree = ast.parse(path.read_text(), filename=str(path))
    bound, loaded = _bound_and_loaded(tree)
    allowed = bound | set(dir(builtins)) | _IMPLICIT
    bad = sorted({(n.id, n.lineno) for n in loaded if n.id not in allowed})
    assert not bad, (
        f"{path.name} references names never bound anywhere in the file "
        f"(missing import?): {bad}")


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: p.name)
def test_script_imports(path):
    """Module-level execution must succeed (all scripts are main-guarded)."""
    sys.path.insert(0, str(ROOT))
    try:
        spec = importlib.util.spec_from_file_location(
            f"script_smoke_{path.stem}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert callable(getattr(mod, "main", None)) or path.name == "__graft_entry__.py"
    finally:
        sys.path.remove(str(ROOT))
