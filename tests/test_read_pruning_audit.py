"""Lint-style audit: every ``read_parquet`` / ``sized_read`` call in
``pipelines/`` must pass ``columns=`` so only needed columns leave storage
(VERDICT r4 "wrong #2": an unpruned documents read ships the wide ``text``
column through shuffles that use three narrow columns). Genuinely
full-width consumers are whitelisted here, with the reason."""

import ast
import pathlib

PIPELINES = pathlib.Path(__file__).resolve().parent.parent / "lucene_solr_ray" / "pipelines"

# (file, enclosing function) pairs allowed to read full-width, with cause.
WHITELIST = {
    # reads the engine's own shape-token artifact — every column of the
    # token table is consumed by the spatial match
    ("shapes.py", "_read_files"),
}


def _enclosing_function(tree: ast.Module, node: ast.AST) -> str:
    best = "<module>"
    for fn in ast.walk(tree):
        if isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if fn.lineno <= node.lineno and node.lineno <= max(
                getattr(n, "lineno", fn.lineno) for n in ast.walk(fn)
            ):
                best = fn.name
    return best


def _call_name(call: ast.Call) -> str:
    f = call.func
    if isinstance(f, ast.Attribute):
        return f.attr
    if isinstance(f, ast.Name):
        return f.id
    return ""


def test_pipeline_reads_are_column_pruned():
    offenders = []
    for path in sorted(PIPELINES.glob("*.py")):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            name = _call_name(node)
            if name not in ("read_parquet", "sized_read"):
                continue
            has_cols = any(kw.arg == "columns" for kw in node.keywords)
            # sized_read(path, min_rows, columns) positional third arg
            if name == "sized_read" and len(node.args) >= 3:
                has_cols = True
            if has_cols:
                continue
            fn = _enclosing_function(tree, node)
            if (path.name, fn) in WHITELIST:
                continue
            offenders.append(f"{path.name}:{node.lineno} in {fn}()")
    assert not offenders, (
        "unpruned parquet reads in pipelines/ (add columns=[...] or "
        "whitelist with cause in test_read_pruning_audit.py):\n  "
        + "\n  ".join(offenders)
    )
