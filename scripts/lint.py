#!/usr/bin/env python
"""Offline lint: the static-hygiene chain the reference Makefile runs
(ineffassign/staticcheck/misspell/govet, reference: Makefile:51-99),
adapted to this environment — no ruff/flake8 is installed and the image
is offline, so the checks are implemented directly on Python's AST:

  * syntax errors (ast.parse)
  * unused imports (module scope; `# noqa: unused` opts out, as do
    conventional re-export shims in __init__.py)
  * bare `except:` clauses
  * mutable default arguments (list/dict/set literals)
  * f-strings with no placeholders
  * tabs in indentation / trailing whitespace

Exit 0 clean, 1 with findings. Used by `make lint` (part of `make test`)
and CI.
"""

from __future__ import annotations

import ast
import os

ROOTS = ["llamago_tpu", "tests", "scripts", "bench.py", "__graft_entry__.py"]


def _py_files(root: str):
    if os.path.isfile(root):
        yield root
        return
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                yield os.path.join(dirpath, fn)


class _ImportTracker(ast.NodeVisitor):
    def __init__(self):
        self.imported: dict[str, int] = {}  # name -> lineno
        self.used: set[str] = set()

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imported[name] = node.lineno

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            self.imported[a.asname or a.name] = node.lineno

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def lint_file(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        src = f.read()
    problems: list[str] = []
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    lines = src.splitlines()
    for i, line in enumerate(lines, 1):
        if line.rstrip("\n") != line.rstrip():
            problems.append(f"{path}:{i}: trailing whitespace")
        stripped_len = len(line) - len(line.lstrip(" \t"))
        if "\t" in line[:stripped_len]:
            problems.append(f"{path}:{i}: tab in indentation")

    is_init = os.path.basename(path) == "__init__.py"
    tracker = _ImportTracker()
    tracker.visit(tree)
    # names referenced in __all__ / docstrings of re-export shims count
    for name, lineno in sorted(tracker.imported.items(), key=lambda kv: kv[1]):
        if name in tracker.used or name == "_":
            continue
        if is_init:  # re-export shim: importing IS the use
            continue
        if lineno - 1 < len(lines) and "noqa" in lines[lineno - 1]:
            continue
        problems.append(f"{path}:{lineno}: unused import '{name}'")

    # format specs (f"{x:.1f}") are themselves JoinedStr nodes — skip them
    spec_ids = {
        id(n.format_spec)
        for n in ast.walk(tree)
        if isinstance(n, ast.FormattedValue) and n.format_spec is not None
    }
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare 'except:'")
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"{path}:{d.lineno}: mutable default argument")
        if isinstance(node, ast.JoinedStr) and id(node) not in spec_ids:
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                problems.append(
                    f"{path}:{node.lineno}: f-string without placeholders")
    return problems


def main() -> int:
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    problems: list[str] = []
    n = 0
    for root in ROOTS:
        for path in _py_files(root):
            n += 1
            problems.extend(lint_file(path))
    for p in problems:
        print(p)
    print(f"lint: {n} files, {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
