"""Static gate for the repo (VERDICT r2 #7; reference precedent
/root/reference/Makefile:13-18 `make mypy` + flake8).

mypy/ruff/flake8 are not installed in this environment and installs are
not permitted, so this is a stdlib checker (ast + symtable) covering the
error classes those gates catch most often in practice:

  1. syntax errors (every file must parse),
  2. undefined module-level names (the class mypy/pyflakes catch that
     actually breaks at runtime: typos, names referenced but never
     imported/defined),
  3. unused imports (respecting ``# noqa`` on the import line and
     ``__all__`` re-exports),
  4. annotation coverage on public functions (reported, enforced as a
     ratchet: the floor is the current measured coverage).

Exit code 0 = clean. Run via ``make lint``.
"""

from __future__ import annotations

import argparse
import ast
import builtins
import sys
import symtable
from pathlib import Path
from typing import List, Set, Tuple

REPO = Path(__file__).resolve().parents[1]
TARGETS = ["dcvgan_tpu", "tools", "tests", "bench.py", "__graft_entry__.py"]

# names python defines implicitly at module/function scope
IMPLICIT = {
    "__name__", "__file__", "__doc__", "__package__", "__loader__",
    "__spec__", "__builtins__", "__debug__", "__class__", "__module__",
    "__qualname__", "__dict__", "__annotations__",
}

ANNOTATION_FLOOR = 0.80  # ratchet: raise as coverage improves, never lower


def iter_files() -> List[Path]:
    files = []
    for t in TARGETS:
        p = REPO / t
        if p.is_file():
            files.append(p)
        elif p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
    return files


def module_bindings(table: symtable.SymbolTable) -> Set[str]:
    """Names bound at module scope (defs, imports, assignments)."""
    out = set()
    for sym in table.get_symbols():
        if sym.is_assigned() or sym.is_imported():
            out.add(sym.get_name())
    for child in table.get_children():
        out.add(child.get_name())
    return out


def undefined_names(path: Path, src: str) -> List[Tuple[int, str]]:
    """Global-scope name references with no module binding and no builtin."""
    try:
        top = symtable.symtable(src, str(path), "exec")
    except SyntaxError as e:
        return [(e.lineno or 0, f"syntax error: {e.msg}")]
    bound = module_bindings(top) | IMPLICIT | set(dir(builtins))

    problems: List[Tuple[int, str]] = []
    tree = ast.parse(src)

    # collect names referenced as globals anywhere (symtable marks a
    # symbol GLOBAL_IMPLICIT when a scope reads a name it never binds)
    unresolved: Set[str] = set()

    def walk_table(tb: symtable.SymbolTable) -> None:
        for sym in tb.get_symbols():
            name = sym.get_name()
            if name in bound:
                continue
            if sym.is_referenced() and sym.is_global() and not sym.is_assigned():
                unresolved.add(name)
        for child in tb.get_children():
            walk_table(child)

    walk_table(top)
    if unresolved:
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Name)
                and isinstance(node.ctx, ast.Load)
                and node.id in unresolved
            ):
                problems.append((node.lineno, f"undefined name {node.id!r}"))
    return problems


def unused_imports(path: Path, src: str) -> List[Tuple[int, str]]:
    tree = ast.parse(src)
    lines = src.splitlines()
    imported: dict[str, int] = {}  # bound name -> lineno
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            line = lines[node.lineno - 1] if node.lineno <= len(lines) else ""
            if "noqa" in line:
                continue
            if isinstance(node, ast.ImportFrom) and node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                name = alias.asname or alias.name.split(".")[0]
                imported[name] = node.lineno

    used: Set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    # __all__ re-exports and string annotations
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)

    return [
        (lineno, f"unused import {name!r}")
        for name, lineno in sorted(imported.items(), key=lambda kv: kv[1])
        if name not in used
    ]


def annotation_coverage(paths: List[Path]) -> Tuple[int, int]:
    """(annotated, total) over public functions in dcvgan_tpu/."""
    annotated = total = 0
    for path in paths:
        if "dcvgan_tpu" not in path.parts:
            continue
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            if node.name.startswith("_"):
                continue
            total += 1
            args = node.args
            all_args = args.posonlyargs + args.args + args.kwonlyargs
            named = [a for a in all_args if a.arg not in ("self", "cls")]
            if node.returns is not None or (
                named and all(a.annotation is not None for a in named)
            ):
                annotated += 1
    return annotated, total


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    files = iter_files()
    n_problems = 0
    for path in files:
        src = path.read_text()
        rel = path.relative_to(REPO)
        for lineno, msg in undefined_names(path, src) + unused_imports(path, src):
            print(f"{rel}:{lineno}: {msg}")
            n_problems += 1

    annotated, total = annotation_coverage(files)
    cov = annotated / total if total else 1.0
    status = "ok" if cov >= ANNOTATION_FLOOR else "BELOW FLOOR"
    print(
        f"annotation coverage (public fns, dcvgan_tpu/): "
        f"{annotated}/{total} = {cov:.1%} (floor {ANNOTATION_FLOOR:.0%}: {status})"
    )
    if cov < ANNOTATION_FLOOR:
        n_problems += 1

    print(f"{len(files)} files checked, {n_problems} problems")
    return 1 if n_problems else 0


if __name__ == "__main__":
    sys.exit(main())
