#!/usr/bin/env python
"""Enforcing stdlib-only linter (flake8-subset) for environments without
flake8/ruff.

The reference gates CI on flake8 + mypy (ref Makefile:5-6, mypy.ini,
.github/workflows/linter.yml). This container bakes in neither and
forbids installs, so `make lint` runs this AST/token-based checker with
a matching core rule set — ENFORCING (non-zero exit on any violation).
When flake8 is importable it is used instead (setup.cfg carries the
equivalent config), and `make typecheck` runs mypy when available
(mypy.ini) — this file is the always-available floor, not a replacement.

Rules (flake8 codes where they correspond):
  E501  line longer than MAX_LINE columns
  W291/W293  trailing whitespace
  W605  invalid escape sequence in a non-raw string (SyntaxWarning)
  E722  bare `except:`
  F401  imported name never used (module scope; `__init__.py`,
        `as`-re-exports, `__all__` entries and TYPE_CHECKING exempt)
  F811  redefinition of an imported/def'd name before use
  F541  f-string without placeholders
  E999  syntax error
  T100  leftover debugger call (pdb/breakpoint())

Annotation-sanity floor (a stdlib stand-in so the typecheck gate is not
a no-op on containers without mypy; `make typecheck` still runs the real
mypy when importable):
  F722  syntax error in forward (string) annotation
  TC001 annotation references a name bound nowhere in the module
  TC002 annotation references a nonexistent `typing` attribute
  TC003 `no_type_check` escape hatch (forbidden in package code — it
        silently exempts the function from every future mypy run)
"""

from __future__ import annotations

import argparse
import ast
import sys
import tokenize
import warnings
from pathlib import Path

MAX_LINE = 100


def _line_checks(path: Path, src: str, errors: list) -> None:
    for i, line in enumerate(src.splitlines(), 1):
        stripped = line.rstrip("\n")
        # URLs and long string literals still count — same as flake8
        if len(stripped) > MAX_LINE and "noqa: E501" not in stripped:
            errors.append((path, i, f"E501 line too long "
                           f"({len(stripped)} > {MAX_LINE})"))
        if stripped != stripped.rstrip() and "noqa" not in stripped:
            code = "W293" if not stripped.strip() else "W291"
            errors.append((path, i, f"{code} trailing whitespace"))


class _Visitor(ast.NodeVisitor):
    def __init__(self, path: Path, src_lines: list):
        self.path = path
        self.lines = src_lines
        self.errors: list = []
        # name -> (lineno, is_import) for module-scope definitions
        self.imports: dict = {}
        self.used: set = set()
        self.exported: set = set()
        self.in_type_checking = 0

    def _noqa(self, lineno: int, code: str) -> bool:
        if 1 <= lineno <= len(self.lines):
            line = self.lines[lineno - 1]
            return "noqa" in line and (f"noqa: {code}" in line
                                       or "noqa" == line.split("#")[-1].strip())
        return False

    # -- imports (module scope only: generic_visit not called on defs for
    #    import tracking; nested imports are often conditional/lazy) -------
    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self._record_import(name, node.lineno, a.asname == a.name)
        self.generic_visit(node)

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            self.generic_visit(node)
            return
        for a in node.names:
            if a.name == "*":
                continue
            self._record_import(a.asname or a.name, node.lineno,
                                a.asname == a.name)
        self.generic_visit(node)

    def _record_import(self, name, lineno, explicit_reexport):
        if explicit_reexport:      # `import x as x` = re-export idiom
            self.used.add(name)
        self.imports.setdefault(name, []).append(lineno)

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node):
        self.generic_visit(node)

    def visit_If(self, node):
        test = node.test
        is_tc = (isinstance(test, ast.Name) and test.id == "TYPE_CHECKING") \
            or (isinstance(test, ast.Attribute) and test.attr == "TYPE_CHECKING")
        if is_tc:
            # names imported for annotations only — exempt from F401
            for sub in ast.walk(ast.Module(body=node.body, type_ignores=[])):
                if isinstance(sub, (ast.Import, ast.ImportFrom)):
                    for a in sub.names:
                        self.used.add((a.asname or a.name).split(".")[0])
        self.generic_visit(node)

    def visit_Assign(self, node):
        for t in node.targets:
            if isinstance(t, ast.Name) and t.id == "__all__":
                try:
                    for v in ast.literal_eval(node.value):
                        self.exported.add(v)
                except Exception:
                    pass
        self.generic_visit(node)

    def visit_ExceptHandler(self, node):
        if node.type is None and not self._noqa(node.lineno, "E722"):
            self.errors.append((self.path, node.lineno,
                                "E722 do not use bare 'except'"))
        self.generic_visit(node)

    def visit_JoinedStr(self, node):
        if not any(isinstance(v, ast.FormattedValue) for v in node.values):
            if not self._noqa(node.lineno, "F541"):
                self.errors.append((self.path, node.lineno,
                                    "F541 f-string without placeholders"))
        # visit interpolated expressions but NOT format_spec (itself a
        # JoinedStr of constants — would false-positive F541)
        for v in node.values:
            if isinstance(v, ast.FormattedValue):
                self.visit(v.value)

    def visit_Call(self, node):
        f = node.func
        name = f.id if isinstance(f, ast.Name) else (
            f.attr if isinstance(f, ast.Attribute) else "")
        if name in ("set_trace", "breakpoint") and not self._noqa(
                node.lineno, "T100"):
            self.errors.append((self.path, node.lineno,
                                f"T100 leftover debugger call '{name}'"))
        self.generic_visit(node)


def _annotation_checks(tree: ast.Module, path: Path, lines: list,
                       errors: list) -> None:
    """Stdlib mypy floor: every name an annotation references must be
    bound SOMEWHERE in the module (import, def, assignment, parameter) or
    be a builtin — catching annotation typos that `from __future__ import
    annotations` hides from runtime; attributes on the `typing` module
    are verified against the real module (`tp.Optinal` etc.)."""
    import builtins
    import typing as _typing

    def noqa(lineno: int, code: str) -> bool:
        if 1 <= lineno <= len(lines):
            line = lines[lineno - 1]
            return "noqa" in line and (
                f"noqa: {code}" in line
                or "noqa" == line.split("#")[-1].strip())
        return False

    bound = set(dir(builtins)) | {"__file__", "__name__", "__doc__"}
    typing_aliases = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(
                node.ctx, (ast.Store, ast.Del)):
            bound.add(node.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            bound.add(node.name)
        elif isinstance(node, ast.arg):
            bound.add(node.arg)
        elif isinstance(node, ast.Import):
            for a in node.names:
                top = (a.asname or a.name).split(".")[0]
                bound.add(top)
                if a.name == "typing":
                    typing_aliases.add(a.asname or "typing")
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name != "*":
                    bound.add(a.asname or a.name)
        elif isinstance(node, (ast.Global, ast.Nonlocal)):
            bound.update(node.names)

    def check_expr(expr: ast.expr, lineno: int) -> None:
        for sub in ast.walk(expr):
            if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
                if sub.id not in bound and not noqa(lineno, "TC001"):
                    errors.append((path, lineno,
                                   f"TC001 annotation name '{sub.id}' is "
                                   "bound nowhere in this module"))
            elif (isinstance(sub, ast.Attribute)
                  and isinstance(sub.value, ast.Name)
                  and sub.value.id in typing_aliases
                  and not hasattr(_typing, sub.attr)
                  and not noqa(lineno, "TC002")):
                errors.append((path, lineno,
                               f"TC002 'typing.{sub.attr}' does not exist"))
            elif isinstance(sub, ast.Constant) and isinstance(sub.value, str):
                # forward annotation: parse and recurse
                try:
                    inner = ast.parse(sub.value, mode="eval").body
                except SyntaxError:
                    if not noqa(lineno, "F722"):
                        errors.append((path, lineno,
                                       "F722 syntax error in forward "
                                       f"annotation {sub.value!r}"))
                    continue
                check_expr(inner, lineno)

    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for dec in node.decorator_list:
                name = dec.id if isinstance(dec, ast.Name) else (
                    dec.attr if isinstance(dec, ast.Attribute) else "")
                if name == "no_type_check" and not noqa(dec.lineno, "TC003"):
                    errors.append((path, dec.lineno,
                                   "TC003 no_type_check escape hatch"))
            args = node.args
            for a in (args.posonlyargs + args.args + args.kwonlyargs
                      + [x for x in (args.vararg, args.kwarg) if x]):
                if a.annotation is not None:
                    check_expr(a.annotation, a.lineno)
            if node.returns is not None:
                check_expr(node.returns, node.lineno)
        elif isinstance(node, ast.AnnAssign):
            check_expr(node.annotation, node.lineno)


def check_file(path: Path) -> list:
    errors: list = []
    try:
        src = path.read_text(encoding="utf-8")
    except (OSError, UnicodeDecodeError) as exc:
        return [(path, 0, f"E902 cannot read: {exc}")]
    _line_checks(path, src, errors)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always", SyntaxWarning)
        try:
            tree = ast.parse(src, filename=str(path))
        except SyntaxError as exc:
            errors.append((path, exc.lineno or 0, f"E999 {exc.msg}"))
            return errors
        for w in caught:
            if issubclass(w.category, SyntaxWarning):
                errors.append((path, getattr(w, "lineno", 0) or 0,
                               f"W605 {w.message}"))
    lines = src.splitlines()
    v = _Visitor(path, lines)
    v.visit(tree)
    errors.extend(v.errors)
    _annotation_checks(tree, path, lines, errors)
    # docstrings/strings can reference names (doctest/sphinx) — flake8
    # does not count those either; keep parity (no special handling).
    if path.name != "__init__.py":          # __init__ = re-export surface
        for name, linenos in v.imports.items():
            if name in v.used or name in v.exported or name == "_":
                continue
            for ln in linenos:
                if not v._noqa(ln, "F401"):
                    errors.append((path, ln,
                                   f"F401 '{name}' imported but unused"))
    # tokenize-level: tabs in indentation (W191)
    try:
        for tok in tokenize.generate_tokens(iter(lines).__next__):
            if tok.type == tokenize.INDENT and "\t" in tok.string:
                errors.append((path, tok.start[0], "W191 tab indentation"))
    except (tokenize.TokenError, StopIteration, IndentationError):
        pass
    return errors


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("targets", nargs="+")
    args = ap.parse_args(argv)
    files: list = []
    for t in args.targets:
        p = Path(t)
        files.extend(sorted(p.rglob("*.py")) if p.is_dir() else [p])
    all_errors: list = []
    for f in files:
        all_errors.extend(check_file(f))
    for path, line, msg in sorted(all_errors):
        print(f"{path}:{line}: {msg}")
    print(f"lint: {len(files)} files, {len(all_errors)} violations",
          file=sys.stderr)
    return 1 if all_errors else 0


if __name__ == "__main__":
    sys.exit(main())
