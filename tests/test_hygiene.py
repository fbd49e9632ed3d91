"""Executable lint tier: the mechanical subset of the ruff gate, in-repo.

ruff/pyright run in CI (.github/workflows/ci.yml, config in pyproject.toml)
but are not installable in the build sandbox — these AST checks keep the
load-bearing rules enforced on every test run:

* no stray ``print`` in library code (T20),
* no mutable default arguments (B006),
* no bare ``except:`` (E722),
* every module under ``skrample_tpu`` imports cleanly,
* every name in a module's ``__all__`` actually resolves.
"""

from __future__ import annotations

import ast
import importlib
import pathlib
import pkgutil

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
LIBRARY = ROOT / "skrample_tpu"
SOURCES = sorted(LIBRARY.rglob("*.py"))


def _tree(path: pathlib.Path) -> ast.Module:
    return ast.parse(path.read_text(), filename=str(path))


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(ROOT)))
def test_no_stray_prints(path: pathlib.Path) -> None:
    allowed = {"__graft_entry__.py"}
    if path.name in allowed:
        return
    for node in ast.walk(_tree(path)):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
        ):
            raise AssertionError(f"{path.relative_to(ROOT)}:{node.lineno}: stray print() in library code")


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(ROOT)))
def test_no_mutable_defaults(path: pathlib.Path) -> None:
    for node in ast.walk(_tree(path)):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in [*node.args.defaults, *[d for d in node.args.kw_defaults if d]]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    raise AssertionError(
                        f"{path.relative_to(ROOT)}:{node.lineno}: mutable default in {node.name}()"
                    )


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(ROOT)))
def test_no_bare_except(path: pathlib.Path) -> None:
    for node in ast.walk(_tree(path)):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            raise AssertionError(f"{path.relative_to(ROOT)}:{node.lineno}: bare except")


def _module_names() -> list[str]:
    import skrample_tpu

    names = ["skrample_tpu"]
    for info in pkgutil.walk_packages(skrample_tpu.__path__, prefix="skrample_tpu."):
        names.append(info.name)
    return names


@pytest.mark.parametrize("name", _module_names())
def test_module_imports_and_all_resolves(name: str) -> None:
    module = importlib.import_module(name)
    for exported in getattr(module, "__all__", ()):  # noqa: B905
        assert getattr(module, exported, None) is not None, f"{name}.__all__ lists unresolvable {exported!r}"
