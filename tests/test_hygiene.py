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
    allowed = {"__graft_entry__.py", "__main__.py"}  # CLI stdout is the product
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


# names that look unused to the AST scan but are intentional re-exports or
# future-import machinery
_REEXPORT_OK = {
    "annotations",  # from __future__
    # diffusers.py re-exports the config-translation surface
    "DIFFUSERS_CLASS_MAP", "DIFFUSERS_KEY_MAP", "DIFFUSERS_KEY_MAP_REV",
    "DIFFUSERS_VALUE_MAP", "DIFFUSERS_VALUE_MAP_REV", "ParsedDiffusersConfig",
    "DEFAULT_FAKE_CONFIG", "as_diffusers_config", "attr_dict", "parse_diffusers_config",
    # scheduling.py aggregates the stack/curve modules
    "_PartialSchedule", "NoMod", "NoSub", "ScheduleModifier", "SubSchedule", "SubSigmas",
    "find_modifier", "restack", "split_stack", "Beta", "Exponential", "FlowShift",
    "Hyper", "Karras", "Probit", "Sinner",
    # schedule_curves: base-class field annotations must resolve in the
    # subclass module for dataclass-generated __init__ type hints
    "ScheduleCommon", "SkrampleSchedule",
}


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(ROOT)))
def test_no_unused_imports(path: pathlib.Path) -> None:
    tree = _tree(path)
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                imported[(alias.asname or alias.name).split(".")[0]] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for alias in node.names:
                if alias.name != "*":
                    imported[alias.asname or alias.name] = node.lineno

    used = {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
    source_lines = path.read_text().splitlines()
    exported = set(getattr(__import__("importlib").import_module(_module_for(path)), "__all__", ()))

    for name, lineno in imported.items():
        if name in used or name in _REEXPORT_OK or name in exported:
            continue
        # crude textual fallback catches attribute/annotation-string usage
        mentions = sum(1 for line in source_lines if name in line.split("#")[0])
        assert mentions > 1, f"{path.relative_to(ROOT)}:{lineno}: unused import {name!r}"


def _module_for(path: pathlib.Path) -> str:
    rel = path.relative_to(ROOT).with_suffix("")
    parts = list(rel.parts)
    if parts[-1] == "__init__":
        parts.pop()
    return ".".join(parts)
