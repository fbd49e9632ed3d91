"""Drop-in import compatibility with Beinsezii/skrample.

``install()`` registers ``skrample.*`` module aliases onto this package so
existing code keeps its imports:

    import skrample_tpu.compat; skrample_tpu.compat.install()
    from skrample.sampling.structured import DPM          # -> ours
    from skrample.scheduling import FlowShift, Linear     # -> ours
    from skrample.pytorch.noise import Brownian           # -> torch adapter

The mapping is module-for-module; the scheduler wrappers additionally accept
the torch-facing noise adapter classes wherever the reference accepted its
torch generators.  Refuses to shadow a genuinely installed ``skrample``."""

from __future__ import annotations

import importlib
import sys
import types

_ALIASES: dict[str, str] = {
    "skrample": "skrample_tpu",
    "skrample.common": "skrample_tpu.common",
    "skrample.scheduling": "skrample_tpu.scheduling",
    "skrample.sampling": "skrample_tpu.sampling",
    "skrample.sampling.models": "skrample_tpu.sampling.models",
    "skrample.sampling.traits": "skrample_tpu.sampling.traits",
    "skrample.sampling.structured": "skrample_tpu.sampling.structured",
    "skrample.sampling.functional": "skrample_tpu.sampling.functional",
    "skrample.sampling.interface": "skrample_tpu.sampling.interface",
    "skrample.sampling.tableaux": "skrample_tpu.sampling.tableaux",
    "skrample.sampling.tableaux.common": "skrample_tpu.sampling.tableaux.core",
    "skrample.sampling.tableaux.providers": "skrample_tpu.sampling.tableaux.catalog",
    "skrample.diffusers": "skrample_tpu.diffusers",
    "skrample.pytorch.noise": "skrample_tpu.torch_noise",
}


def install(force: bool = False) -> None:
    "Register the aliases in ``sys.modules``."
    if not force and "skrample" in sys.modules and not getattr(sys.modules["skrample"], "__skrample_tpu_alias__", False):
        raise RuntimeError("a real 'skrample' package is already imported; pass force=True to shadow it")

    for alias, target in _ALIASES.items():
        module = importlib.import_module(target)
        sys.modules[alias] = module

    # mark + provide the 'pytorch' intermediate package
    sys.modules["skrample"].__skrample_tpu_alias__ = True  # type: ignore[attr-defined]
    pytorch_pkg = types.ModuleType("skrample.pytorch")
    pytorch_pkg.noise = sys.modules["skrample.pytorch.noise"]  # type: ignore[attr-defined]
    sys.modules["skrample.pytorch"] = pytorch_pkg

    # the generator functions live in 'generators' here but 'providers' there
    catalog = sys.modules["skrample.sampling.tableaux.providers"]
    from .sampling.tableaux import generators

    for name in ("rk2_tableau", "rk3_tableau", "rk4_tableau", "ees25_tableau", "ees27_tableau"):
        if not hasattr(catalog, name):
            setattr(catalog, name, getattr(generators, name))


def uninstall() -> None:
    for alias in _ALIASES:
        if getattr(sys.modules.get(alias), "__skrample_tpu_alias__", alias != "skrample"):
            sys.modules.pop(alias, None)
    sys.modules.pop("skrample.pytorch", None)
