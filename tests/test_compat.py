"""The skrample import-alias layer."""

import sys

import pytest

from skrample_tpu import compat


@pytest.fixture
def installed():
    # other test modules may have imported the REAL reference 'skrample';
    # snapshot and restore whatever was there
    snapshot = {name: sys.modules.get(name) for name in list(compat._ALIASES) + ["skrample.pytorch"]}
    compat.install(force=True)
    yield
    compat.uninstall()
    for name, module in snapshot.items():
        if module is not None:
            sys.modules[name] = module


def test_aliases_resolve(installed) -> None:
    import skrample.common
    import skrample.diffusers
    import skrample.pytorch.noise
    import skrample.sampling.structured
    import skrample.sampling.tableaux.providers
    import skrample.scheduling

    import skrample_tpu

    assert skrample.common is skrample_tpu.common
    assert skrample.scheduling.Linear is skrample_tpu.scheduling.Linear

    from skrample.sampling.structured import DPM

    from skrample_tpu.sampling.structured import DPM as OurDPM

    assert DPM is OurDPM
    assert hasattr(skrample.sampling.tableaux.providers, "rk2_tableau")
    assert hasattr(skrample.sampling.tableaux.providers, "RKZ")

    from skrample.pytorch.noise import Brownian, Random  # noqa: F401


def test_from_import_shapes(installed) -> None:
    from skrample.common import Point, Step  # noqa: F401
    from skrample.sampling import functional, interface, models, tableaux, traits  # noqa: F401
    from skrample.scheduling import ZSNR, Beta, FlowShift, Karras  # noqa: F401


def test_uninstall_cleans(installed) -> None:
    assert "skrample" in sys.modules
    compat.uninstall()
    assert "skrample" not in sys.modules
    assert "skrample.scheduling" not in sys.modules
    compat.install(force=True)  # fixture teardown expects the aliases present


def test_refuses_to_shadow_real_package() -> None:
    import types

    previous = sys.modules.get("skrample")
    fake = types.ModuleType("skrample")
    sys.modules["skrample"] = fake
    try:
        with pytest.raises(RuntimeError):
            compat.install()
        compat.install(force=True)  # explicit override allowed
        compat.uninstall()
    finally:
        sys.modules.pop("skrample", None)
        if previous is not None:
            sys.modules["skrample"] = previous
