"""The skrample import-alias layer."""

import sys

import pytest

from skrample_tpu import compat


@pytest.fixture
def installed():
    compat.install()
    yield
    compat.uninstall()


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


def test_uninstall_cleans() -> None:
    compat.install()
    assert "skrample" in sys.modules
    compat.uninstall()
    assert "skrample" not in sys.modules
    assert "skrample.scheduling" not in sys.modules


def test_refuses_to_shadow_real_package() -> None:
    import types

    fake = types.ModuleType("skrample")
    sys.modules["skrample"] = fake
    try:
        with pytest.raises(RuntimeError):
            compat.install()
        compat.install(force=True)  # explicit override allowed
        compat.uninstall()
    finally:
        sys.modules.pop("skrample", None)
