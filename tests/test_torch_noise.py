"""Torch-facing noise adapters: surface parity with the reference's
pytorch generators, counter/state semantics, batch stacking."""

import numpy as np
import torch

from skrample_tpu.common import Step
from skrample_tpu.torch_noise import (
    BatchTensorNoise,
    Brownian,
    BrownianProps,
    Colored,
    ColoredProps,
    Offset,
    Pyramid,
    Random,
)


def test_all_generators_shape_and_dtype() -> None:
    for cls in (Random, Brownian, Colored, Offset, Pyramid):
        gen = cls.from_inputs((2, 8, 8), torch.Generator().manual_seed(42), dtype=torch.float64)
        out = gen.generate(Step.from_int(3, 10))
        assert out.shape == (2, 8, 8)
        assert out.dtype == torch.float64
        assert out.isfinite().all(), cls


def test_stream_advances() -> None:
    gen = Random.from_inputs((16,), torch.Generator().manual_seed(1))
    a, b = gen.generate(None), gen.generate(None)
    assert not torch.equal(a, b)
    # fresh generator with same seed replays the stream
    again = Random.from_inputs((16,), torch.Generator().manual_seed(1))
    assert torch.equal(a, again.generate(None))


def test_brownian_interval_determinism() -> None:
    a = Brownian.from_inputs((8,), torch.Generator().manual_seed(5)).generate(Step(0.2, 0.3))
    b = Brownian.from_inputs((8,), torch.Generator().manual_seed(5), BrownianProps(max_steps=10_000)).generate(
        Step(0.2, 0.3)
    )
    assert torch.equal(a, b)


def test_colored_energy_target() -> None:
    gen = Colored.from_inputs((256, 256), torch.Generator().manual_seed(9), ColoredProps(energy=2.0))
    out = gen.generate(Step(0, 0.5))
    assert abs(out.std().item() - 2.0) < 1e-4


def test_batch_stack() -> None:
    batch = BatchTensorNoise.from_batch_inputs(
        Random, (4, 4), [torch.Generator().manual_seed(s) for s in (1, 2, 3)]
    )
    out = batch.generate(None)
    assert out.shape == (3, 4, 4)
    solo = Random.from_inputs((4, 4), torch.Generator().manual_seed(2)).generate(None)
    np.testing.assert_array_equal(out[1].numpy(), solo.numpy())


def test_torch_noise_dual_vs_reference():
    """Live dual-run: identical torch.Generator streams through our adapters
    and the reference's generators must be BIT-identical (that is these
    adapters' reason to exist).  Brownian is excluded (the reference's needs
    torchsde, absent here; ours is the counter-based tree)."""
    import sys
    from pathlib import Path

    import pytest as _pytest
    import torch

    if not Path("/root/reference/skrample").is_dir():
        _pytest.skip("reference tree not mounted")
    sys.path.insert(0, "/root/reference")
    import skrample.pytorch.noise as ref_noise

    import skrample_tpu.torch_noise as my_noise

    shape = (2, 4, 16, 16)
    from skrample.common import Step as RStep

    from skrample_tpu.common import Step as MStep

    # stream-exact adapters: every torch.Generator draw must match the
    # reference's order and shape, giving bit-identical output
    for name in ("Random", "Offset"):
        for step in (None, 0.3):
            mine_gen = getattr(my_noise, name).from_inputs(shape, torch.Generator().manual_seed(11))
            ref_gen = getattr(ref_noise, name).from_inputs(shape, torch.Generator().manual_seed(11))
            m = mine_gen.generate(MStep(step, step + 0.1) if step is not None else None)
            r = ref_gen.generate(RStep(step, step + 0.1) if step is not None else None)
            assert torch.equal(m, r), f"{name} step={step}"

    # distribution-equivalent adapters (pyramid levels / spectral shaping run
    # on the jax implementations): match moments, not bits.  Pyramid compares
    # on a 3D shape — the REFERENCE's permute gymnastics crash on batched 4D
    # shapes under this torch version; ours handles both.
    for name in ("Pyramid", "Colored"):
        cmp_shape = (4, 32, 32) if name == "Pyramid" else shape
        mine_gen = getattr(my_noise, name).from_inputs(cmp_shape, torch.Generator().manual_seed(11))
        ref_gen = getattr(ref_noise, name).from_inputs(cmp_shape, torch.Generator().manual_seed(11))
        m = mine_gen.generate(None)
        r = ref_gen.generate(None)
        assert m.shape == r.shape and m.dtype == r.dtype
        assert abs(float(m.std()) - float(r.std())) < 0.15, name
        assert abs(float(m.mean()) - float(r.mean())) < 0.15, name
