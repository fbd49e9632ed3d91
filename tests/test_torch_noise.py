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
