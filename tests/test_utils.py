"""Utility surface: torch bridge, profiler trace, compile cache, pipeline builder."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from skrample_tpu.utils import enable_compilation_cache, from_torch, to_torch, trace


def test_torch_roundtrip() -> None:
    t = torch.randn(4, 4)
    j = from_torch(t)
    np.testing.assert_allclose(t.numpy(), np.asarray(j))
    back = to_torch(j, dtype=torch.float64)
    assert back.dtype == torch.float64
    np.testing.assert_allclose(t.numpy(), back.numpy())


def test_trace_contextmanager(tmp_path) -> None:
    with trace(tmp_path):
        jnp.ones(8).block_until_ready()
    assert any(tmp_path.iterdir())  # wrote profile artifacts


def test_compilation_cache(tmp_path) -> None:
    enable_compilation_cache(tmp_path)
    assert jax.config.jax_compilation_cache_dir == str(tmp_path)


def test_build_pipeline() -> None:
    from skrample_tpu.pipeline import build_pipeline

    pipe = build_pipeline(lambda x, t, s, a: x * 0.9, (1, 4, 8, 8), steps=4)
    out = pipe.generate(jax.random.PRNGKey(0))
    assert out.shape == (1, 4, 8, 8)
    assert pipe.nfe == 4
