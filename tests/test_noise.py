"""Noise generators: spectral slope and energy targets for Colored (measured
by an independent PSD regression), Brownian tree invariants (additivity,
variance, step-count determinism), batch fan-out determinism, and shape/
stat sanity for the rest."""

import itertools
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skrample_tpu.common import Step
from skrample_tpu.noise import (
    BatchNoise,
    Brownian,
    BrownianProps,
    Colored,
    ColoredProps,
    Offset,
    OffsetProps,
    Pyramid,
    Random,
    brownian_at,
    stack_noise,
)


def measure_noise_color(data: np.ndarray) -> float:
    "Spectral exponent via radial PSD log-log regression (independent of the generator)."
    shape = data.shape
    F = np.fft.fftshift(np.fft.fftn(data))
    psd = np.abs(F) ** 2

    freqs = [np.fft.fftshift(np.fft.fftfreq(s)) for s in shape]
    mesh = np.meshgrid(*freqs, indexing="ij")
    radial = np.sqrt(sum(m**2 for m in mesh))

    mask = radial > 0
    radial, psd = radial[mask], psd[mask]

    num_bins = min(shape) // 2
    edges = np.linspace(radial.min(), radial.max(), num_bins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    idx = np.digitize(radial, edges) - 1
    powers = np.array([psd[idx == i].mean() if (idx == i).any() else 0 for i in range(num_bins)])

    valid = (powers > 0) & (centers > 0)
    slope = np.polyfit(np.log(centers[valid]), np.log(powers[valid]), 1)[0]
    return -float(slope)


@pytest.mark.parametrize(
    ("exponent", "shape"),
    itertools.product([-3, -1.5, 0, 1.5, 3], [(65536,), (512, 512)]),
)
def test_colored_spectral_slope(exponent: float, shape) -> None:
    gen = Colored(shape, jax.random.PRNGKey(0), jnp.float32, ColoredProps(color_curve=0, color_start=exponent, color_end=-exponent))
    n0 = np.asarray(gen.generate(0, None))
    assert abs(exponent - measure_noise_color(n0)) < 0.15, f"{exponent=}"
    n1 = np.asarray(gen.generate(1, Step(0, 1)))
    assert abs(-exponent - measure_noise_color(n1)) < 0.15, f"{-exponent=}"


@pytest.mark.parametrize(
    ("energy", "shape"),
    itertools.product([None, -3, -1.5, 0, 1.5, 3], [(65536,), (256, 256)]),
)
def test_colored_energy(energy, shape) -> None:
    start, end = float(np.random.default_rng(1).normal()), float(np.random.default_rng(2).normal())
    gen = Colored(shape, jax.random.PRNGKey(1), jnp.float32, ColoredProps(energy=energy, color_start=start, color_end=end))
    # Bessel-corrected (ddof=1): the energy contract uses torch std semantics
    std0 = float(np.asarray(gen.generate(0, None), dtype=np.float64).std(ddof=1))
    std1 = float(np.asarray(gen.generate(1, Step(0, 1)), dtype=np.float64).std(ddof=1))
    if energy is None:
        assert abs(1 - std0) < 1e-2
        assert abs(1 - std1) < 1e-2
    else:
        assert abs(abs(energy) - std0) < 1e-5
        assert abs(abs(energy) - std1) < 1e-5


def test_colored_exponent_interpolation() -> None:
    props = ColoredProps(color_start=2, color_end=-2, color_curve=2)
    gen = Colored((16,), jax.random.PRNGKey(0), jnp.float32, props)
    assert gen.exponent_at(None) == props.color_start
    assert gen.exponent_at(Step(0.99, 1.0)) == pytest.approx(props.color_end, abs=1e-9)
    mid = gen.exponent_at(Step(0.4, 0.5))
    assert props.color_end < mid < props.color_start
    flat = Colored((16,), jax.random.PRNGKey(0), jnp.float32, ColoredProps(color_curve=math.inf, color_end=-1))
    assert flat.exponent_at(Step(0, 0.1)) == -1


KEY = jax.random.PRNGKey(42)


def test_brownian_additivity() -> None:
    "Increments must compose exactly: W[a..b] + W[b..c] == W[a..c]."
    shape = (64,)
    depth = 12
    a, b, c = 0.125, 0.375, 0.75
    w_ab = brownian_at(KEY, b, depth, shape) - brownian_at(KEY, a, depth, shape)
    w_bc = brownian_at(KEY, c, depth, shape) - brownian_at(KEY, b, depth, shape)
    w_ac = brownian_at(KEY, c, depth, shape) - brownian_at(KEY, a, depth, shape)
    np.testing.assert_allclose(np.asarray(w_ab + w_bc), np.asarray(w_ac), rtol=1e-5, atol=1e-6)


def test_brownian_variance() -> None:
    "W(t) ~ N(0, t): check the sample variance across many keys."
    shape = (256,)
    depth = 10
    for t in (0.25, 0.5, 0.875):
        draws = np.stack([np.asarray(brownian_at(jax.random.PRNGKey(k), t, depth, shape)) for k in range(64)])
        assert abs(draws.var() - t) < 0.05 * max(t, 0.2), f"{t=} var={draws.var()}"


def test_brownian_increment_unit_variance() -> None:
    gen = Brownian.from_inputs((4096,), 7)
    for step in (Step(0.1, 0.2), Step(0.5, 0.9), Step(0.0, 1.0)):
        std = float(gen.generate(0, step).std())
        assert abs(std - 1) < 0.08, f"{step=} {std=}"


def test_brownian_step_count_invariance() -> None:
    "The same time interval yields the same noise regardless of loop layout."
    gen = Brownian.from_inputs((32,), 3)
    a = gen.generate(0, Step.from_int(2, 10))  # covers [0.2, 0.3]
    b = gen.generate(5, Step(0.2, 0.3))  # different call index, same interval
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Two half-steps spanning [0.2, 0.3] recombine into the full increment
    h1 = gen.generate(0, Step(0.2, 0.25))
    h2 = gen.generate(1, Step(0.25, 0.3))
    full = gen.generate(2, Step(0.2, 0.3))
    lhs = (np.asarray(h1) + np.asarray(h2)) * math.sqrt(0.05)
    np.testing.assert_allclose(lhs, np.asarray(full) * math.sqrt(0.1), rtol=1e-5, atol=1e-6)


def test_brownian_none_step() -> None:
    gen = Brownian.from_inputs((8, 8), 1)
    assert gen.generate(0, None).shape == (8, 8)


def test_random_determinism() -> None:
    gen = Random.from_inputs((16,), 5)
    np.testing.assert_array_equal(np.asarray(gen.generate(3, None)), np.asarray(gen.generate(3, None)))
    assert not np.array_equal(np.asarray(gen.generate(3, None)), np.asarray(gen.generate(4, None)))


def test_offset_shifts_mean() -> None:
    props = OffsetProps(dims=(0,), strength=1.5)
    gen = Offset.from_inputs((4, 4096), 11, props)
    out = np.asarray(gen.generate(0, None))
    per_row_mean = out.mean(axis=1)
    assert np.abs(per_row_mean).max() > 0.3  # offsets dominate row means

    static = Offset.from_inputs((4, 64), 11, OffsetProps(static=True))
    o1 = np.asarray(static.generate(0, None)) - np.asarray(Random.from_inputs((4, 64), 11).generate(0, None))
    o2 = np.asarray(static.generate(1, None)) - np.asarray(Random.from_inputs((4, 64), 11).generate(1, None))
    np.testing.assert_allclose(o1, o2, rtol=0, atol=1e-6)


def test_pyramid_unit_variance_and_structure() -> None:
    gen = Pyramid.from_inputs((1, 4, 64, 64), 13)
    out = np.asarray(gen.generate(0, None))
    assert out.shape == (1, 4, 64, 64)
    assert abs(out.std() - 1) < 1e-2
    # multi-res noise has stronger low-frequency content than white noise
    white = np.asarray(Random.from_inputs((1, 4, 64, 64), 13).generate(0, None))
    assert measure_noise_color(out[0, 0]) > measure_noise_color(white[0, 0]) + 0.1


def test_batch_fanout_determinism() -> None:
    batch = BatchNoise.from_batch_inputs(Random, (8,), [1, 2, 3])
    out = np.asarray(batch.generate(0, None))
    assert out.shape == (3, 8)
    # item streams depend only on their own seed, not the batch size
    solo = np.asarray(Random.from_inputs((8,), 2).generate(0, None))
    np.testing.assert_array_equal(out[1], solo)


def test_stack_noise_shape() -> None:
    gen = Random.from_inputs((2, 4), 0)
    stacked = stack_noise(gen, 5)
    assert stacked.shape == (5, 2, 4)
    np.testing.assert_array_equal(np.asarray(stacked[2]), np.asarray(gen.generate(2, Step.from_int(2, 5))))


def test_colored_eager_traced_single_semantic():
    """Regression (round-1 verdict): the same Colored generator must produce
    the same values eagerly and under jit.  The std normalization reduces in
    float64 on both paths, so eager == traced to reduce-order tolerance."""
    from skrample_tpu.common import Step

    gen = Colored((4, 24, 24), jax.random.PRNGKey(11), jnp.float32, ColoredProps(energy=1.0))
    for step in (None, Step.from_int(0, 10), Step.from_int(7, 10)):
        eager = gen.generate(3, step)
        traced = jax.jit(lambda s=step: gen.generate(3, s))()
        np.testing.assert_allclose(np.asarray(eager), np.asarray(traced), rtol=0, atol=1e-6)
        if step is not None:
            # energy target holds under trace too, not just eagerly
            assert abs(np.asarray(traced, np.float64).std(ddof=1) - 1.0) < 1e-4
