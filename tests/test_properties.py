"""Property-based invariants (hypothesis).

Where golden tables pin specific values, these pin *laws*: algebraic
roundtrips and structural invariants that must hold for arbitrary inputs,
not just the fixtures.  A tier the reference suite does not have."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings

# property tests share the box with TPU-bench compiles in CI; wall-clock
# deadlines under that load are flakes, not signal
settings.register_profile("no_deadline", deadline=None)
settings.load_profile("no_deadline")
from hypothesis import strategies as st

from skrample_tpu.common import MergeStrategy, Point, Step, bashforth, spowf, sumprod
from skrample_tpu.sampling import models
from skrample_tpu.sampling.tableaux import ButcherCoeffs

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)
unit = st.floats(min_value=1e-3, max_value=1.0 - 1e-3, allow_nan=False)
small_arrays = st.lists(finite, min_size=1, max_size=8).map(lambda v: np.asarray(v, np.float64))


# --- Point / Step laws -------------------------------------------------------


@given(sample=finite, noise=finite, sigma=unit)
def test_point_noise_roundtrip(sample: float, noise: float, sigma: float) -> None:
    point = Point(500.0, sigma, math.sqrt(1 - sigma**2))
    mixed = point.add_noise(sample, noise)
    recovered = point.remove_noise(mixed, noise)
    # exact algebraically; numerically limited by cancellation when
    # |noise*sigma| >> |sample*alpha|, so tolerance scales with conditioning
    conditioning = (abs(sample) + abs(noise) + 1.0) / point.alpha
    assert math.isclose(recovered, sample, rel_tol=1e-9, abs_tol=1e-12 * conditioning)


@given(position=st.integers(0, 10_000), amount=st.integers(1, 10_000))
def test_step_int_roundtrip(position: int, amount: int) -> None:
    position = position % amount
    step = Step.from_int(position, amount)
    assert round(step.position()) == position
    assert round(step.amount()) == amount
    assert step.normal() == step
    clamped = step.clamp()
    assert 0 <= clamped.time_from <= clamped.time_to <= 1 + 1e-12


@given(
    ours=st.lists(st.integers(0, 5), max_size=6),
    theirs=st.lists(st.integers(0, 5), max_size=6),
)
def test_merge_strategy_laws(ours: list[int], theirs: list[int]) -> None:
    for strategy in MergeStrategy:
        merged = strategy.merge(ours, theirs, lambda a, b: a == b)
        assert set(merged) <= set(ours) | set(theirs)
    # Unique variants never duplicate an element across source lists
    ua = MergeStrategy.UniqueAfter.merge(ours, theirs, lambda a, b: a == b)
    assert ua[: len(ours)] == ours
    for x in ua[len(ours) :]:
        assert x not in ours
    ub = MergeStrategy.UniqueBefore.merge(ours, theirs, lambda a, b: a == b)
    assert ub[: len(theirs)] == theirs
    for x in ub[len(theirs) :]:
        assert x not in theirs


@given(x=finite, f=st.floats(0.1, 4.0))
def test_spowf_odd_symmetry(x: float, f: float) -> None:
    assert math.isclose(spowf(-x, f), -spowf(x, f), rel_tol=1e-12, abs_tol=1e-30)


@given(order=st.integers(1, 9))
def test_bashforth_weights_sum_to_one(order: int) -> None:
    weights = bashforth(order)
    assert len(weights) == order
    assert math.isclose(math.fsum(weights), 1.0, abs_tol=1e-9)


@given(values=small_arrays)
def test_sumprod_matches_manual(values: np.ndarray) -> None:
    weights = [0.25] * len(values)
    expected = sum(v * w for v, w in zip(values.tolist(), weights, strict=True))
    assert math.isclose(sumprod(values.tolist(), weights), expected, rel_tol=1e-12, abs_tol=1e-12)


# --- predictor algebra laws --------------------------------------------------

PREDICTORS = [models.DataModel(), models.NoiseModel(), models.FlowModel(), models.VelocityModel(), models.ScaleX()]


@given(sample=finite, output=finite, sigma=unit)
@settings(max_examples=50)
def test_to_x_from_x_inverse(sample: float, output: float, sigma: float) -> None:
    point = Point(sigma * 1000, sigma, math.sqrt(1 - sigma**2))
    for predictor in PREDICTORS:
        x_hat = predictor.to_x(sample, output, point)
        back = predictor.from_x(sample, x_hat, point)
        assert math.isclose(back, output, rel_tol=1e-7, abs_tol=1e-7), type(predictor).__name__


@given(sample=finite, output=finite, s_from=unit, s_to=unit, eta=st.floats(0, 1))
@settings(max_examples=50)
def test_forward_backward_inverse(sample: float, output: float, s_from: float, s_to: float, eta: float) -> None:
    from skrample_tpu.common import DeltaPoint

    s_from, s_to = max(s_from, s_to), min(s_from, s_to)  # noise decreases
    dp = DeltaPoint(
        Point(s_from * 1000, s_from, math.sqrt(1 - s_from**2)),
        Point(s_to * 1000, s_to, math.sqrt(1 - s_to**2)),
    )
    noise = 0.37
    for predictor in PREDICTORS:
        hop = predictor.transition(dp, eta)
        if abs(hop.delta) < 1e-9:
            continue  # non-invertible hop (zero injection weight)
        result = hop.apply(sample, output, noise)
        back = hop.invert(sample, result, noise)
        assert math.isclose(back, output, rel_tol=1e-6, abs_tol=1e-6), type(predictor).__name__


@given(sample=finite, output=finite, sigma=unit)
@settings(max_examples=50)
def test_model_convert_roundtrip(sample: float, output: float, sigma: float) -> None:
    point = Point(sigma * 1000, sigma, math.sqrt(1 - sigma**2))
    for src in PREDICTORS[:4]:
        for dst in PREDICTORS[:4]:
            convert = models.ModelConvert(src, dst)
            there = convert.output_to(sample, output, point)
            back = convert.output_from(sample, there, point)
            assert math.isclose(back, output, rel_tol=1e-6, abs_tol=1e-6)


# --- tableau builder laws ----------------------------------------------------


@given(stages=st.integers(1, 6), data=st.data())
@settings(max_examples=30)
def test_butcher_serialize_roundtrip(stages: int, data) -> None:
    count = stages + stages + sum(range(stages))  # c + b + a rows
    coeffs = data.draw(st.lists(finite, min_size=count, max_size=count))
    built = ButcherCoeffs.deserialize(list(coeffs), stages)
    again = ButcherCoeffs.deserialize(list(built.serialize()), stages)
    assert built == again


@given(stages=st.integers(2, 5), data=st.data())
@settings(max_examples=30)
def test_shu_osher_row_sums(stages: int, data) -> None:
    "Butcher c derived from Shu-Osher form always equals the a-row sums."
    alphas = [data.draw(st.lists(unit, min_size=stages, max_size=stages)) for _ in range(stages)]
    betas = [data.draw(st.lists(unit, min_size=stages, max_size=stages)) for _ in range(stages)]
    built = ButcherCoeffs.from_shu_osher(alphas, betas)
    for c, row in zip(built.c, built.a, strict=True):
        assert math.isclose(c, math.fsum(row), abs_tol=1e-9)
