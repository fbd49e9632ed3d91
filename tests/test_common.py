"""Core layer: Adams-Bashforth weights vs literature, sigmoid/softmax vs
torch, the full MergeStrategy truth table, and Step round-trip arithmetic."""

import numpy as np
import pytest
import torch

from skrample_tpu.common import (
    MergeStrategy,
    Step,
    bashforth,
    divf,
    ln,
    rescale_positive,
    rescale_subnormal,
    sigmoid,
    softmax,
    spowf,
    sumprod,
)


def test_bashforth_vs_literature() -> None:
    literature = ((1,), (3 / 2, -1 / 2), (23 / 12, -4 / 3, 5 / 12), (55 / 24, -59 / 24, 37 / 24, -3 / 8))
    for n, coeffs in enumerate(literature):
        np.testing.assert_allclose(np.asarray(bashforth(n + 1)), np.asarray(coeffs), atol=1e-12, rtol=1e-12)


def test_sigmoid_vs_torch() -> None:
    items = spowf(torch.linspace(-2, 2, 9, dtype=torch.float64), 2)
    assert torch.allclose(torch.sigmoid(items), sigmoid(items), rtol=0, atol=1e-12)


def test_softmax_vs_torch() -> None:
    items = spowf(torch.linspace(-2, 2, 9, dtype=torch.float64), 2)
    expected = torch.softmax(items, 0)
    actual = torch.tensor(softmax(tuple(items)), dtype=torch.float64)
    assert torch.allclose(expected, actual, rtol=0, atol=1e-12)


def test_merge_truth_table() -> None:
    cases: list[tuple[list[int], list[int], list[int], list[int]]] = [
        (list(range(0, 11)), list(range(0, 15, 2)), list(range(1, 10, 2)), list(range(12, 15, 2))),
        (list(range(4, 15)), list(range(0, 11, 2)), list(range(5, 11, 2)) + list(range(11, 15)), list(range(0, 4, 2))),
    ]
    for a, b, a_extra, b_extra in cases:
        table = [
            (a, b, MergeStrategy.Ours, a),
            (b, a, MergeStrategy.Ours, b),
            (a, b, MergeStrategy.Theirs, b),
            (b, a, MergeStrategy.Theirs, a),
            (a, b, MergeStrategy.After, a + b),
            (b, a, MergeStrategy.After, b + a),
            (a, b, MergeStrategy.Before, b + a),
            (b, a, MergeStrategy.Before, a + b),
            (a, b, MergeStrategy.UniqueBefore, b + a_extra),
            (b, a, MergeStrategy.UniqueBefore, a + b_extra),
            (a, b, MergeStrategy.UniqueAfter, a + b_extra),
            (b, a, MergeStrategy.UniqueAfter, b + a_extra),
        ]
        for ours, theirs, strategy, merged in table:
            assert strategy.merge(ours, theirs) == merged, f"{ours} {strategy} {theirs}"


STEP_STEPS = 31


@pytest.mark.parametrize("n", range(STEP_STEPS + 1))
def test_step_roundtrip(n: int) -> None:
    step = Step.from_int(n, STEP_STEPS)
    assert abs(step.amount() - STEP_STEPS) < 1e-8
    assert abs(step.position() - n) < 1e-8
    assert Step(*reversed(step)).normal() == step
    assert abs(step.offset(-4).position() - (n - 4)) < 1e-8
    assert abs(step.offset(+4).position() - (n + 4)) < 1e-8
    assert step.offset(STEP_STEPS / 2).clamp().position() + 1 <= STEP_STEPS + 1e-8
    assert step.offset(STEP_STEPS / -2).clamp().position() >= 0


def test_divf_edge_cases() -> None:
    assert divf(1, 2) == 0.5
    assert divf(1, 0) == float("inf")
    assert divf(-1, 0) == float("-inf")
    with pytest.raises(ZeroDivisionError):
        divf(0, 0)


def test_ln_edge_cases() -> None:
    assert ln(1) == 0
    assert ln(0) == float("-inf")
    with pytest.raises(ValueError):
        ln(-1)


def test_rescales() -> None:
    assert rescale_positive(0) == 1
    assert rescale_positive(1) == 2
    assert rescale_positive(-1) == 0.5
    assert rescale_subnormal(0) == 0
    assert abs(rescale_subnormal(1e9)) < 1 + 1e-9
    assert rescale_subnormal(-3) == -0.75


def test_sumprod_extended_precision() -> None:
    # math.sumprod's Neumaier accumulation beats naive summation
    values = (1e16, 1.0, -1e16)
    weights = (1.0, 1.0, 1.0)
    assert sumprod(values, weights) == 1.0
