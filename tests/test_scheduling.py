"""Schedule layer: bit-parity with the reference goldens plus structural
invariants (batch==single, zero point, endpoint preservation, inverse maps)."""

import itertools
import random

import numpy as np
import pytest

from fixture_common import ALL_MODIFIERS, ALL_SCHEDULES, SCHEDULE_STACKS, load_fixture
from skrample_tpu import scheduling

GOLDEN = load_fixture("schedules.json")


@pytest.mark.parametrize("name", sorted(GOLDEN.keys()))
def test_golden_bitmatch(name: str) -> None:
    "Sigma/timestep tables must bit-match the reference in float64."
    schedule = SCHEDULE_STACKS[name]
    for key, t in (("points7", 7), ("points33", 33)):
        mine = schedule.points_np(np.linspace(1, 0, t))
        ref = np.asarray(GOLDEN[name][key], dtype=np.float64)
        np.testing.assert_array_equal(mine, ref, err_msg=f"{name}/{key}")
    mine = schedule.schedule_np(11)
    ref = np.asarray(GOLDEN[name]["schedule11"], dtype=np.float64)
    np.testing.assert_array_equal(mine, ref, err_msg=f"{name}/schedule11")


@pytest.mark.parametrize("schedule_type", ALL_SCHEDULES)
def test_sigmas_to_points_fixed_point(schedule_type) -> None:
    "The inverse sigma map must be a stable fixed point under iteration."
    schedule = schedule_type()
    points = schedule.points_np(np.linspace(1, 0, 33))
    inv = schedule._sigmas_to_points(points[:, 1], points[:, 2])
    for _ in range(100):
        inv = schedule._sigmas_to_points(inv[:, 1], inv[:, 2])
    deviation = abs(points - inv)
    assert (deviation <= 1e-3 * abs(points) + 1e-9).all()


@pytest.mark.parametrize(
    ("schedule_type", "modifier"),
    itertools.product(ALL_SCHEDULES, [None, *ALL_MODIFIERS]),
)
def test_batch_equals_single(schedule_type, modifier) -> None:
    schedule = modifier(schedule_type()) if modifier else schedule_type()
    rng = random.Random(7)
    t100 = [0, 1, *(rng.random() for _ in range(98))]
    batch = schedule.points_np(t100)
    single = np.array([schedule.point(t) for t in t100], dtype=np.float64)
    assert batch.shape == single.shape
    assert np.array_equal(batch, single)


@pytest.mark.parametrize(
    ("schedule_type", "modifier"),
    itertools.product(ALL_SCHEDULES, [None, *ALL_MODIFIERS]),
)
def test_zero_point(schedule_type, modifier) -> None:
    schedule = modifier(schedule_type()) if modifier else schedule_type()
    assert schedule.point(0) == (0, 0, 1)


@pytest.mark.parametrize(("schedule_type", "modifier"), itertools.product(ALL_SCHEDULES, ALL_MODIFIERS))
def test_modifier_preserves_endpoint(schedule_type, modifier) -> None:
    base = schedule_type()
    np.testing.assert_allclose(modifier(base).point(1), base.point(1), rtol=0, atol=1e-15)


def test_stack_roundtrip() -> None:
    stacked = scheduling.Hyper(scheduling.FlowShift(scheduling.Karras(scheduling.Scaled())))
    mods, sub, base = stacked.all_split
    assert [type(m) for m in mods] == [scheduling.Hyper, scheduling.FlowShift]
    assert type(sub) is scheduling.Karras
    assert type(base) is scheduling.Scaled
    rebuilt = scheduling.ScheduleModifier.stack(mods, sub, base)
    assert rebuilt == stacked


def test_find_split() -> None:
    stacked = scheduling.Hyper(scheduling.FlowShift(scheduling.Sinner(scheduling.Linear())))
    found = stacked.find_split(scheduling.FlowShift)
    assert found is not None
    before, flow, after, sub, base = found
    assert [type(m) for m in before] == [scheduling.Hyper]
    assert type(flow) is scheduling.FlowShift
    assert [type(m) for m in after] == [scheduling.Sinner]
    assert sub is None
    assert type(base) is scheduling.Linear
    assert stacked.find(scheduling.Beta) is None
    assert stacked.lowest == scheduling.Linear()


def test_schedule_lru_identity() -> None:
    a = scheduling.np_schedule_lru(scheduling.Scaled(), 20)
    b = scheduling.np_schedule_lru(scheduling.Scaled(), 20)
    assert a is b


def test_fixed_schedule_interpolates() -> None:
    base = scheduling.Linear()
    table = base.schedule_np(10)
    fixed = scheduling.FixedSchedule(table, base.space)
    # At the table's own gridpoints the interpolation is (near) exact
    np.testing.assert_allclose(fixed.schedule_np(10), table, rtol=0, atol=1e-12)
    # And it is hashable for the LRU
    assert hash(fixed) == hash(scheduling.FixedSchedule(table.copy(), base.space))


def test_fixed_schedule_from_regular() -> None:
    base = scheduling.Scaled()
    table = base.schedule_np(8)
    regular = base.space.regularize(table[:, 1])
    fixed = scheduling.FixedSchedule.from_regular(table[:, 0], regular, base.space)
    np.testing.assert_allclose(fixed.schedule_np(8), table, rtol=0, atol=1e-9)


def test_stack_surgery_roundtrip():
    "split_stack -> restack must reproduce any stack by value, and find must locate members."
    from skrample_tpu.scheduling import (
        Beta,
        Exponential,
        FlowShift,
        Hyper,
        Karras,
        Linear,
        Scaled,
        Sinner,
        find_modifier,
        restack,
        split_stack,
    )

    stacks = [
        Scaled(),
        Linear(),
        Karras(Scaled()),
        FlowShift(Linear()),
        Hyper(FlowShift(Linear())),
        Sinner(Hyper(Beta(Scaled()))),
        FlowShift(Exponential(Scaled(), rho=2.0), shift=5.0),
    ]
    for stack in stacks:
        mods, sub, base = split_stack(stack)
        assert restack(mods, sub, base) == stack
        for mod in mods:
            assert find_modifier(stack, type(mod)) is mod

    # bare schedules split to empty modifier lists
    mods, sub, base = split_stack(Scaled())
    assert mods == [] and sub is None and base == Scaled()
    assert find_modifier(Linear(), FlowShift) is None


def test_find_split_duplicate_modifiers_lossless():
    """Regression: splitting around a modifier type that appears twice must
    not lose either instance.  (The reference implementation drops one: its
    find_split over FlowShift(FlowShift(Linear)) returns only the inner
    shift and restacking silently collapses the stack.)  Ours returns the
    outermost match with the rest intact, so split -> restack is identity."""
    from skrample_tpu.scheduling import FlowShift, Linear, ScheduleModifier

    stack = FlowShift(FlowShift(Linear(), shift=2.0), shift=5.0)
    before, found, after, sub, base = stack.find_split(FlowShift)

    assert found.shift == 5.0  # outermost (first in application order)
    assert [m.shift for m in after] == [2.0]
    assert before == [] and sub is None

    rebuilt = ScheduleModifier.stack([*before, found, *after], sub, base)
    assert rebuilt == stack
