#!/usr/bin/env python
"""Wrapper step() overhead: 1000 steps of Euler + FlowShift(Beta(ZSNR())) on
shape-[1] tensors — the reference's scripts/overhead.py harness.  Our wrapper
runs these steps as compiled-table FMAs, so this measures the pure
bookkeeping floor."""

from time import perf_counter_ns

import torch

from skrample_tpu.diffusers import SkrampleWrapperScheduler
from skrample_tpu.sampling.structured import Euler
from skrample_tpu.scheduling import ZSNR, Beta, FlowShift


def bench_wrapper() -> int:
    wrapper = SkrampleWrapperScheduler(Euler(), FlowShift(Beta(ZSNR())))
    wrapper.set_timesteps(1000)

    clock = perf_counter_ns()
    for timestep in wrapper.timesteps:
        output, sample = torch.rand([1]), torch.rand([1])
        wrapper.step(output, timestep, sample, return_dict=False)
    return perf_counter_ns() - clock


if __name__ == "__main__":
    for _run in range(5):
        total = bench_wrapper()
        print(f"{total} ns total, {total / 1000:.0f} ns/step")
