#!/usr/bin/env python
"""Inside-out Runge-Kutta under a diffusers pipeline.

The RK wrapper presents each RK *stage* as a timestep, so a standard
one-call-per-timestep pipeline loop drives a multi-NFE solver unchanged.
Remember to multiply steps by `wrapper.order` is NOT needed — pipelines
iterate `wrapper.timesteps`, which already contains all stage points.

    from diffusers import StableDiffusionXLPipeline
    from skrample_tpu.diffusers import RKUltraWrapperScheduler

    pipe.scheduler = RKUltraWrapperScheduler.from_diffusers_config(
        pipe.scheduler, sampler_order=4,
    )

Driven by hand below against a toy model (no diffusers needed)."""

import torch

from skrample_tpu.diffusers import DynasauRKWrapperScheduler, RKUltraWrapperScheduler
from skrample_tpu.sampling.models import FlowModel
from skrample_tpu.scheduling import FlowShift, Linear

for wrapper in (
    RKUltraWrapperScheduler(FlowShift(Linear()), sampler_order=4, model=FlowModel()),
    DynasauRKWrapperScheduler(FlowShift(Linear()), sampler_order=3, model=FlowModel()),
):
    steps = wrapper.adjust_steps(16)  # equal NFE budget vs 16 Euler steps
    wrapper.set_timesteps(steps)
    print(type(wrapper).__name__, f"order={wrapper.order}", f"presented timesteps={len(wrapper.timesteps)}")

    sample = torch.randn(1, 4, 16, 16)
    for t in wrapper.timesteps:
        output = sample * 0.05  # toy model
        sample = wrapper.step(output, t, sample, return_dict=False)[0]
    print("  final std:", round(sample.std().item(), 4))
