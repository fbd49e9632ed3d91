#!/usr/bin/env python
"""Drop-in diffusers usage: swap the pipeline scheduler for a skrample-tpu
wrapper (requires the `diffusers` package + model weights; shown for shape).

    from diffusers import FluxPipeline
    from skrample_tpu.diffusers import SkrampleWrapperScheduler

    pipe = FluxPipeline.from_pretrained("black-forest-labs/FLUX.1-schnell")
    pipe.scheduler = SkrampleWrapperScheduler.from_diffusers_config(pipe.scheduler)
    image = pipe("a photo of a capy... a beaver wearing a hat").images[0]

Below: the same wrapper driven by hand against a fake model, which is what
the test-suite does and works without diffusers installed."""

import torch

from skrample_tpu import scheduling
from skrample_tpu.diffusers import SkrampleWrapperScheduler
from skrample_tpu.sampling import structured
from skrample_tpu.sampling.models import FlowModel

scheduler = SkrampleWrapperScheduler.from_diffusers_config(
    {
        "_class_name": "FlowMatchEulerDiscreteScheduler",
        "num_train_timesteps": 1000,
        "shift": 3.0,
        "use_dynamic_shifting": True,
    },
    sampler=structured.DPM,
    sampler_props={"order": 2},
)
print("sampler:", scheduler.sampler)
print("schedule:", scheduler.schedule)
print("model:", scheduler.model)

scheduler.set_timesteps(8, mu=0.7)  # mu hot-swaps FlowShift like diffusers does
sample = torch.randn(1, 4, 32, 32)
for t in scheduler.timesteps:
    fake_output = sample * 0.1
    sample = scheduler.step(fake_output, t, sample, return_dict=False)[0]
print("final latent std:", sample.std().item())
