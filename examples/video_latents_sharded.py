#!/usr/bin/env python
"""Video generation: VideoDiT + Ulysses sequence parallelism + Brownian SDE.

Rank-agnostic samplers mean a 5D video latent (B, C, F, H, W) flows through
unchanged.  The VideoDiT's ``sequence_parallel=True`` shards frames over
'sp' during spatial attention and spatial sites during temporal attention
(XLA inserts the all-to-alls from the alternating sharding constraints),
and the virtual Brownian tree keeps SDE noise a pure function of
(seed, interval) — deterministic across step counts, restarts, and
reshardings.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from skrample_tpu import scheduling
from skrample_tpu.models import VideoDiT, VideoDiTConfig
from skrample_tpu.noise import Brownian, stack_noise
from skrample_tpu.ops import CompiledDenoiser, compile_sampler
from skrample_tpu.parallel import latent_sharding, make_mesh
from skrample_tpu.sampling import models, structured

steps = 8
mesh = make_mesh(dp=None, sp=2)
print("mesh:", dict(mesh.shape))

# (batch, channels, frames, height, width) — frames shard over sp
shape = (mesh.shape["dp"], 16, 8, 32, 32)
sharding = latent_sharding(mesh, batch_axis=0, spatial_axis=2, ndim=5)

model = VideoDiT(
    VideoDiTConfig(dim=256, depth=2, heads=2, compute_dtype=jnp.float32, sequence_parallel=True),
    mesh=mesh,
)
params = model.init(jax.random.PRNGKey(0))
params = jax.device_put(params, NamedSharding(mesh, P()))  # replicated; tp also composes

sampler = structured.DPM(order=2, stochasticity=1)  # SDE
schedule = scheduling.FlowShift(scheduling.Linear())
compiled = compile_sampler(sampler, schedule, models.FlowModel(), steps)
denoiser = CompiledDenoiser.build(compiled, dtype=jnp.float32)

# Brownian increments: noise is a function of the time interval, so a resumed
# or re-sharded run sees the same stochastic path
tree = Brownian(shape[1:], jax.random.key(7), jnp.float32)
noises = stack_noise(tree, steps)[:, None].repeat(shape[0], 1)  # (steps, B, ...)


@jax.jit
def generate(x, noises):
    return denoiser.run(model.as_sampleable(params), x, noises=noises)


with mesh:
    x0 = jax.device_put(jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32), sharding)
    out = generate(x0, noises)
    out.block_until_ready()

print(f"video latents {shape} sampled; output sharding: {out.sharding.spec}")
print(f"finite: {bool(jnp.isfinite(out).all())}, std: {float(out.std()):.3f}")
