#!/usr/bin/env python
"""Multi-chip generation: data-parallel batch + tensor-parallel model over a
jax.sharding Mesh. XLA inserts the ICI collectives from the shardings."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

from skrample_tpu import scheduling
from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.ops import CompiledDenoiser, compile_sampler
from skrample_tpu.parallel import latent_sharding, make_mesh, shard_batch
from skrample_tpu.sampling import models, structured

mesh = make_mesh(dp=None, sp=1, extra_axes={"tp": min(4, max(1, len(jax.devices()) // 2))})
print("mesh:", dict(mesh.shape))

dit = DiT(DiTConfig(dim=128, depth=2, heads=4))
params = dit.init(jax.random.PRNGKey(0))
params = jax.tree.map(
    lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
    params,
    dit.param_spec(),
    is_leaf=lambda v: isinstance(v, jax.Array | np.ndarray),
)

steps = 25
compiled = compile_sampler(
    structured.DPM(order=2), scheduling.FlowShift(scheduling.Linear()), models.FlowModel(), steps
)
denoiser = CompiledDenoiser.build(compiled)

batch = mesh.shape["dp"] * 2
with mesh:
    x0 = shard_batch(mesh, jax.random.normal(jax.random.PRNGKey(1), (batch, 4, 64, 64), jnp.float32))
    out = jax.jit(lambda x: denoiser.run(dit.as_sampleable(params), x))(x0)
    out.block_until_ready()

print("out:", out.shape, "sharding:", out.sharding)
