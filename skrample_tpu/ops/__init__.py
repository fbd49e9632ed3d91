"""The TPU execution engine.

Three tiers, all consuming the same sampler specs from
:mod:`skrample_tpu.sampling`:

* :mod:`.compiler` — runs a structured sampler *symbolically* (linear
  combination tracing) to extract per-step scalar coefficient tables.
* :mod:`.fused` — applies one step's table as a single fused elementwise
  FMA (XLA fusion by default, a Pallas kernel on TPU for the hot path).
* :mod:`.loop` — ``lax.scan`` denoise loops: table-driven multistep solvers,
  generic RK tableau loops, and a fallback that traces the polymorphic
  sampler code directly.
* :mod:`.adaptive` — the fully device-resident adaptive RK controller
  (``lax.while_loop`` over precomputed (cursor, size) coefficient tables).
* :mod:`.flash_attention` — online-softmax attention kernel for the model
  tier (scores never materialize in HBM).
"""

from .adaptive import rkmoire_device_loop
from .compiler import CompiledSampler, NonlinearSamplerError, compile_sampler
from .flash_attention import attention_reference, flash_attention
from .fused import fused_step, fused_step_pallas
from .loop import CompiledDenoiser, generic_sample_loop, rk_sample_loop, rkmoire_sample_loop, sample_loop

__all__ = [
    "CompiledDenoiser",
    "CompiledSampler",
    "NonlinearSamplerError",
    "attention_reference",
    "compile_sampler",
    "flash_attention",
    "fused_step",
    "fused_step_pallas",
    "generic_sample_loop",
    "rk_sample_loop",
    "rkmoire_device_loop",
    "rkmoire_sample_loop",
    "sample_loop",
]
