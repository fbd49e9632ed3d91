"""skrample-tpu: a TPU-native (JAX/XLA/Pallas) composable sampling framework
for diffusion models, capability-compatible with Beinsezii/skrample.

Layer map:
  common      — value types + polymorphic scalar math
  scheduling  — float64 host-side schedule stack (bit-matches the reference)
  sampling    — predictor algebra, structured + functional solvers, tableaux
  ops         — the TPU engine: coefficient-table compiler, fused FMA step,
                lax.scan denoise loops, Pallas kernels
  noise       — jax.random noise generators incl. the virtual Brownian tree
  parallel    — jax.sharding mesh helpers for batch/spatial sharding
  diffusers   — torch-facing scheduler wrapper for DiffusionPipeline
  models      — reference flax models for end-to-end runs and benchmarks
  optim       — memory-efficient training: int8 block-quantized AdamW
                moments + bf16 stochastic-rounding parameter updates

The torch-facing ``diffusers`` module and the jax modules import lazily so
either half is usable without the other's dependencies.
"""

from . import common, scheduling
from .common import DeltaPoint, MergeStrategy, Point, Step

__version__ = "0.3.0"

__all__ = [
    "DeltaPoint",
    "MergeStrategy",
    "Point",
    "Step",
    "common",
    "scheduling",
]
