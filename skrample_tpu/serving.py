"""Dynamic-batching serving runtime.

The bench's steady-state study showed the chip's marginal cost per image is
a fraction of the single-request latency once dispatches overlap; this
module productizes that discipline.  Requests (seeds) arrive on a queue, a
worker packs them into the smallest padded batch BUCKET (static shapes —
each bucket compiles once, ever), dispatches the fused denoise scan, and
resolves each request's future with ITS SLICE of the batch output
*immediately*: jax arrays are async, so the worker never blocks on device
compute and the device queue stays full (double-buffering falls out of
XLA's dispatch model instead of being hand-built).  Callers block only when
they touch their own result.

Two properties the reference's torch loop can't offer:

* **Batch-composition invariance** — every request's initial latent AND its
  per-step stochastic noise are drawn from its own key (the noise buffer is
  stacked per item, not drawn batch-wide), so a request's latent never
  depends on which strangers or padding it was packed with: bit-identical
  within one bucket executable, identical up to matmul reduction order
  across bucket sizes (XLA tiles each batch shape differently — last-ulp
  f32).  Tested in ``tests/test_serving.py``; the sampler-level invariance
  this builds on is `parallel.batch_keys`' fold_in discipline.
* **Bounded compile count** — arbitrary load factors into a handful of
  bucket executables.  Padding waste is visible in :class:`ServingStats`.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp

from . import scheduling
from .ops import CompiledDenoiser, compile_sampler
from .sampling import models, structured


@dataclass
class ServingStats:
    requests: int = 0
    batches: int = 0
    padded_items: int = 0
    "Dummy items dispatched to fill buckets (wasted model FLOPs)."
    bucket_counts: dict[int, int] = field(default_factory=dict)

    @property
    def padding_fraction(self) -> float:
        dispatched = sum(b * n for b, n in self.bucket_counts.items())
        return self.padded_items / dispatched if dispatched else 0.0


class ServingEngine:
    """Queue -> bucketed batches -> fused denoise dispatches.

    ``model_fn`` is the usual ``(x, t, sigma, alpha) -> prediction`` closure
    (params bound/sharded by the caller) accepting any leading batch size;
    ``item_shape`` is ONE request's latent shape, without the batch axis.

    ``submit(key)`` returns a future of the request's latent; ``generate``
    is the blocking convenience.  Use as a context manager (or call
    ``close()``) to join the worker."""

    def __init__(
        self,
        model_fn: Callable,
        item_shape: tuple[int, ...],
        sampler: structured.StructuredSampler | None = None,
        schedule: scheduling.SkrampleSchedule | None = None,
        model_transform: models.DiffusionModel | None = None,
        steps: int = 25,
        dtype: Any = jnp.float32,
        buckets: tuple[int, ...] = (1, 2, 4, 8),
        max_delay_ms: float = 2.0,
    ):
        self.model_fn = model_fn
        self.item_shape = tuple(item_shape)
        self.steps = steps
        self.dtype = dtype
        self.buckets = tuple(sorted(buckets))
        self.max_delay_s = max_delay_ms / 1e3
        self.stats = ServingStats()

        compiled = compile_sampler(
            sampler if sampler is not None else structured.DPM(order=2),
            schedule if schedule is not None else scheduling.FlowShift(scheduling.Linear()),
            model_transform if model_transform is not None else models.FlowModel(),
            steps,
        )
        self._denoiser = CompiledDenoiser.build(compiled, dtype=dtype)
        self._executables: dict[int, Callable] = {}
        self._prepare_fn: Callable | None = None
        self._queue: queue.Queue = queue.Queue()
        self._closed = False
        self._worker = threading.Thread(target=self._loop, name="skrample-serving", daemon=True)
        self._worker.start()

    # -- request side --------------------------------------------------

    def submit(self, key: jax.Array | int) -> Future:
        "Enqueue one request; the future resolves to its (item_shape) latent."
        if self._closed:
            raise RuntimeError("engine is closed")
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        fut: Future = Future()
        self._queue.put((key, fut))
        return fut

    def generate(self, key: jax.Array | int) -> jax.Array:
        return self.submit(key).result()

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._queue.put(None)
            self._worker.join()

    def __enter__(self) -> "ServingEngine":
        return self

    def __exit__(self, *exc: object) -> None:
        self.close()

    # -- worker side -----------------------------------------------------

    def _executable(self, batch: int) -> Callable:
        fn = self._executables.get(batch)
        if fn is None:
            if self._denoiser.requires_noise:
                run = lambda x0, noises: self._denoiser.run(self.model_fn, x0, noises=noises)  # noqa: E731
            else:
                run = lambda x0, noises: self._denoiser.run(self.model_fn, x0)  # noqa: E731
            donate = () if jax.default_backend() == "cpu" else (0,)
            fn = self._executables[batch] = jax.jit(run, donate_argnums=donate)
        return fn

    def _prepare(self, keys: list[jax.Array]) -> tuple[jax.Array, jax.Array | None]:
        """Batched per-request seeding: every request's initial latent (and,
        stochastic only, its own step-noise buffer) comes from its own key,
        generated in ONE vmapped dispatch per batch — vmapping
        ``jax.random.normal`` over explicit keys is value-identical to the
        per-request calls (counter-based PRNG), so batching stays invisible."""
        fn = self._prepare_fn
        if fn is None:
            if self._denoiser.requires_noise:

                def prepare(key):
                    k_init, k_loop = jax.random.split(key)
                    return (
                        jax.random.normal(k_init, self.item_shape, self.dtype),
                        jax.random.normal(k_loop, (self.steps, *self.item_shape), self.dtype),
                    )

                # noises land as (steps, B, *item) straight from out_axes=1
                fn = jax.jit(jax.vmap(prepare, out_axes=(0, 1)))
            else:

                def prepare(key):
                    return jax.random.normal(jax.random.split(key)[0], self.item_shape, self.dtype)

                seeded = jax.jit(jax.vmap(prepare))
                fn = lambda ks: (seeded(ks), None)  # noqa: E731
            self._prepare_fn = fn
        return fn(jnp.stack(keys))

    def _collect(self) -> list[tuple[jax.Array, Future]] | None:
        "Block for one request, then sweep up to the largest bucket within the delay."
        first = self._queue.get()
        if first is None:
            return None
        batch = [first]
        deadline = self.max_delay_s
        while len(batch) < self.buckets[-1]:
            try:
                item = self._queue.get(timeout=deadline)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-post the sentinel for the outer loop
                break
            batch.append(item)
        return batch

    def _loop(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            try:
                self._dispatch(batch)
            except Exception as err:  # compile/shape errors: fail the batch, keep serving
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(err)

    def _dispatch(self, batch: list[tuple[jax.Array, Future]]) -> None:
        n = len(batch)
        bucket = next(b for b in self.buckets if b >= n) if n <= self.buckets[-1] else self.buckets[-1]
        keys = [key for key, _ in batch]
        keys += [jax.random.PRNGKey(0)] * (bucket - n)  # pad with deterministic dummies
        x0, noises = self._prepare(keys)

        out = self._executable(bucket)(x0, noises)

        # jax arrays are async: handing each caller its slice keeps this
        # worker dispatching the next batch while the device runs this one
        for i, (_, fut) in enumerate(batch):
            fut.set_result(out[i])

        self.stats.requests += n
        self.stats.batches += 1
        self.stats.padded_items += bucket - n
        self.stats.bucket_counts[bucket] = self.stats.bucket_counts.get(bucket, 0) + 1
