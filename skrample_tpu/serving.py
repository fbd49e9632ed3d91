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
        postprocess: Callable | None = None,
        conditioned: bool = False,
        mesh: Any | None = None,
    ):
        """``postprocess`` (optional): a jittable batch -> batch function
        applied to every denoised batch before request slices are handed
        out — e.g. ``lambda z: vae.decode(vae_params, z)`` to serve pixels
        instead of latents.  It runs on device inside the same async
        dispatch chain (the worker still never blocks), and it is traced
        once per bucket shape like the denoise executable itself.

        ``conditioned=True`` declares a 5-argument ``model_fn``
        ``(x, t, sigma, alpha, context)`` (e.g. :meth:`MMDiT.as_served`)
        and unlocks per-request ``submit(..., context=...)``: the batch's
        stacked contexts become a traced executable argument, so ONE
        executable per bucket serves every prompt — prompts never cause
        recompiles (provided the encoder emits a fixed token count).
        Requests without a context run the unconditional branch
        (``context=None`` baked) and group separately.

        ``mesh`` (optional): a ``jax.sharding.Mesh`` with a ``dp`` axis —
        every dispatched batch is sharded over it (batch axis over ``dp``,
        riding ICI), so one engine drives all data-parallel chips.  The
        sampler update is pointwise in the latent, so sharding needs zero
        collectives; model-internal axes (``tp``, ...) belong to the
        ``model_fn`` closure as usual.  Every bucket must be divisible by
        the ``dp`` size (static shapes shard evenly), and per-request key
        fan-out keeps results invariant to the sharding — a mesh engine
        returns the same latents as a single-device one (tested)."""
        self.model_fn = model_fn
        self.item_shape = tuple(item_shape)
        self.steps = steps
        self.dtype = dtype
        self.buckets = tuple(sorted(buckets))
        self.max_delay_s = max_delay_ms / 1e3
        self.conditioned = conditioned
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape["dp"]
            bad = [b for b in self.buckets if b % dp]
            if bad:
                raise ValueError(f"buckets {bad} not divisible by the mesh's dp={dp} (static shapes shard evenly)")
        self.stats = ServingStats()

        self._postprocess = jax.jit(postprocess) if postprocess is not None else None
        self._sampler = sampler if sampler is not None else structured.DPM(order=2)
        self._schedule = schedule if schedule is not None else scheduling.FlowShift(scheduling.Linear())
        self._transform = model_transform if model_transform is not None else models.FlowModel()
        self._denoisers: dict[int, CompiledDenoiser] = {}
        self._denoiser = self._denoiser_for(0)  # compile the txt2img tables eagerly
        self._executables: dict[tuple[int, int], Callable] = {}
        self._prepare_fns: dict[tuple[int, str], Callable] = {}
        self._queue: queue.Queue = queue.Queue()
        self._closed = False
        self._worker = threading.Thread(target=self._loop, name="skrample-serving", daemon=True)
        self._worker.start()

    # -- request side --------------------------------------------------

    def submit(
        self,
        key: jax.Array | int,
        initial: jax.Array | None = None,
        strength: float = 1.0,
        context: jax.Array | None = None,
    ) -> Future:
        """Enqueue one request; the future resolves to its (item_shape) latent.

        txt2img by default; pass ``initial`` (an item_shape latent) plus
        ``strength`` in (0, 1] for img2img — the same entry-point recipe as
        :meth:`GenerationPipeline.generate` (the trajectory starts at
        ``round(steps * (1 - strength))`` with ``initial`` noised to that
        point).  Requests are grouped by entry point, so each distinct
        strength adds its own bucket executables — quantize strengths in
        the API layer if callers are free-form.

        ``context`` (conditioned engines only): this request's conditioning,
        without the batch axis — a single ``(tokens, width)`` array (e.g.
        one row of :meth:`TextEncoder.apply`) or any PYTREE of arrays (e.g.
        the SD3/SDXL stacks' ``(context, pooled)`` pair): each leaf is
        stacked across the batch and the model_fn receives the stacked
        tree.  All requests must share one context structure/shape to share
        executables."""
        if self._closed:
            raise RuntimeError("engine is closed")
        if context is not None and not self.conditioned:
            raise ValueError("context= needs ServingEngine(conditioned=True) and a 5-arg model_fn")
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        start = 0 if initial is None else min(round(self.steps * (1 - strength)), self.steps - 1)
        fut: Future = Future()
        self._queue.put((key, initial, start, context, fut))
        return fut

    def generate(
        self,
        key: jax.Array | int,
        initial: jax.Array | None = None,
        strength: float = 1.0,
        context: jax.Array | None = None,
    ) -> jax.Array:
        return self.submit(key, initial, strength, context).result()

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

    def _denoiser_for(self, start: int) -> CompiledDenoiser:
        d = self._denoisers.get(start)
        if d is None:
            compiled = compile_sampler(self._sampler, self._schedule, self._transform, self.steps, start=start)
            d = self._denoisers[start] = CompiledDenoiser.build(compiled, dtype=self.dtype)
        return d

    def _executable(self, start: int, batch: int, has_ctx: bool = False) -> Callable:
        fn = self._executables.get((start, batch, has_ctx))
        if fn is None:
            denoiser = self._denoiser_for(start)

            def model_for(ctx):
                # conditioned engines take a 5-arg model_fn; ctx is a traced
                # batch argument when present, a baked None when not
                if self.conditioned:
                    return lambda x, t, s, a: self.model_fn(x, t, s, a, ctx)
                return self.model_fn

            def run(x0, noises, ctx=None):
                if self.mesh is not None:
                    from .parallel import latent_sharding

                    # constraints INSIDE the jitted program: batch over dp
                    # for the carry and the per-step noise buffer (axis 1 —
                    # its leading axis is the scan/step axis); ctx leaves
                    # shard their batch axis.  The update is pointwise, so
                    # no collectives appear.
                    x0 = jax.lax.with_sharding_constraint(x0, latent_sharding(self.mesh, 0, ndim=x0.ndim))
                    if noises is not None and getattr(noises, "ndim", 0):
                        noises = jax.lax.with_sharding_constraint(
                            noises, latent_sharding(self.mesh, 1, ndim=noises.ndim)
                        )
                    if ctx is not None:
                        ctx = jax.tree.map(
                            lambda leaf: jax.lax.with_sharding_constraint(
                                leaf, latent_sharding(self.mesh, 0, ndim=leaf.ndim)
                            ),
                            ctx,
                        )
                if denoiser.requires_noise:
                    return denoiser.run(model_for(ctx), x0, noises=noises, start=start)
                return denoiser.run(model_for(ctx), x0, start=start)
            donate = () if jax.default_backend() == "cpu" else (0,)
            fn = self._executables[(start, batch, has_ctx)] = jax.jit(run, donate_argnums=donate)
        return fn

    def _prepare(
        self, keys: list[jax.Array], initials: jax.Array | None, start: int
    ) -> tuple[jax.Array, jax.Array | None]:
        """Batched per-request seeding: every request's initial latent (and,
        stochastic only, its own step-noise buffer) comes from its own key,
        generated in ONE vmapped dispatch per batch — vmapping
        ``jax.random.normal`` over explicit keys is value-identical to the
        per-request calls (counter-based PRNG), so batching stays invisible.
        img2img batches (``initials`` stacked per item) noise each initial
        to the entry point with the request's own seed, the
        ``GenerationPipeline.generate`` recipe."""
        mode = "txt" if initials is None else "img"
        fn = self._prepare_fns.get((start, mode))
        if fn is None:
            requires_noise = self._denoiser_for(start).requires_noise

            def seed_noise(k_loop):
                return jax.random.normal(k_loop, (self.steps, *self.item_shape), self.dtype)

            if mode == "txt":

                def prepare(key):
                    k_init, k_loop = jax.random.split(key)
                    x0 = jax.random.normal(k_init, self.item_shape, self.dtype)
                    return (x0, seed_noise(k_loop)) if requires_noise else (x0, 0.0)

            else:
                entry = self._schedule.ipoint(start / self.steps)
                denom = self._schedule.point_1.add_noise(0.0, 1.0)

                def prepare(key, initial):
                    k_init, k_loop = jax.random.split(key)
                    seed = jax.random.normal(k_init, self.item_shape, self.dtype)
                    x0 = entry.add_noise(initial.astype(self.dtype), seed) / denom
                    return (x0, seed_noise(k_loop)) if requires_noise else (x0, 0.0)

            # noises land as (steps, B, *item) straight from out_axes=1
            out_axes = (0, 1 if requires_noise else None)
            fn = self._prepare_fns[(start, mode)] = jax.jit(jax.vmap(prepare, out_axes=out_axes))

        args = (jnp.stack(keys),) if initials is None else (jnp.stack(keys), initials)
        x0, noises = fn(*args)
        return x0, (noises if self._denoiser_for(start).requires_noise else None)

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
            # group by (entry point, mode, conditioned): each start index is
            # its own set of compiled tables, txt2img/img2img seed
            # differently, and context presence changes the executable
            groups: dict[tuple[int, bool, bool], list] = {}
            for item in batch:
                key, initial, start, context, fut = item
                # a cancelled request never dispatches; set_running_or_notify_cancel
                # also locks out post-dispatch cancel() per Future protocol
                if not fut.set_running_or_notify_cancel():
                    continue
                groups.setdefault((start, initial is None, context is None), []).append(item)
            for (start, *_), group in groups.items():
                try:
                    self._dispatch(group, start)
                except Exception as err:  # compile/shape errors: fail the group, keep serving
                    for *_, fut in group:
                        if not fut.done():
                            fut.set_exception(err)

    def _dispatch(self, batch: list, start: int) -> None:
        n = len(batch)
        bucket = next(b for b in self.buckets if b >= n) if n <= self.buckets[-1] else self.buckets[-1]
        keys = [key for key, *_ in batch]
        keys += [jax.random.PRNGKey(0)] * (bucket - n)  # pad with deterministic dummies
        initials = None
        if batch[0][1] is not None:
            stack = [initial for _, initial, *_ in batch]
            stack += [stack[0]] * (bucket - n)
            initials = jnp.stack(stack)
        ctx = None
        if batch[0][3] is not None:
            stack = [context for *_, context, _ in batch]
            stack += [stack[0]] * (bucket - n)
            # per-LEAF stacking supports pytree contexts (e.g. the stacks'
            # (context, pooled) pairs); pin the engine dtype — an off-dtype
            # context (f64 literals under x64, bf16 encoder output) would
            # otherwise promote the denoise scan carry (a TypeError) or
            # split the bucket executable
            ctx = jax.tree.map(lambda *leaves: jnp.stack(leaves).astype(self.dtype), *stack)
        x0, noises = self._prepare(keys, initials, start)

        if ctx is None:
            out = self._executable(start, bucket)(x0, noises)
        else:
            out = self._executable(start, bucket, has_ctx=True)(x0, noises, ctx)
        if self._postprocess is not None:
            out = self._postprocess(out)

        # jax arrays are async: handing each caller its slice keeps this
        # worker dispatching the next batch while the device runs this one
        for i, (*_, fut) in enumerate(batch):
            fut.set_result(out[i])

        self.stats.requests += n
        self.stats.batches += 1
        self.stats.padded_items += bucket - n
        self.stats.bucket_counts[bucket] = self.stats.bucket_counts.get(bucket, 0) + 1
