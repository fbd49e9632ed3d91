"""Iteration-level (continuous) batching for diffusion serving.

:class:`~skrample_tpu.serving.ServingEngine` packs requests into
whole-trajectory batches: a request arriving one step after a batch
dispatched waits that batch's full denoise before its own even starts, and
a finishing batch drains the chip while the next one fills.  This module
applies the LLM-serving discipline (iteration-level scheduling) at
DENOISE-STEP granularity instead: a fixed pool of ``slots`` latents
advances ONE step per device dispatch, each slot carrying its own
trajectory position ``n`` in the compiled coefficient table — finished
slots retire at the next step boundary and queued requests are admitted
into them immediately, so occupancy under staggered load approaches 100%
instead of the batch engine's fill-and-drain sawtooth.

Exactness is the design anchor, same as the batch engine's
batch-composition invariance: the per-slot update gathers that slot's row
of the f64-compiled weight table (``weights[n]``) and applies the same
elementwise FMA as the ``lax.scan`` path (:meth:`CompiledDenoiser.step_batched`),
and every request seeds its initial latent AND its per-step noise buffer
from its own key.  Two tiers, both tested (``tests/test_continuous.py``):
a request's latent is **bit-identical across pool packings and admission
timings** (one executable; per-element math never mixes slots), and it
matches the batch engine / a solo scan to **XLA fusion rounding**
(last-ulp f32, ~4e-7 after 6 steps — the scan body and the tick body are
different fused programs, so the FMA chain contracts differently).

The per-tick host loop reads the ``(slots,)`` step-index vector after each
dispatch to detect completions; ``ticks_per_dispatch`` amortizes dispatch
overhead by scanning K steps per executable call (completions are then
detected up to K-1 ticks late — harmless, a finished slot's latent is
frozen by the active mask).

Reference anchor: the reference ships no serving runtime (its samplers run
inside a caller's own loop, ``/root/reference/skrample/sampling``); both
engines are TPU-native additions beyond reference scope.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from . import scheduling
from .ops import CompiledDenoiser, compile_sampler
from .sampling import models, structured


@dataclass
class ContinuousStats:
    requests: int = 0
    completed: int = 0
    ticks: int = 0
    "Device steps dispatched (x ticks_per_dispatch steps each)."
    slot_steps: int = 0
    "Total slot-steps dispatched (ticks x ticks_per_dispatch x slots)."
    active_slot_steps: int = 0
    "Slot-steps that advanced a live request (the rest idled masked)."
    bucket_counts: dict[int, int] = field(default_factory=dict)
    "Occupancy histogram: live slots -> dispatch count."

    @property
    def occupancy(self) -> float:
        return self.active_slot_steps / self.slot_steps if self.slot_steps else 0.0


class ContinuousServingEngine:
    """Slot pool -> one denoise step per dispatch -> admit at step boundaries.

    ``model_fn`` is the serving closure ``(x, t, sigma, alpha[, context])``.
    Because slots sit at different trajectory positions, ``t`` arrives as a
    ``(slots,)`` vector and ``sigma``/``alpha`` arrive broadcast-ready as
    ``(slots, 1, ..., 1)`` — every model family here already accepts that
    (their ``apply`` takes ``(B,)`` timesteps; the solver algebra lives in
    the compiled tables, so most closures ignore sigma/alpha entirely).

    ``conditioned=True`` requires ``context_like`` (one request's context
    pytree, no batch axis) so the stacked per-slot context state can be
    allocated up front; every ``submit`` must then pass a ``context`` of
    that exact structure/shape.

    txt2img only: a compiled table's order ramp is anchored at its start
    index, so img2img entry points belong to the batch engine (one table
    per ``start``) — mixing starts per slot would need per-slot tables.

    ``mesh`` (optional): a ``jax.sharding.Mesh`` with a ``dp`` axis — the
    slot axis shards over it inside the jitted tick (``slots`` must divide
    by dp).  Same invariance as the batch engine: per-request keys make
    results independent of the sharding."""

    def __init__(
        self,
        model_fn: Callable,
        item_shape: tuple[int, ...],
        sampler: structured.StructuredSampler | None = None,
        schedule: scheduling.SkrampleSchedule | None = None,
        model_transform: models.DiffusionModel | None = None,
        steps: int = 25,
        dtype: Any = jnp.float32,
        slots: int = 4,
        conditioned: bool = False,
        context_like: Any = None,
        ticks_per_dispatch: int = 1,
        mesh: Any | None = None,
        postprocess: Callable | None = None,
    ):
        """``postprocess`` (optional): same contract as the batch engine's —
        a jittable batch -> batch function applied on device to retired
        latents before the future resolves (e.g. a VAE decode to serve
        pixels).  Here it runs per retired slot on a ``(1, *item)`` slice,
        so it traces once and stays off the tick's hot path."""
        if conditioned and context_like is None:
            raise ValueError("conditioned=True needs context_like= (one request's context pytree)")
        if ticks_per_dispatch < 1:
            raise ValueError("ticks_per_dispatch must be >= 1")
        if mesh is not None and slots % mesh.shape["dp"]:
            raise ValueError(f"slots={slots} not divisible by the mesh's dp={mesh.shape['dp']}")
        self.model_fn = model_fn
        self.item_shape = tuple(item_shape)
        self.steps = steps
        self.dtype = dtype
        self.slots = slots
        self.conditioned = conditioned
        self.ticks_per_dispatch = ticks_per_dispatch
        self.mesh = mesh
        self.stats = ContinuousStats()

        sampler = sampler if sampler is not None else structured.DPM(order=2)
        schedule = schedule if schedule is not None else scheduling.FlowShift(scheduling.Linear())
        transform = model_transform if model_transform is not None else models.FlowModel()
        self._denoiser = CompiledDenoiser.build(
            compile_sampler(sampler, schedule, transform, steps), dtype=dtype
        )

        B = slots
        self._x = jnp.zeros((B, *self.item_shape), dtype)
        self._ring = tuple(jnp.zeros_like(self._x) for _ in range(self._denoiser.history * self._denoiser.slots))
        self._n = jnp.full((B,), steps, jnp.int32)  # all retired = all free
        self._noisebuf = (
            jnp.zeros((B, steps, *self.item_shape), dtype) if self._denoiser.requires_noise else None
        )
        self._ctx = (
            jax.tree.map(lambda leaf: jnp.zeros((B, *jnp.shape(leaf)), dtype), context_like)
            if conditioned
            else None
        )

        self._tick = jax.jit(self._tick_fn)
        self._admit = jax.jit(self._admit_fn)
        self._prepare = jax.jit(self._prepare_fn)
        self._postprocess = jax.jit(postprocess) if postprocess is not None else None

        self._queue: queue.Queue = queue.Queue()
        self._closed = False
        # submit/close atomicity: without the lock a submit racing close
        # could enqueue after the None sentinel and its future would never
        # resolve; with it, any enqueue happens-before the close (and the
        # worker's exit drain resolves everything still queued)
        self._lock = threading.Lock()
        self._worker = threading.Thread(target=self._loop, name="skrample-continuous", daemon=True)
        self._worker.start()

    # -- request side --------------------------------------------------

    def submit(
        self,
        key: jax.Array | int,
        initial: jax.Array | None = None,
        strength: float = 1.0,
        context: Any = None,
    ) -> Future:
        """Enqueue one txt2img request; the future resolves to its latent.

        ``initial``/``strength`` exist for drop-in use where a
        :class:`~skrample_tpu.serving.ServingEngine` is expected (e.g.
        :class:`~skrample_tpu.server.ServingHTTPServer`) but img2img is
        rejected: entry offsets need per-start compiled tables, which is
        the batch engine's bucket-per-start design."""
        if initial is not None:
            raise ValueError("img2img (initial=) is batch-engine territory: one table per start index")
        if self.conditioned and context is None:
            raise ValueError("conditioned engine: every request needs context=")
        if context is not None and not self.conditioned:
            raise ValueError("context= needs ContinuousServingEngine(conditioned=True)")
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("engine is closed")
            self._queue.put((key, context, fut))
        return fut

    def generate(self, key: jax.Array | int, context: Any = None) -> jax.Array:
        return self.submit(key, context=context).result()

    def close(self) -> None:
        with self._lock:
            if not self._closed:
                self._closed = True
                self._queue.put(None)
        # ALWAYS join, even when _closed was already set: after a worker
        # fault the worker's own finally sets _closed, and close() must not
        # return while the worker is still draining the queue (a queued
        # future could otherwise resolve after close()).  join() is
        # idempotent and cheap on a finished thread.
        self._worker.join()

    def __enter__(self) -> "ContinuousServingEngine":
        return self

    def __exit__(self, *exc: object) -> None:
        self.close()

    # -- device programs -------------------------------------------------

    def _constrain(self, x: jax.Array, axis: int = 0) -> jax.Array:
        if self.mesh is None:
            return x
        from .parallel import latent_sharding

        return jax.lax.with_sharding_constraint(x, latent_sharding(self.mesh, axis, ndim=x.ndim))

    def _tick_fn(self, x, ring, n, noisebuf, ctx):
        "Advance every live slot one step, K = ticks_per_dispatch times."
        d = self._denoiser
        steps = self.steps
        B = self.slots
        if self.mesh is not None:
            x = self._constrain(x)
            ring = tuple(self._constrain(r) for r in ring)
            if noisebuf is not None:
                noisebuf = self._constrain(noisebuf)
            if ctx is not None:
                ctx = jax.tree.map(self._constrain, ctx)
        bshape = (B,) + (1,) * len(self.item_shape)

        def one(carry, _):
            x, ring, n = carry
            active = n < steps
            nn = jnp.minimum(n, steps - 1)
            pts = d.points[nn]  # (B, 3): the slot's own (t, sigma, alpha)
            t, sigma, alpha = pts[:, 0], pts[:, 1].reshape(bshape), pts[:, 2].reshape(bshape)
            if ctx is not None:
                o = self.model_fn(x, t, sigma, alpha, ctx)
            elif self.conditioned:
                o = self.model_fn(x, t, sigma, alpha, None)
            else:
                o = self.model_fn(x, t, sigma, alpha)
            z = noisebuf[jnp.arange(B), nn] if noisebuf is not None else None
            x_new, ring_new = d.step_batched(d.weights[nn], x, o, ring, z)
            mask = active.reshape(bshape)
            x = jnp.where(mask, x_new, x)
            ring = tuple(jnp.where(mask, rn, r) for rn, r in zip(ring_new, ring))
            n = jnp.where(active, n + 1, n)
            return (x, ring, n), None

        (x, ring, n), _ = jax.lax.scan(one, (x, ring, n), None, length=self.ticks_per_dispatch)
        return x, ring, n

    def _admit_fn(self, x, ring, n, noisebuf, ctx, slot, x0, nb_i, ctx_i):
        "Functionally install one request into slot `slot` (traced index)."
        x = x.at[slot].set(x0)
        ring = tuple(r.at[slot].set(jnp.zeros_like(x0)) for r in ring)
        n = n.at[slot].set(0)
        if noisebuf is not None:
            noisebuf = noisebuf.at[slot].set(nb_i)
        if ctx is not None:
            ctx = jax.tree.map(lambda state, leaf: state.at[slot].set(leaf), ctx, ctx_i)
        return x, ring, n, noisebuf, ctx

    def _prepare_fn(self, key):
        """Per-request seeding, the batch engine's exact txt2img recipe
        (``ServingEngine._prepare``): initial latent and step-noise buffer
        each from the request's own key — counter-based PRNG makes the
        values identical to a solo or batched run."""
        k_init, k_loop = jax.random.split(key)
        x0 = jax.random.normal(k_init, self.item_shape, self.dtype)
        if self._denoiser.requires_noise:
            return x0, jax.random.normal(k_loop, (self.steps, *self.item_shape), self.dtype)
        return x0, None

    # -- worker side -----------------------------------------------------

    def _admit_request(self, slot: int, key: jax.Array, context: Any) -> None:
        x0, nb_i = self._prepare(key)
        ctx_i = (
            jax.tree.map(lambda leaf: jnp.asarray(leaf).astype(self.dtype), context)
            if context is not None
            else None
        )
        self._x, self._ring, self._n, self._noisebuf, self._ctx = self._admit(
            self._x, self._ring, self._n, self._noisebuf, self._ctx, slot, x0, nb_i, ctx_i
        )

    def _loop(self) -> None:
        """Worker shell: containment around the scheduling loop.

        Any fault in the loop — trace/compile errors AND runtime device
        faults surfacing at the ``(slots,)`` readback — fails every
        in-flight future instead of silently killing the thread; the exit
        path (normal close or fault) then marks the engine closed and
        resolves everything still sitting in the queue, so no caller can
        block forever on a future the pool will never touch."""
        pending: dict[int, Future] = {}
        try:
            self._loop_impl(pending)
        except BaseException as err:
            for fut in pending.values():
                if not fut.done():
                    fut.set_exception(err)
            raise
        finally:
            with self._lock:
                self._closed = True  # later submits fail fast
            while True:
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    break
                if item is None:
                    continue
                *_, fut = item
                if not fut.done():
                    fut.set_exception(RuntimeError("engine closed before this request was admitted"))

    def _loop_impl(self, pending: dict[int, Future]) -> None:
        free = list(range(self.slots))
        draining = False
        # host mirror of the step-index vector from the LAST readback:
        # admissions reset their slot to 0, so the post-tick delta
        # min(n, steps) - min(n_prev, steps) counts exactly the steps that
        # advanced a live trajectory (a slot finishing on tick 1 of K, or a
        # trailing partial scan, no longer counts as K active ticks)
        n_prev = np.full((self.slots,), self.steps, np.int64)
        while True:
            # -- admit into free slots; block only when fully idle
            while free and not draining:
                try:
                    item = self._queue.get_nowait() if pending else self._queue.get()
                except queue.Empty:
                    break
                if item is None:
                    draining = True
                    break
                key, context, fut = item
                # a cancelled request never occupies a slot; running futures
                # stay cancellable — mid-flight cancels free the slot below
                if fut.cancelled():
                    continue
                slot = free.pop()
                try:
                    self._admit_request(slot, key, context)
                except Exception as err:  # bad context shape/structure: fail it, keep serving
                    free.append(slot)
                    if not fut.done():
                        fut.set_exception(err)
                    continue
                pending[slot] = fut
                n_prev[slot] = 0
            if not pending:
                if draining:
                    return
                continue

            # -- one device dispatch advances every live slot K steps
            #    (faults here — and at the readback below — are contained
            #    by the _loop shell, which fails every in-flight future)
            self._x, self._ring, self._n = self._tick(
                self._x, self._ring, self._n, self._noisebuf, self._ctx
            )
            self.stats.ticks += 1
            k = self.ticks_per_dispatch
            self.stats.slot_steps += self.slots * k
            self.stats.bucket_counts[len(pending)] = self.stats.bucket_counts.get(len(pending), 0) + 1

            # -- retire finished (and mid-flight-cancelled) slots
            #    (the (slots,) read syncs on this tick only)
            n_host = np.asarray(self._n).astype(np.int64)
            self.stats.active_slot_steps += int(
                (np.minimum(n_host, self.steps) - np.minimum(n_prev, self.steps)).sum()
            )
            n_prev = n_host.copy()
            for slot, fut in list(pending.items()):
                if fut.cancelled():
                    # caller gave up: free the slot now — the masked tick
                    # keeps computing it until reuse, admission resets it
                    del pending[slot]
                    free.append(slot)
                elif n_host[slot] >= self.steps:
                    out = self._x[slot]
                    if self._postprocess is not None:
                        out = self._postprocess(self._x[slot][None])[0]
                    try:
                        fut.set_result(out)
                    except Exception:  # cancelled in the race window: drop it
                        pass
                    del pending[slot]
                    free.append(slot)
                    self.stats.completed += 1
            self.stats.requests = self.stats.completed + len(pending)
