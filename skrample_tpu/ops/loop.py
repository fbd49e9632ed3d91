"""``lax.scan`` denoise loops and the single-step device API.

Three execution strategies, fastest first:

* :class:`CompiledDenoiser` — table-compiled multistep samplers (Euler, DPM,
  Adams, UniP/UniPC, SPC...).  The scan body is ``model call + one fused
  FMA + ring roll``; all solver scalars were precomputed host-side in
  float64 by :mod:`skrample_tpu.ops.compiler`.
* :func:`rk_sample_loop` — tableau solvers (RKUltra / DynasauRK).  Stage
  structure unrolls at trace time; per-step stage points and update
  coefficients stream in as scan inputs, so DynasauRK's per-step tableaux
  compile into the same single executable.
* :func:`generic_sample_loop` — fallback that traces the polymorphic sampler
  spec directly (unrolled); needed only for non-affine samplers like
  ``SPC(power != 1)``.

No host syncs occur inside any loop; sample buffers are donated.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..common import DeltaPoint, Point, Step
from ..sampling import functional, interface, models, structured
from ..scheduling import SkrampleSchedule
from .compiler import CompiledSampler, compile_sampler

type DeviceModel = Callable[[jax.Array, jax.Array, jax.Array, jax.Array], jax.Array]
"(sample, timestep, sigma, alpha) -> prediction, all traced."


@dataclass
class CompiledDenoiser:
    """Device-ready form of a :class:`CompiledSampler`.

    Compacts the canonical weight table to the active columns
    (``[x, o, (hs, hp[, hz]) x H, z?]``), uploads it once, and provides both
    the full-scan loop and a reusable single-step function for wrappers."""

    compiled: CompiledSampler
    weights: jax.Array
    "(steps, rows, device_width)"
    points: jax.Array
    "(steps, 3)"
    slots: int
    "Ring entries per history slot (2, or 3 when past noise is read)."
    rows: int
    "1 when history stores raw (x, o); 3 when stored values are synthesized."
    kernel: str = "xla"
    "'xla' (fused multiply-add chain) or 'pallas' (explicit TPU kernel)."
    _jitted_step: Callable | None = None
    _jitted_step_indexed: Callable | None = None

    @classmethod
    def build(cls, compiled: CompiledSampler, dtype: Any = jnp.float32, kernel: str = "auto") -> "CompiledDenoiser":
        """``kernel='auto'`` resolves to the Pallas kernel on TPU and the XLA
        chain elsewhere.  Interleaved A/B on TPU v5e (SDXL 1x4x128x128
        latents, DPM++2M in a lax.scan, min over 6 alternating rounds):
        f32 Pallas 0.84 vs XLA 2.28 us/step; bf16 Pallas 0.91 vs XLA 1.91 —
        the explicit VMEM-streamed pass wins ~2-2.7x at both dtypes.
        Pass ``kernel='xla'`` to force the fallback."""
        H = compiled.history
        slots = 3 if compiled.ring_noise else 2
        rows = 1 if compiled.trivial_store else 3
        if kernel == "auto":
            kernel = "pallas" if jax.default_backend() == "tpu" else "xla"
        if kernel not in ("xla", "pallas"):
            raise ValueError(f"unknown kernel {kernel!r}")

        columns: list[int] = [0, 1]  # x, o
        for age in range(1, H + 1):
            base = 2 + 3 * (age - 1)
            columns.extend([base, base + 1])
            if compiled.ring_noise:
                columns.append(base + 2)
        if compiled.requires_noise:
            columns.append(compiled.width - 1)

        weights = compiled.weights[:, :rows, :][:, :, columns]
        return cls(
            compiled=compiled,
            weights=jnp.asarray(weights, dtype=dtype),
            points=jnp.asarray(compiled.points, dtype=dtype),
            slots=slots,
            rows=rows,
            kernel=kernel,
        )

    @property
    def history(self) -> int:
        return self.compiled.history

    @property
    def requires_noise(self) -> bool:
        return self.compiled.requires_noise

    def init_ring(self, sample: jax.Array) -> tuple[jax.Array, ...]:
        """History as a flat tuple ``(hs1, hp1[, hz1], hs2, ...)``: the ring
        roll is then pure pytree shuffling — zero data movement per step,
        unlike a stacked ring array which would copy itself every roll."""
        return tuple(jnp.zeros_like(sample) for _ in range(self.history * self.slots))

    def step(
        self,
        step_weights: jax.Array,
        x: jax.Array,
        o: jax.Array,
        ring: tuple[jax.Array, ...],
        noise: jax.Array | None = None,
    ) -> tuple[jax.Array, tuple[jax.Array, ...]]:
        "One update: returns (next sample, next ring). Pure; jit/scan friendly."
        basis: list[jax.Array] = [x, o, *ring]
        if self.requires_noise:
            assert noise is not None, "sampler requires per-step noise"
            basis.append(noise)

        w = step_weights.astype(x.dtype)

        if self.kernel == "pallas":
            from .fused import fused_step_pallas

            outs = fused_step_pallas(w[: self.rows], jnp.stack(basis))
            x_new = outs[0]
            if self.rows == 1:
                store_sample, store_pred = x, o
            else:
                store_sample, store_pred = outs[1], outs[2]
        else:

            def fma(r: int) -> jax.Array:
                acc = basis[0] * w[r, 0]
                for k in range(1, len(basis)):
                    acc = acc + basis[k] * w[r, k]
                return acc

            x_new = fma(0)
            if self.rows == 1:
                store_sample, store_pred = x, o
            else:
                store_sample, store_pred = fma(1), fma(2)

        if self.history:
            slot = [store_sample, store_pred]
            if self.slots == 3:
                slot.append(noise if noise is not None else jnp.zeros_like(x))
            ring = (*slot, *ring[: -self.slots])
        return x_new, ring

    def step_batched(
        self,
        step_weights: jax.Array,
        x: jax.Array,
        o: jax.Array,
        ring: tuple[jax.Array, ...],
        noise: jax.Array | None = None,
    ) -> tuple[jax.Array, tuple[jax.Array, ...]]:
        """One update with PER-ITEM weights: ``step_weights`` is
        ``(B, rows, width)`` — each batch row applies its own trajectory
        position's coefficients (continuous batching runs slots at different
        step indices in one dispatch; see
        :class:`skrample_tpu.continuous.ContinuousServingEngine`).

        The math is :meth:`step`'s FMA applied per row — elementwise
        multiplies against broadcast ``(B, 1, ...)`` scalars, so each row is
        bit-identical to the scalar-weight path.  Always the XLA chain: the
        Pallas fused kernel assumes weights shared across the batch, and the
        model call dominates this path regardless."""
        basis: list[jax.Array] = [x, o, *ring]
        if self.requires_noise:
            assert noise is not None, "sampler requires per-step noise"
            basis.append(noise)

        w = step_weights.astype(x.dtype)
        bshape = (x.shape[0],) + (1,) * (x.ndim - 1)

        def fma(r: int) -> jax.Array:
            acc = basis[0] * w[:, r, 0].reshape(bshape)
            for k in range(1, len(basis)):
                acc = acc + basis[k] * w[:, r, k].reshape(bshape)
            return acc

        x_new = fma(0)
        if self.rows == 1:
            store_sample, store_pred = x, o
        else:
            store_sample, store_pred = fma(1), fma(2)

        if self.history:
            slot = [store_sample, store_pred]
            if self.slots == 3:
                slot.append(noise if noise is not None else jnp.zeros_like(x))
            ring = (*slot, *ring[: -self.slots])
        return x_new, ring

    def jitted_step(self) -> Callable:
        """Single-step executable for wrappers: (step_weights, x, o, ring,
        noise?) -> (next x, next ring).  Compiled once, reused every step.

        The consumed buffers (x, o, the ring, noise) are donated on real
        accelerators: the update can run fully in place, so the dispatch
        path pays zero allocation per step.  Callers must treat the passed
        arrays as dead after the call (they receive the new ones back)."""
        if self._jitted_step is None:
            if jax.default_backend() == "cpu":
                donate: tuple[int, ...] = ()  # CPU ignores donation (and warns)
            else:
                # Donate only buffers that are actually consumed: with a
                # trivial store the raw (x, o[, z]) flow into the returned
                # ring unchanged and cannot be donated.
                passthrough = self.rows == 1 and self.history > 0
                consumed = [3]  # the ring always shifts one slot free
                if not passthrough:
                    consumed = [1, 2, 3]
                if self.requires_noise and not (passthrough and self.slots == 3):
                    consumed.append(4)
                donate = tuple(consumed)
            if self.requires_noise:
                self._jitted_step = jax.jit(
                    lambda w, x, o, ring, z: self.step(w, x, o, ring, z), donate_argnums=donate
                )
            else:
                self._jitted_step = jax.jit(lambda w, x, o, ring: self.step(w, x, o, ring), donate_argnums=donate)
        return self._jitted_step

    def jitted_step_indexed(self) -> Callable:
        """Like :meth:`jitted_step`, but the whole weight table stays resident
        on device and the host passes only the step index ``n`` (a scalar):
        ``(n, x, o, ring, noise?) -> (next x, next ring)``.

        This removes all per-step host work beyond the dispatch itself — no
        weight-row lookup, no per-step host->device row transfer — so it is
        the fastest single-step path for wrapper drivers that cannot scan.
        The row gather (``weights[n]``) is a device-side dynamic slice over a
        table that was uploaded once at build time."""
        if self._jitted_step_indexed is None:
            weights = self.weights  # uploaded once; closed over as a device constant
            # jitted_step's donation indices are positional over (w|n, x, o,
            # ring[, z]) — identical layout here, so the same analysis applies.
            if jax.default_backend() == "cpu":
                donate_idx: tuple[int, ...] = ()
            else:
                passthrough = self.rows == 1 and self.history > 0
                consumed = [3]
                if not passthrough:
                    consumed = [1, 2, 3]
                if self.requires_noise and not (passthrough and self.slots == 3):
                    consumed.append(4)
                donate_idx = tuple(consumed)
            if self.requires_noise:
                self._jitted_step_indexed = jax.jit(
                    lambda n, x, o, ring, z: self.step(weights[n], x, o, ring, z), donate_argnums=donate_idx
                )
            else:
                self._jitted_step_indexed = jax.jit(
                    lambda n, x, o, ring: self.step(weights[n], x, o, ring), donate_argnums=donate_idx
                )
        return self._jitted_step_indexed

    def run(
        self,
        model_fn: DeviceModel,
        sample: jax.Array,
        key: jax.Array | None = None,
        noises: jax.Array | None = None,
        return_trajectory: bool = False,
        unroll: int = 4,
        start: int = 0,
        callback: Callable[[np.ndarray, int], Any] | None = None,
    ) -> jax.Array:
        """The full denoise loop as one ``lax.scan``.

        Per-step noise comes from ``noises`` (precomputed ``(steps, *shape)``,
        e.g. Brownian/colored generators) or i.i.d. normal from ``key``.
        ``start`` skips the leading steps (img2img); pass the same value to
        :func:`~skrample_tpu.ops.compiler.compile_sampler` so the history
        ramp matches.  ``callback(sample, step_index)`` fires per step via
        ``jax.debug.callback`` (host-side, unordered w.r.t. device work).

        ``unroll=4`` measured fastest on TPU v5e at SDXL f32 latents
        (12-round interleaved A/B: 0.60 us/step vs 1.01 for unroll=1;
        single-run marginals jitter ~2x through the dev tunnel, so only
        interleaved comparisons are trusted)."""
        steps = self.compiled.steps

        xs: tuple = (jnp.arange(start, steps), self.weights[start:], self.points[start:])
        fold_keys = False
        if self.requires_noise:
            if noises is not None:
                xs = (*xs, noises[start:])
            elif key is not None:
                # Generate i.i.d. normal in-body from folded keys: no
                # (steps x latent) noise buffer in HBM.
                fold_keys = True
                xs = (*xs, jax.random.split(key, steps)[start:])
            else:
                raise ValueError("sampler requires noise: pass key= or noises=")

        def body(carry, inp):
            x, ring = carry
            if self.requires_noise:
                n, w, point, z = inp
                if fold_keys:
                    z = jax.random.normal(z, x.shape, x.dtype)
            else:
                (n, w, point), z = inp, None
            o = model_fn(x, point[0], point[1], point[2])
            x_new, ring_new = self.step(w, x, o, ring, z)
            if callback is not None:
                jax.debug.callback(callback, x_new, n)
            return (x_new, ring_new), (x_new if return_trajectory else None)

        (final, _ring), traj = jax.lax.scan(body, (sample, self.init_ring(sample)), xs, unroll=unroll)
        return traj if return_trajectory else final


def sample_loop(
    sampler: structured.StructuredSampler,
    schedule: SkrampleSchedule,
    model_transform: models.DiffusionModel,
    steps: int,
    model_fn: DeviceModel,
    sample: jax.Array,
    key: jax.Array | None = None,
    noises: jax.Array | None = None,
    dtype: Any = None,
    return_trajectory: bool = False,
    start: int = 0,
) -> jax.Array:
    "Compile + run a structured sampler as one fused scan loop."
    compiled = compile_sampler(sampler, schedule, model_transform, steps, start=start)
    denoiser = CompiledDenoiser.build(compiled, dtype=dtype or sample.dtype)
    return denoiser.run(
        model_fn, sample, key=key, noises=noises, return_trajectory=return_trajectory, start=start
    )


# --- Runge-Kutta scan loops ------------------------------------------------


def _wrap_device_model(
    model_fn: DeviceModel,
    model_transform: models.DiffusionModel,
    derivative_transform: models.DiffusionModel | None,
) -> DeviceModel:
    if not derivative_transform:
        return model_fn
    convert = models.ModelConvert(model_transform, derivative_transform)

    def wrapped(x, t, s, a):
        return convert.output_to(x, model_fn(x, t, s, a), Point(t, s, a))

    return wrapped


def rk_sample_loop(
    sampler: functional.RKUltra | functional.DynasauRK,
    schedule: SkrampleSchedule,
    model_transform: models.DiffusionModel,
    steps: int,
    model_fn: DeviceModel,
    sample: jax.Array,
    key: jax.Array | None = None,
    noises: jax.Array | None = None,
) -> jax.Array:
    """Tableau solvers as a ``lax.scan``.

    Stage structure (counts, which rows exist) is static; stage points and
    all gamma/delta/zeta coefficients are precomputed host-side in float64
    and stream through the scan as per-step arrays — so DynasauRK's per-step
    tableaux share one compiled executable.  Steps whose stages touch
    t=0 / sigma=0 (the final step) run outside the scan through the generic
    :func:`~skrample_tpu.sampling.functional.step_tableau`, which handles the
    model-call skip at trace time."""
    dtype = sample.dtype
    epsilon = 1e-8

    tableaus = [
        sampler.tableau(Step.from_int(n, steps)) if isinstance(sampler, functional.DynasauRK) else sampler.tableau()
        for n in range(steps)
    ]
    stages = len(tableaus[0].stages)
    assert all(len(t.stages) == stages for t in tableaus), "stage structure must be uniform"

    transform = sampler.derivative_transform or model_transform
    wrapped_model = _wrap_device_model(model_fn, model_transform, sampler.derivative_transform)

    # Host-side coefficient extraction, float64 throughout
    stage_points = np.zeros((steps, stages, 3))
    stage_gamma = np.zeros((steps, stages))
    stage_delta = np.zeros((steps, stages))
    a_norm = np.zeros((steps, stages, stages))  # a-row / fsum(a-row)
    b_weights = np.zeros((steps, stages))
    final_gamma = np.zeros(steps)
    final_delta = np.zeros(steps)
    final_zeta = np.zeros(steps)
    scan_mask = np.ones(steps, dtype=bool)

    for n in range(steps):
        tab = tableaus[n]
        step = Step.from_int(n, steps)
        S0, S1, *points = schedule.ipoints([*step, *(step[0] + st.c * (step[1] - step[0]) for st in tab.stages)])
        delta = DeltaPoint(S0, S1)
        for i, (point, stage) in enumerate(zip(points, tab.stages, strict=True)):
            if abs(point.timestep) < epsilon or abs(point.sigma) < epsilon:
                scan_mask[n] = False  # needs the generic call-skip path
            stage_points[n, i] = point
            if stage.a:
                part = DeltaPoint(S0, point)
                stage_gamma[n, i] = transform.gamma(part)
                stage_delta[n, i] = transform.delta(part)
                a_norm[n, i, : len(stage.a)] = np.asarray(stage.a) / math.fsum(stage.a)
        b_weights[n] = tab.weights
        final_gamma[n] = transform.gamma(delta, sampler.stochasticity)
        final_delta[n] = transform.delta(delta, sampler.stochasticity)
        final_zeta[n] = transform.zeta(delta, sampler.stochasticity)

    requires_noise = abs(sampler.stochasticity) > 1e-8
    if requires_noise and noises is None:
        if key is None:
            raise ValueError("stochastic sampler: pass key= or noises=")
        noises = jax.vmap(lambda k: jax.random.normal(k, sample.shape, dtype))(jax.random.split(key, steps))

    # Which stages synthesize an intermediate sample (static structure)
    has_a = [bool(tab.a) for tab in tableaus[0].stages]

    def stage_body(x, inp):
        pts, s_g, s_d, a_n, b_w, f_g, f_d, f_z, z = inp
        derivatives: list[jax.Array] = []
        for i in range(stages):
            if has_a[i]:
                mean_d = sum(derivatives[j] * a_n[i, j] for j in range(i))
                X = x * s_g[i] + mean_d * s_d[i]
            else:
                X = x
            derivatives.append(wrapped_model(X, pts[i, 0], pts[i, 1], pts[i, 2]))
        combined = sum(derivatives[i] * b_w[i] for i in range(stages))
        x_new = x * f_g + combined * f_d
        if requires_noise:
            x_new = x_new + z * f_z
        return x_new

    # Scan over the prefix of steps that never touch t=0; run the rest generically.
    n_scan = int(np.argmin(scan_mask)) if not scan_mask.all() else steps

    if n_scan:
        xs = tuple(
            jnp.asarray(arr[:n_scan], dtype=dtype)
            for arr in (stage_points, stage_gamma, stage_delta, a_norm, b_weights, final_gamma, final_delta, final_zeta)
        )
        z_xs = noises[:n_scan] if requires_noise else jnp.zeros((n_scan, 1), dtype)

        def body(x, inp):
            return stage_body(x, inp), None

        sample, _ = jax.lax.scan(body, sample, (*xs, z_xs))

    for n in range(n_scan, steps):
        step = Step.from_int(n, steps)
        sample = functional.step_tableau(
            tableaus[n],
            sample,
            model_fn,  # step_tableau applies the derivative conversion itself
            model_transform,
            schedule,
            step,
            sampler.derivative_transform,
            noises[n] if requires_noise else None,
            sampler.stochasticity,
        )[0]

    return sample


def generic_sample_loop(
    sampler: structured.StructuredSampler,
    schedule: SkrampleSchedule,
    model_transform: models.DiffusionModel,
    steps: int,
    model_fn: DeviceModel,
    sample: jax.Array,
    noises: jax.Array | None = None,
) -> jax.Array:
    """Fallback: trace the polymorphic sampler spec directly (unrolled loop).

    Works for every sampler including non-affine ones; compile time grows
    with ``steps``."""
    adapter = interface.StructuredFunctionalAdapter(sampler)
    if noises is not None:
        counter = iter(range(steps))
        rng = lambda _step: noises[next(counter)]  # noqa: E731
    else:
        rng = None
    return adapter.sample_model(sample, model_fn, model_transform, schedule, steps, rng=rng)




def rkmoire_sample_loop(
    sampler: functional.RKMoire,
    schedule: SkrampleSchedule,
    model_transform: models.DiffusionModel,
    steps: int,
    model_fn: DeviceModel,
    sample: jax.Array,
    include: slice = slice(None),
) -> jax.Array:
    """Adaptive embedded RK with the step-size controller on host and ONE
    jitted embedded-step executable on device.

    Reproduces :meth:`~skrample_tpu.sampling.functional.RKMoire.sample_model`
    exactly (same controller math, same MSE evaluator — which must be the
    default for this path), but each trial step is a single device dispatch
    instead of dozens of eager ops.  Error scalars sync back per iteration —
    that is inherent to data-dependent step control."""
    if sampler.evaluator is not functional.FunctionalAdaptive.mse:
        # custom evaluators are arbitrary host code: use the eager spec path
        return sampler.sample_model(sample, model_fn, model_transform, schedule, steps, include)

    dtype = sample.dtype
    tab = sampler.tableau()
    stages = len(tab.stages)
    has_a = [bool(st.a) for st in tab.stages]
    a_norm = np.zeros((stages, stages))
    for i, st in enumerate(tab.stages):
        if st.a:
            a_norm[i, : len(st.a)] = np.asarray(st.a) / math.fsum(st.a)
    b_w = np.asarray(tab.weights)
    e_w = np.asarray(tab.error_weights)

    transform = sampler.derivative_transform or model_transform
    wrapped_model = _wrap_device_model(model_fn, model_transform, sampler.derivative_transform)

    @jax.jit
    def eval_step(x, pts, s_g, s_d, f_g, f_d):
        derivatives: list[jax.Array] = []
        for i in range(stages):
            if has_a[i]:
                mean_d = sum(derivatives[j] * float(a_norm[i, j]) for j in range(i))
                X = x * s_g[i] + mean_d * s_d[i]
            else:
                X = x
            derivatives.append(wrapped_model(X, pts[i, 0], pts[i, 1], pts[i, 2]))
        high = x * f_g + sum(d * float(w) for d, w in zip(derivatives, b_w)) * f_d
        low = x * f_g + sum(d * float(w) for d, w in zip(derivatives, e_w)) * f_d
        # relative error: mse(low, high) / max(mse(0, high), eps) — on device
        err = jnp.mean(jnp.square(low - high)) / jnp.maximum(jnp.mean(jnp.square(high)), 1e-16)
        return high, err

    def coefficients(step_from: int, step_to: int):
        step = Step(step_from / steps, step_to / steps)
        S0, S1, *points = schedule.ipoints([*step, *(step[0] + st.c * (step[1] - step[0]) for st in tab.stages)])
        delta = DeltaPoint(S0, S1)
        pts = np.asarray(points, dtype=np.float64)
        s_g = np.zeros(stages)
        s_d = np.zeros(stages)
        for i, (point, st) in enumerate(zip(points, tab.stages, strict=True)):
            if st.a:
                part = DeltaPoint(S0, point)
                s_g[i] = transform.gamma(part)
                s_d[i] = transform.delta(part)
        return (
            jnp.asarray(pts, dtype),
            jnp.asarray(s_g, dtype),
            jnp.asarray(s_d, dtype),
            jnp.asarray(transform.gamma(delta), dtype),
            jnp.asarray(transform.delta(delta), dtype),
        )

    # --- controller: mirrors RKMoire.sample_model exactly -------------------
    initial = sampler.initial
    maximum = sampler.maximum
    if sampler.rescale_init:
        initial *= stages / 2
    if sampler.rescale_max:
        maximum *= stages / 2

    step_size = max(round(steps * initial), 1)
    epsilon = 1e-16
    indices = list(range(steps))[include]
    step = indices[0]

    while step <= indices[-1]:
        step_next = min(step + step_size, indices[-1] + 1)

        if step_next < steps:
            sample_high, err_dev = eval_step(sample, *coefficients(step, step_next))

            sigma0, sigma1, sigma2 = schedule.ipoints_np(
                [step / steps, step_next / steps, (step_next + step_size) / steps]
            )[:, 1].tolist()
            slope = abs(sigma0 - sigma1) / abs(sigma1 - sigma2)

            error = float(err_dev)  # the one host sync per trial step
            adjustment = (sampler.threshold / max(error, epsilon)) ** sampler.adaption / slope
            step_size = max(round(min(step_size * adjustment, steps * maximum)), 1)

            if step_next - step > step_size and 1 / max(adjustment, epsilon) > sampler.discard:
                continue  # retry smaller without accepting

        else:  # final step: generic path handles the t=0 stage skip
            sample_high = functional.step_tableau(
                tab.unembed(),
                sample,
                model_fn,
                model_transform,
                schedule,
                Step(step / steps, 1),
                sampler.derivative_transform,
            )[0]

        sample = sample_high
        step = step_next

    return sample
