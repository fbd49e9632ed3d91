"""Fully device-resident adaptive RK (RKMoire) via ``lax.while_loop``.

The adaptive controller's state space is *discrete*: the cursor and the step
size are integers in ``[0, steps]``, so every schedule point / transition
coefficient any trial step could ever need can be precomputed host-side (in
float64, with the exact arithmetic the host controller uses) into
``(cursor, size)``-indexed tables.  The whole sample loop then runs as one
``lax.while_loop`` on device — controller scalars in float64 via a local x64
scope — with **zero host syncs**, unlike the round-1 host controller that
synced the error scalar once per trial step.

Numerical parity: identical coefficient tables, identical f32 stage math,
identical f64 controller arithmetic; the only tolerated divergence is the
last-ulp of the XLA ``pow`` vs libm in the step-size update, which can flip
a ``round()`` only on exact .5 boundaries (asserted not to occur in tests:
trial counts match the host controller exactly).

Table memory is O(steps^2 * stages); the driver falls back to the host
controller above ``MAX_TABLE_ENTRIES`` or for non-default evaluators.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..common import DeltaPoint, Step
from ..sampling import functional, models
from ..sampling.rk_solvers import RKMoire
from ..scheduling import SkrampleSchedule
from .loop import DeviceModel, _wrap_device_model

MAX_TABLE_ENTRIES = 4_000_000
"Coefficient-table size cap (entries) before falling back to the host loop."


def rkmoire_device_loop(
    sampler: RKMoire,
    schedule: SkrampleSchedule,
    model_transform: models.DiffusionModel,
    steps: int,
    model_fn: DeviceModel,
    sample: jax.Array,
    include: slice = slice(None),
    return_counters: bool = False,
) -> jax.Array | tuple[jax.Array, int, int]:
    """Run RKMoire entirely on device.

    Matches :meth:`RKMoire.sample_model` trajectory-for-trajectory for the
    default MSE evaluator.  ``return_counters`` additionally returns the
    (accepted, trials) counts for parity testing."""
    if sampler.evaluator is not functional.FunctionalAdaptive.mse:
        raise ValueError("device loop supports the default MSE evaluator only")

    dtype = sample.dtype
    pair = sampler.tableau()
    stages = len(pair.stages)
    has_a = [bool(st.a) for st in pair.stages]
    a_norm = np.zeros((stages, stages))
    for i, st in enumerate(pair.stages):
        if st.a:
            a_norm[i, : len(st.a)] = np.asarray(st.a) / math.fsum(st.a)
    b_w = [float(w) for w in pair.weights]
    e_w = [float(w) for w in pair.error_weights]

    # --- controller constants, exactly as the host loop derives them --------
    first_frac = sampler.initial * (stages / 2 if sampler.rescale_init else 1)
    ceiling_frac = sampler.maximum * (stages / 2 if sampler.rescale_max else 1)
    size0 = max(round(steps * first_frac), 1)
    span = list(range(steps))[include]
    first, last = span[0], span[-1]
    # the controller clamp is min(size * adjustment, steps * ceiling_frac)
    # before round(); the largest representable integer size is therefore:
    max_size = max(int(round(steps * ceiling_frac)), size0, 1)

    if steps * (max_size + 1) * stages * 3 > MAX_TABLE_ENTRIES:
        raise ValueError("coefficient tables would exceed MAX_TABLE_ENTRIES; use the host loop")

    transform = sampler.derivative_transform or model_transform
    wrapped_model = _wrap_device_model(model_fn, model_transform, sampler.derivative_transform)

    # --- (cursor, size) coefficient tables, float64 host-side ---------------
    # Trial steps always land on the integer grid: Step(c/steps, t/steps)
    # with t = min(c + s, last + 1).  Stage geometry therefore only depends
    # on (c, effective s).
    tab_pts = np.zeros((steps, max_size + 1, stages, 3))
    tab_sg = np.zeros((steps, max_size + 1, stages))
    tab_sd = np.zeros((steps, max_size + 1, stages))
    tab_fg = np.zeros((steps, max_size + 1))
    tab_fd = np.zeros((steps, max_size + 1))

    for c in range(first, min(last + 1, steps)):
        for s in range(1, max_size + 1):
            t = min(c + s, last + 1)
            if t >= steps or t <= c:
                continue  # final-branch or unreachable
            step = Step(c / steps, t / steps)
            S0, S1, *points = schedule.ipoints([*step, *(step[0] + st.c * (step[1] - step[0]) for st in pair.stages)])
            for i, (point, st) in enumerate(zip(points, pair.stages, strict=True)):
                tab_pts[c, s, i] = point
                if st.a:
                    part = DeltaPoint(S0, point)
                    tab_sg[c, s, i] = transform.gamma(part)
                    tab_sd[c, s, i] = transform.delta(part)
            whole = DeltaPoint(S0, S1)
            tab_fg[c, s] = transform.gamma(whole)
            tab_fd[c, s] = transform.delta(whole)

    # sigma grid for the slope correction: ipoints at every integer/steps,
    # index clipped exactly like the host's t-axis clip.
    sig_grid = np.asarray([p.sigma for p in schedule.ipoints([i / steps for i in range(steps + 1)])])

    # --- final-step tables (cursor -> coefficients), Step(c/steps, 1) -------
    epsilon = 1e-8
    fin_pts = np.zeros((steps, stages, 3))
    fin_sg = np.zeros((steps, stages))
    fin_sd = np.zeros((steps, stages))
    fin_fg = np.zeros(steps)
    fin_fd = np.zeros(steps)
    fin_skip: list[set[int]] = []
    for c in range(steps):
        step = Step(c / steps, 1)
        S0, S1, *points = schedule.ipoints([*step, *(step[0] + st.c * (step[1] - step[0]) for st in pair.stages)])
        skips: set[int] = set()
        for i, (point, st) in enumerate(zip(points, pair.stages, strict=True)):
            fin_pts[c, i] = point
            if abs(point.timestep) < epsilon or abs(point.sigma) < epsilon:
                skips.add(i)
            if st.a:
                part = DeltaPoint(S0, point)
                fin_sg[c, i] = transform.gamma(part)
                fin_sd[c, i] = transform.delta(part)
        whole = DeltaPoint(S0, S1)
        fin_fg[c] = transform.gamma(whole)
        fin_fd[c] = transform.delta(whole)
        fin_skip.append(skips)
    # the model-call-skip structure must be cursor-invariant to stay traceable
    skip_mask = fin_skip[0] if fin_skip else set()
    if any(s != skip_mask for s in fin_skip):
        raise ValueError("final-step skip structure varies with cursor; use the host loop")

    # --- device constants ----------------------------------------------------
    d_pts = jnp.asarray(tab_pts, dtype)
    d_sg = jnp.asarray(tab_sg, dtype)
    d_sd = jnp.asarray(tab_sd, dtype)
    d_fg = jnp.asarray(tab_fg, dtype)
    d_fd = jnp.asarray(tab_fd, dtype)
    d_fin_pts = jnp.asarray(fin_pts, dtype)
    d_fin_sg = jnp.asarray(fin_sg, dtype)
    d_fin_sd = jnp.asarray(fin_sd, dtype)
    d_fin_fg = jnp.asarray(fin_fg, dtype)
    d_fin_fd = jnp.asarray(fin_fd, dtype)

    with jax.enable_x64():
        d_sig = jnp.asarray(sig_grid, jnp.float64)
        f64 = dict(
            threshold=jnp.float64(sampler.threshold),
            adaption=jnp.float64(sampler.adaption),
            eps=jnp.float64(1e-16),
            cap=jnp.float64(steps * ceiling_frac),
            discard=jnp.float64(sampler.discard) if math.isfinite(sampler.discard) else None,
        )

    def stage_sweep(x, pts, s_g, s_d):
        "Shared RK stage loop; returns the derivative list."
        derivs: list[jax.Array] = []
        for i in range(stages):
            if has_a[i]:
                mix = sum(derivs[j] * float(a_norm[i, j]) for j in range(i) if a_norm[i, j] != 0.0)
                latent = x * s_g[i] + mix * s_d[i]
            else:
                latent = x
            derivs.append(wrapped_model(latent, pts[i, 0], pts[i, 1], pts[i, 2]))
        return derivs

    def trial(x, cursor, size, target):
        s_eff = target - cursor
        pts = d_pts[cursor, s_eff]
        derivs = stage_sweep(x, pts, d_sg[cursor, s_eff], d_sd[cursor, s_eff])
        fg = d_fg[cursor, s_eff]
        fd = d_fd[cursor, s_eff]
        high = x * fg + sum(d * w for d, w in zip(derivs, b_w)) * fd
        low = x * fg + sum(d * w for d, w in zip(derivs, e_w)) * fd
        # identical f32 error math to the host path's device kernel
        err = jnp.mean(jnp.square(low - high)) / jnp.maximum(jnp.mean(jnp.square(high)), jnp.asarray(1e-16, dtype))
        return high, err

    def controller(cursor, size, target, err32):
        "Step-size update in float64 — the host controller's exact arithmetic."
        with jax.enable_x64():
            sigma0 = d_sig[cursor]
            sigma1 = d_sig[target]
            sigma2 = d_sig[jnp.minimum(target + size, steps)]
            slope = jnp.abs(sigma0 - sigma1) / jnp.abs(sigma1 - sigma2)
            error = jnp.maximum(err32.astype(jnp.float64), f64["eps"])
            adjustment = (f64["threshold"] / error) ** f64["adaption"] / slope
            new_size = jnp.maximum(jnp.round(jnp.minimum(size * adjustment, f64["cap"])), 1.0).astype(jnp.int32)
            if f64["discard"] is None:
                redo = jnp.bool_(False)
            else:
                redo = ((target - cursor) > new_size) & (
                    1.0 / jnp.maximum(adjustment, f64["eps"]) > f64["discard"]
                )
        return new_size, redo

    terminal = last + 1 == steps

    def cond(state):
        x, cursor, size, accepted, trials = state
        in_range = cursor <= last
        target = jnp.minimum(cursor + size, last + 1)
        return in_range & (target < steps) if terminal else in_range

    def body(state):
        x, cursor, size, accepted, trials = state
        target = jnp.minimum(cursor + size, last + 1)
        high, err = trial(x, cursor, size, target)
        new_size, redo = controller(cursor, size, target, err)
        x_next = jnp.where(redo, x, high)
        cursor_next = jnp.where(redo, cursor, target)
        return (x_next, cursor_next, new_size, accepted + (~redo).astype(jnp.int32), trials + 1)

    state = (
        sample,
        jnp.asarray(first, jnp.int32),
        jnp.asarray(size0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    x, cursor, size, accepted, trials = jax.lax.while_loop(cond, body, state)

    if terminal:
        # One final hop to t=0: bare high-order row, degenerate stages back-solved.
        def final_hop(x, cursor):
            pts = d_fin_pts[cursor]
            fg = d_fin_fg[cursor]
            fd = d_fin_fd[cursor]
            derivs: list[jax.Array] = []
            for i in range(stages):
                if has_a[i]:
                    mix = sum(derivs[j] * float(a_norm[i, j]) for j in range(i) if a_norm[i, j] != 0.0)
                    latent = x * d_fin_sg[cursor, i] + mix * d_fin_sd[cursor, i]
                else:
                    latent = x
                if i in skip_mask:
                    derivs.append((latent - fg * x) / fd)  # transition.invert, eta=0
                else:
                    derivs.append(wrapped_model(latent, pts[i, 0], pts[i, 1], pts[i, 2]))
            return x * fg + sum(d * w for d, w in zip(derivs, b_w)) * fd

        x = final_hop(x, cursor)
        accepted = accepted + 1

    if return_counters:
        return x, accepted, trials
    return x
