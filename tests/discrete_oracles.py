"""Independent discrete-scheduler oracles for parity testing.

The ``diffusers`` package is not installable in this environment, so the
parity tier runs against these *independently written* implementations of
the published algorithms that diffusers' schedulers implement:

* the discrete scaled-linear beta schedule (DDPM/SD convention:
  ``betas = linspace(sqrt(b0), sqrt(b1), N)^2``, cumulative products),
* the zero-terminal-SNR rescale (arXiv:2305.08891, algorithm 1, discrete),
* flow-match sigma grids with the resolution shift (Flux/SD3 convention),
* Euler, Euler-ancestral, Heun, and DPM-Solver++(2M) sampling updates
  (arXiv:2211.01095), all in the normalized variance-preserving domain.

Everything here is written from the published formulas in discrete form —
deliberately NOT from this library's continuous closed forms — so agreement
is evidence, not circularity.
"""

from __future__ import annotations

import math

import numpy as np


# =============================================================================
# Discrete schedule tables
# =============================================================================


def scaled_linear_alphas_cumprod(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
) -> np.ndarray:
    "The SD 'scaled_linear' cumulative signal table, discrete cumprod form."
    betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def zsnr_alphas_cumprod(alphas_cumprod: np.ndarray) -> np.ndarray:
    "Zero-terminal-SNR rescale (arXiv:2305.08891 alg. 1) of a discrete table."
    roots = np.sqrt(alphas_cumprod)
    first, last = roots[0], roots[-1]
    roots = (roots - last) * (first / (first - last))
    return roots**2


def regular_sigmas(alphas_cumprod: np.ndarray) -> np.ndarray:
    "Karras-style 'regular' sigma per trained timestep: sqrt((1-ac)/ac)."
    return np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)


def euler_discrete_grid(
    steps: int, num_train_timesteps: int = 1000, zsnr: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """(timesteps, regular sigmas) as the discrete Euler scheduler presents
    them with the SD-standard "trailing" spacing: descending from the last
    trained timestep in N/steps strides, sigmas interpolated on the table."""
    table = scaled_linear_alphas_cumprod(num_train_timesteps)
    if zsnr:
        table = zsnr_alphas_cumprod(table)
    stride = num_train_timesteps / steps
    timesteps = np.arange(num_train_timesteps, 0, -stride).round().astype(np.float64) - 1
    with np.errstate(divide="ignore"):
        sigmas = np.interp(timesteps, np.arange(num_train_timesteps), regular_sigmas(table))
    return timesteps, sigmas


def flowmatch_grid(steps: int, shift: float = 1.0, num_train_timesteps: int = 1000) -> tuple[np.ndarray, np.ndarray]:
    """(timesteps, sigmas) of the discrete flow-match Euler scheduler:
    ``sigmas = linspace(1, 1/steps)`` through the static resolution shift,
    timesteps presented as ``sigma * N``."""
    sigmas = np.linspace(1.0, 1.0 / steps, steps, dtype=np.float64)
    sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    return sigmas * num_train_timesteps, sigmas


def flowmatch_dynamic_grid(
    steps: int, mu: float, sigma_power: float = 1.0, num_train_timesteps: int = 1000
) -> tuple[np.ndarray, np.ndarray]:
    """Dynamic-shifting ("mu") flow-match grid: the Flux/SD3 ``time_shift``
    ``sigma -> exp(mu) / (exp(mu) + (1/sigma - 1)^sigma_power)`` applied to
    the linear grid.  With ``sigma_power=1`` (every shipped Flux config) this
    is exactly the static shift at ``shift = exp(mu)``; the exponent form is
    the published generalization."""
    sigmas = np.linspace(1.0, 1.0 / steps, steps, dtype=np.float64)
    sigmas = np.exp(mu) / (np.exp(mu) + (1.0 / sigmas - 1.0) ** sigma_power)
    return sigmas * num_train_timesteps, sigmas


# =============================================================================
# Normalized-domain helpers
# =============================================================================


def vp_normalize(regular: np.ndarray | float) -> tuple[np.ndarray, np.ndarray]:
    """regular sigma -> normalized (sigma, alpha) with sigma^2 + alpha^2 = 1.

    The polar form handles infinite regular sigmas (exact zero SNR) exactly:
    atan(inf) = pi/2 -> (1, 0)."""
    theta = np.arctan(regular)
    return np.sin(theta), np.cos(theta)


# =============================================================================
# Sampling updates (normalized VP domain: x = alpha*x0 + sigma*eps)
# =============================================================================


def euler_step(x: np.ndarray, eps: np.ndarray, reg_from: float, reg_to: float) -> np.ndarray:
    """One Euler update in the scaled (regular-sigma) domain:
    ``x_scaled += (s_to - s_from) * eps``, mapped through the VP scaling."""
    s_f, a_f = vp_normalize(reg_from)
    s_t, a_t = vp_normalize(reg_to)
    scaled = x / a_f  # to the sigma-scaled domain
    scaled = scaled + (reg_to - reg_from) * eps
    return scaled * a_t


def ancestral_step(
    x: np.ndarray, eps: np.ndarray, reg_from: float, reg_to: float, noise: np.ndarray
) -> np.ndarray:
    "Euler-ancestral: split the target sigma into a down-step plus fresh noise."
    up2 = reg_to**2 * (reg_from**2 - reg_to**2) / reg_from**2
    up = math.sqrt(up2)
    down = math.sqrt(reg_to**2 - up2)
    s_f, a_f = vp_normalize(reg_from)
    s_t, a_t = vp_normalize(reg_to)
    scaled = x / a_f
    scaled = scaled + (down - reg_from) * eps + up * noise
    return scaled * a_t


def heun_step(
    x: np.ndarray,
    model,  # (x_scaled_normalized, timestep, reg_sigma) -> eps
    t_from: float,
    t_to: float,
    reg_from: float,
    reg_to: float,
) -> np.ndarray:
    "Second-order Heun (trapezoid) update in the scaled domain."
    s_f, a_f = vp_normalize(reg_from)
    s_t, a_t = vp_normalize(reg_to)
    eps_1 = model(x, t_from, reg_from)
    scaled = x / a_f
    probe = scaled + (reg_to - reg_from) * eps_1
    eps_2 = model(probe * a_t, t_to, reg_to)
    scaled = scaled + (reg_to - reg_from) * 0.5 * (eps_1 + eps_2)
    return scaled * a_t


def dpmpp_2m_trajectory(
    x: np.ndarray,
    model,  # (x, timestep, reg_sigma) -> eps
    timesteps: np.ndarray,
    sigmas: np.ndarray,
    order: int = 2,
) -> np.ndarray:
    """DPM-Solver++(2M) (arXiv:2211.01095 algorithm 2), data-prediction form,
    in the normalized VP domain, with the standard first-step warmup and
    last-step order drop.  ``sigmas`` are regular; a trailing zero hop ends
    the trajectory."""
    reg = np.concatenate([sigmas, [0.0]])
    x0_prev: np.ndarray | None = None
    lam_prev: float | None = None

    for n, t in enumerate(timesteps):
        s_f, a_f = vp_normalize(reg[n])
        s_t, a_t = vp_normalize(reg[n + 1])

        eps = model(x, t, reg[n])
        x0 = (x - s_f * eps) / a_f
        lam_f = math.log(a_f / s_f) if s_f > 0 else math.inf

        use_second = (
            order >= 2
            and x0_prev is not None
            and n + 1 < len(timesteps)  # the final update drops to order 1
        )
        if use_second:
            lam_t = math.log(a_t / s_t) if s_t > 0 else math.inf
            h = lam_t - lam_f
            h_prev = lam_f - lam_prev
            r = h_prev / h
            d = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
        else:
            d = x0

        if s_t > 0:
            lam_t = math.log(a_t / s_t)
            h = lam_t - lam_f
            x = (s_t / s_f) * x - a_t * math.expm1(-h) * d
        else:
            x = a_t * d  # terminal hop lands exactly on the estimate

        x0_prev = x0
        lam_prev = lam_f

    return x


def unipc_trajectory(
    x: np.ndarray,
    model,  # (x, timestep, reg_sigma) -> eps
    timesteps: np.ndarray,
    sigmas: np.ndarray,
    order: int = 2,
) -> np.ndarray:
    """UniPC (arXiv:2302.04867), data-prediction, B(h) = e^-h - 1 variant, in
    the phi-function formulation: at each step the previous result is first
    corrected with the fresh model output (UniC), then the predictor (UniP)
    advances.  Order ramps with available history and down toward the end.

    The difference weights rho solve the Vandermonde system
    ``sum_k rho_k r_k^(n-1) = n! * phi_{n+1}(-h) / phi_1(-h)`` where
    ``phi_1(z) = e^z - 1`` and ``phi_{k+1}(z) = (phi_k(z) - 1/k!) / z``."""
    reg = np.concatenate([sigmas, [0.0]])
    steps = len(timesteps)

    def nrm(r: float) -> tuple[float, float]:
        th = math.atan(r)
        return math.sin(th), math.cos(th)

    def lam(n: int) -> float:
        s, a = nrm(reg[n])
        return math.log(a / s) if s > 0 else math.inf

    def phi_rhos(h: float, ratios: list[float]) -> list[float]:
        "Solve for the difference-term weights (fast path for one ratio)."
        z = -h
        phi = math.expm1(z)  # phi_1(z) * z^0 bookkeeping follows the recursion
        b_scale = phi
        rows, rhs = [], []
        running = phi / z - 1.0
        for n in range(1, len(ratios) + 1):
            rows.append([r ** (n - 1) for r in ratios])
            rhs.append(running * math.factorial(n) / b_scale)
            running = running / z - 1.0 / math.factorial(n + 1)
        return list(np.linalg.solve(rows, rhs))

    def effective(n: int, hist: int) -> int:
        return max(1, min(9, n + 1, order, hist + 1, steps - n))

    def solve(n_from: int, n_to: int, x_from: np.ndarray, x0s: list[np.ndarray], lams: list[float],
              extra: tuple[np.ndarray, float] | None) -> np.ndarray:
        "One UniP/UniC update from history (newest first) at n_from -> n_to."
        s_f, a_f = nrm(reg[n_from])
        s_t, a_t = nrm(reg[n_to])
        lam_f = lams[0]
        lam_t = math.log(a_t / s_t) if s_t > 0 else math.inf
        h = abs(lam_t - lam_f)

        ratios: list[float] = []
        diffs: list[np.ndarray] = []
        for k in range(1, len(x0s)):
            rk = (lams[k] - lam_f) / h
            ratios.append(rk if math.isfinite(rk) else 0.0)
            diffs.append((x0s[k] - x0s[0]) / rk)
        if extra is not None:  # corrector: the next point's estimate at r = 1
            ratios.append(1.0)
            diffs.append(extra[0] - x0s[0])

        if not ratios:
            rhos = [0.5]
        else:
            rhos = phi_rhos(h, ratios)

        d = x0s[0]
        for rho, diff in zip(rhos[: len(diffs)], diffs, strict=False):
            d = d + rho * diff
        if s_t > 0:
            return (s_t / s_f) * x_from - a_t * math.expm1(-h) * d
        return a_t * d

    hist_x0: list[np.ndarray] = []   # newest first
    hist_lam: list[float] = []
    hist_x: list[np.ndarray] = []    # sample each prediction was made at
    hist_n: list[int] = []

    for n in range(steps):
        s_f, a_f = nrm(reg[n])
        eps = model(x, timesteps[n], reg[n])
        x0 = (x - s_f * eps) / a_f

        if hist_x0:
            # UniC: re-solve the previous hop with this estimate appended
            k = effective(hist_n[0], len(hist_n) - 1)
            x = solve(
                hist_n[0],
                n,
                hist_x[0],
                hist_x0[: k],
                hist_lam[: k],
                extra=(x0, 1.0),
            )

        hist_x0.insert(0, x0)
        hist_lam.insert(0, lam(n))
        hist_x.insert(0, x)
        hist_n.insert(0, n)

        # UniP from the (corrected) sample
        k = effective(n, len(hist_n) - 1)
        x = solve(n, n + 1, x, hist_x0[: k], hist_lam[: k], extra=None)

    return x
