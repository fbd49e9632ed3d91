"""Guidance combinators for model closures.

The sampler APIs take a bare ``(x, t, sigma, alpha) -> prediction`` closure;
conditioning lives inside it.  These combinators compose guided closures out
of conditioned/unconditioned ones while staying jit-transparent (everything
is elementwise, so the combined closure fuses into the surrounding scan).
"""

from __future__ import annotations

from collections.abc import Callable

from ..common import Sample

type ModelClosure[T: Sample] = Callable[[T, float, float, float], T]


def classifier_free[T: Sample](
    conditioned: ModelClosure[T],
    unconditioned: ModelClosure[T],
    scale: float,
) -> ModelClosure[T]:
    """Classifier-free guidance: ``u + scale * (c - u)``.

    ``scale=1`` degenerates to the conditioned model; ``0`` to the
    unconditioned one.  Costs two model evaluations per call — batch the two
    branches inside one closure when the model supports it."""

    def guided(x: T, t: float, s: float, a: float) -> T:
        u = unconditioned(x, t, s, a)
        c = conditioned(x, t, s, a)
        return u + scale * (c - u)

    return guided


def interval_classifier_free[T: Sample](
    conditioned: ModelClosure[T],
    unconditioned: ModelClosure[T],
    scale: float,
    sigma_range: tuple[float, float],
) -> ModelClosure[T]:
    """Guidance interval (arXiv:2404.07724): apply CFG only while sigma is
    inside ``sigma_range`` and run the conditioned model bare elsewhere.

    Guiding the entire trajectory is where CFG's over-saturation comes
    from — the paper shows restricting guidance to the middle noise levels
    improves FID at equal scale.  The band check is ``jnp.where`` on the
    traced sigma (no Python branching), so one compiled closure serves the
    whole trajectory; both model branches still evaluate per call — batch
    them inside one closure when the model supports it (see
    ``MMDiT.as_sampleable``'s batched-CFG layout)."""
    import jax.numpy as jnp

    lo, hi = sigma_range

    def guided(x: T, t: float, s: float, a: float) -> T:
        c = conditioned(x, t, s, a)
        u = unconditioned(x, t, s, a)
        live = jnp.logical_and(s >= lo, s <= hi)
        eff = jnp.where(live, scale, 1.0)
        return u + eff * (c - u)

    return guided


def rescaled_classifier_free[T: Sample](
    conditioned: ModelClosure[T],
    unconditioned: ModelClosure[T],
    scale: float,
    rescale: float = 0.7,
) -> ModelClosure[T]:
    """CFG with std-rescale (arXiv:2305.08891 section 3.4): the guided
    prediction is rescaled toward the conditioned prediction's per-sample
    standard deviation to counter over-exposure at high scales."""

    def guided(x: T, t: float, s: float, a: float) -> T:
        u = unconditioned(x, t, s, a)
        c = conditioned(x, t, s, a)
        g = u + scale * (c - u)
        c_std = c.std()
        g_std = g.std()
        adjusted = g * (c_std / g_std)
        return rescale * adjusted + (1 - rescale) * g

    return guided
