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
