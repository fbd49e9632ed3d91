"""Small shared utilities: torch <-> jax bridging, profiling, compile cache."""

from .guidance import classifier_free, interval_classifier_free, rescaled_classifier_free
from .observability import enable_compilation_cache, trace
from .torch_bridge import from_torch, to_torch

__all__ = [
    "classifier_free",
    "enable_compilation_cache",
    "from_torch",
    "interval_classifier_free",
    "rescaled_classifier_free",
    "to_torch",
    "trace",
]
