"""Small shared utilities: torch <-> jax bridging, profiling, compile cache."""

from .observability import enable_compilation_cache, trace
from .torch_bridge import from_torch, to_torch

__all__ = ["enable_compilation_cache", "from_torch", "to_torch", "trace"]
