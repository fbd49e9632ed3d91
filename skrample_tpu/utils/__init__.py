"""Small shared utilities: torch <-> jax bridging and timing helpers."""

from .torch_bridge import from_torch, to_torch

__all__ = ["from_torch", "to_torch"]
