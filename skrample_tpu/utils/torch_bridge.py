"""torch <-> jax array bridging for the diffusers wrapper boundary.

Zero-copy via DLPack where the layouts allow it, falling back to a numpy
round-trip (which is itself zero-copy for contiguous CPU float32/float64)."""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

import numpy as np

if TYPE_CHECKING:
    import jax
    import torch


def from_torch(tensor: "torch.Tensor") -> "jax.Array":
    "torch.Tensor -> jax.Array on the default device."
    import jax
    import jax.numpy as jnp

    t = tensor.detach()
    if t.device.type == "cpu" and t.dtype.is_floating_point:
        try:
            return jnp.from_dlpack(t.contiguous())
        except Exception:  # noqa: BLE001 — dtype/layout not dlpack-compatible
            pass
    return jax.numpy.asarray(np.asarray(t.cpu().float()))


def to_torch(array: "jax.Array | np.ndarray", dtype: Any = None, device: Any = None) -> "torch.Tensor":
    "jax.Array -> torch.Tensor (host)."
    import torch

    out = torch.from_numpy(np.array(array))
    if dtype is not None or device is not None:
        out = out.to(dtype=dtype, device=device)
    return out
