"""Native host runtime: the C fused-FMA kernel behind the torch-side wrapper.

Compiled on first use with the system compiler into a cached shared library
and bound via ctypes; everything degrades gracefully to the pure-torch path
when no compiler is available.  The jax/TPU path never touches this — XLA
fuses the same op on-device."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

_LIB: ctypes.CDLL | None | bool = None  # None = untried, False = unavailable


def _source_path() -> Path:
    return Path(__file__).parent / "fma.c"


def _build_library() -> Path | None:
    source = _source_path()
    tag = hashlib.sha256(source.read_bytes()).hexdigest()[:16]
    cache_dir = Path(os.environ.get("SKRAMPLE_TPU_CACHE", Path(tempfile.gettempdir()) / "skrample_tpu_native"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    lib_path = cache_dir / f"fma_{tag}_{sys.platform}.so"
    if lib_path.exists():
        return lib_path

    for compiler in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [compiler, "-O3", "-shared", "-fPIC", "-o", str(lib_path), str(source)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return lib_path
        except (FileNotFoundError, subprocess.CalledProcessError, subprocess.TimeoutExpired):
            continue
    return None


def _load() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is None:
        path = _build_library()
        if path is None:
            _LIB = False
        else:
            lib = ctypes.CDLL(str(path))
            # raw-int pointer ABI: avoids ctypes.cast overhead per call
            for name in ("fused_fma_f32", "fused_fma_f64"):
                getattr(lib, name).restype = None
                getattr(lib, name).argtypes = [
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.c_void_p,
                    ctypes.c_int64,
                    ctypes.c_void_p,
                    ctypes.c_int64,
                ]
            for name in ("fused_fma3_f32", "fused_fma3_f64"):
                getattr(lib, name).restype = None
                getattr(lib, name).argtypes = [
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.c_void_p,
                    ctypes.c_int64,
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                    ctypes.c_int64,
                ]
            _LIB = lib
    return _LIB or None


def available() -> bool:
    return _load() is not None


def fused_fma(sources: list[np.ndarray], coeffs: np.ndarray, out: np.ndarray) -> bool:
    """``out = sum_k coeffs[k] * sources[k]`` in one pass.

    All arrays contiguous float32 or float64 of equal length; returns False
    (caller must fall back) when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return False

    dtype = out.dtype
    fn = lib.fused_fma_f32 if dtype == np.float32 else lib.fused_fma_f64
    ptrs = (ctypes.c_void_p * len(sources))(*(s.ctypes.data for s in sources))
    coeffs64 = np.ascontiguousarray(coeffs, dtype=np.float64)
    fn(ptrs, coeffs64.ctypes.data, len(sources), out.ctypes.data, out.size)
    return True


def fused_fma3(
    sources: list[np.ndarray],
    coeffs: np.ndarray,
    out0: np.ndarray,
    out1: np.ndarray,
    out2: np.ndarray,
) -> bool:
    "Three weight rows over the same sources in one call (final + store rows)."
    lib = _load()
    if lib is None:
        return False

    dtype = out0.dtype
    fn = lib.fused_fma3_f32 if dtype == np.float32 else lib.fused_fma3_f64
    ptrs = (ctypes.c_void_p * len(sources))(*(s.ctypes.data for s in sources))
    coeffs64 = np.ascontiguousarray(coeffs, dtype=np.float64)
    fn(ptrs, coeffs64.ctypes.data, len(sources), out0.ctypes.data, out1.ctypes.data, out2.ctypes.data, out0.size)
    return True
