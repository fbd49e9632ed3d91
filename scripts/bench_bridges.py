#!/usr/bin/env python
"""Characterize the bridge model families: the VAE (pixel <-> latent) and
the TextEncoder (prompt -> conditioning).

Both sit on the serving path now — the VAE decode runs behind every
pixel-space request (``ServingEngine(postprocess=...)``) and the encoder
runs once per prompt — so their cost relative to the denoise loop is what
decides whether the hooks are free in practice.

Slope-times the jitted forwards (the repo's standard tunnel discipline:
forced host transfers, best-of over interleaved scan lengths) and reports
effective TFLOP/s + MFU against the v5e bf16 peak.  VAE FLOPs are counted
by tracing the actual forward with counting wrappers (as in
``bench_unet.py``); encoder FLOPs come from the analytic formula (pure
dense stack, no convs).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from skrample_tpu.utils import enable_compilation_cache

enable_compilation_cache("/tmp/skrample_tpu_xla_cache")

from skrample_tpu.models import (
    VAE,
    ByteTokenizer,
    TextEncoder,
    TextEncoderConfig,
    VAEConfig,
)
from skrample_tpu.models import vae as vae_mod
from skrample_tpu.models.text_encoder import text_encoder_forward_flops

LENGTHS = (2, 12)
PEAK_BF16 = 197e12


def count_vae_flops(fn, *args) -> float:
    "Matmul-equivalent FLOPs of one call, by tracing with counting wrappers."
    total = 0.0
    orig_conv, orig_dense, orig_attn = vae_mod._conv, vae_mod._dense, VAE._attention

    def conv(p, xx, dtype, stride=1, cl=False):
        nonlocal total
        out = orig_conv(p, xx, dtype, stride, cl)
        co, ci, k, _ = p["w"].shape
        spatial = out.size // (out.shape[0] * co)
        total += 2.0 * k * k * ci * co * spatial * xx.shape[0]
        return out

    def dense(p, xx, dtype):
        nonlocal total
        total += 2.0 * p["w"].shape[0] * p["w"].shape[1] * (xx.size // xx.shape[-1])
        return orig_dense(p, xx, dtype)

    def attention(self, p, xx, dtype, cl):
        nonlocal total
        B = xx.shape[0]
        C = p["qkv"]["w"].shape[0]
        tokens = xx.size // (B * C)
        total += 4.0 * B * tokens**2 * C
        return orig_attn(self, p, xx, dtype, cl)

    vae_mod._conv, vae_mod._dense, VAE._attention = conv, dense, attention
    try:
        jax.eval_shape(fn, *args)
    finally:
        vae_mod._conv, vae_mod._dense, VAE._attention = orig_conv, orig_dense, orig_attn
    return total


def slope(step_fn, carry, params=None) -> float:
    """us-per-call via best-of-4 interleaved scan-length slope, forced transfers.

    ``params``: threaded through jit as an ARGUMENT when given — a closure
    capture lowers a ~340 MB param tree as constants, which the remote
    compile service rejects with HTTP 413 (the round-3 Flux lesson; the
    service's limit now bites these bridge models too).  ``step_fn`` then
    takes ``(params, carry, _)``."""
    runners = {}
    for n in LENGTHS:
        if params is None:
            fn = jax.jit(lambda c, n=n: jax.lax.scan(step_fn, c, None, length=n)[0])
            args = (carry,)
        else:
            fn = jax.jit(lambda p, c, n=n: jax.lax.scan(lambda cc, x: step_fn(p, cc, x), c, None, length=n)[0])
            args = (params, carry)
        runners[n] = (fn, args)
        jax.tree.map(np.asarray, fn(*args))
    best = {n: float("inf") for n in LENGTHS}
    for _ in range(4):
        for n in LENGTHS:
            fn, args = runners[n]
            t0 = time.perf_counter()
            jax.tree.map(np.asarray, fn(*args))
            best[n] = min(best[n], time.perf_counter() - t0)
    lo, hi = LENGTHS
    return (best[hi] - best[lo]) / (hi - lo)


def report(label: str, sec: float, flops: float) -> None:
    print(
        f"{label:58s} {sec * 1e6:9.1f} us/call  eff {flops / sec / 1e12:6.1f} TF/s"
        f"  mfu {flops / sec / PEAK_BF16:.3f}",
        flush=True,
    )


def bench_vae(batch: int, hw: int) -> None:
    "SD-scale VAE: levels=4 (f=8), base=128 — the AutoencoderKL shape."
    config = VAEConfig(base=128, levels=4, blocks_per_level=2, compute_dtype=jnp.bfloat16)
    model = VAE(config)
    # reference composition for the A/B row AND for FLOP counting (the fused
    # decode routes its convs through ops/fused_conv.py, which the counting
    # wrappers don't see — identical math, so the count transfers)
    import dataclasses

    ref_model = VAE(dataclasses.replace(config, fused_decode=False))
    params = model.init(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    f = config.downsample_factor
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, config.latent_channels, hw // f, hw // f), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (batch, 3, hw, hw), jnp.float32)

    dec_flops = count_vae_flops(ref_model.decode, params, z)
    enc_flops = count_vae_flops(ref_model.posterior, params, x)
    print(
        f"VAE base=128 levels=4 ({n_params / 1e6:.1f}M params, batch {batch}, {hw}x{hw} pixels, "
        f"decode {dec_flops / 1e9:.0f} / encode {enc_flops / 1e9:.0f} GFLOP)",
        flush=True,
    )

    def decode_step(c, _):
        out = model.decode(params, c)
        # tiny-constant feedback defeats DCE without perturbing values
        return c + 1e-38 * out[:, :1, ::f, ::f].astype(c.dtype), None

    def encode_step(c, _):
        mean, _ = model.posterior(params, c)
        up = jnp.repeat(jnp.repeat(mean[:, :3], f, -2), f, -1)
        return c + 1e-38 * up.astype(c.dtype), None

    sec = slope(decode_step, z)
    report(f"  decode ({hw // f}x{hw // f} latent -> {hw}x{hw} pixels)", sec, dec_flops)

    def decode_ref_step(c, _):
        out = ref_model.decode(params, c)
        return c + 1e-38 * out[:, :1, ::f, ::f].astype(c.dtype), None

    sec = slope(decode_ref_step, z)
    report("  decode, unfused reference (A/B)", sec, dec_flops)
    sec = slope(encode_step, x)
    report(f"  encode ({hw}x{hw} pixels -> posterior)", sec, enc_flops)


def bench_text_encoder(batch: int) -> None:
    "CLIP-L-ish: dim 768, depth 12, 128 byte tokens."
    config = TextEncoderConfig(dim=768, depth=12, heads=12, max_tokens=128)
    model = TextEncoder(config)
    params = model.init(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    ids = jnp.asarray(ByteTokenizer().batch(["a photograph of an astronaut riding a horse"] * batch, 128))
    flops = text_encoder_forward_flops(config, batch, 128)
    print(
        f"TextEncoder dim=768 depth=12 ({n_params / 1e6:.1f}M params, batch {batch}, 128 tokens, "
        f"{flops / 1e9:.1f} GFLOP/fwd)",
        flush=True,
    )

    def step(p, c, _):
        feats = model.apply(p, c)
        bump = (feats.mean() * 1e-30).astype(jnp.int32)  # 0 at runtime, opaque to XLA
        return jnp.clip(c + bump, 0, config.vocab_size - 1), None

    sec = slope(step, ids, params=params)
    report("  forward (prompt batch -> context features)", sec, flops)


def bench_t5(batch: int) -> None:
    "T5-base-ish encoder: d_model 768, 12 layers, 128 tokens."
    from skrample_tpu.models import T5Encoder, T5EncoderConfig
    from skrample_tpu.models.t5_encoder import t5_encoder_forward_flops

    config = T5EncoderConfig(dim=768, head_dim=64, heads=12, ff_dim=2048, depth=12)
    model = T5Encoder(config)
    params = model.init(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 32000, (batch, 128)), jnp.int32)
    flops = t5_encoder_forward_flops(config, batch, 128)
    print(
        f"T5Encoder dim=768 depth=12 gated ({n_params / 1e6:.1f}M params, batch {batch}, 128 tokens, "
        f"{flops / 1e9:.1f} GFLOP/fwd)",
        flush=True,
    )

    def step(p, c, _):
        feats = model.apply(p, c)
        bump = (feats.mean() * 1e-30).astype(jnp.int32)
        return jnp.clip(c + bump, 0, config.vocab_size - 1), None

    sec = slope(step, ids, params=params)
    report("  forward (bidirectional context features)", sec, flops)


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    bench_vae(batch=1, hw=512)
    bench_text_encoder(batch=32)
    bench_t5(batch=32)


if __name__ == "__main__":
    main()
