"""``python -m skrample_tpu`` — operational entry points.

The reference ships no CLI (it is a library embedded in someone else's
loop); a deployable framework needs a door you can open from a shell:

* ``info``    — backend, device inventory, version (the "is the chip there"
  check; exits non-zero if JAX can't initialize a backend).
* ``serve``   — stand up the HTTP serving front-end (:mod:`.server`) around
  a demo DiT with seeded random parameters.  This is a *harness* for load
  tests and smoke checks; real deployments build a
  :class:`~skrample_tpu.serving.ServingEngine` around their own checkpoint
  stack and hand it to :class:`~skrample_tpu.server.ServingServer`.
* ``generate`` — one-shot demo generation to a ``.npy`` file (the
  end-to-end "does the whole stack run here" probe).
"""

from __future__ import annotations

import argparse
import sys
from typing import Sequence


def _cmd_info(args: argparse.Namespace) -> int:
    import jax

    from . import __version__

    devices = jax.devices()
    print(f"skrample-tpu {__version__}")
    print(f"backend: {jax.default_backend()}")
    print(f"devices: {len(devices)}")
    for d in devices:
        print(f"  [{d.id}] {d.device_kind} ({d.platform})")
    return 0


def _demo_engine(args: argparse.Namespace):
    "A DiT with seeded random params wrapped for the serving engine."
    import jax

    from .models.dit import DiT, DiTConfig
    from .serving import ServingEngine

    side = args.size // 8  # latent side at the usual 8x VAE factor
    heads = max(args.dim // 128, 1)  # the TPU-native head shape (head_dim 128)
    model = DiT(DiTConfig(dim=args.dim, depth=args.depth, heads=heads, patch=2, channels=4, attention="flash"))
    params = model.init(jax.random.PRNGKey(args.param_seed))
    model_fn = lambda x, t, sigma, alpha: model.apply(params, x, t)  # noqa: E731
    return ServingEngine(
        model_fn,
        item_shape=(4, side, side),
        steps=args.steps,
        buckets=tuple(int(b) for b in args.buckets.split(",")),
    )


def _cmd_serve(args: argparse.Namespace) -> int:
    from .server import ServingServer

    engine = _demo_engine(args)
    with engine, ServingServer(engine, host=args.host, port=args.port) as srv:
        print(f"serving on http://{srv.host}:{srv.port}  (POST /v1/generate, GET /healthz, GET /stats)")
        try:
            import threading

            threading.Event().wait()  # serve until interrupted
        except KeyboardInterrupt:
            print("shutting down")
    return 0


def _cmd_generate(args: argparse.Namespace) -> int:
    import numpy as np

    engine = _demo_engine(args)
    with engine:
        latent = np.asarray(engine.generate(args.seed))
    np.save(args.out, latent)
    print(f"wrote {latent.shape} {latent.dtype} -> {args.out}")
    return 0


def _add_demo_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dim", type=int, default=256, help="DiT width (demo model)")
    p.add_argument("--depth", type=int, default=4, help="DiT depth (demo model)")
    p.add_argument("--size", type=int, default=256, help="image size in pixels (latent = size/8)")
    p.add_argument("--steps", type=int, default=25, help="denoise steps")
    p.add_argument("--param-seed", type=int, default=0, help="demo parameter seed")
    p.add_argument("--buckets", default="1,2,4,8", help="batch buckets, comma-separated")


def main(argv: Sequence[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="python -m skrample_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("info", help="backend + device inventory").set_defaults(fn=_cmd_info)

    serve = sub.add_parser("serve", help="HTTP serving front-end around a demo DiT")
    _add_demo_flags(serve)
    serve.add_argument("--host", default="127.0.0.1")
    serve.add_argument("--port", type=int, default=8000)
    serve.set_defaults(fn=_cmd_serve)

    gen = sub.add_parser("generate", help="one-shot demo generation to .npy")
    _add_demo_flags(gen)
    gen.add_argument("--seed", type=int, default=0, help="request seed")
    gen.add_argument("--out", default="latent.npy")
    gen.set_defaults(fn=_cmd_generate)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
