"""Train the flagship DiT with flow matching — the full TPU training story.

One jitted train step: conditional-flow-matching loss (linear interpolant,
velocity target — the objective `FlowModel()` sampling expects), grads,
adamw, all under `jax.lax.scan` so an epoch is one dispatch.  Flags show the
production knobs:

  --remat        per-block jax.checkpoint (-46% activation memory at
                 DiT-1024/16 for +20% step time; see BASELINE.md)
  --dp/--tp      shard over a (dp, tp) mesh: data-parallel batch,
                 megatron col/row tensor-parallel params (DiT.param_spec);
                 XLA inserts the all-reduces from the shardings alone
  --fsdp         ZeRO-3 layout on top of dp x tp: params, Adam moments, and
                 the EMA shadow shard over dp (parallel/fsdp.py) — weights
                 all-gather on use, grads reduce-scatter, updates stay
                 local; removes the one-chip cap on trainable size
  --checkpoint   save/restore the param tree (models/checkpoint.py)
  --orbax DIR    production checkpointing instead: async orbax saves of the
                 FULL train state (params + opt state + EMA + step) with
                 retention and latest-step resume (models.TrainCheckpointer)
  --ema-decay    EMA shadow tree updated inside the scanned step (what you
                 serve from; models/ema.py, warmup-aware decay)

Synthetic data (a fixed random image set) keeps the example hermetic; swap
`make_batch` for a real loader.  Runs on CPU in seconds at the default toy
size; scale dims up on a chip.

  --host-loader  the real-dataset pattern: the image set stays HOST-side and
                 `skrample_tpu.data` feeds the chip — EpochLoader draws
                 deterministic shuffled batches (resumable: batch n of epoch
                 e is a pure function of the seed) and prefetch_to_device
                 keeps 2 batches in flight so the H2D copy overlaps compute.
                 One jitted step per batch instead of the scanned epoch
                 (scanning requires the data resident on device).

Run: python examples/train_flow_matching.py [--steps 200] [--remat]
     [--dp 2 --tp 2] [--checkpoint /tmp/dit.npz | --orbax /tmp/dit_ckpt]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS even under a site hook that pins the backend (the dev
# host pins axon; env alone does not override once jax picks a platform) —
# this is what makes `JAX_PLATFORMS=cpu python examples/...` hermetic,
# which tests/test_resume.py's subprocesses rely on
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
import optax

from skrample_tpu.models import (
    DiT,
    DiTConfig,
    TrainCheckpointer,
    ema_init,
    ema_update,
    load_params,
    save_params,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--heads", type=int, default=2, help="set so dim/heads is a multiple of 128 to hit the fused TPU kernels (on CPU those run in slow interpret mode, so the toy default stays at head_dim 64)")
    ap.add_argument("--size", type=int, default=16, help="latent H=W")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--fsdp", action="store_true", help="shard params/moments/EMA over dp (ZeRO-3 layout; needs --dp > 1)")
    ap.add_argument("--checkpoint", type=str, default="")
    ap.add_argument("--orbax", type=str, default="", help="orbax checkpoint dir (async, full train state)")
    ap.add_argument("--resume", action="store_true", help="restore from the latest step in --orbax (explicit: an existing checkpoint without --resume is an error, so a stale dir can't silently hijack a fresh run)")
    ap.add_argument("--until", type=int, default=0, help="train until GLOBAL step N (overrides --steps; with --resume the run does N - restored_step steps — the preemption/resume recipe)")
    ap.add_argument("--save-every", type=int, default=0, help="orbax-save the full train state every N steps (host-loader mode; async, overlaps compute) — with --resume this is the preemption story")
    ap.add_argument("--abort-after-step", type=int, default=-1, help="fault injection: SIGKILL this process right after completing global step K (tests/test_resume.py kills a run mid-epoch with this and bit-compares the resumed result)")
    ap.add_argument("--ema-decay", type=float, default=0.9999)
    ap.add_argument("--opt8", action="store_true", help="int8 block-quantized AdamW moments (~2 vs 8 bytes/param of optimizer state; skrample_tpu.optim.adamw8bit)")
    ap.add_argument("--host-loader", action="store_true", help="feed host-resident data via skrample_tpu.data (EpochLoader + prefetch_to_device) instead of the scanned device-resident epoch")
    ap.add_argument("--lora", type=int, default=0, help="train rank-N LoRA adapters over the frozen base instead of full params (models.lora_init/lora_merge: grads + moments shrink to the adapter tree; the base rides through jit as a frozen argument)")
    args = ap.parse_args()

    config = DiTConfig(
        dim=args.dim,
        depth=args.depth,
        heads=args.heads,
        compute_dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32,
        attention="flash",
        remat=args.remat,
    )
    model = DiT(config)
    params = model.init(jax.random.PRNGKey(0))
    if args.checkpoint and os.path.exists(args.checkpoint):
        params = load_params(args.checkpoint)
        print(f"resumed from {args.checkpoint}")

    base_params: dict = {}
    if args.lora:
        from skrample_tpu.models import lora_init, lora_merge

        base_params = params
        params = lora_init(jax.random.PRNGKey(2), base_params, rank=args.lora)
        n_base = sum(int(v.size) for v in jax.tree.leaves(base_params))
        n_ad = sum(int(v.size) for v in jax.tree.leaves(params))
        print(f"LoRA rank {args.lora}: training {n_ad} of {n_base} params ({n_ad / n_base:.2%})")

    mesh = None
    param_specs = None
    if args.fsdp and args.dp < 2:
        raise SystemExit("--fsdp shards over the dp axis; pass --dp > 1")
    if args.dp * args.tp > 1:
        from jax.sharding import Mesh
        from jax.sharding import PartitionSpec as P

        from skrample_tpu.parallel import fsdp_param_specs, shard_tree

        mesh = Mesh(np.asarray(jax.devices()[: args.dp * args.tp]).reshape(args.dp, args.tp), ("dp", "tp"))
        if args.lora:
            # the frozen base keeps the megatron tp layout; adapters are tiny
            # (replicated unless --fsdp shards the larger ones over dp)
            base_params = shard_tree(base_params, mesh, model.param_spec())
            param_specs = jax.tree.map(lambda _: P(), params)
        else:
            param_specs = model.param_spec()
        if args.fsdp:
            param_specs = fsdp_param_specs(params, args.dp, base_specs=param_specs, min_size=1024)
        params = shard_tree(params, mesh, param_specs)

    if args.opt8:
        from skrample_tpu.optim import adamw8bit

        opt = adamw8bit(1e-4)
    else:
        opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    ema = ema_init(params)
    if args.fsdp and mesh is not None:
        from skrample_tpu.parallel import opt_state_specs, shard_tree

        # moments + EMA colocate with their param shard: updates stay local
        opt_state = shard_tree(opt_state, mesh, opt_state_specs(opt_state, params, param_specs, args.dp))
        ema = shard_tree(ema, mesh, param_specs)
    start_step = 0

    ckpt = TrainCheckpointer(args.orbax) if args.orbax else None
    if ckpt is not None and ckpt.latest_step() is not None:
        if not args.resume:
            raise SystemExit(
                f"{args.orbax} already holds step {ckpt.latest_step()}: pass --resume to continue it"
            )
        # `like=` restores each leaf with the live tree's dtype/sharding —
        # on the fsdp/tp meshes every leaf lands directly as its shard
        state = ckpt.restore(like={"params": params, "opt_state": opt_state, "ema": ema, "step": 0})
        params, opt_state, ema = state["params"], state["opt_state"], state["ema"]
        start_step = int(state["step"])
        print(f"resumed from {args.orbax} at step {start_step}")
    elif args.resume:
        print(f"--resume: nothing committed in {args.orbax or '(no --orbax)'}, starting fresh")
    if args.until:
        if args.until < start_step:
            raise SystemExit(f"--until {args.until} is before the restored step {start_step}")
        args.steps = args.until - start_step
    if args.save_every or args.abort_after_step >= 0:
        if not args.host_loader or ckpt is None:
            raise SystemExit("--save-every/--abort-after-step need --host-loader and --orbax (per-step boundaries)")

    # hermetic "dataset": 64 fixed random images
    data = jax.random.normal(jax.random.PRNGKey(42), (64, 4, args.size, args.size), jnp.float32)

    def make_batch(key):
        idx = jax.random.randint(key, (args.batch,), 0, data.shape[0])
        return data[idx]

    def loss_fn(p, base, x0, noise, sigma):
        tree = lora_merge(base, p) if args.lora else p
        s = sigma[:, None, None, None]
        xt = (1 - s) * x0 + s * noise  # linear interpolant: x_t
        pred = model.apply(tree, xt, sigma * 1000.0)
        return jnp.mean((pred - (noise - x0)) ** 2)  # velocity target

    def train_step(carry, inputs, base, x0=None):
        p, o, e = carry
        key, n = inputs
        kb, kn, kt = jax.random.split(key, 3)
        if x0 is None:  # scanned mode draws from the device-resident set
            x0 = make_batch(kb)
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            x0 = jax.lax.with_sharding_constraint(x0, NamedSharding(mesh, P("dp")))
        noise = jax.random.normal(kn, x0.shape, jnp.float32)
        sigma = jax.random.uniform(kt, (args.batch,), minval=1e-3, maxval=1.0)
        loss, grads = jax.value_and_grad(loss_fn)(p, base, x0, noise, sigma)
        if args.fsdp and mesh is not None:
            from skrample_tpu.parallel import constrain

            grads = constrain(grads, mesh, param_specs)  # dp all-reduce -> reduce-scatter
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        e = ema_update(e, p, decay=args.ema_decay, step=n)
        return (p, o, e), loss

    # NOTE: the (frozen) base threads through jit as an ARGUMENT — closing
    # over a multi-GB tree lowers it as captured constants (see BASELINE.md)
    @jax.jit
    def epoch(base, p, o, e, key, step0):
        keys = jax.random.split(key, args.steps)
        body = lambda carry, inp: train_step(carry, inp, base)  # noqa: E731
        return jax.lax.scan(body, (p, o, e), (keys, step0 + jnp.arange(args.steps)))

    @jax.jit
    def host_step(base, p, o, e, x0, key, n):
        (p, o, e), loss = train_step((p, o, e), (key, n), base, x0=x0)
        return p, o, e, loss

    t0 = time.perf_counter()
    ctx = mesh if mesh is not None else _null()
    with ctx:
        if args.host_loader:
            import itertools

            from skrample_tpu.data import EpochLoader, prefetch_to_device

            host_data = np.asarray(data)  # the dataset lives on the host
            loader = EpochLoader({"x0": host_data}, args.batch, jax.random.PRNGKey(7))
            if mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                place = lambda b: jax.device_put(b, {"x0": NamedSharding(mesh, P("dp"))})  # noqa: E731
            else:
                place = None
            losses = []
            # iter_from(start_step): the O(1) resume cursor — batch n of a
            # resumed run is bit-identical to batch n of an uninterrupted one
            batches = itertools.islice(prefetch_to_device(loader.iter_from(start_step), place=place), args.steps)
            end = start_step + args.steps
            for n, batch in enumerate(batches, start=start_step):
                key = jax.random.fold_in(jax.random.PRNGKey(1), n)
                params, opt_state, ema, loss = host_step(base_params, params, opt_state, ema, batch["x0"], key, n)
                losses.append(loss)
                done = n + 1  # global steps completed
                if args.save_every and done % args.save_every == 0 and done != end:
                    ckpt.save(done, {"params": params, "opt_state": opt_state, "ema": ema, "step": done})
                if args.abort_after_step == n:
                    # fault injection: die like a preemption.  Join the last
                    # boundary save (so a committed step exists to resume
                    # from), dispatch one more async save, and SIGKILL with
                    # it likely mid-write — orbax commits atomically, so the
                    # torn write is discarded on restart ("Removing existing
                    # directory since it is not finalized") and resume sees
                    # the last COMPLETE step
                    import signal

                    ckpt.wait()
                    if not args.save_every or done % args.save_every:
                        ckpt.save(done, {"params": params, "opt_state": opt_state, "ema": ema, "step": done})
                    print(f"aborting after step {n} (fault injection)", flush=True)
                    os.kill(os.getpid(), signal.SIGKILL)
            losses = np.asarray(jax.device_get(losses))
        else:
            (params, opt_state, ema), losses = epoch(
                base_params, params, opt_state, ema, jax.random.fold_in(jax.random.PRNGKey(1), start_step), start_step
            )
            losses = np.asarray(losses)
    dt = time.perf_counter() - t0
    if args.steps:  # a resume that is already at --until does 0 steps
        print(f"{args.steps} steps in {dt:.2f}s ({dt / args.steps * 1e3:.2f} ms/step incl. compile)")
        print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")
        assert np.isfinite(losses).all()

    if args.checkpoint:
        save_params(args.checkpoint, params)
        print(f"saved {args.checkpoint}")
    if ckpt is not None:
        end = start_step + args.steps
        if args.steps or ckpt.latest_step() != end:
            ckpt.save(end, {"params": params, "opt_state": opt_state, "ema": ema, "step": end})
        ckpt.close()  # joins the async save
        print(f"saved orbax step {end} -> {args.orbax} (params + opt state + EMA)")


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
