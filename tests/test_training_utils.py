"""Training utilities: EMA parameter tracking and orbax-backed checkpoints.

The reference ships no training story (SURVEY.md §2.0 — it is a sampler
library); these are the TPU-native production pieces around it: the EMA
shadow tree diffusion models are served from, and async/sharded
checkpoint-resume for long runs."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skrample_tpu.models import (
    TrainCheckpointer,
    ema_decay_schedule,
    ema_init,
    ema_update,
)


def tree(key=0, scale=1.0):
    k = jax.random.PRNGKey(key)
    return {
        "w": jax.random.normal(k, (4, 8), jnp.float32) * scale,
        "blocks": [
            {"a": jax.random.normal(jax.random.fold_in(k, i), (8,), jnp.float32) * scale}
            for i in range(2)
        ],
        "step": jnp.asarray(3, jnp.int32),
    }


class TestEMA:
    def test_init_is_copy(self):
        p = tree()
        e = ema_init(p)
        np.testing.assert_array_equal(np.asarray(e["w"]), np.asarray(p["w"]))

    def test_update_is_lerp(self):
        p, q = tree(0), tree(1)
        e = ema_update(ema_init(p), q, decay=0.9)
        expect = 0.9 * np.asarray(p["w"]) + 0.1 * np.asarray(q["w"])
        np.testing.assert_allclose(np.asarray(e["w"]), expect, rtol=1e-6)

    def test_decay_schedule_warms_up(self):
        d0 = float(ema_decay_schedule(0, decay=0.9999))
        d_mid = float(ema_decay_schedule(100, decay=0.9999))
        d_inf = float(ema_decay_schedule(10**7, decay=0.9999))
        assert d0 == pytest.approx(0.1)  # (1+0)/(10+0)
        assert d0 < d_mid < 0.9999
        assert d_inf == pytest.approx(0.9999)

    def test_update_with_step_uses_schedule(self):
        p, q = tree(0), tree(1)
        by_step = ema_update(ema_init(p), q, decay=0.9999, step=0)
        manual = ema_update(ema_init(p), q, decay=float(ema_decay_schedule(0, 0.9999)))
        np.testing.assert_allclose(np.asarray(by_step["w"]), np.asarray(manual["w"]), rtol=1e-6)

    def test_jittable_and_converges_to_params(self):
        p = tree(0)
        target = tree(1, scale=2.0)

        @jax.jit
        def run(e):
            def body(e, _):
                return ema_update(e, target, decay=0.5), None

            return jax.lax.scan(body, e, None, length=40)[0]

        e = run(ema_init(p))
        np.testing.assert_allclose(np.asarray(e["w"]), np.asarray(target["w"]), atol=1e-5)


class TestTrainCheckpointer:
    def test_roundtrip_and_retention(self, tmp_path):
        state = tree()
        with TrainCheckpointer(tmp_path / "ckpt", max_to_keep=2) as ckpt:
            for step in (1, 2, 3):
                ckpt.save(step, jax.tree.map(lambda x: x * step, state))
            ckpt.wait()
            assert ckpt.latest_step() == 3
            assert ckpt.all_steps() == [2, 3]  # retention dropped step 1

            restored = ckpt.restore()
            np.testing.assert_allclose(
                np.asarray(restored["w"]), 3 * np.asarray(state["w"]), rtol=1e-6
            )
            restored2 = ckpt.restore(step=2)
            np.testing.assert_allclose(
                np.asarray(restored2["blocks"][1]["a"]),
                2 * np.asarray(state["blocks"][1]["a"]),
                rtol=1e-6,
            )
            assert int(restored["step"]) == 3 * int(state["step"])

    def test_restore_missing_raises(self, tmp_path):
        with TrainCheckpointer(tmp_path / "empty") as ckpt:
            with pytest.raises(FileNotFoundError):
                ckpt.restore()

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
    def test_sharded_restore(self, tmp_path):
        "Restore with a `like` tree lands each leaf in its mesh sharding."
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
        state = {"w": jax.random.normal(jax.random.PRNGKey(0), (8, 16), jnp.float32)}
        with TrainCheckpointer(tmp_path / "sharded") as ckpt:
            ckpt.save(7, state)
            ckpt.wait()

            like = {"w": jax.ShapeDtypeStruct((8, 16), jnp.float32, sharding=NamedSharding(mesh, P("dp")))}
            restored = ckpt.restore(like=like)
        assert restored["w"].sharding.spec == P("dp")
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(state["w"]))

    def test_resume_matches_uninterrupted_training(self, tmp_path):
        "Save mid-run, restore, continue: identical to the straight-through run."
        import optax

        def loss_fn(p, x):
            return jnp.mean((x @ p["w"]) ** 2)

        opt = optax.adamw(1e-2)
        x = jax.random.normal(jax.random.PRNGKey(5), (16, 4), jnp.float32)

        @jax.jit
        def step(p, o, e, n):
            grads = jax.grad(loss_fn)(p, x)
            updates, o = opt.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return p, o, ema_update(e, p, decay=0.99, step=n)

        def run(p, o, e, start, count):
            for n in range(start, start + count):
                p, o, e = step(p, o, e, n)
            return p, o, e

        params = {"w": jax.random.normal(jax.random.PRNGKey(0), (4, 4), jnp.float32)}
        o0 = opt.init(params)
        straight = run(params, o0, ema_init(params), 0, 8)

        p, o, e = run(params, o0, ema_init(params), 0, 4)
        with TrainCheckpointer(tmp_path / "resume") as ckpt:
            ckpt.save(4, {"params": p, "opt_state": o, "ema": e})
            ckpt.wait()
            got = ckpt.restore(like={"params": p, "opt_state": o, "ema": e})
        resumed = run(got["params"], got["opt_state"], got["ema"], 4, 4)

        for a, b in zip(jax.tree.leaves(straight), jax.tree.leaves(resumed)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
