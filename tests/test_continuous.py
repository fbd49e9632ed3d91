"""Iteration-level (continuous) batching engine (skrample_tpu/continuous.py).

The load-bearing claim mirrors the batch engine's, with one honest split:

* WITHIN the pool, a request's latent is bit-identical no matter when it
  was admitted or which strangers shared the slots — same executable,
  per-element math independent across slots.
* VERSUS the batch engine, trajectories agree to XLA fusion rounding
  (last-ulp f32, observed ~4e-7 after 6 steps): the scan body and the
  tick body are different fused programs, so the FMA chain contracts
  differently.  Same compiled f64 tables, same per-request seeding.
"""

from __future__ import annotations

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skrample_tpu.continuous import ContinuousServingEngine
from skrample_tpu.sampling import structured
from skrample_tpu.serving import ServingEngine


def toy_model(x, t, sigma, alpha):
    "Pointwise, parameter-free stand-in: batch-equivariant like a real net."
    return x * 0.9 - jnp.tanh(x) * sigma


def batch_singles(keys, **kw):
    "Reference: every request alone through the batch engine."
    base = dict(model_fn=toy_model, item_shape=(4, 8, 8), steps=6, buckets=(1,))
    base.update(kw)
    with ServingEngine(**base) as engine:
        return [np.asarray(engine.generate(k)) for k in keys]


def make_engine(**kw):
    base = dict(model_fn=toy_model, item_shape=(4, 8, 8), steps=6, slots=4)
    base.update(kw)
    return ContinuousServingEngine(**base)


def assert_fusion_close(a, b):
    "Equal up to XLA fusion rounding (different fused programs, same math)."
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TestExactness:
    def test_pooled_equals_batch_engine(self):
        "Requests sharing the slot pool == solo batch-engine runs."
        keys = list(range(6))  # 6 requests through 4 slots: forced staggering
        ref = batch_singles(keys)
        with make_engine() as engine:
            futs = [engine.submit(k) for k in keys]
            got = [np.asarray(f.result()) for f in futs]
        for r, g in zip(ref, got):
            assert_fusion_close(r, g)

    def test_admission_timing_is_invisible_bit_exact(self):
        "Same key -> bit-identical latent across pool packings and timings."
        keys = [3, 5, 7]
        with make_engine(slots=2) as engine:
            together = [np.asarray(f.result()) for f in [engine.submit(k) for k in keys]]
        with make_engine(slots=2) as engine:
            f0 = engine.submit(keys[0])
            time.sleep(0.05)  # request 0 advances some steps before 1 and 2 land
            rest = [engine.submit(k) for k in keys[1:]]
            staggered = [np.asarray(f.result()) for f in [f0, *rest]]
        for a, b in zip(together, staggered):
            np.testing.assert_array_equal(a, b)

    def test_stochastic_sampler_per_request_noise(self):
        "SDE sampling: the per-request noise buffer rides in slot state."
        sampler = structured.DPM(order=1, stochasticity=1.0)
        keys = [10, 11, 12, 13, 14]
        ref = batch_singles(keys, sampler=sampler)
        with make_engine(sampler=sampler, slots=2) as engine:
            futs = [engine.submit(k) for k in keys]
            got = [np.asarray(f.result()) for f in futs]
        for r, g in zip(ref, got):
            assert_fusion_close(r, g)

    def test_multistep_history_rides_in_slot_state(self):
        "DPM order-2's ring is per-slot; staggered slots don't cross-talk."
        sampler = structured.DPM(order=2)
        keys = [20, 21, 22]
        ref = batch_singles(keys, sampler=sampler)
        with make_engine(sampler=sampler, slots=2) as engine:
            f0 = engine.submit(keys[0])
            time.sleep(0.03)
            rest = [engine.submit(k) for k in keys[1:]]
            got = [np.asarray(f.result()) for f in [f0, *rest]]
        for r, g in zip(ref, got):
            assert_fusion_close(r, g)

    def test_ticks_per_dispatch_exact(self):
        "K-step scans per dispatch change timing, never values (bit-exact: same body)."
        keys = [30, 31, 32]
        with make_engine(slots=4) as engine:
            ref = [np.asarray(f.result()) for f in [engine.submit(k) for k in keys]]
        with make_engine(slots=4, ticks_per_dispatch=3) as engine:
            got = [np.asarray(f.result()) for f in [engine.submit(k) for k in keys]]
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)


class TestConditioned:
    def cond_model(self, x, t, sigma, alpha, ctx):
        return x * 0.9 - jnp.tanh(x) * sigma + ctx[:, None, None, None] * 0.01

    def test_per_request_context_equals_batch_engine(self):
        keys = [1, 2, 3]
        ctxs = [jnp.float32(c) for c in (0.5, -1.0, 2.0)]
        base = dict(model_fn=self.cond_model, item_shape=(4, 8, 8), steps=6, conditioned=True)
        with ServingEngine(buckets=(1,), **base) as engine:
            ref = [np.asarray(engine.generate(k, context=c)) for k, c in zip(keys, ctxs)]
        with ContinuousServingEngine(slots=2, context_like=jnp.float32(0.0), **base) as engine:
            futs = [engine.submit(k, context=c) for k, c in zip(keys, ctxs)]
            got = [np.asarray(f.result()) for f in futs]
        for r, g in zip(ref, got):
            assert_fusion_close(r, g)

    def test_pytree_context(self):
        "Pytree contexts stack per leaf into slot state."

        def model(x, t, s, a, ctx):
            bias, gain = ctx
            return x * gain[:, None, None, None] + bias[:, None, None, None]

        like = (jnp.float32(0.0), jnp.float32(1.0))
        with ContinuousServingEngine(
            model, (4, 8, 8), steps=4, slots=2, conditioned=True, context_like=like
        ) as engine:
            a = np.asarray(engine.generate(0, context=(jnp.float32(0.1), jnp.float32(0.9))))
            b = np.asarray(engine.generate(0, context=(jnp.float32(0.2), jnp.float32(0.9))))
        assert not np.array_equal(a, b)

    def test_conditioned_requires_context(self):
        base = dict(model_fn=self.cond_model, item_shape=(4, 8, 8), steps=4)
        with ContinuousServingEngine(
            conditioned=True, context_like=jnp.float32(0.0), **base
        ) as engine:
            with pytest.raises(ValueError, match="needs context"):
                engine.submit(0)

    def test_context_requires_conditioned(self):
        with make_engine() as engine:
            with pytest.raises(ValueError, match="conditioned"):
                engine.submit(0, context=jnp.float32(1.0))

    def test_bad_context_fails_request_not_engine(self):
        base = dict(model_fn=self.cond_model, item_shape=(4, 8, 8), steps=4, conditioned=True)
        with ContinuousServingEngine(context_like=jnp.float32(0.0), slots=2, **base) as engine:
            bad = engine.submit(0, context=jnp.zeros((3, 3)))  # wrong shape
            with pytest.raises(Exception):
                bad.result(timeout=30)
            # the pool survives and keeps serving
            ok = np.asarray(engine.generate(1, context=jnp.float32(1.0)))
        assert ok.shape == (4, 8, 8)


class TestMesh:
    "mesh=: the slot axis shards over dp; results stay invariant to it."

    def test_sharded_pool_equals_unsharded(self):
        from skrample_tpu.parallel import make_mesh

        sampler = structured.DPM(order=2, stochasticity=1.0)
        keys = [40, 41, 42, 43, 44, 45]
        with make_engine(slots=4, sampler=sampler) as engine:
            ref = [np.asarray(f.result()) for f in [engine.submit(k) for k in keys]]
        mesh = make_mesh(dp=4)
        with make_engine(slots=4, sampler=sampler, mesh=mesh) as engine:
            got = [np.asarray(f.result()) for f in [engine.submit(k) for k in keys]]
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

    def test_indivisible_slots_rejected(self):
        from skrample_tpu.parallel import make_mesh

        with pytest.raises(ValueError, match="divisible"):
            make_engine(slots=3, mesh=make_mesh(dp=4))


class TestMechanics:
    def test_constructor_validation(self):
        with pytest.raises(ValueError, match="context_like"):
            ContinuousServingEngine(toy_model, (4,), conditioned=True)
        with pytest.raises(ValueError, match="ticks_per_dispatch"):
            ContinuousServingEngine(toy_model, (4,), ticks_per_dispatch=0)

    def test_submit_after_close_raises(self):
        engine = make_engine()
        engine.close()
        with pytest.raises(RuntimeError):
            engine.submit(0)

    def test_close_after_worker_fault_still_joins_worker(self):
        """A worker fault sets _closed in its own finally; a later close()
        must STILL join the worker (advisor round-4: the early-return made
        close() race the worker's queue drain)."""

        def bad_model(x, t, sigma, alpha):
            raise RuntimeError("injected fault")

        engine = ContinuousServingEngine(bad_model, (4, 8, 8), steps=4, slots=2)
        fut = engine.submit(0)
        with pytest.raises(Exception):
            fut.result(timeout=60)
        engine.close()
        assert not engine._worker.is_alive()
        with pytest.raises(RuntimeError):
            engine.submit(1)

    def test_stats_track_occupancy(self):
        with make_engine(slots=4) as engine:
            futs = [engine.submit(k) for k in range(2)]
            for f in futs:
                f.result()
            stats = engine.stats
        assert stats.completed == 2
        assert stats.ticks >= 6  # at least `steps` dispatches
        assert 0 < stats.occupancy <= 0.5  # 2 live requests over 4 slots
        assert stats.slot_steps == stats.ticks * 4

    def test_int_and_key_seeds_agree(self):
        with make_engine() as engine:
            a = np.asarray(engine.generate(42))
            b = np.asarray(engine.generate(jax.random.PRNGKey(42)))
        np.testing.assert_array_equal(a, b)

    def test_cancel_queued_request_never_occupies_a_slot(self):
        with make_engine(slots=1, steps=16) as engine:
            a = engine.submit(0)  # occupies the only slot
            b = engine.submit(1)  # queued behind it
            cancelled = b.cancel()
            np.asarray(a.result())
            c = np.asarray(engine.generate(2))
        if cancelled:  # admission may have won the race; both outcomes legal
            with pytest.raises(Exception):
                b.result(timeout=5)
        ref = batch_singles([2], steps=16, buckets=(1,))
        assert_fusion_close(ref[0], c)

    def test_cancel_mid_flight_frees_the_slot(self):
        with make_engine(slots=1, steps=512) as engine:
            a = engine.submit(0)
            time.sleep(0.05)  # a is (very likely) mid-trajectory in the slot
            cancelled = a.cancel()  # never marked running: cancellable until resolved
            b = np.asarray(engine.generate(7))  # must reuse the freed slot
        if cancelled:
            with pytest.raises(Exception):
                a.result(timeout=5)
        else:  # a finished before the cancel landed; still a valid run
            np.asarray(a.result())
        ref = batch_singles([7], steps=512, buckets=(1,))
        assert_fusion_close(ref[0], b)

    def test_more_requests_than_slots_all_complete(self):
        with make_engine(slots=2) as engine:
            futs = [engine.submit(k) for k in range(9)]
            outs = [np.asarray(f.result()) for f in futs]
        assert len(outs) == 9
        assert engine.stats.completed == 9
