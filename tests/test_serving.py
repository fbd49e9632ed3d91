"""Dynamic-batching serving runtime (skrample_tpu/serving.py).

The load-bearing claim is batch-composition invariance: a request's latent
is bit-identical whether it ran alone, padded, or packed with others —
initial latent AND stochastic step noise come from the request's own key."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skrample_tpu.sampling import structured
from skrample_tpu.serving import ServingEngine


def toy_model(x, t, sigma, alpha):
    "Pointwise, parameter-free stand-in: batch-equivariant like a real net."
    return x * 0.9 - jnp.tanh(x) * sigma


def make_engine(**kw):
    base = dict(model_fn=toy_model, item_shape=(4, 8, 8), steps=6)
    base.update(kw)
    return ServingEngine(**base)


def singles(keys, **kw):
    "Reference: every request alone in a bucket-1 engine."
    with make_engine(buckets=(1,), **kw) as engine:
        return [np.asarray(engine.generate(k)) for k in keys]


class TestInvariance:
    def test_batched_equals_single_deterministic(self):
        keys = list(range(5))
        ref = singles(keys)
        with make_engine(buckets=(4,), max_delay_ms=50.0) as engine:
            futs = [engine.submit(k) for k in keys]  # lands as 4 + 1(padded)
            got = [np.asarray(f.result()) for f in futs]
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

    def test_batched_equals_single_stochastic(self):
        "Per-request noise buffers: invariance holds for SDE sampling too."
        sampler = structured.DPM(order=1, stochasticity=1.0)
        keys = [10, 11, 12]
        ref = singles(keys, sampler=sampler)
        with make_engine(sampler=sampler, buckets=(4,), max_delay_ms=50.0) as engine:
            futs = [engine.submit(k) for k in keys]
            got = [np.asarray(f.result()) for f in futs]
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

    def test_arrival_pattern_is_irrelevant(self):
        "Same seed -> same latent across different packings of the queue."
        with make_engine(buckets=(1, 2, 4), max_delay_ms=20.0) as engine:
            a = np.asarray(engine.generate(7))  # alone
            futs = [engine.submit(k) for k in (6, 7, 8, 9)]  # packed
            b = np.asarray(futs[1].result())
            [f.result() for f in futs]
        np.testing.assert_array_equal(a, b)


class TestMechanics:
    def test_bucketing_and_padding_stats(self):
        with make_engine(buckets=(2, 4), max_delay_ms=50.0) as engine:
            futs = [engine.submit(k) for k in range(3)]  # 3 -> bucket 4, 1 padded
            for f in futs:
                f.result()
            stats = engine.stats
        assert stats.requests == 3
        assert stats.batches == 1
        assert stats.bucket_counts == {4: 1}
        assert stats.padded_items == 1
        assert stats.padding_fraction == pytest.approx(0.25)

    def test_overload_splits_into_batches(self):
        with make_engine(buckets=(1, 2), max_delay_ms=20.0) as engine:
            futs = [engine.submit(k) for k in range(5)]
            outs = [np.asarray(f.result()) for f in futs]
            assert engine.stats.batches >= 3  # 5 requests, bucket max 2
        assert all(o.shape == (4, 8, 8) for o in outs)
        assert all(np.isfinite(o).all() for o in outs)

    def test_compile_count_is_bounded_by_buckets(self):
        with make_engine(buckets=(1, 4), max_delay_ms=5.0) as engine:
            for wave in range(3):
                futs = [engine.submit(10 * wave + i) for i in range(wave + 1)]
                for f in futs:
                    f.result()
            assert {b for _, b, _ in engine._executables} <= {1, 4}
            assert {s for s, _, _ in engine._executables} == {0}

    def test_img2img_matches_pipeline_recipe(self):
        "Engine img2img == GenerationPipeline.generate with the same key/initial."
        from skrample_tpu import scheduling
        from skrample_tpu.pipeline import GenerationPipeline
        from skrample_tpu.sampling import models, structured

        initial = jax.random.normal(jax.random.PRNGKey(50), (4, 8, 8), jnp.float32)
        key = jax.random.PRNGKey(51)
        with make_engine(buckets=(1,)) as engine:
            got = np.asarray(engine.generate(key, initial=initial, strength=0.6))
            got_txt = np.asarray(engine.generate(key))

        # an UNBATCHED pipeline (latent_shape == item_shape) draws the same
        # key-split/normal sequence as the engine's per-item seeding, and the
        # toy model is pointwise, so the latents must agree exactly
        pipe = GenerationPipeline(
            model_fn=toy_model,
            sampler=structured.DPM(order=2),
            schedule=scheduling.FlowShift(scheduling.Linear()),
            model_transform=models.FlowModel(),
            steps=6,
            latent_shape=(4, 8, 8),
            donate=False,
        )
        # (tight tolerance, not bit-equal: the engine seeds inside one jitted
        # vmap while the pipeline noises the entry latent eagerly — the same
        # math fuses/rounds differently)
        ref = np.asarray(pipe.generate(key, initial=initial, strength=0.6))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-7)
        np.testing.assert_allclose(got_txt, np.asarray(pipe.generate(key)), rtol=2e-5, atol=2e-7)

    def test_img2img_packing_invariance_and_strength(self):
        initials = jax.random.normal(jax.random.PRNGKey(60), (4, 4, 8, 8), jnp.float32)
        with make_engine(buckets=(1,)) as engine:
            solo = [
                np.asarray(engine.generate(100 + i, initial=initials[i], strength=0.5))
                for i in range(4)
            ]
        with make_engine(buckets=(4,), max_delay_ms=50.0) as engine:
            futs = [engine.submit(100 + i, initial=initials[i], strength=0.5) for i in range(4)]
            packed = [np.asarray(f.result()) for f in futs]
        for a, b in zip(solo, packed):
            np.testing.assert_array_equal(a, b)

        # lower strength -> output stays closer to the initial
        with make_engine(buckets=(1,)) as engine:
            near = np.asarray(engine.generate(7, initial=initials[0], strength=0.2))
            far = np.asarray(engine.generate(7, initial=initials[0], strength=0.95))
        x = np.asarray(initials[0])
        rel = lambda y: np.linalg.norm(y - x) / np.linalg.norm(x)  # noqa: E731
        assert rel(near) < rel(far)

    def test_mixed_txt2img_and_img2img_batch(self):
        "One sweep with both modes: groups dispatch separately, results match solo."
        initial = jax.random.normal(jax.random.PRNGKey(70), (4, 8, 8), jnp.float32)
        with make_engine(buckets=(1,)) as engine:
            solo_txt = np.asarray(engine.generate(5))
            solo_img = np.asarray(engine.generate(6, initial=initial, strength=0.5))
        with make_engine(buckets=(1, 2, 4), max_delay_ms=50.0) as engine:
            f_txt = engine.submit(5)
            f_img = engine.submit(6, initial=initial, strength=0.5)
            got_txt, got_img = np.asarray(f_txt.result()), np.asarray(f_img.result())
            assert engine.stats.batches == 2  # split by (start, mode)
        np.testing.assert_array_equal(solo_txt, got_txt)
        np.testing.assert_array_equal(solo_img, got_img)

    def test_cancelled_request_skips_dispatch_and_spares_batchmates(self):
        "A cancelled future must never poison the batch it was packed with."
        with make_engine(buckets=(4,), max_delay_ms=100.0) as engine:
            a = engine.submit(1)
            b = engine.submit(2)
            cancelled = b.cancel()  # within the collect window: still queued
            c = engine.submit(3)
            got_a, got_c = np.asarray(a.result()), np.asarray(c.result())
        if cancelled:
            with pytest.raises(Exception):
                b.result(timeout=5)
        ref = singles([1, 3])
        np.testing.assert_array_equal(ref[0], got_a)
        np.testing.assert_array_equal(ref[1], got_c)

    def test_submit_after_close_raises(self):
        engine = make_engine()
        engine.close()
        with pytest.raises(RuntimeError):
            engine.submit(0)

    def test_int_and_key_seeds_agree(self):
        with make_engine() as engine:
            a = np.asarray(engine.generate(42))
            b = np.asarray(engine.generate(jax.random.PRNGKey(42)))
        np.testing.assert_array_equal(a, b)


class TestPostprocess:
    def test_postprocess_applied_to_each_request(self):
        "Pixel-space serving: the hook output equals decode(latent) exactly."
        keys = [1, 2, 3]
        latents = singles(keys)
        post = lambda z: jnp.tanh(z) * 2.0  # stand-in for a VAE decode
        with make_engine(buckets=(4,), max_delay_ms=50.0, postprocess=post) as engine:
            futs = [engine.submit(k) for k in keys]
            got = [np.asarray(f.result()) for f in futs]
        for lat, g in zip(latents, got):
            np.testing.assert_array_equal(np.asarray(jnp.tanh(lat) * 2.0), g)

    def test_postprocess_may_change_shape(self):
        "e.g. a VAE decode upsamples: request futures carry the new item shape."
        post = lambda z: jnp.repeat(jnp.repeat(z, 2, axis=-2), 2, axis=-1)
        with make_engine(postprocess=post) as engine:
            out = engine.generate(0)
        assert out.shape == (4, 16, 16)


def conditioned_model(x, t, sigma, alpha, context=None):
    "5-arg stand-in: per-request context shifts the prediction."
    bias = 0.0 if context is None else context.mean(axis=(1, 2))[:, None, None, None]
    return x * 0.9 - jnp.tanh(x) * sigma + bias


def tuple_conditioned_model(x, t, sigma, alpha, cond=None):
    "Pytree context: (sequence features, pooled vector), the stacks' shape."
    if cond is None:
        return x * 0.9 - jnp.tanh(x) * sigma
    seq, pooled = cond
    bias = seq.mean(axis=(1, 2)) + pooled.mean(axis=1)
    return x * 0.9 - jnp.tanh(x) * sigma + bias[:, None, None, None]


class TestConditioned:
    def test_per_request_context_equals_solo(self):
        "Prompts batched together == each prompt served alone (bit-exact)."
        contexts = [jnp.full((16, 8), float(i)) for i in (1, 2, 3)]
        with ServingEngine(
            conditioned_model, item_shape=(4, 8, 8), steps=6, buckets=(1,), conditioned=True
        ) as engine:
            ref = [np.asarray(engine.generate(k, context=c)) for k, c in enumerate(contexts)]
        with ServingEngine(
            conditioned_model,
            item_shape=(4, 8, 8),
            steps=6,
            buckets=(4,),
            max_delay_ms=50.0,
            conditioned=True,
        ) as engine:
            futs = [engine.submit(k, context=c) for k, c in enumerate(contexts)]
            got = [np.asarray(f.result()) for f in futs]
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

    def test_contexts_change_outputs(self):
        with ServingEngine(
            conditioned_model, item_shape=(4, 8, 8), steps=6, buckets=(2,), conditioned=True
        ) as engine:
            a = np.asarray(engine.generate(0, context=jnp.zeros((16, 8))))
            b = np.asarray(engine.generate(0, context=jnp.ones((16, 8))))
        assert not np.array_equal(a, b)

    def test_mixed_conditioned_and_unconditional(self):
        "context=None requests run the unconditional branch, grouped apart."
        ctx = jnp.full((16, 8), 2.0)
        with ServingEngine(
            conditioned_model, item_shape=(4, 8, 8), steps=6, buckets=(1,), conditioned=True
        ) as engine:
            ref_c = np.asarray(engine.generate(5, context=ctx))
            ref_u = np.asarray(engine.generate(5))
        with ServingEngine(
            conditioned_model,
            item_shape=(4, 8, 8),
            steps=6,
            buckets=(1, 2),
            max_delay_ms=50.0,
            conditioned=True,
        ) as engine:
            f1 = engine.submit(5, context=ctx)
            f2 = engine.submit(5)
            got_c, got_u = np.asarray(f1.result()), np.asarray(f2.result())
        np.testing.assert_array_equal(ref_c, got_c)
        np.testing.assert_array_equal(ref_u, got_u)
        assert not np.array_equal(got_c, got_u)

    def test_one_executable_serves_all_prompts(self):
        "Different context VALUES share the executable (no recompiles)."
        with ServingEngine(
            conditioned_model, item_shape=(4, 8, 8), steps=6, buckets=(1,), conditioned=True
        ) as engine:
            for i in range(4):
                engine.generate(i, context=jnp.full((16, 8), float(i)))
            assert len(engine._executables) == 1

    def test_context_requires_conditioned_engine(self):
        with make_engine() as engine:
            with pytest.raises(ValueError, match="conditioned=True"):
                engine.submit(0, context=jnp.zeros((16, 8)))

    def test_pytree_context_equals_solo(self):
        "(context, pooled) tuples stack per leaf — the imported stacks' shape."
        conds = [(jnp.full((16, 8), float(i)), jnp.full((5,), 10.0 * i)) for i in (1, 2, 3)]
        with ServingEngine(
            tuple_conditioned_model, item_shape=(4, 8, 8), steps=6, buckets=(1,), conditioned=True
        ) as engine:
            ref = [np.asarray(engine.generate(k, context=c)) for k, c in enumerate(conds)]
        with ServingEngine(
            tuple_conditioned_model,
            item_shape=(4, 8, 8),
            steps=6,
            buckets=(4,),
            max_delay_ms=50.0,
            conditioned=True,
        ) as engine:
            futs = [engine.submit(k, context=c) for k, c in enumerate(conds)]
            got = [np.asarray(f.result()) for f in futs]
            assert len(engine._executables) == 1
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)


class TestMesh:
    "mesh=: batches shard over dp; results stay invariant to the sharding."

    def test_sharded_equals_single_device(self):
        from skrample_tpu.parallel import make_mesh

        keys = list(range(5))
        ref = singles(keys)
        mesh = make_mesh(dp=4)
        with make_engine(buckets=(4, 8), max_delay_ms=50.0, mesh=mesh) as engine:
            futs = [engine.submit(k) for k in keys]
            got = [np.asarray(f.result()) for f in futs]
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

    def test_sharded_stochastic_and_conditioned(self):
        from skrample_tpu.parallel import make_mesh

        sampler = structured.DPM(order=1, stochasticity=1.0)
        mesh = make_mesh(dp=2)
        conds = [jnp.full((3, 4), float(i)) for i in (1, 2, 3)]
        with ServingEngine(
            conditioned_model, item_shape=(4, 8, 8), steps=6, buckets=(1,), sampler=sampler, conditioned=True
        ) as solo:
            ref = [np.asarray(solo.generate(k, context=c)) for k, c in enumerate(conds)]
        with ServingEngine(
            conditioned_model,
            item_shape=(4, 8, 8),
            steps=6,
            buckets=(4,),
            max_delay_ms=50.0,
            sampler=sampler,
            conditioned=True,
            mesh=mesh,
        ) as engine:
            futs = [engine.submit(k, context=c) for k, c in enumerate(conds)]
            got = [np.asarray(f.result()) for f in futs]
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)

    def test_indivisible_bucket_rejected(self):
        from skrample_tpu.parallel import make_mesh

        mesh = make_mesh(dp=4)
        with pytest.raises(ValueError, match="divisible"):
            ServingEngine(toy_model, item_shape=(4, 8, 8), steps=4, buckets=(1, 4), mesh=mesh)
