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
            assert set(engine._executables) <= {1, 4}

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
