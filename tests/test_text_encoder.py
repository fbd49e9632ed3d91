"""TextEncoder (sixth model family): the prompt -> conditioning bridge.

The reference receives conditioning features from the surrounding diffusers
pipeline's CLIP/T5 encoders; a standalone framework ships its own.  These
tests pin the contract: tokenizer layout, causality (the packing-invariance
mechanism), EOS pooling, MMDiT interoperability, tp spec tree shape, and
trainability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skrample_tpu.models import ByteTokenizer, TextEncoder, TextEncoderConfig

TINY = TextEncoderConfig(dim=64, depth=2, heads=2, max_tokens=32, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def enc():
    model = TextEncoder(TINY)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


class TestTokenizer:
    def test_layout(self) -> None:
        tok = ByteTokenizer()
        ids = tok.encode("hi", 8)
        assert ids.tolist() == [tok.BOS, ord("h"), ord("i"), tok.EOS, tok.PAD, tok.PAD, tok.PAD, tok.PAD]
        assert ids.dtype == np.int32

    def test_truncation_keeps_eos(self) -> None:
        tok = ByteTokenizer()
        ids = tok.encode("abcdefgh", 5)
        assert ids.tolist() == [tok.BOS, ord("a"), ord("b"), ord("c"), tok.EOS]

    def test_utf8_round_trip(self) -> None:
        tok = ByteTokenizer()
        text = "café ☃"
        assert tok.decode(tok.encode(text, 32)) == text

    def test_batch(self) -> None:
        tok = ByteTokenizer()
        out = tok.batch(["a", "bb"], 6)
        assert out.shape == (2, 6)
        assert (out[:, 0] == tok.BOS).all()


class TestEncoder:
    def test_shapes(self, enc) -> None:
        model, params = enc
        ids = jnp.asarray(ByteTokenizer().batch(["a cat", "a dog in the rain"], 32))
        features, pooled = model.encode(params, ids)
        assert features.shape == (2, 32, TINY.dim)
        assert pooled.shape == (2, TINY.dim)
        assert features.dtype == pooled.dtype == jnp.float32
        assert bool(jnp.isfinite(features).all()) and bool(jnp.isfinite(pooled).all())

    def test_causality(self, enc) -> None:
        "Changing token j leaves every feature at positions < j untouched."
        model, params = enc
        tok = ByteTokenizer()
        a = tok.encode("hello world", 16)
        b = a.copy()
        j = 8
        b[j:] = [ord("X")] * (16 - j)
        fa = np.asarray(model.apply(params, jnp.asarray(a)[None]))
        fb = np.asarray(model.apply(params, jnp.asarray(b)[None]))
        np.testing.assert_array_equal(fa[:, :j], fb[:, :j])
        assert not np.array_equal(fa[:, j:], fb[:, j:])

    def test_pooled_invariant_to_padding_length(self, enc) -> None:
        "Same text, different static lengths: identical pooled vector."
        model, params = enc
        tok = ByteTokenizer()
        short = model.encode(params, jnp.asarray(tok.encode("a cat", 8))[None])[1]
        long = model.encode(params, jnp.asarray(tok.encode("a cat", 32))[None])[1]
        # equal up to matmul reduction order: XLA tiles each static length
        # differently, so agreement is last-ulp f32, not bit-exact (the same
        # effect the serving engine documents across bucket sizes)
        np.testing.assert_allclose(np.asarray(short), np.asarray(long), atol=1e-5)

    def test_batch_consistency(self, enc) -> None:
        model, params = enc
        ids = jnp.asarray(ByteTokenizer().batch(["one", "two", "three"], 16))
        full = np.asarray(model.apply(params, ids))
        solo = np.asarray(model.apply(params, ids[1:2]))
        np.testing.assert_allclose(full[1:2], solo, rtol=1e-5, atol=1e-6)

    def test_prompts_differ(self, enc) -> None:
        model, params = enc
        ids = jnp.asarray(ByteTokenizer().batch(["a cat", "a dog"], 16))
        _, pooled = model.encode(params, ids)
        assert not np.allclose(np.asarray(pooled[0]), np.asarray(pooled[1]))

    def test_non_causal_option(self) -> None:
        model = TextEncoder(TextEncoderConfig(**{**TINY.__dict__, "causal": False}))
        params = model.init(jax.random.PRNGKey(0))
        ids = jnp.asarray(ByteTokenizer().encode("hello", 16))[None]
        changed = ids.at[0, 10].set(ord("Z"))
        fa = np.asarray(model.apply(params, ids))
        fb = np.asarray(model.apply(params, changed))
        # bidirectional: a later token DOES change earlier features
        assert not np.array_equal(fa[:, :10], fb[:, :10])

    def test_param_spec_tree_matches(self, enc) -> None:
        model, params = enc
        spec = model.param_spec()
        jax.tree.map(lambda w, s: None, params, spec)  # same structure or raises

    def test_length_guard(self, enc) -> None:
        model, params = enc
        with pytest.raises(ValueError, match="max_tokens"):
            model.apply(params, jnp.zeros((1, 64), jnp.int32))


class TestIntegration:
    def test_feeds_mmdit(self, enc) -> None:
        "Sequence features drive MMDiT context; prompts change the output."
        from skrample_tpu.models import MMDiT, MMDiTConfig

        model, params = enc
        mmdit = MMDiT(
            MMDiTConfig(
                dim=64, depth=1, heads=2, context_dim=TINY.dim, context_tokens=128,
                compute_dtype=jnp.float32, attention="full",
            )
        )
        mparams = mmdit.init(jax.random.PRNGKey(1))
        # adaLN-zero init makes a fresh MMDiT output exactly 0 and gates the
        # conditioning path closed; un-zero the final modulation + projection
        # so conditioning differences reach the output
        for name in ("final_out", "final_mod"):
            mparams[name]["w"] = jax.random.normal(jax.random.PRNGKey(9), mparams[name]["w"].shape) * 0.02
        ids = jnp.asarray(ByteTokenizer().batch(["a cat", "a dog"], 32))
        features = model.apply(params, ids)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8), jnp.float32)
        outs = [np.asarray(mmdit.apply(mparams, x, jnp.asarray([0.5]), features[i : i + 1])) for i in (0, 1)]
        assert outs[0].shape == x.shape
        assert not np.array_equal(outs[0], outs[1])

    def test_quantized_cosine(self, enc) -> None:
        model, params = enc
        qparams = model.quantize_params(params)
        ids = jnp.asarray(ByteTokenizer().encode("the quick brown fox", 32))[None]
        f32, _ = model.encode(params, ids)
        q, _ = model.encode(qparams, ids)
        a, b = np.asarray(f32).ravel(), np.asarray(q).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.99

    def test_trains(self) -> None:
        "A few steps of a contrastive-style objective reduce the loss."
        model = TextEncoder(TINY)
        params = model.init(jax.random.PRNGKey(0))
        ids = jnp.asarray(ByteTokenizer().batch(["a photo of a cat", "a painting of a dog"], 32))
        target = jax.random.normal(jax.random.PRNGKey(3), (2, TINY.dim), jnp.float32)

        def loss_fn(p):
            _, pooled = model.encode(p, ids)
            return jnp.mean((pooled - target) ** 2)

        @jax.jit
        def step(p):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            return jax.tree.map(lambda w, g: w - 1e-2 * g, p, grads), loss

        losses = []
        for _ in range(8):
            params, loss = step(params)
            losses.append(float(loss))
            assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0]
