"""HTTP serving front-end (skrample_tpu/server.py) + CLI (skrample_tpu/__main__.py).

The server is a thin network boundary over ServingEngine, so the contract
under test is transport-level: requests round-trip arrays faithfully,
concurrent HTTP callers share the engine's dynamic batching, prompt
encodings are cached, and malformed input degrades to 400s without killing
the listener."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from skrample_tpu.serving import ServingEngine
from skrample_tpu.server import ServingServer, decode_array, encode_array


def toy_model(x, t, sigma, alpha):
    return x * 0.9 - jnp.tanh(x) * sigma


def toy_conditioned(x, t, sigma, alpha, context):
    bias = context.mean(axis=(1, 2)) if context is not None else 0.0
    shaped = bias.reshape(-1, 1, 1, 1) if context is not None else 0.0
    return x * 0.9 - jnp.tanh(x) * sigma + shaped


ITEM = (2, 4, 4)


def make_server(**kw):
    engine_kw = dict(model_fn=toy_model, item_shape=ITEM, steps=4, buckets=(1, 2, 4))
    engine_kw.update(kw.pop("engine", {}))
    engine = ServingEngine(**engine_kw)
    return engine, ServingServer(engine, port=0, **kw)


def call(server: ServingServer, path: str, payload: dict | None = None) -> tuple[int, dict]:
    url = f"http://{server.host}:{server.port}{path}"
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


class TestArrayCodec:
    def test_round_trip(self):
        x = np.arange(24, dtype=np.float32).reshape(2, 3, 4) / 7
        y = decode_array(encode_array(x))
        np.testing.assert_array_equal(x, y)
        assert y.dtype == x.dtype

    def test_round_trip_scalarish_and_bf16(self):
        import jax

        x = jnp.ones((3,), jnp.bfloat16) * 1.5
        y = decode_array(encode_array(jax.device_get(x)))
        assert y.shape == (3,) and str(y.dtype) == "bfloat16"

    def test_length_mismatch_rejected(self):
        d = encode_array(np.zeros((4,), np.float32))
        d["shape"] = [5]
        with pytest.raises(ValueError, match="bytes"):
            decode_array(d)

    def test_malformed_base64_rejected(self):
        d = encode_array(np.zeros((4,), np.float32))
        d["data"] = "!!not base64!!"
        with pytest.raises(ValueError, match="malformed"):
            decode_array(d)


class TestRoutes:
    def test_healthz_and_stats(self):
        engine, server = make_server()
        with engine, server:
            code, health = call(server, "/healthz")
            assert code == 200 and health["ok"] and health["steps"] == 4
            assert health["item_shape"] == list(ITEM)
            code, stats = call(server, "/stats")
            assert code == 200 and stats["requests"] == 0

    def test_unknown_route_404(self):
        engine, server = make_server()
        with engine, server:
            assert call(server, "/nope")[0] == 404
            assert call(server, "/nope", {})[0] == 404

    def test_generate_matches_engine_and_is_deterministic(self):
        engine, server = make_server()
        with engine, server:
            code, out = call(server, "/v1/generate", {"seed": 7})
            assert code == 200
            got = decode_array(out["latent"])
            assert got.shape == ITEM
            code2, out2 = call(server, "/v1/generate", {"seed": 7})
            np.testing.assert_array_equal(got, decode_array(out2["latent"]))
        # engine-level reference for the same seed
        with ServingEngine(toy_model, ITEM, steps=4, buckets=(1,)) as ref:
            np.testing.assert_array_equal(got, np.asarray(ref.generate(7)))

    def test_concurrent_clients_share_batching(self):
        engine, server = make_server(engine={"max_delay_ms": 30.0})
        with engine, server:
            results: dict[int, np.ndarray] = {}

            def worker(seed: int) -> None:
                code, out = call(server, "/v1/generate", {"seed": seed})
                assert code == 200
                results[seed] = decode_array(out["latent"])

            threads = [threading.Thread(target=worker, args=(s,)) for s in range(6)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            code, stats = call(server, "/stats")
            assert stats["requests"] == 6
        with ServingEngine(toy_model, ITEM, steps=4, buckets=(1,)) as ref:
            for seed, got in results.items():
                np.testing.assert_array_equal(got, np.asarray(ref.generate(seed)))

    def test_img2img_initial(self):
        engine, server = make_server()
        initial = np.linspace(-1, 1, int(np.prod(ITEM)), dtype=np.float32).reshape(ITEM)
        with engine, server:
            code, out = call(
                server, "/v1/generate", {"seed": 3, "strength": 0.5, "initial": encode_array(initial)}
            )
            assert code == 200
        with ServingEngine(toy_model, ITEM, steps=4, buckets=(1,)) as ref:
            want = np.asarray(ref.generate(3, initial=jnp.asarray(initial), strength=0.5))
        np.testing.assert_array_equal(decode_array(out["latent"]), want)


class TestContinuousEngine:
    "The HTTP boundary is engine-agnostic: the continuous pool drops in."

    def test_server_over_continuous_engine(self):
        from skrample_tpu.continuous import ContinuousServingEngine

        engine = ContinuousServingEngine(toy_model, ITEM, steps=4, slots=2)
        server = ServingServer(engine, port=0)
        with engine, server:
            code, out = call(server, "/v1/generate", {"seed": 7})
            assert code == 200
            got = decode_array(out["latent"])
            code, stats = call(server, "/stats")
            assert code == 200
            assert stats["completed"] >= 1
            assert 0 < stats["occupancy"] <= 1
            # img2img is batch-engine territory: clean 400, server survives
            initial = np.zeros(ITEM, np.float32)
            code, _ = call(
                server, "/v1/generate", {"seed": 1, "strength": 0.5, "initial": encode_array(initial)}
            )
            assert code == 400
            assert call(server, "/healthz")[0] == 200
        with ServingEngine(toy_model, ITEM, steps=4, buckets=(1,)) as ref:
            np.testing.assert_allclose(got, np.asarray(ref.generate(7)), rtol=1e-5, atol=1e-5)


class TestValidation:
    def test_bad_json_400(self):
        engine, server = make_server()
        with engine, server:
            url = f"http://{server.host}:{server.port}/v1/generate"
            req = urllib.request.Request(url, data=b"{not json", headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=30)
            assert exc.value.code == 400

    def test_missing_seed_unknown_field_bad_strength(self):
        engine, server = make_server()
        with engine, server:
            assert call(server, "/v1/generate", {})[0] == 400
            assert call(server, "/v1/generate", {"seed": "x"})[0] == 400
            assert call(server, "/v1/generate", {"seed": True})[0] == 400
            assert call(server, "/v1/generate", {"seed": 1, "bogus": 2})[0] == 400
            assert call(server, "/v1/generate", {"seed": 1, "strength": 0.0})[0] == 400
            code, err = call(server, "/v1/generate", {"seed": 1, "prompt": "hi"})
            assert code == 400 and "unconditional" in err["error"]
            bad = encode_array(np.zeros((1, 1, 1), np.float32))
            assert call(server, "/v1/generate", {"seed": 1, "initial": bad})[0] == 400
            # the listener survived all of that
            assert call(server, "/v1/generate", {"seed": 1})[0] == 200


class TestConditioned:
    def test_prompt_encoding_cached_and_applied(self):
        calls: list[str] = []

        def encode_prompt(prompt: str):
            calls.append(prompt)
            bias = float(len(prompt))
            return np.full((3, 4), bias, np.float32)

        engine = ServingEngine(
            toy_conditioned, ITEM, steps=4, buckets=(1, 2), conditioned=True
        )
        with engine, ServingServer(engine, encode_prompt=encode_prompt, port=0) as server:
            code, a = call(server, "/v1/generate", {"seed": 5, "prompt": "cat"})
            code_b, b = call(server, "/v1/generate", {"seed": 5, "prompt": "a longer prompt"})
            code_c, c = call(server, "/v1/generate", {"seed": 5, "prompt": "cat"})
            assert code == code_b == code_c == 200
            assert calls == ["cat", "a longer prompt"]  # cache hit on the repeat
            la, lb, lc = (decode_array(r["latent"]) for r in (a, b, c))
            np.testing.assert_array_equal(la, lc)
            assert not np.array_equal(la, lb)  # prompt changes the latent
            _, stats = call(server, "/stats")
            assert stats["cached_prompts"] == 2

    def test_raw_context_array(self):
        engine = ServingEngine(toy_conditioned, ITEM, steps=4, buckets=(1,), conditioned=True)
        ctx = np.full((3, 4), 2.0, np.float32)
        with engine, ServingServer(engine, port=0) as server:
            code, out = call(server, "/v1/generate", {"seed": 9, "context": encode_array(ctx)})
            assert code == 200
        with ServingEngine(toy_conditioned, ITEM, steps=4, buckets=(1,), conditioned=True) as ref:
            want = np.asarray(ref.generate(9, context=jnp.asarray(ctx)))
        np.testing.assert_array_equal(decode_array(out["latent"]), want)

    def test_prompt_without_encoder_400(self):
        engine = ServingEngine(toy_conditioned, ITEM, steps=4, buckets=(1,), conditioned=True)
        with engine, ServingServer(engine, port=0) as server:
            code, err = call(server, "/v1/generate", {"seed": 1, "prompt": "x"})
            assert code == 400 and "encoder" in err["error"]


class TestCLI:
    def test_info_runs(self, capsys):
        from skrample_tpu.__main__ import main

        assert main(["info"]) == 0
        out = capsys.readouterr().out
        assert "backend: cpu" in out and "devices:" in out

    def test_generate_writes_npy(self, tmp_path):
        from skrample_tpu.__main__ import main

        out = tmp_path / "latent.npy"
        argv = ["generate", "--dim", "128", "--depth", "1", "--size", "64", "--steps", "2",
                "--buckets", "1", "--seed", "3", "--out", str(out)]
        assert main(argv) == 0
        latent = np.load(out)
        assert latent.shape == (4, 8, 8) and np.isfinite(latent).all()
