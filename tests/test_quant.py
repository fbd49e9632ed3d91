"""Int8 serving path (``ops/quant.py``): numerics and tree surgery.

The scheme is dynamic per-token activation x static per-channel weight
symmetric int8 with int32 accumulation — worst-case per-element rounding is
0.5/127 of each operand's row/column max, so a single matmul should land
within ~1e-2 relative error and the end-to-end DiT forward should stay
nearly parallel (cosine > 0.99) to the bf16 path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skrample_tpu.models import DiT, DiTConfig
from skrample_tpu.ops.quant import dense_int8, quantize_activation, quantize_params, quantize_weight


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-12)


def test_weight_roundtrip_error() -> None:
    w = np.random.default_rng(0).normal(size=(256, 512)).astype(np.float32)
    q = quantize_weight(jnp.asarray(w))
    assert q["q"].dtype == jnp.int8
    back = np.asarray(q["q"], np.float32) * np.asarray(q["s"])
    # symmetric per-column: error bounded by half an lsb of the column max
    assert np.abs(back - w).max() <= (np.abs(w).max(0) / 127 * 0.5 + 1e-6).max()


def test_zero_column_weight_safe() -> None:
    w = jnp.zeros((64, 128), jnp.float32)
    q = quantize_weight(w)
    assert np.isfinite(np.asarray(q["s"])).all()
    assert not np.asarray(q["q"]).any()


def test_activation_quant_shapes() -> None:
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 64)), jnp.float32)
    xq, s = quantize_activation(x)
    assert xq.shape == x.shape and xq.dtype == jnp.int8
    assert s.shape == (2, 16, 1)
    assert _rel_err(np.asarray(xq, np.float32) * np.asarray(s), x) < 1e-2


def test_dense_int8_matches_f32() -> None:
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 64, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 512)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(512,)), jnp.float32)
    exact = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    got = dense_int8({"w_q": quantize_weight(w), "b": b}, x, jnp.float32)
    assert got.dtype == jnp.float32
    assert _rel_err(got, exact) < 2e-2


def test_dense_int8_jits() -> None:
    rng = np.random.default_rng(3)
    params = {
        "w_q": quantize_weight(jnp.asarray(rng.normal(size=(128, 128)), jnp.float32)),
        "b": jnp.zeros((128,), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    eager = dense_int8(params, x, jnp.float32)
    jitted = jax.jit(lambda p, v: dense_int8(p, v, jnp.float32))(params, x)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager), rtol=1e-6)


def _nontrivial_params(model: DiT, key: jax.Array) -> dict:
    "init() zero-initializes the adaLN-zero heads; fill them so the forward has signal."
    params = model.init(key)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.fold_in(key, 7), len(leaves))
    leaves = [
        leaf + 0.02 * jax.random.normal(k, leaf.shape, leaf.dtype) if leaf.ndim >= 1 else leaf
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, leaves)


@pytest.fixture(scope="module")
def dit_pair():
    config = DiTConfig(dim=128, depth=2, heads=2, compute_dtype=jnp.float32)
    model = DiT(config)
    params = _nontrivial_params(model, jax.random.PRNGKey(0))
    return model, params, model.quantize_params(params)


def test_quantize_params_tree_shape(dit_pair) -> None:
    model, params, qparams = dit_pair
    block = qparams["blocks"][0]
    for name in ("qkv", "proj", "mlp_in", "mlp_out"):
        assert "w_q" in block[name], name
        assert block[name]["w_q"]["q"].dtype == jnp.int8
    # excluded: modulation heads; too small: patch/timestep/final projections
    for name in ("ada",):
        assert "w" in block[name]
    for name in ("patch_in", "final_mod", "final_out", "t_mlp1", "t_mlp2"):
        assert "w" in qparams[name], name


def test_dit_int8_forward_close(dit_pair) -> None:
    model, params, qparams = dit_pair
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16), jnp.float32)
    t = jnp.asarray([100.0, 700.0])
    ref = np.asarray(model.apply(params, x, t), np.float64).ravel()
    got = np.asarray(model.apply(qparams, x, t), np.float64).ravel()
    cos = float(ref @ got / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > 0.99, cos
    assert _rel_err(got, ref) < 0.15  # elementwise worst-case, quant noise through 2 blocks


def test_quantize_rows_kernel_matches_xla_path() -> None:
    "Interpret-mode Pallas one-pass quantize == the two-pass XLA formula, bit for bit."
    from skrample_tpu.ops.quant import quantize_rows

    x2 = jnp.asarray(np.random.default_rng(5).normal(size=(64, 256)), jnp.float32)
    q, s = quantize_rows(x2, block_r=32, interpret=True)
    qe, se = quantize_activation(x2)
    # the kernel's divide may lower as reciprocal-multiply: 1 ulp on s,
    # at most 1 lsb on q at round-to-nearest ties
    assert np.abs(np.asarray(q, np.int32) - np.asarray(qe, np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(s).ravel(), np.asarray(se).ravel(), rtol=1e-6)


def test_quantize_rows_zero_row_safe() -> None:
    from skrample_tpu.ops.quant import quantize_rows

    x2 = jnp.zeros((8, 128), jnp.float32)
    q, s = quantize_rows(x2, block_r=8, interpret=True)
    assert not np.asarray(q).any()
    assert np.isfinite(np.asarray(s)).all()


def test_quantize_rows_spmd_shards_rows() -> None:
    """The custom_partitioning wrapper must shard the row axis (not replicate
    the opaque kernel) and match the single-device result."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from skrample_tpu.ops.quant import _quant_rows_spmd

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    x2 = jnp.asarray(np.random.default_rng(6).normal(size=(512, 128)), jnp.float32)
    qe, se = quantize_activation(x2)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))
    xs = jax.device_put(x2, NamedSharding(mesh, P("dp", None)))
    with mesh:
        q, s = jax.jit(_quant_rows_spmd(True))(xs)
        q.block_until_ready()
    assert "dp" in str(q.sharding.spec), q.sharding
    assert s.shape == (512,)
    assert np.abs(np.asarray(q, np.int32) - np.asarray(qe, np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(s), np.asarray(se).ravel(), rtol=1e-6)


def test_dit_int8_tensor_parallel_matches_single(dit_pair) -> None:
    """The quantized tree under a (dp x tp) sharded jit with
    ``param_spec(quantized=True)``: int8 weights shard like their f32
    counterparts, scales follow the output dim, and the result matches the
    single-device int8 run (row-parallel int8 is exact under SPMD — the
    activation max reduces collectively and int32 partials psum before the
    rescale; residual f32 fusion differences stay under a quant bucket)."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    model, params, qparams = dit_pair
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 16, 16), jnp.float32)
    t = jnp.asarray([10.0, 250.0, 600.0, 990.0])
    single = model.apply(qparams, x, t)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "tp"))
    spec_tree = model.param_spec(quantized=True)
    qs = jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        qparams,
        spec_tree,
        is_leaf=lambda v: isinstance(v, jax.Array | np.ndarray),
    )
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    with mesh:
        sharded = jax.jit(model.apply)(qs, xs, t)
        sharded.block_until_ready()
    qkv = qs["blocks"][0]["qkv"]
    assert "tp" in str(qkv["w_q"]["q"].sharding.spec), qkv["w_q"]["q"].sharding
    assert "tp" in str(qkv["w_q"]["s"].sharding.spec), qkv["w_q"]["s"].sharding
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=2e-4)


def test_dit_int8_forward_jits(dit_pair) -> None:
    model, params, qparams = dit_pair
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16, 16), jnp.float32)
    t = jnp.asarray([10.0])
    eager = model.apply(qparams, x, t)
    jitted = jax.jit(model.apply)(qparams, x, t)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager), rtol=1e-5, atol=1e-6)


def test_quant_rows_local_caps_block_for_wide_rows(monkeypatch) -> None:
    """Flux-width matrices (D=12288 fused qkv/mlp at dim 3072) must pick a
    block_r that keeps block_r * D under ~1M elements — block_r=256 there
    allocates an 18MB scoped-VMEM block, over the chip's 16MB limit."""
    from skrample_tpu.ops import quant

    picked: dict[tuple[int, int], int] = {}

    def spy(x2, block_r=256, interpret=False):
        picked[x2.shape] = block_r
        return quantize_activation(x2)  # skip the kernel; selection is what's under test

    monkeypatch.setattr(quant, "quantize_rows", spy)
    quant._quant_rows_local(jnp.zeros((4096, 12288), jnp.bfloat16), interpret=True)
    assert picked[(4096, 12288)] * 12288 <= 1 << 20, picked
    quant._quant_rows_local(jnp.zeros((4096, 2048), jnp.bfloat16), interpret=True)
    assert picked[(4096, 2048)] == 256, picked  # DiT widths keep the original block


def test_condunet_quantize_scope() -> None:
    """CondUNet's per-family int8 default ("deep") quantizes ONLY the
    >=4-block Transformer2D stages; "all" is the every-dense tree and
    "none" is identity — the guard against the measured SDXL regression
    (scripts/bench_sdxl.py: conv-interleaved int8 dots lose fusion)."""
    from skrample_tpu.models import CondUNet, CondUNetConfig

    model = CondUNet(
        CondUNetConfig(
            widths=(128, 128),
            layers_per_block=1,
            transformer_layers=(1, 4),
            heads=(2, 2),
            context_dim=64,
            pooled_dim=0,
            groups=8,
            compute_dtype=jnp.float32,
        )
    )
    params = model.init(jax.random.PRNGKey(0))

    def has_quant(tree) -> bool:
        found = False

        def walk(node):
            nonlocal found
            if isinstance(node, dict):
                if "w_q" in node:
                    found = True
                for v in node.values():
                    walk(v)
            elif isinstance(node, list):
                for v in node:
                    walk(v)

        walk(tree)
        return found

    deep = model.quantize_params(params)  # default scope="deep"
    assert not has_quant(deep["down"][0]), "shallow stage must stay bf16/f32"
    assert has_quant(deep["down"][1]), "the 4-block stage must quantize"
    assert has_quant(deep["mid"]), "the deep mid stage must quantize"
    assert not has_quant({"r": deep["down"][0]["resnets"]}), "convs never quantize"
    # up path: up[0] is the DEEPEST level (reversed order)
    assert has_quant(deep["up"][0])
    assert not has_quant(deep["up"][-1])

    allq = model.quantize_params(params, scope="all")
    assert has_quant(allq["down"][0]) and has_quant(allq["down"][1])

    none = model.quantize_params(params, scope="none")
    assert none is params

    with pytest.raises(ValueError, match="scope"):
        model.quantize_params(params, scope="bogus")

    # the scoped trees still run
    x = jnp.zeros((1, 4, 8, 8), jnp.float32)
    ctx = jnp.zeros((1, 5, 64), jnp.float32)
    out = model.apply(deep, x, jnp.full((1,), 400.0), ctx)
    assert out.shape == x.shape
