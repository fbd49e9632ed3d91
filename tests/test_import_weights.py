"""Pretrained CLIP text-tower import, verified against transformers.

The strongest parity evidence available in-sandbox: build a (random-weight)
``transformers.CLIPTextModel`` on CPU, import its state dict through
``clip_text_encoder``, and require OUR forward to reproduce the HF model's
hidden states and pooling — same weights, two implementations, float32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection  # noqa: E402

from skrample_tpu.models.import_weights import clip_text_config, clip_text_encoder  # noqa: E402

# eos is the HIGHEST vocab id, the real-CLIP convention (eos 49407 of
# 49408): transformers' pooling has a legacy branch for eos_token_id == 2
# that gathers at argmax(input_ids) instead of the first eos match, and
# only this convention satisfies both branches
HF_CFG = dict(
    vocab_size=99,
    hidden_size=64,
    intermediate_size=256,
    num_hidden_layers=3,
    num_attention_heads=4,
    max_position_embeddings=16,
    eos_token_id=98,
    bos_token_id=97,
)


def token_batch(eos: int = 98) -> np.ndarray:
    ids = np.full((2, 16), 7, np.int64)  # trailing filler AFTER the eos
    ids[0, :5] = [97, 10, 20, 30, eos]
    ids[1, :3] = [97, 42, eos]
    return ids


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_clip_text_model_parity(act: str) -> None:
    torch.manual_seed(0)
    hf = CLIPTextModel(CLIPTextConfig(**HF_CFG, hidden_act=act)).eval()
    enc, params = clip_text_encoder(hf)

    ids = token_batch()
    with torch.no_grad():
        out = hf(input_ids=torch.as_tensor(ids))
    ours = enc.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), out.last_hidden_state.numpy(), atol=2e-5)

    # pooled = feature at the first EOS position (identity text_proj here)
    _, pooled = enc.encode(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5)


def test_clip_with_projection_parity() -> None:
    torch.manual_seed(1)
    hf = CLIPTextModelWithProjection(
        CLIPTextConfig(**HF_CFG, hidden_act="quick_gelu", projection_dim=32)
    ).eval()
    enc, params = clip_text_encoder(hf)

    ids = token_batch()
    with torch.no_grad():
        out = hf(input_ids=torch.as_tensor(ids))
    _, pooled = enc.encode(params, jnp.asarray(ids, jnp.int32))
    assert pooled.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(pooled), out.text_embeds.numpy(), atol=2e-5)


def test_config_mapping() -> None:
    cfg = clip_text_config(CLIPTextConfig(**HF_CFG, hidden_act="quick_gelu"))
    assert (cfg.dim, cfg.depth, cfg.heads, cfg.mlp_ratio) == (64, 3, 4, 4)
    assert cfg.max_tokens == 16 and cfg.ln_affine and cfg.causal
    assert cfg.act == "quick_gelu" and cfg.resolved_eos_id == 98


def test_state_dict_tuple_entry_point() -> None:
    torch.manual_seed(2)
    hf = CLIPTextModel(CLIPTextConfig(**HF_CFG, hidden_act="gelu")).eval()
    enc, params = clip_text_encoder((hf.state_dict(), hf.config))
    ids = token_batch()
    with torch.no_grad():
        ref = hf(input_ids=torch.as_tensor(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(enc.apply(params, jnp.asarray(ids, jnp.int32))), ref, atol=2e-5)


def test_imported_tree_matches_param_spec() -> None:
    "The imported tree shards with the encoder's own PartitionSpecs."
    torch.manual_seed(3)
    hf = CLIPTextModel(CLIPTextConfig(**HF_CFG, hidden_act="gelu")).eval()
    enc, params = clip_text_encoder(hf)
    jax.tree.map(lambda w, s: None, params, enc.param_spec())  # same structure or raises


@pytest.mark.soak  # torch-mirror importer parity: full tier only
class TestVAE:
    """AutoencoderKL import oracle.

    diffusers is not installable in-sandbox, so the oracle is an
    independently written torch mirror of the *published* AutoencoderKL
    architecture (arch per the SD release: GroupNorm(eps 1e-6)+SiLU resnet
    pairs, one single-head mid attention, asymmetric-(0,1) stride-2
    downsample, nearest-2x upsample, quant/post_quant 1x1 convs) with
    module names chosen to produce diffusers' exact state-dict keys."""

    CFG = dict(
        in_channels=3,
        out_channels=3,
        latent_channels=4,
        block_out_channels=(32, 64),
        layers_per_block=1,
        norm_num_groups=8,
        scaling_factor=0.18215,
        use_quant_conv=True,
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2,
        act_fn="silu",
    )

    @classmethod
    def _torch_vae(cls, quant: bool = True, cfg: dict | None = None):
        import math as _math

        import torch.nn as nn
        import torch.nn.functional as F

        cfg = cfg or cls.CFG
        groups = cfg["norm_num_groups"]
        widths = cfg["block_out_channels"]
        layers = cfg["layers_per_block"]
        latent = cfg["latent_channels"]

        class Resnet(nn.Module):
            def __init__(self, c_in, c_out):
                super().__init__()
                self.norm1 = nn.GroupNorm(groups, c_in, eps=1e-6)
                self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
                self.norm2 = nn.GroupNorm(groups, c_out, eps=1e-6)
                self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
                if c_in != c_out:
                    self.conv_shortcut = nn.Conv2d(c_in, c_out, 1)

            def forward(self, x):
                h = self.conv1(F.silu(self.norm1(x)))
                h = self.conv2(F.silu(self.norm2(h)))
                return (self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x) + h

        class Attn(nn.Module):
            def __init__(self, width):
                super().__init__()
                self.group_norm = nn.GroupNorm(groups, width, eps=1e-6)
                self.to_q = nn.Linear(width, width)
                self.to_k = nn.Linear(width, width)
                self.to_v = nn.Linear(width, width)
                self.to_out = nn.ModuleList([nn.Linear(width, width)])

            def forward(self, x):
                B, C, H, W = x.shape
                t = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
                q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
                a = torch.softmax(q @ k.transpose(1, 2) / _math.sqrt(C), dim=-1)
                o = self.to_out[0](a @ v)
                return x + o.transpose(1, 2).reshape(B, C, H, W)

        class Mid(nn.Module):
            def __init__(self, width):
                super().__init__()
                self.resnets = nn.ModuleList([Resnet(width, width), Resnet(width, width)])
                self.attentions = nn.ModuleList([Attn(width)])

            def forward(self, x):
                return self.resnets[1](self.attentions[0](self.resnets[0](x)))

        class Downsampler(nn.Module):
            def __init__(self, width):
                super().__init__()
                self.conv = nn.Conv2d(width, width, 3, stride=2, padding=0)

            def forward(self, x):
                return self.conv(F.pad(x, (0, 1, 0, 1)))

        class DownBlock(nn.Module):
            def __init__(self, c_in, c_out, last):
                super().__init__()
                self.resnets = nn.ModuleList(
                    [Resnet(c_in if j == 0 else c_out, c_out) for j in range(layers)]
                )
                if not last:
                    self.downsamplers = nn.ModuleList([Downsampler(c_out)])

            def forward(self, x):
                for r in self.resnets:
                    x = r(x)
                return self.downsamplers[0](x) if hasattr(self, "downsamplers") else x

        class Upsampler(nn.Module):
            def __init__(self, width):
                super().__init__()
                self.conv = nn.Conv2d(width, width, 3, padding=1)

            def forward(self, x):
                return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))

        class UpBlock(nn.Module):
            def __init__(self, c_in, c_out, last):
                super().__init__()
                self.resnets = nn.ModuleList(
                    [Resnet(c_in if j == 0 else c_out, c_out) for j in range(layers + 1)]
                )
                if not last:
                    self.upsamplers = nn.ModuleList([Upsampler(c_out)])

            def forward(self, x):
                for r in self.resnets:
                    x = r(x)
                return self.upsamplers[0](x) if hasattr(self, "upsamplers") else x

        class Encoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_in = nn.Conv2d(3, widths[0], 3, padding=1)
                self.down_blocks = nn.ModuleList(
                    [
                        DownBlock(widths[max(i - 1, 0)], w, i == len(widths) - 1)
                        for i, w in enumerate(widths)
                    ]
                )
                self.mid_block = Mid(widths[-1])
                self.conv_norm_out = nn.GroupNorm(groups, widths[-1], eps=1e-6)
                self.conv_out = nn.Conv2d(widths[-1], 2 * latent, 3, padding=1)

            def forward(self, x):
                h = self.conv_in(x)
                for b in self.down_blocks:
                    h = b(h)
                return self.conv_out(F.silu(self.conv_norm_out(self.mid_block(h))))

        class Decoder(nn.Module):
            def __init__(self):
                super().__init__()
                rev = list(reversed(widths))
                self.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
                self.mid_block = Mid(rev[0])
                self.up_blocks = nn.ModuleList(
                    [
                        UpBlock(rev[max(i - 1, 0)], w, i == len(rev) - 1)
                        for i, w in enumerate(rev)
                    ]
                )
                self.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
                self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

            def forward(self, z):
                h = self.mid_block(self.conv_in(z))
                for b in self.up_blocks:
                    h = b(h)
                return self.conv_out(F.silu(self.conv_norm_out(h)))

        class AutoKL(nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder = Encoder()
                self.decoder = Decoder()
                if quant:
                    self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
                    self.post_quant_conv = nn.Conv2d(latent, latent, 1)

            def moments(self, x):
                h = self.encoder(x)
                mean, logvar = (self.quant_conv(h) if quant else h).chunk(2, dim=1)
                return mean, logvar.clamp(-30.0, 20.0)

            def decode(self, z):
                return self.decoder(self.post_quant_conv(z) if quant else z)

        return AutoKL()

    def test_parity(self) -> None:
        from skrample_tpu.models.import_weights import diffusers_vae

        torch.manual_seed(5)
        ref = self._torch_vae().eval()
        vae, params = diffusers_vae((ref.state_dict(), self.CFG))
        assert vae.config.norm_affine and vae.config.quant_convs
        assert vae.config.widths() == [32, 64] and vae.config.groups == 8

        x = torch.randn(2, 3, 16, 16, generator=torch.Generator().manual_seed(6))
        with torch.no_grad():
            mean_t, logvar_t = ref.moments(x)
        mean_j, logvar_j = vae.posterior(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(), atol=5e-5)

        # encode(key=None) is the scaled posterior mode
        np.testing.assert_allclose(
            np.asarray(vae.encode(params, jnp.asarray(x.numpy()))),
            mean_t.numpy() * vae.config.scaling_factor,
            atol=5e-5,
        )

        z = torch.randn(2, 4, 8, 8, generator=torch.Generator().manual_seed(7))
        with torch.no_grad():
            pix_t = ref.decode(z)
        # our decode takes the SCALED latent (divides by scaling_factor first)
        pix_j = vae.decode(params, jnp.asarray(z.numpy()) * vae.config.scaling_factor)
        np.testing.assert_allclose(np.asarray(pix_j), pix_t.numpy(), atol=5e-5)

    def test_parity_four_level_ladder(self) -> None:
        "The real SD shape scaled down: 4 levels with the capped 4x width."
        from skrample_tpu.models.import_weights import diffusers_vae

        cfg = {
            **self.CFG,
            "block_out_channels": (16, 32, 64, 64),
            "down_block_types": ("DownEncoderBlock2D",) * 4,
            "up_block_types": ("UpDecoderBlock2D",) * 4,
        }
        torch.manual_seed(12)
        ref = self._torch_vae(cfg=cfg).eval()
        vae, params = diffusers_vae((ref.state_dict(), cfg))
        assert vae.config.widths() == [16, 32, 64, 64]

        x = torch.randn(1, 3, 32, 32, generator=torch.Generator().manual_seed(13))
        with torch.no_grad():
            mean_t, _ = ref.moments(x)
            want = ref.decode(mean_t).numpy()
        mean_j, _ = vae.posterior(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=1e-4)
        got = vae.decode(params, (mean_j - vae.config.shift_factor) * vae.config.scaling_factor)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_rejects_unmapped_keys(self) -> None:
        from skrample_tpu.models.import_weights import diffusers_vae

        torch.manual_seed(8)
        ref = self._torch_vae()
        sd = dict(ref.state_dict())
        sd["encoder.mystery.weight"] = torch.zeros(1)
        with pytest.raises(ValueError, match="unmapped"):
            diffusers_vae((sd, self.CFG))

    def test_rejects_foreign_width_ladder(self) -> None:
        from skrample_tpu.models.import_weights import vae_config

        with pytest.raises(ValueError, match="ladder"):
            vae_config({**self.CFG, "block_out_channels": (32, 48)})

    def test_legacy_attention_naming(self) -> None:
        "Pre-0.15 checkpoints: query/key/value/proj_attn stored as 1x1 convs."
        from skrample_tpu.models.import_weights import diffusers_vae

        torch.manual_seed(9)
        ref = self._torch_vae().eval()
        sd = dict(ref.state_dict())
        for blk in ("encoder.mid_block.attentions.0", "decoder.mid_block.attentions.0"):
            for new, old in (("to_q", "query"), ("to_k", "key"), ("to_v", "value"), ("to_out.0", "proj_attn")):
                w = sd.pop(f"{blk}.{new}.weight")
                sd[f"{blk}.{old}.weight"] = w[:, :, None, None]  # as 1x1 conv
                sd[f"{blk}.{old}.bias"] = sd.pop(f"{blk}.{new}.bias")
        vae, params = diffusers_vae((sd, self.CFG))
        x = torch.randn(1, 3, 16, 16, generator=torch.Generator().manual_seed(10))
        with torch.no_grad():
            mean_t, _ = ref.moments(x)
        mean_j, _ = vae.posterior(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=5e-5)


@pytest.mark.soak  # torch-mirror importer parity: full tier only
class TestSD3:
    """SD3 transformer (MMDiT) import oracle.

    As with the VAE, the oracle is an independently written torch mirror of
    the *published* MMDiT architecture (arXiv 2403.03206 / the SD3 release:
    dual-stream blocks with adaLN-zero modulation meeting in one joint
    attention, pre-only final text stream, cropped positional embedding,
    timestep + pooled-text conditioning MLPs) with module names chosen to
    produce diffusers' exact SD3Transformer2DModel state-dict keys."""

    CFG = dict(
        num_attention_heads=4,
        attention_head_dim=16,
        num_layers=2,
        patch_size=2,
        in_channels=4,
        out_channels=4,
        joint_attention_dim=32,
        pooled_projection_dim=40,
        caption_projection_dim=64,
        pos_embed_max_size=8,
        qk_norm=None,
    )

    @classmethod
    def _torch_sd3(cls, qk_norm: bool = False, dual_layers: tuple = (), cfg: dict | None = None):
        import math as _math

        import torch.nn as nn
        import torch.nn.functional as F

        cfg = cfg or cls.CFG
        heads = cfg["num_attention_heads"]
        hd = cfg["attention_head_dim"]
        d = heads * hd
        depth = cfg["num_layers"]
        patch = cfg["patch_size"]
        chans = cfg["in_channels"]
        ctx_d = cfg["joint_attention_dim"]
        pool_d = cfg["pooled_projection_dim"]
        pmax = cfg["pos_embed_max_size"]

        def ln(x):
            return F.layer_norm(x, (d,), eps=1e-6)

        class GELUProj(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(d, 4 * d)

            def forward(self, x):
                return F.gelu(self.proj(x), approximate="tanh")

        class FF(nn.Module):
            def __init__(self):
                super().__init__()
                self.net = nn.ModuleList([GELUProj(), nn.Identity(), nn.Linear(4 * d, d)])

            def forward(self, x):
                return self.net[2](self.net[0](x))

        class RMSNorm(nn.Module):
            def __init__(self):
                super().__init__()
                self.weight = nn.Parameter(torch.rand(hd) + 0.5)

            def forward(self, x):  # per-head, over the last (head_dim) axis
                return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + 1e-6) * self.weight

        class Attn(nn.Module):
            def __init__(self, pre_only):
                super().__init__()
                self.to_q = nn.Linear(d, d)
                self.to_k = nn.Linear(d, d)
                self.to_v = nn.Linear(d, d)
                self.add_q_proj = nn.Linear(d, d)
                self.add_k_proj = nn.Linear(d, d)
                self.add_v_proj = nn.Linear(d, d)
                self.to_out = nn.ModuleList([nn.Linear(d, d)])
                if not pre_only:
                    self.to_add_out = nn.Linear(d, d)
                if qk_norm:
                    self.norm_q = RMSNorm()
                    self.norm_k = RMSNorm()
                    self.norm_added_q = RMSNorm()
                    self.norm_added_k = RMSNorm()

            def forward(self, img_mod, txt_mod):
                B, N = img_mod.shape[:2]

                def split(x):
                    return x.reshape(B, -1, heads, hd).transpose(1, 2)

                q_i, k_i = split(self.to_q(img_mod)), split(self.to_k(img_mod))
                q_t, k_t = split(self.add_q_proj(txt_mod)), split(self.add_k_proj(txt_mod))
                if qk_norm:
                    q_i, k_i = self.norm_q(q_i), self.norm_k(k_i)
                    q_t, k_t = self.norm_added_q(q_t), self.norm_added_k(k_t)
                q = torch.cat([q_i, q_t], dim=2)
                k = torch.cat([k_i, k_t], dim=2)
                v = torch.cat([split(self.to_v(img_mod)), split(self.add_v_proj(txt_mod))], dim=2)
                a = torch.softmax(q @ k.transpose(2, 3) / _math.sqrt(hd), dim=-1)
                o = (a @ v).transpose(1, 2).reshape(B, -1, d)
                return o[:, :N], o[:, N:]

        class SelfAttn(nn.Module):
            def __init__(self):
                super().__init__()
                self.to_q = nn.Linear(d, d)
                self.to_k = nn.Linear(d, d)
                self.to_v = nn.Linear(d, d)
                self.to_out = nn.ModuleList([nn.Linear(d, d)])
                if qk_norm:
                    self.norm_q = RMSNorm()
                    self.norm_k = RMSNorm()

            def forward(self, x):
                B, N = x.shape[:2]

                def split(t):
                    return t.reshape(B, N, heads, hd).transpose(1, 2)

                q, k, v = split(self.to_q(x)), split(self.to_k(x)), split(self.to_v(x))
                if qk_norm:
                    q, k = self.norm_q(q), self.norm_k(k)
                a = torch.softmax(q @ k.transpose(2, 3) / _math.sqrt(hd), dim=-1)
                return self.to_out[0]((a @ v).transpose(1, 2).reshape(B, N, d))

        class AdaLinear(nn.Module):
            def __init__(self, n):
                super().__init__()
                self.linear = nn.Linear(d, n * d)

        class Block(nn.Module):
            def __init__(self, pre_only, dual):
                super().__init__()
                self.pre_only = pre_only
                self.dual = dual
                self.norm1 = AdaLinear(9 if dual else 6)
                self.norm1_context = AdaLinear(2 if pre_only else 6)
                self.attn = Attn(pre_only)
                self.ff = FF()
                if not pre_only:
                    self.ff_context = FF()
                if dual:
                    self.attn2 = SelfAttn()

            def forward(self, img, txt, temb):
                mods = self.norm1.linear(F.silu(temb)).chunk(9 if self.dual else 6, dim=1)
                sh_a, sc_a, g_a, sh_m, sc_m, g_m = mods[:6]
                img_mod = ln(img) * (1 + sc_a[:, None]) + sh_a[:, None]
                if self.dual:
                    sh_a2, sc_a2, g_a2 = mods[6:]
                    img_mod2 = ln(img) * (1 + sc_a2[:, None]) + sh_a2[:, None]
                if self.pre_only:
                    sc, sh = self.norm1_context.linear(F.silu(temb)).chunk(2, dim=1)
                    txt_mod = ln(txt) * (1 + sc[:, None]) + sh[:, None]
                else:
                    tsh_a, tsc_a, tg_a, tsh_m, tsc_m, tg_m = self.norm1_context.linear(
                        F.silu(temb)
                    ).chunk(6, dim=1)
                    txt_mod = ln(txt) * (1 + tsc_a[:, None]) + tsh_a[:, None]
                img_attn, txt_attn = self.attn(img_mod, txt_mod)
                img = img + g_a[:, None] * self.attn.to_out[0](img_attn)
                if self.dual:
                    img = img + g_a2[:, None] * self.attn2(img_mod2)
                img = img + g_m[:, None] * self.ff(ln(img) * (1 + sc_m[:, None]) + sh_m[:, None])
                if self.pre_only:
                    return img, txt
                txt = txt + tg_a[:, None] * self.attn.to_add_out(txt_attn)
                txt = txt + tg_m[:, None] * self.ff_context(
                    ln(txt) * (1 + tsc_m[:, None]) + tsh_m[:, None]
                )
                return img, txt

        class PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(chans, d, patch, stride=patch)
                self.register_buffer("pos_embed", torch.randn(1, pmax * pmax, d) * 0.02)

            def forward(self, x):
                h = self.proj(x).flatten(2).transpose(1, 2)
                gh, gw = x.shape[2] // patch, x.shape[3] // patch
                top, left = (pmax - gh) // 2, (pmax - gw) // 2
                table = self.pos_embed.reshape(1, pmax, pmax, d)
                crop = table[:, top : top + gh, left : left + gw].reshape(1, gh * gw, d)
                return h + crop

        class TwoLayer(nn.Module):
            def __init__(self, d_in):
                super().__init__()
                self.linear_1 = nn.Linear(d_in, d)
                self.linear_2 = nn.Linear(d, d)

            def forward(self, x):
                return self.linear_2(F.silu(self.linear_1(x)))

        class TimeText(nn.Module):
            def __init__(self):
                super().__init__()
                self.timestep_embedder = TwoLayer(256)
                self.text_embedder = TwoLayer(pool_d)

        class SD3Mini(nn.Module):
            def __init__(self):
                super().__init__()
                self.pos_embed = PatchEmbed()
                self.time_text_embed = TimeText()
                self.context_embedder = nn.Linear(ctx_d, d)
                self.transformer_blocks = nn.ModuleList(
                    [Block(pre_only=(i == depth - 1), dual=(i in dual_layers)) for i in range(depth)]
                )
                self.norm_out = AdaLinear(2)
                self.proj_out = nn.Linear(d, patch * patch * chans)

            def forward(self, x, t, context, pooled):
                B, _, H, W = x.shape
                img = self.pos_embed(x)
                txt = self.context_embedder(context)
                freqs = torch.exp(
                    -_math.log(10000.0) * torch.arange(128, dtype=torch.float32) / 128.0
                )
                args = t.float()[:, None] * freqs[None]
                sin_emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
                temb = self.time_text_embed.timestep_embedder(sin_emb) + self.time_text_embed.text_embedder(pooled)
                for blk in self.transformer_blocks:
                    img, txt = blk(img, txt, temb)
                sc, sh = self.norm_out.linear(F.silu(temb)).chunk(2, dim=1)
                img = ln(img) * (1 + sc[:, None]) + sh[:, None]
                out = self.proj_out(img)
                gh, gw = H // patch, W // patch
                out = out.reshape(B, gh, gw, patch, patch, chans)
                return out.permute(0, 5, 1, 3, 2, 4).reshape(B, chans, H, W)

        return SD3Mini()

    def _parity_at(self, ref, H: int, W: int, batch: int, seed: int, cfg: dict | None = None) -> None:
        from skrample_tpu.models.import_weights import sd3_mmdit

        mmdit, params = sd3_mmdit((ref.state_dict(), cfg or self.CFG))
        assert mmdit.config.sd3_wiring and mmdit.config.final_txt_pre_only

        gen = torch.Generator().manual_seed(seed)
        x = torch.randn(batch, 4, H, W, generator=gen)
        t = torch.rand(batch, generator=gen) * 1000.0
        ctx = torch.randn(batch, 24, 32, generator=gen)
        pooled = torch.randn(batch, 40, generator=gen)
        with torch.no_grad():
            want = ref(x, t, ctx, pooled).numpy()
        got = mmdit.apply(
            params,
            jnp.asarray(x.numpy()),
            jnp.asarray(t.numpy()),
            jnp.asarray(ctx.numpy()),
            pooled=jnp.asarray(pooled.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    def test_parity(self) -> None:
        torch.manual_seed(11)
        ref = self._torch_sd3().eval()
        self._parity_at(ref, H=8, W=8, batch=2, seed=12)

    def test_parity_cropped_pos_embed(self) -> None:
        "A larger latent exercises the off-center pos-embed crop."
        torch.manual_seed(13)
        ref = self._torch_sd3().eval()
        self._parity_at(ref, H=12, W=12, batch=1, seed=14)

    def test_parity_depth_variant(self) -> None:
        "Depth 3 exercises the pre-only LAST block indexing off the default."
        from skrample_tpu.models.import_weights import sd3_mmdit

        cfg = {**self.CFG, "num_layers": 3}
        torch.manual_seed(30)
        ref = self._torch_sd3(cfg=cfg).eval()
        self._parity_at(ref, H=8, W=8, batch=1, seed=31, cfg=cfg)

    def test_parity_sd35_qk_norm(self) -> None:
        "SD3.5-large's per-head RMS qk-norm, with random (non-unit) scales."
        torch.manual_seed(18)
        ref = self._torch_sd3(qk_norm=True).eval()
        cfg = {**self.CFG, "qk_norm": "rms_norm"}
        self._parity_at(ref, H=8, W=8, batch=2, seed=19, cfg=cfg)

    def test_parity_sd35_medium_dual_attention(self) -> None:
        "SD3.5-medium: qk-norm + a second image-stream self-attention in block 0."
        torch.manual_seed(21)
        ref = self._torch_sd3(qk_norm=True, dual_layers=(0,)).eval()
        cfg = {**self.CFG, "qk_norm": "rms_norm", "dual_attention_layers": (0,)}
        self._parity_at(ref, H=8, W=8, batch=2, seed=22, cfg=cfg)

    def test_rejects_unsupported_features(self) -> None:
        from skrample_tpu.models.import_weights import mmdit_config

        with pytest.raises(ValueError, match="qk_norm"):
            mmdit_config({**self.CFG, "qk_norm": "layer_norm"})

    def test_rejects_unmapped_keys(self) -> None:
        from skrample_tpu.models.import_weights import sd3_mmdit

        torch.manual_seed(15)
        sd = dict(self._torch_sd3().state_dict())
        sd["transformer_blocks.0.attn.mystery.weight"] = torch.zeros(1)
        with pytest.raises(ValueError, match="unmapped"):
            sd3_mmdit((sd, self.CFG))

    def test_guided_closure(self) -> None:
        "CFG through the imported tree: explicit uncond context, SD3-style."
        from skrample_tpu.models.import_weights import sd3_mmdit

        torch.manual_seed(16)
        mmdit, params = sd3_mmdit((self._torch_sd3().state_dict(), self.CFG))
        gen = torch.Generator().manual_seed(17)
        ctx = jnp.asarray(torch.randn(1, 24, 32, generator=gen).numpy())
        pooled = jnp.asarray(torch.randn(1, 40, generator=gen).numpy())
        fn = mmdit.as_sampleable(
            params,
            ctx,
            guidance_scale=4.0,
            pooled=pooled,
            uncond_context=jnp.zeros_like(ctx),
            uncond_pooled=jnp.zeros_like(pooled),
        )
        x = jnp.asarray(torch.randn(1, 4, 8, 8, generator=gen).numpy())
        out = fn(x, 500.0, None, None)
        assert out.shape == x.shape and bool(jnp.isfinite(out).all())


@pytest.mark.soak  # torch-mirror importer parity: full tier only
class TestCondUNet:
    """UNet2DConditionModel import oracle (SD1.5 / SDXL families).

    Independently written torch mirror of the published architecture:
    timestep-injected resnets (GroupNorm eps 1e-5, affine),
    Transformer2DModel stages (self + cross attention, GEGLU with exact
    gelu, bias-free q/k/v), torch-padding stride-2 downsample, skip-concat
    up path, and SDXL's text_time added conditioning.  Both the linear
    (SDXL) and conv-1x1 (SD1.5) token projections are covered."""

    SDXL_CFG = dict(
        in_channels=4,
        block_out_channels=(32, 64, 128),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
        layers_per_block=2,
        transformer_layers_per_block=[1, 1, 2],
        attention_head_dim=[2, 2, 4],
        cross_attention_dim=48,
        norm_num_groups=8,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=56 + 6 * 8,
        flip_sin_to_cos=True,
        freq_shift=0,
    )
    SD15_CFG = dict(
        in_channels=4,
        block_out_channels=(32, 64, 64, 64),
        down_block_types=(
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "DownBlock2D",
        ),
        layers_per_block=2,
        transformer_layers_per_block=1,
        attention_head_dim=4,
        cross_attention_dim=24,
        norm_num_groups=8,
        addition_embed_type=None,
        flip_sin_to_cos=True,
        freq_shift=0,
    )

    @classmethod
    def _torch_unet(cls, cfg: dict, linear_proj: bool = True):
        import math as _math

        import torch.nn as nn
        import torch.nn.functional as F

        widths = cfg["block_out_channels"]
        levels = len(widths)
        layers = cfg["layers_per_block"]
        groups = cfg["norm_num_groups"]
        ctx_d = cfg["cross_attention_dim"]
        tdim = 4 * widths[0]
        tl = cfg["transformer_layers_per_block"]
        tl = list(tl) if isinstance(tl, (list, tuple)) else [tl] * levels
        hd = cfg["attention_head_dim"]
        heads = list(hd) if isinstance(hd, (list, tuple)) else [hd] * levels
        cross = [t == "CrossAttnDownBlock2D" for t in cfg["down_block_types"]]
        sdxl = cfg.get("addition_embed_type") == "text_time"

        def sin_emb(t, dim):
            half = dim // 2
            freqs = torch.exp(-_math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
            args = t.float()[:, None] * freqs[None]
            return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

        class Resnet(nn.Module):
            def __init__(self, c_in, c_out):
                super().__init__()
                self.norm1 = nn.GroupNorm(groups, c_in, eps=1e-5)
                self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
                self.time_emb_proj = nn.Linear(tdim, c_out)
                self.norm2 = nn.GroupNorm(groups, c_out, eps=1e-5)
                self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
                if c_in != c_out:
                    self.conv_shortcut = nn.Conv2d(c_in, c_out, 1)

            def forward(self, x, emb):
                h = self.conv1(F.silu(self.norm1(x)))
                h = h + self.time_emb_proj(F.silu(emb))[:, :, None, None]
                h = self.conv2(F.silu(self.norm2(h)))
                return (self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x) + h

        class Attn(nn.Module):
            def __init__(self, d, kv_d, n_heads):
                super().__init__()
                self.heads = n_heads
                self.to_q = nn.Linear(d, d, bias=False)
                self.to_k = nn.Linear(kv_d, d, bias=False)
                self.to_v = nn.Linear(kv_d, d, bias=False)
                self.to_out = nn.ModuleList([nn.Linear(d, d)])

            def forward(self, x, ctx=None):
                ctx = x if ctx is None else ctx
                B, N, D = x.shape
                d = D // self.heads

                def split(t):
                    return t.reshape(B, -1, self.heads, d).transpose(1, 2)

                q, k, v = split(self.to_q(x)), split(self.to_k(ctx)), split(self.to_v(ctx))
                a = torch.softmax(q @ k.transpose(2, 3) / _math.sqrt(d), dim=-1)
                return self.to_out[0]((a @ v).transpose(1, 2).reshape(B, N, D))

        class GEGLU(nn.Module):
            def __init__(self, d):
                super().__init__()
                self.proj = nn.Linear(d, 8 * d)

            def forward(self, x):
                value, gate = self.proj(x).chunk(2, dim=-1)
                return value * F.gelu(gate)  # exact gelu, the published GEGLU

        class FF(nn.Module):
            def __init__(self, d):
                super().__init__()
                self.net = nn.ModuleList([GEGLU(d), nn.Identity(), nn.Linear(4 * d, d)])

            def forward(self, x):
                return self.net[2](self.net[0](x))

        class Basic(nn.Module):
            def __init__(self, d, n_heads):
                super().__init__()
                self.norm1 = nn.LayerNorm(d, eps=1e-5)
                self.attn1 = Attn(d, d, n_heads)
                self.norm2 = nn.LayerNorm(d, eps=1e-5)
                self.attn2 = Attn(d, ctx_d, n_heads)
                self.norm3 = nn.LayerNorm(d, eps=1e-5)
                self.ff = FF(d)

            def forward(self, x, ctx):
                x = x + self.attn1(self.norm1(x))
                x = x + self.attn2(self.norm2(x), ctx)
                return x + self.ff(self.norm3(x))

        class Transformer2D(nn.Module):
            def __init__(self, d, depth, n_heads):
                super().__init__()
                self.norm = nn.GroupNorm(groups, d, eps=1e-6)
                if linear_proj:
                    self.proj_in = nn.Linear(d, d)
                    self.proj_out = nn.Linear(d, d)
                else:
                    self.proj_in = nn.Conv2d(d, d, 1)
                    self.proj_out = nn.Conv2d(d, d, 1)
                self.transformer_blocks = nn.ModuleList([Basic(d, n_heads) for _ in range(depth)])

            def forward(self, x, ctx):
                B, C, H, W = x.shape
                res = x
                h = self.norm(x)
                if linear_proj:
                    h = h.reshape(B, C, H * W).transpose(1, 2)
                    h = self.proj_in(h)
                else:
                    h = self.proj_in(h).reshape(B, C, H * W).transpose(1, 2)
                for blk in self.transformer_blocks:
                    h = blk(h, ctx)
                if linear_proj:
                    h = self.proj_out(h).transpose(1, 2).reshape(B, C, H, W)
                else:
                    h = self.proj_out(h.transpose(1, 2).reshape(B, C, H, W))
                return res + h

        class Downsampler(nn.Module):
            def __init__(self, w):
                super().__init__()
                self.conv = nn.Conv2d(w, w, 3, stride=2, padding=1)

            def forward(self, x):
                return self.conv(x)

        class Upsampler(nn.Module):
            def __init__(self, w):
                super().__init__()
                self.conv = nn.Conv2d(w, w, 3, padding=1)

            def forward(self, x):
                return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))

        class DownBlock(nn.Module):
            def __init__(self, i):
                super().__init__()
                prev = widths[max(i - 1, 0)]
                self.resnets = nn.ModuleList(
                    [Resnet(prev if j == 0 else widths[i], widths[i]) for j in range(layers)]
                )
                if cross[i]:
                    self.attentions = nn.ModuleList(
                        [Transformer2D(widths[i], tl[i], heads[i]) for _ in range(layers)]
                    )
                if i < levels - 1:
                    self.downsamplers = nn.ModuleList([Downsampler(widths[i])])

            def forward(self, x, emb, ctx, skips):
                for j, res in enumerate(self.resnets):
                    x = res(x, emb)
                    if hasattr(self, "attentions"):
                        x = self.attentions[j](x, ctx)
                    skips.append(x)
                if hasattr(self, "downsamplers"):
                    x = self.downsamplers[0](x)
                    skips.append(x)
                return x

        class UpBlock(nn.Module):
            def __init__(self, i):
                super().__init__()
                prev = widths[min(i + 1, levels - 1)]
                self.resnets = nn.ModuleList()
                for j in range(layers + 1):
                    skip_w = widths[i] if j < layers else (widths[max(i - 1, 0)] if i else widths[0])
                    self.resnets.append(Resnet((prev if j == 0 else widths[i]) + skip_w, widths[i]))
                if cross[i]:
                    self.attentions = nn.ModuleList(
                        [Transformer2D(widths[i], tl[i], heads[i]) for _ in range(layers + 1)]
                    )
                if i > 0:
                    self.upsamplers = nn.ModuleList([Upsampler(widths[i])])

            def forward(self, x, emb, ctx, skips):
                for j, res in enumerate(self.resnets):
                    x = res(torch.cat([x, skips.pop()], dim=1), emb)
                    if hasattr(self, "attentions"):
                        x = self.attentions[j](x, ctx)
                if hasattr(self, "upsamplers"):
                    x = self.upsamplers[0](x)
                return x

        class Mid(nn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = nn.ModuleList([Resnet(widths[-1], widths[-1]), Resnet(widths[-1], widths[-1])])
                self.attentions = nn.ModuleList([Transformer2D(widths[-1], tl[-1], heads[-1])])

            def forward(self, x, emb, ctx):
                return self.resnets[1](self.attentions[0](self.resnets[0](x, emb), ctx), emb)

        class TwoLayer(nn.Module):
            def __init__(self, d_in):
                super().__init__()
                self.linear_1 = nn.Linear(d_in, tdim)
                self.linear_2 = nn.Linear(tdim, tdim)

            def forward(self, x):
                return self.linear_2(F.silu(self.linear_1(x)))

        ladder = cfg.get("conditioning_embedding_out_channels")

        class CondEmbed(nn.Module):  # the published ControlNet conv ladder
            def __init__(self):
                super().__init__()
                self.conv_in = nn.Conv2d(cfg.get("conditioning_channels", 3), ladder[0], 3, padding=1)
                blocks = []
                for a, b in zip(ladder[:-1], ladder[1:]):
                    blocks.append(nn.Conv2d(a, a, 3, padding=1))
                    blocks.append(nn.Conv2d(a, b, 3, padding=1, stride=2))
                self.blocks = nn.ModuleList(blocks)
                self.conv_out = nn.Conv2d(ladder[-1], widths[0], 3, padding=1)

            def forward(self, x):
                h = F.silu(self.conv_in(x))
                for blk in self.blocks:
                    h = F.silu(blk(h))
                return self.conv_out(h)

        class UNetMini(nn.Module):
            def __init__(self, controlnet: bool = False):
                super().__init__()
                self.controlnet = controlnet
                self.conv_in = nn.Conv2d(cfg["in_channels"], widths[0], 3, padding=1)
                self.time_embedding = TwoLayer(widths[0])
                if sdxl:
                    self.add_embedding = TwoLayer(cfg["projection_class_embeddings_input_dim"])
                self.down_blocks = nn.ModuleList([DownBlock(i) for i in range(levels)])
                self.mid_block = Mid()
                if controlnet:
                    self.controlnet_cond_embedding = CondEmbed()
                    n_skips = 1 + levels * layers + (levels - 1)
                    self.controlnet_down_blocks = nn.ModuleList(
                        [nn.Conv2d(w, w, 1) for w in [widths[0]] + sum(([widths[i]] * (layers + (1 if i < levels - 1 else 0)) for i in range(levels)), [])]
                    )
                    assert len(self.controlnet_down_blocks) == n_skips
                    self.controlnet_mid_block = nn.Conv2d(widths[-1], widths[-1], 1)
                else:
                    self.up_blocks = nn.ModuleList([UpBlock(levels - 1 - k) for k in range(levels)])
                    self.conv_norm_out = nn.GroupNorm(groups, widths[0], eps=1e-5)
                    self.conv_out = nn.Conv2d(widths[0], cfg["in_channels"], 3, padding=1)

            def forward(self, x, t, ctx, pooled=None, time_ids=None, cond_img=None, control=None, scale=1.0):
                emb = self.time_embedding(sin_emb(t, widths[0]))
                if sdxl:
                    ids = sin_emb(time_ids.reshape(-1), cfg["addition_time_embed_dim"])
                    add = torch.cat([pooled, ids.reshape(x.shape[0], -1)], dim=-1)
                    emb = emb + self.add_embedding(add)
                h = self.conv_in(x)
                if self.controlnet:
                    h = h + self.controlnet_cond_embedding(cond_img)
                skips = [h]
                for blk in self.down_blocks:
                    h = blk(h, emb, ctx, skips)
                h = self.mid_block(h, emb, ctx)
                if self.controlnet:
                    down = [z(s) * scale for z, s in zip(self.controlnet_down_blocks, skips)]
                    return down, self.controlnet_mid_block(h) * scale
                if control is not None:  # the published residual injection points
                    down_res, mid_res = control
                    skips = [s + r for s, r in zip(skips, down_res)]
                    h = h + mid_res
                for blk in self.up_blocks:
                    h = blk(h, emb, ctx, skips)
                return self.conv_out(F.silu(self.conv_norm_out(h)))

        return UNetMini(controlnet=ladder is not None)

    def test_parity_sdxl_shape(self) -> None:
        from skrample_tpu.models.import_weights import diffusers_unet

        torch.manual_seed(40)
        ref = self._torch_unet(self.SDXL_CFG).eval()
        unet, params = diffusers_unet((ref.state_dict(), self.SDXL_CFG))
        assert unet.config.pooled_dim == 56 and unet.config.transformer_layers == (0, 1, 2)

        gen = torch.Generator().manual_seed(41)
        x = torch.randn(2, 4, 16, 16, generator=gen)
        t = torch.rand(2, generator=gen) * 1000.0
        ctx = torch.randn(2, 10, 48, generator=gen)
        pooled = torch.randn(2, 56, generator=gen)
        tids = torch.tensor([[512.0, 512.0, 0.0, 0.0, 512.0, 512.0]] * 2)
        with torch.no_grad():
            want = ref(x, t, ctx, pooled, tids).numpy()
        got = unet.apply(
            params,
            jnp.asarray(x.numpy()),
            jnp.asarray(t.numpy()),
            jnp.asarray(ctx.numpy()),
            jnp.asarray(pooled.numpy()),
            jnp.asarray(tids.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_parity_sd15_shape_conv_projections(self) -> None:
        from skrample_tpu.models.import_weights import diffusers_unet

        torch.manual_seed(42)
        ref = self._torch_unet(self.SD15_CFG, linear_proj=False).eval()
        unet, params = diffusers_unet((ref.state_dict(), self.SD15_CFG))
        assert unet.config.pooled_dim == 0 and unet.config.transformer_layers == (1, 1, 1, 0)

        gen = torch.Generator().manual_seed(43)
        x = torch.randn(1, 4, 16, 16, generator=gen)
        ctx = torch.randn(1, 8, 24, generator=gen)
        with torch.no_grad():
            want = ref(x, torch.tensor([500.0]), ctx).numpy()
        got = unet.apply(params, jnp.asarray(x.numpy()), 500.0, jnp.asarray(ctx.numpy()))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    @pytest.mark.parametrize(
        "variant",
        [
            # 4-level SDXL-ish with a trailing plain level (skip bookkeeping stress)
            dict(
                block_out_channels=(16, 32, 32, 64),
                down_block_types=(
                    "CrossAttnDownBlock2D",
                    "CrossAttnDownBlock2D",
                    "DownBlock2D",
                    "CrossAttnDownBlock2D",
                ),
                transformer_layers_per_block=[1, 2, 1, 1],
                attention_head_dim=[2, 4, 2, 4],
            ),
            # 3 resnets per level, repeated widths
            dict(
                block_out_channels=(16, 16, 32),
                down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
                layers_per_block=3,
                transformer_layers_per_block=2,
                attention_head_dim=2,
            ),
        ],
    )
    def test_parity_shape_variants(self, variant: dict) -> None:
        "Mirror parity across skip-bookkeeping edge shapes (4-level, 3-layer)."
        from skrample_tpu.models.import_weights import diffusers_unet

        cfg = {
            **self.SDXL_CFG,
            "cross_attention_dim": 24,
            "projection_class_embeddings_input_dim": 40 + 6 * 8,
            "norm_num_groups": 8,
            **variant,
        }
        torch.manual_seed(sum(cfg["block_out_channels"]))
        ref = self._torch_unet(cfg).eval()
        unet, params = diffusers_unet((ref.state_dict(), cfg))

        gen = torch.Generator().manual_seed(45)
        hw = 16 if len(cfg["block_out_channels"]) < 4 else 32
        x = torch.randn(1, 4, hw, hw, generator=gen)
        ctx = torch.randn(1, 6, 24, generator=gen)
        pooled = torch.randn(1, 40, generator=gen)
        tids = torch.tensor([[float(hw)] * 2 + [0.0, 0.0] + [float(hw)] * 2])
        with torch.no_grad():
            want = ref(x, torch.tensor([321.0]), ctx, pooled, tids).numpy()
        got = unet.apply(
            params,
            jnp.asarray(x.numpy()),
            321.0,
            jnp.asarray(ctx.numpy()),
            jnp.asarray(pooled.numpy()),
            jnp.asarray(tids.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_rejects_unmapped_keys(self) -> None:
        from skrample_tpu.models.import_weights import diffusers_unet

        torch.manual_seed(44)
        sd = dict(self._torch_unet(self.SDXL_CFG).state_dict())
        sd["mid_block.mystery.weight"] = torch.zeros(1)
        with pytest.raises(ValueError, match="unmapped"):
            diffusers_unet((sd, self.SDXL_CFG))

    def test_rejects_exotic_configs(self) -> None:
        from skrample_tpu.models.import_weights import unet_config

        with pytest.raises(ValueError, match="addition_embed_type"):
            unet_config({**self.SDXL_CFG, "addition_embed_type": "image"})
        with pytest.raises(ValueError, match="down_block_types"):
            unet_config({**self.SDXL_CFG, "down_block_types": ("AttnDownBlock2D",) * 3})
        with pytest.raises(ValueError, match="mid_block_type"):
            unet_config({**self.SDXL_CFG, "mid_block_type": "UNetMidBlock2D"})
        with pytest.raises(ValueError, match="up_block_types"):
            unet_config({**self.SDXL_CFG, "up_block_types": ("UpBlock2D",) * 3})

    def test_refiner_time_ids_split(self) -> None:
        "SDXL-refiner-class checkpoints (5 time ids) split pooled correctly."
        from skrample_tpu.models.import_weights import unet_config

        cfg = {**self.SDXL_CFG, "projection_class_embeddings_input_dim": 56 + 5 * 8}
        assert unet_config(cfg, time_ids=5).pooled_dim == 56
        # the default 6-id split would land at the wrong boundary
        assert unet_config(cfg).pooled_dim != 56


@pytest.mark.soak  # torch-mirror importer parity: full tier only
class TestControlNet:
    """ControlNetModel import oracle: the UNet-encoder copy + conditioning
    conv ladder + per-skip 1x1 convs (randomly initialized in the mirror so
    mapping bugs can't hide behind published zero-init), and the residual
    injection points into the base UNet."""

    CFG = {
        **TestCondUNet.SDXL_CFG,
        "conditioning_channels": 3,
        "conditioning_embedding_out_channels": (4, 8),  # one stride-2: pixels at 2x the latent
    }

    def test_parity_and_injection(self) -> None:
        from skrample_tpu.models.import_weights import diffusers_controlnet, diffusers_unet

        torch.manual_seed(80)
        ctrl_ref = TestCondUNet._torch_unet(self.CFG).eval()
        unet_ref = TestCondUNet._torch_unet(TestCondUNet.SDXL_CFG).eval()
        ctrl, ctrl_params = diffusers_controlnet((ctrl_ref.state_dict(), self.CFG))
        unet, unet_params = diffusers_unet((unet_ref.state_dict(), TestCondUNet.SDXL_CFG))

        gen = torch.Generator().manual_seed(81)
        x = torch.randn(2, 4, 16, 16, generator=gen)
        cond_img = torch.randn(2, 3, 32, 32, generator=gen)
        t = torch.rand(2, generator=gen) * 1000.0
        ctx = torch.randn(2, 10, 48, generator=gen)
        pooled = torch.randn(2, 56, generator=gen)
        tids = torch.tensor([[512.0, 512.0, 0.0, 0.0, 512.0, 512.0]] * 2)
        scale = 0.8

        with torch.no_grad():
            want_down, want_mid = ctrl_ref(x, t, ctx, pooled, tids, cond_img=cond_img, scale=scale)
            want_out = unet_ref(x, t, ctx, pooled, tids, control=(want_down, want_mid)).numpy()

        got_down, got_mid = ctrl.apply(
            ctrl_params,
            jnp.asarray(x.numpy()),
            jnp.asarray(t.numpy()),
            jnp.asarray(ctx.numpy()),
            jnp.asarray(cond_img.numpy()),
            jnp.asarray(pooled.numpy()),
            jnp.asarray(tids.numpy()),
            scale=scale,
        )
        assert len(got_down) == len(want_down)
        for got_r, want_r in zip(got_down, want_down):
            np.testing.assert_allclose(np.asarray(got_r), want_r.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_mid), want_mid.numpy(), atol=1e-4)

        got_out = unet.apply(
            unet_params,
            jnp.asarray(x.numpy()),
            jnp.asarray(t.numpy()),
            jnp.asarray(ctx.numpy()),
            jnp.asarray(pooled.numpy()),
            jnp.asarray(tids.numpy()),
            control=(got_down, got_mid),
        )
        np.testing.assert_allclose(np.asarray(got_out), want_out, atol=2e-4)

    def test_rejects_unmapped_keys(self) -> None:
        from skrample_tpu.models.import_weights import diffusers_controlnet

        torch.manual_seed(82)
        sd = dict(TestCondUNet._torch_unet(self.CFG).state_dict())
        sd["controlnet_cond_embedding.mystery.weight"] = torch.zeros(1)
        with pytest.raises(ValueError, match="unmapped"):
            diffusers_controlnet((sd, self.CFG))

    def test_wrong_residual_count_rejected(self) -> None:
        from skrample_tpu.models import CondUNet, CondUNetConfig

        model = CondUNet(
            CondUNetConfig(
                widths=(16, 32),
                layers_per_block=1,
                transformer_layers=(0, 1),
                heads=(2, 2),
                context_dim=24,
                pooled_dim=0,
                groups=8,
                compute_dtype=jnp.float32,
                layout="nchw",
            )
        )
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 4, 16, 16))
        with pytest.raises(ValueError, match="residuals"):
            model.apply(params, x, 500.0, jnp.zeros((1, 6, 24)), control=([jnp.zeros((1, 16, 16, 16))], jnp.zeros((1, 32, 8, 8))))


@pytest.mark.soak  # torch-mirror importer parity: full tier only
class TestFlux:
    """FLUX.1 transformer import oracle.

    Independently written torch mirror of the published FLUX.1 architecture
    (black-forest-labs release / diffusers FluxTransformer2DModel): 3-axis
    RoPE with consecutive-pair rotation, per-head RMS qk-norm, text-first
    joint attention in the double-stream blocks, fused [attn | mlp] output
    projection in the single-stream blocks, guidance embedding.  The mirror
    consumes PACKED latent tokens exactly as the published pipeline packs
    them; the test packs with the published recipe and compares against our
    model's internal patchify."""

    CFG = dict(
        patch_size=1,
        in_channels=16,
        num_layers=2,
        num_single_layers=2,
        attention_head_dim=16,
        num_attention_heads=4,
        joint_attention_dim=32,
        pooled_projection_dim=24,
        guidance_embeds=True,
        axes_dims_rope=(4, 6, 6),
    )

    @classmethod
    def _torch_flux(cls, guidance: bool = True, cfg: dict | None = None):
        import math as _math

        import torch.nn as nn
        import torch.nn.functional as F

        cfg = cfg or cls.CFG
        heads = cfg["num_attention_heads"]
        hd = cfg["attention_head_dim"]
        d = heads * hd
        axes = cfg["axes_dims_rope"]
        ctx_d = cfg["joint_attention_dim"]
        pool_d = cfg["pooled_projection_dim"]

        def ln(x):
            return F.layer_norm(x, (d,), eps=1e-6)

        def rope_tables(ids):  # (N, 3) -> cos/sin (N, hd/2)
            parts = []
            for a, dim_a in enumerate(axes):
                omega = 1.0 / 10000 ** (torch.arange(0, dim_a, 2, dtype=torch.float32) / dim_a)
                parts.append(ids[:, a : a + 1].float() * omega[None])
            ang = torch.cat(parts, dim=-1)
            return torch.cos(ang), torch.sin(ang)

        def apply_rope(x, cos, sin):  # (B, H, N, hd), consecutive pairs
            p = x.float().reshape(*x.shape[:-1], hd // 2, 2)
            x0, x1 = p[..., 0], p[..., 1]
            co, si = cos[None, None], sin[None, None]
            return torch.stack([x0 * co - x1 * si, x0 * si + x1 * co], dim=-1).reshape(x.shape)

        class RMSNorm(nn.Module):
            def __init__(self):
                super().__init__()
                self.weight = nn.Parameter(torch.rand(hd) + 0.5)

            def forward(self, x):
                return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + 1e-6) * self.weight

        class GELUProj(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(d, 4 * d)

            def forward(self, x):
                return F.gelu(self.proj(x), approximate="tanh")

        class FF(nn.Module):
            def __init__(self):
                super().__init__()
                self.net = nn.ModuleList([GELUProj(), nn.Identity(), nn.Linear(4 * d, d)])

            def forward(self, x):
                return self.net[2](self.net[0](x))

        class JointAttn(nn.Module):
            def __init__(self):
                super().__init__()
                for name in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
                    setattr(self, name, nn.Linear(d, d))
                self.to_out = nn.ModuleList([nn.Linear(d, d)])
                self.to_add_out = nn.Linear(d, d)
                self.norm_q = RMSNorm()
                self.norm_k = RMSNorm()
                self.norm_added_q = RMSNorm()
                self.norm_added_k = RMSNorm()

            def forward(self, img, txt, cos, sin):
                B, L = txt.shape[:2]

                def split(x):
                    return x.reshape(B, -1, heads, hd).transpose(1, 2)

                # text FIRST in the joint sequence (the Flux convention)
                q = torch.cat([self.norm_added_q(split(self.add_q_proj(txt))), self.norm_q(split(self.to_q(img)))], dim=2)
                k = torch.cat([self.norm_added_k(split(self.add_k_proj(txt))), self.norm_k(split(self.to_k(img)))], dim=2)
                v = torch.cat([split(self.add_v_proj(txt)), split(self.to_v(img))], dim=2)
                q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
                a = torch.softmax(q @ k.transpose(2, 3) / _math.sqrt(hd), dim=-1)
                o = (a @ v).transpose(1, 2).reshape(B, -1, d)
                return self.to_add_out(o[:, :L]), self.to_out[0](o[:, L:])

        class AdaLinear(nn.Module):
            def __init__(self, n):
                super().__init__()
                self.linear = nn.Linear(d, n * d)

        class DoubleBlock(nn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = AdaLinear(6)
                self.norm1_context = AdaLinear(6)
                self.attn = JointAttn()
                self.ff = FF()
                self.ff_context = FF()

            def forward(self, img, txt, temb, cos, sin):
                sh, sc, g, sh_m, sc_m, g_m = self.norm1.linear(F.silu(temb)).chunk(6, dim=1)
                tsh, tsc, tg, tsh_m, tsc_m, tg_m = self.norm1_context.linear(F.silu(temb)).chunk(6, dim=1)
                txt_attn, img_attn = self.attn(
                    ln(img) * (1 + sc[:, None]) + sh[:, None],
                    ln(txt) * (1 + tsc[:, None]) + tsh[:, None],
                    cos,
                    sin,
                )
                img = img + g[:, None] * img_attn
                img = img + g_m[:, None] * self.ff(ln(img) * (1 + sc_m[:, None]) + sh_m[:, None])
                txt = txt + tg[:, None] * txt_attn
                txt = txt + tg_m[:, None] * self.ff_context(ln(txt) * (1 + tsc_m[:, None]) + tsh_m[:, None])
                return img, txt

        class SingleAttn(nn.Module):
            def __init__(self):
                super().__init__()
                self.to_q = nn.Linear(d, d)
                self.to_k = nn.Linear(d, d)
                self.to_v = nn.Linear(d, d)
                self.norm_q = RMSNorm()
                self.norm_k = RMSNorm()

            def forward(self, x, cos, sin):
                B, N = x.shape[:2]

                def split(t):
                    return t.reshape(B, N, heads, hd).transpose(1, 2)

                q = apply_rope(self.norm_q(split(self.to_q(x))), cos, sin)
                k = apply_rope(self.norm_k(split(self.to_k(x))), cos, sin)
                a = torch.softmax(q @ k.transpose(2, 3) / _math.sqrt(hd), dim=-1)
                return (a @ split(self.to_v(x))).transpose(1, 2).reshape(B, N, d)

        class SingleBlock(nn.Module):
            def __init__(self):
                super().__init__()
                self.norm = AdaLinear(3)
                self.attn = SingleAttn()
                self.proj_mlp = nn.Linear(d, 4 * d)
                self.proj_out = nn.Linear(5 * d, d)

            def forward(self, x, temb, cos, sin):
                sh, sc, g = self.norm.linear(F.silu(temb)).chunk(3, dim=1)
                h = ln(x) * (1 + sc[:, None]) + sh[:, None]
                attn = self.attn(h, cos, sin)
                mlp = F.gelu(self.proj_mlp(h), approximate="tanh")
                return x + g[:, None] * self.proj_out(torch.cat([attn, mlp], dim=2))

        class TwoLayer(nn.Module):
            def __init__(self, d_in):
                super().__init__()
                self.linear_1 = nn.Linear(d_in, d)
                self.linear_2 = nn.Linear(d, d)

            def forward(self, x):
                return self.linear_2(F.silu(self.linear_1(x)))

        class TimeText(nn.Module):
            def __init__(self):
                super().__init__()
                self.timestep_embedder = TwoLayer(256)
                self.text_embedder = TwoLayer(pool_d)
                if guidance:
                    self.guidance_embedder = TwoLayer(256)

        class FluxMini(nn.Module):
            def __init__(self):
                super().__init__()
                self.x_embedder = nn.Linear(16, d)
                self.context_embedder = nn.Linear(ctx_d, d)
                self.time_text_embed = TimeText()
                self.transformer_blocks = nn.ModuleList([DoubleBlock() for _ in range(cfg["num_layers"])])
                self.single_transformer_blocks = nn.ModuleList(
                    [SingleBlock() for _ in range(cfg["num_single_layers"])]
                )
                self.norm_out = AdaLinear(2)
                self.proj_out = nn.Linear(d, 16)

            def forward(self, packed, context, pooled, t, g, txt_ids, img_ids):
                img = self.x_embedder(packed)
                txt = self.context_embedder(context)
                cos, sin = rope_tables(torch.cat([txt_ids, img_ids], dim=0))

                freqs = torch.exp(-_math.log(10000.0) * torch.arange(128, dtype=torch.float32) / 128.0)
                emb = lambda v: torch.cat(  # noqa: E731
                    [torch.cos(v.float()[:, None] * freqs[None]), torch.sin(v.float()[:, None] * freqs[None])],
                    dim=-1,
                )
                temb = self.time_text_embed.timestep_embedder(emb(t))
                if guidance:
                    temb = temb + self.time_text_embed.guidance_embedder(emb(g * 1000.0))
                temb = temb + self.time_text_embed.text_embedder(pooled)

                for blk in self.transformer_blocks:
                    img, txt = blk(img, txt, temb, cos, sin)
                h = torch.cat([txt, img], dim=1)
                for blk in self.single_transformer_blocks:
                    h = blk(h, temb, cos, sin)
                img = h[:, txt.shape[1] :]
                sc, sh = self.norm_out.linear(F.silu(temb)).chunk(2, dim=1)
                return self.proj_out(ln(img) * (1 + sc[:, None]) + sh[:, None])

        return FluxMini()

    @staticmethod
    def _pack(lat):  # the published pipeline packing
        B, C, H, W = lat.shape
        lat = lat.view(B, C, H // 2, 2, W // 2, 2).permute(0, 2, 4, 1, 3, 5)
        return lat.reshape(B, (H // 2) * (W // 2), C * 4)

    @staticmethod
    def _unpack(tokens, C, H, W):
        B = tokens.shape[0]
        t = tokens.view(B, H // 2, W // 2, C, 2, 2).permute(0, 3, 1, 4, 2, 5)
        return t.reshape(B, C, H, W)

    def test_parity(self) -> None:
        from skrample_tpu.models.import_weights import flux_transformer

        torch.manual_seed(23)
        ref = self._torch_flux().eval()
        flux, params = flux_transformer((ref.state_dict(), self.CFG))
        assert flux.config.channels == 4 and flux.config.guidance

        gen = torch.Generator().manual_seed(24)
        H = W = 8
        x = torch.randn(2, 4, H, W, generator=gen)
        t = torch.rand(2, generator=gen) * 1000.0
        ctx = torch.randn(2, 12, 32, generator=gen)
        pooled = torch.randn(2, 24, generator=gen)

        gh, gw = H // 2, W // 2
        img_ids = torch.zeros(gh * gw, 3)
        img_ids[:, 1] = torch.arange(gh).repeat_interleave(gw)
        img_ids[:, 2] = torch.arange(gw).repeat(gh)
        with torch.no_grad():
            out_tokens = ref(self._pack(x), ctx, pooled, t, torch.full((2,), 3.5), torch.zeros(12, 3), img_ids)
            want = self._unpack(out_tokens, 4, H, W).numpy()
        got = flux.apply(
            params,
            jnp.asarray(x.numpy()),
            jnp.asarray(t.numpy()),
            jnp.asarray(ctx.numpy()),
            jnp.asarray(pooled.numpy()),
            guidance=3.5,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    def test_parity_schnell_no_guidance(self) -> None:
        from skrample_tpu.models.import_weights import flux_transformer

        torch.manual_seed(25)
        ref = self._torch_flux(guidance=False).eval()
        cfg = {**self.CFG, "guidance_embeds": False}
        flux, params = flux_transformer((ref.state_dict(), cfg))
        assert not flux.config.guidance

        gen = torch.Generator().manual_seed(26)
        x = torch.randn(1, 4, 8, 8, generator=gen)
        ctx = torch.randn(1, 12, 32, generator=gen)
        pooled = torch.randn(1, 24, generator=gen)
        img_ids = torch.zeros(16, 3)
        img_ids[:, 1] = torch.arange(4).repeat_interleave(4)
        img_ids[:, 2] = torch.arange(4).repeat(4)
        with torch.no_grad():
            out = ref(self._pack(x), ctx, pooled, torch.tensor([500.0]), None, torch.zeros(12, 3), img_ids)
            want = self._unpack(out, 4, 8, 8).numpy()
        got = flux.apply(
            params, jnp.asarray(x.numpy()), 500.0, jnp.asarray(ctx.numpy()), jnp.asarray(pooled.numpy())
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    def test_rejects_unmapped_keys(self) -> None:
        from skrample_tpu.models.import_weights import flux_transformer

        torch.manual_seed(27)
        sd = dict(self._torch_flux().state_dict())
        sd["single_transformer_blocks.0.mystery.weight"] = torch.zeros(1)
        with pytest.raises(ValueError, match="unmapped"):
            flux_transformer((sd, self.CFG))

    def test_parity_depth_variant(self) -> None:
        "Asymmetric double/single depths exercise the block-list mapping."
        from skrample_tpu.models.import_weights import flux_transformer

        cfg = {**self.CFG, "num_layers": 3, "num_single_layers": 1}
        torch.manual_seed(28)
        ref = self._torch_flux(cfg=cfg).eval()
        flux, params = flux_transformer((ref.state_dict(), cfg))
        assert flux.config.depth == 3 and flux.config.single_depth == 1

        gen = torch.Generator().manual_seed(29)
        x = torch.randn(1, 4, 8, 8, generator=gen)
        ctx = torch.randn(1, 12, 32, generator=gen)
        pooled = torch.randn(1, 24, generator=gen)
        img_ids = torch.zeros(16, 3)
        img_ids[:, 1] = torch.arange(4).repeat_interleave(4)
        img_ids[:, 2] = torch.arange(4).repeat(4)
        with torch.no_grad():
            out = ref(self._pack(x), ctx, pooled, torch.tensor([250.0]), torch.full((1,), 2.0), torch.zeros(12, 3), img_ids)
            want = self._unpack(out, 4, 8, 8).numpy()
        got = flux.apply(
            params, jnp.asarray(x.numpy()), 250.0, jnp.asarray(ctx.numpy()), jnp.asarray(pooled.numpy()), guidance=2.0
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    def test_rejects_bad_rope_axes(self) -> None:
        from skrample_tpu.models.import_weights import flux_config

        with pytest.raises(ValueError, match="axes_dims_rope"):
            flux_config({**self.CFG, "axes_dims_rope": (4, 4, 4)})


@pytest.mark.soak  # torch-mirror importer parity: full tier only
class TestLoRA:
    """State-dict-level LoRA merging: architecture-agnostic because it runs
    BEFORE import (W' = W + scale * (alpha/r) * B @ A on diffusers keys),
    so fused qkv layouts never need LoRA-aware slicing."""

    def _lora_pair(self, rng, out_dim, in_dim, r=4):
        return rng.normal(size=(r, in_dim)).astype(np.float32), rng.normal(size=(out_dim, r)).astype(
            np.float32
        )

    def test_merge_then_import_equals_manual_merge(self) -> None:
        from skrample_tpu.models.import_weights import flux_transformer, merge_lora

        torch.manual_seed(70)
        ref = TestFlux._torch_flux().eval()
        base = {k: v.numpy().copy() for k, v in ref.state_dict().items()}
        rng = np.random.default_rng(0)

        d = 64
        a_q, b_q = self._lora_pair(rng, d, d)
        a_m, b_m = self._lora_pair(rng, 4 * d, d)
        lora = {
            # PEFT naming, with a namespacing prefix
            "transformer.transformer_blocks.0.attn.to_q.lora_A.weight": torch.as_tensor(a_q),
            "transformer.transformer_blocks.0.attn.to_q.lora_B.weight": torch.as_tensor(b_q),
            # legacy naming + kohya alpha on a single-stream mlp
            "transformer.single_transformer_blocks.1.proj_mlp.lora.down.weight": torch.as_tensor(a_m),
            "transformer.single_transformer_blocks.1.proj_mlp.lora.up.weight": torch.as_tensor(b_m),
            "transformer.single_transformer_blocks.1.proj_mlp.alpha": torch.tensor(2.0),
        }
        scale = 0.7
        merged = merge_lora(base, lora, scale=scale, prefix="transformer")

        manual = {k: v.copy() for k, v in base.items()}
        manual["transformer_blocks.0.attn.to_q.weight"] += scale * (b_q @ a_q)  # alpha defaults to r
        manual["single_transformer_blocks.1.proj_mlp.weight"] += scale * (2.0 / 4.0) * (b_m @ a_m)

        _, p_merged = flux_transformer((merged, TestFlux.CFG))
        _, p_manual = flux_transformer((manual, TestFlux.CFG))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
            p_merged,
            p_manual,
        )
        # and the adapter actually changed the imported weights
        _, p_base = flux_transformer((base, TestFlux.CFG))
        q_slice = np.asarray(p_merged["double"][0]["img"]["qkv"]["w"][:, :d])
        assert not np.allclose(q_slice, np.asarray(p_base["double"][0]["img"]["qkv"]["w"][:, :d]))

    def test_conv_1x1_adapter(self) -> None:
        from skrample_tpu.models.import_weights import merge_lora

        torch.manual_seed(71)
        base = {"proj.weight": np.zeros((8, 6, 1, 1), np.float32)}
        rng = np.random.default_rng(1)
        a, b = self._lora_pair(rng, 8, 6, r=2)
        merged = merge_lora(
            base,
            {
                "proj.lora_A.weight": torch.as_tensor(a[:, :, None, None]),
                "proj.lora_B.weight": torch.as_tensor(b[:, :, None, None]),
            },
        )
        np.testing.assert_allclose(merged["proj.weight"][:, :, 0, 0], b @ a, atol=1e-6)

    def test_kohya_underscored_paths(self) -> None:
        "civitai-style keys: underscored module paths resolve against the base."
        from skrample_tpu.models.import_weights import merge_lora

        base = {"down_blocks.0.attentions.0.to_q.weight": np.zeros((8, 8), np.float32)}
        rng = np.random.default_rng(2)
        a, b = self._lora_pair(rng, 8, 8, r=2)
        merged = merge_lora(
            base,
            {
                "lora_unet_down_blocks_0_attentions_0_to_q.lora_down.weight": torch.as_tensor(a),
                "lora_unet_down_blocks_0_attentions_0_to_q.lora_up.weight": torch.as_tensor(b),
                "lora_unet_down_blocks_0_attentions_0_to_q.alpha": torch.tensor(1.0),
            },
            scale=2.0,
            prefix="lora_unet",
        )
        np.testing.assert_allclose(
            merged["down_blocks.0.attentions.0.to_q.weight"], 2.0 * (1.0 / 2.0) * (b @ a), atol=1e-6
        )

    def test_rejects_bad_lora(self) -> None:
        from skrample_tpu.models.import_weights import merge_lora

        base = {"lin.weight": np.zeros((4, 4), np.float32)}
        with pytest.raises(ValueError, match="unrecognized"):
            merge_lora(base, {"lin.mystery.weight": np.zeros((2, 4), np.float32)})
        with pytest.raises(ValueError, match="incomplete"):
            merge_lora(base, {"lin.lora_A.weight": np.zeros((2, 4), np.float32)})
        with pytest.raises(ValueError, match="doesn't have"):
            merge_lora(
                base,
                {
                    "other.lora_A.weight": np.zeros((2, 4), np.float32),
                    "other.lora_B.weight": np.zeros((4, 2), np.float32),
                },
            )


@pytest.mark.soak  # torch-mirror importer parity: full tier only
class TestT5:
    T5_CFG = dict(
        vocab_size=120,
        d_model=64,
        d_kv=16,
        num_heads=4,
        d_ff=128,
        num_layers=3,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
    )

    def _parity(self, proj: str) -> None:
        from transformers import T5Config, T5EncoderModel

        from skrample_tpu.models.import_weights import t5_encoder

        torch.manual_seed(4)
        hf = T5EncoderModel(T5Config(**self.T5_CFG, feed_forward_proj=proj)).eval()
        enc, params = t5_encoder(hf)

        ids = np.asarray([[3, 14, 15, 92, 6, 53, 1, 0], [27, 18, 28, 1, 0, 0, 0, 0]], np.int64)
        with torch.no_grad():
            ref = hf(input_ids=torch.as_tensor(ids)).last_hidden_state.numpy()
        ours = np.asarray(enc.apply(params, jnp.asarray(ids, jnp.int32)))
        # NOTE: no attention_mask on either side — full bidirectional attention
        np.testing.assert_allclose(ours, ref, atol=3e-5)

    def test_gated_gelu_parity(self) -> None:
        "T5 v1.1 (the SD3/Flux tower family): gated-gelu FF."
        self._parity("gated-gelu")

    def test_relu_parity(self) -> None:
        "Original T5: relu FF."
        self._parity("relu")

    def test_spec_tree_matches(self) -> None:
        from transformers import T5Config, T5EncoderModel

        from skrample_tpu.models.import_weights import t5_encoder

        hf = T5EncoderModel(T5Config(**self.T5_CFG, feed_forward_proj="gated-gelu")).eval()
        enc, params = t5_encoder(hf)
        jax.tree.map(lambda w, s: None, params, enc.param_spec())

    def test_random_init_runs_and_feeds_mmdit(self) -> None:
        "Framework-native use without a checkpoint: init + MMDiT context."
        from skrample_tpu.models import MMDiT, MMDiTConfig, T5Encoder, T5EncoderConfig

        enc = T5Encoder(T5EncoderConfig(dim=64, head_dim=16, heads=4, ff_dim=128, depth=2, compute_dtype=jnp.float32))
        params = enc.init(jax.random.PRNGKey(0))
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 16)), jnp.int32)
        feats = enc.apply(params, ids)
        assert feats.shape == (2, 16, 64) and bool(jnp.isfinite(feats).all())

        mmdit = MMDiT(MMDiTConfig(dim=64, depth=1, heads=2, context_dim=64, compute_dtype=jnp.float32, attention="full"))
        mp = mmdit.init(jax.random.PRNGKey(1))
        out = mmdit.apply(mp, jnp.ones((2, 4, 8, 8)), jnp.asarray([0.5, 0.5]), feats)
        assert out.shape == (2, 4, 8, 8)
