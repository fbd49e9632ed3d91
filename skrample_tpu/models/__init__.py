"""Reference diffusion models for end-to-end runs, benchmarks, and the
multi-chip dry runs.  The sampling framework itself is model-agnostic — any
``(x, t, sigma, alpha) -> prediction`` closure works."""

from .checkpoint import TrainCheckpointer, load_params, save_params
from .controlnet import ControlNet, ControlNetConfig
from .dit import DiT, DiTConfig
from .ema import ema_decay_schedule, ema_init, ema_update
from .flux import Flux, FluxConfig
from .flux_stack import FluxStack
# NOTE: the t5 loaders stay at models.import_weights.{t5_config,t5_encoder} —
# re-exporting the function here would shadow the .t5_encoder submodule name
from .import_weights import (
    clip_text_config,
    clip_text_encoder,
    diffusers_controlnet,
    diffusers_unet,
    diffusers_vae,
    flux_transformer,
    merge_lora,
    sd3_mmdit,
)
from .lora import lora_init, lora_merge, lora_param_count
from .mmdit import MMDiT, MMDiTConfig
from .sd3 import SD3Stack
from .sdxl import SDXLStack
from .t5_encoder import T5Encoder, T5EncoderConfig
from .text_encoder import ByteTokenizer, TextEncoder, TextEncoderConfig
from .tokenizers import CLIPBPETokenizer, UnigramTokenizer
from .unet import UNet, UNetConfig
from .unet_cond import CondUNet, CondUNetConfig
from .vae import VAE, VAEConfig
from .video_dit import VideoDiT, VideoDiTConfig
from .video_vae import VideoVAE, VideoVAEConfig

__all__ = [
    "ByteTokenizer",
    "CLIPBPETokenizer",
    "UnigramTokenizer",
    "CondUNet",
    "CondUNetConfig",
    "ControlNet",
    "ControlNetConfig",
    "DiT",
    "DiTConfig",
    "Flux",
    "FluxConfig",
    "FluxStack",
    "MMDiT",
    "MMDiTConfig",
    "SD3Stack",
    "SDXLStack",
    "T5Encoder",
    "T5EncoderConfig",
    "TextEncoder",
    "TextEncoderConfig",
    "TrainCheckpointer",
    "UNet",
    "UNetConfig",
    "VAE",
    "VAEConfig",
    "VideoDiT",
    "VideoDiTConfig",
    "VideoVAE",
    "VideoVAEConfig",
    "clip_text_config",
    "clip_text_encoder",
    "diffusers_controlnet",
    "diffusers_unet",
    "diffusers_vae",
    "ema_decay_schedule",
    "ema_init",
    "ema_update",
    "flux_transformer",
    "load_params",
    "lora_init",
    "lora_merge",
    "lora_param_count",
    "merge_lora",
    "save_params",
    "sd3_mmdit",
]
