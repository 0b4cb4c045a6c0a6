from videosd_tpu.models.clip_text import (
    CLIP_PRESETS,
    CLIPTextConfig,
    clip_text_apply,
    clip_text_init,
)
from videosd_tpu.models.controlnet import controlnet_apply, controlnet_init
from videosd_tpu.models.taesd import TAESDConfig, taesd_decode, taesd_encode, taesd_init
from videosd_tpu.models.unet import (
    UNET_PRESETS,
    UNetConfig,
    precat_attention_weights,
    unet_apply,
    unet_init,
)
from videosd_tpu.models.vae import VAEConfig, vae_decode, vae_encode, vae_init

__all__ = [
    "CLIP_PRESETS",
    "CLIPTextConfig",
    "clip_text_apply",
    "clip_text_init",
    "controlnet_apply",
    "controlnet_init",
    "TAESDConfig",
    "taesd_decode",
    "taesd_encode",
    "taesd_init",
    "UNET_PRESETS",
    "UNetConfig",
    "unet_apply",
    "unet_init",
    "VAEConfig",
    "vae_decode",
    "vae_encode",
    "vae_init",
]
