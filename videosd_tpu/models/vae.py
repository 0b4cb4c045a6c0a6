"""AutoencoderKL (full SD VAE) in NHWC JAX.

The parity/fidelity VAE (BASELINE config 1 compares against diffusers fp32
with the stock VAE; the reference's pipelines construct it before swapping
in TAESD, diffusert/videopipeline.py:57-69).  SD1.5 config: 4 down stages
(128,256,512,512), 2 resnets per stage, one mid self-attention block;
``scaling_factor`` 0.18215 applied by the pipeline, not the model
(lcm_controlnet.py:300 / :594).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from videosd_tpu.models.layers import (
    Params,
    attention,
    conv2d,
    conv2d_init,
    group_norm,
    group_norm_init,
    linear,
    linear_init,
    silu,
    upsample_nearest2d,
)

__all__ = ["VAEConfig", "vae_init", "vae_encode", "vae_decode"]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


def _res_init(key, cfg: VAEConfig, in_ch: int, out_ch: int) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": group_norm_init(in_ch),
        "conv1": conv2d_init(ks[0], in_ch, out_ch),
        "norm2": group_norm_init(out_ch),
        "conv2": conv2d_init(ks[1], out_ch, out_ch),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = conv2d_init(ks[2], in_ch, out_ch, kernel=1)
    return p


def _res_apply(p: Params, cfg: VAEConfig, x):
    g = cfg.norm_num_groups
    h = silu(group_norm(p["norm1"], x, groups=g, eps=1e-6))
    h = conv2d(p["conv1"], h)
    h = silu(group_norm(p["norm2"], h, groups=g, eps=1e-6))
    h = conv2d(p["conv2"], h)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _attn_init(key, ch: int) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "group_norm": group_norm_init(ch),
        "to_q": linear_init(ks[0], ch, ch),
        "to_k": linear_init(ks[1], ch, ch),
        "to_v": linear_init(ks[2], ch, ch),
        "to_out": linear_init(ks[3], ch, ch),
    }


def _attn_apply(p: Params, cfg: VAEConfig, x):
    b, h, w, c = x.shape
    res = x
    y = group_norm(p["group_norm"], x, groups=cfg.norm_num_groups, eps=1e-6)
    y = y.reshape(b, h * w, c)
    q, k, v = linear(p["to_q"], y), linear(p["to_k"], y), linear(p["to_v"], y)
    y = attention(q, k, v, num_heads=1)
    y = linear(p["to_out"], y).reshape(b, h, w, c)
    return res + y


def vae_init(key, cfg: VAEConfig = VAEConfig(), dtype=jnp.float32) -> Params:
    n = len(cfg.block_out_channels)
    ks = jax.random.split(key, 2 * n * (cfg.layers_per_block + 2) + 16)
    ki = iter(range(len(ks)))
    ch0 = cfg.block_out_channels[0]
    chN = cfg.block_out_channels[-1]

    enc: Params = {"conv_in": conv2d_init(ks[next(ki)], 3, ch0), "down_blocks": []}
    ch = ch0
    for i, out_ch in enumerate(cfg.block_out_channels):
        blk = {
            "resnets": [
                _res_init(ks[next(ki)], cfg, ch if j == 0 else out_ch, out_ch)
                for j in range(cfg.layers_per_block)
            ]
        }
        if i != n - 1:
            blk["downsamplers"] = [{"conv": conv2d_init(ks[next(ki)], out_ch, out_ch)}]
        enc["down_blocks"].append(blk)
        ch = out_ch
    enc["mid"] = {
        "resnets": [_res_init(ks[next(ki)], cfg, chN, chN), _res_init(ks[next(ki)], cfg, chN, chN)],
        "attentions": [_attn_init(ks[next(ki)], chN)],
    }
    enc["conv_norm_out"] = group_norm_init(chN)
    enc["conv_out"] = conv2d_init(ks[next(ki)], chN, 2 * cfg.latent_channels)
    # diffusers AutoencoderKL quant conv (1x1 on mean+logvar)
    enc["quant_conv"] = conv2d_init(
        ks[next(ki)], 2 * cfg.latent_channels, 2 * cfg.latent_channels, kernel=1
    )

    dec: Params = {
        "post_quant_conv": conv2d_init(
            ks[next(ki)], cfg.latent_channels, cfg.latent_channels, kernel=1
        ),
        "conv_in": conv2d_init(ks[next(ki)], cfg.latent_channels, chN),
        "mid": {
            "resnets": [
                _res_init(ks[next(ki)], cfg, chN, chN),
                _res_init(ks[next(ki)], cfg, chN, chN),
            ],
            "attentions": [_attn_init(ks[next(ki)], chN)],
        },
        "up_blocks": [],
    }
    rev = list(reversed(cfg.block_out_channels))
    ch = chN
    for i, out_ch in enumerate(rev):
        blk = {
            "resnets": [
                _res_init(ks[next(ki)], cfg, ch if j == 0 else out_ch, out_ch)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if i != n - 1:
            blk["upsamplers"] = [{"conv": conv2d_init(ks[next(ki)], out_ch, out_ch)}]
        dec["up_blocks"].append(blk)
        ch = out_ch
    dec["conv_norm_out"] = group_norm_init(ch0)
    dec["conv_out"] = conv2d_init(ks[next(ki)], ch0, 3)

    p = {"encoder": enc, "decoder": dec}
    if dtype != jnp.float32:
        p = jax.tree.map(lambda a: a.astype(dtype), p)
    return p


def vae_encode(params: Params, x, cfg: VAEConfig = VAEConfig(), *, key=None, sample=False):
    """[B,H,W,3] in [-1,1] -> latents [B,H/8,W/8,4] (mode or sample).

    The reference samples the posterior with its per-frame generator
    (``retrieve_latents``, lcm_controlnet.py:55-61 — "sample" mode);
    pass ``sample=True`` with a key to match, or take the mode (default,
    deterministic, what most realtime deployments want).
    Scaling by ``cfg.scaling_factor`` is the caller's job, as in diffusers.
    """
    enc = params["encoder"]
    h = conv2d(enc["conv_in"], x)
    for blk in enc["down_blocks"]:
        for rn in blk["resnets"]:
            h = _res_apply(rn, cfg, h)
        if "downsamplers" in blk:
            h = conv2d(
                blk["downsamplers"][0]["conv"], h, stride=2, padding=[(0, 1), (0, 1)]
            )
    h = _res_apply(enc["mid"]["resnets"][0], cfg, h)
    h = _attn_apply(enc["mid"]["attentions"][0], cfg, h)
    h = _res_apply(enc["mid"]["resnets"][1], cfg, h)
    h = silu(group_norm(enc["conv_norm_out"], h, groups=cfg.norm_num_groups, eps=1e-6))
    h = conv2d(enc["conv_out"], h)
    h = conv2d(enc["quant_conv"], h, padding=0)
    mean, logvar = jnp.split(h, 2, axis=-1)
    if sample:
        if key is None:
            raise ValueError("vae_encode(sample=True) requires key")
        logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        noise = jax.random.normal(key, mean.shape, jnp.float32)
        return (mean.astype(jnp.float32) + std * noise).astype(x.dtype)
    return mean


def vae_decode(params: Params, z, cfg: VAEConfig = VAEConfig()):
    """latents [B,h,w,4] -> [B,8h,8w,3] in [-1,1].  Unscaled input."""
    dec = params["decoder"]
    h = conv2d(dec["post_quant_conv"], z, padding=0)
    h = conv2d(dec["conv_in"], h)
    h = _res_apply(dec["mid"]["resnets"][0], cfg, h)
    h = _attn_apply(dec["mid"]["attentions"][0], cfg, h)
    h = _res_apply(dec["mid"]["resnets"][1], cfg, h)
    for blk in dec["up_blocks"]:
        for rn in blk["resnets"]:
            h = _res_apply(rn, cfg, h)
        if "upsamplers" in blk:
            h = upsample_nearest2d(h)
            h = conv2d(blk["upsamplers"][0]["conv"], h)
    h = silu(group_norm(dec["conv_norm_out"], h, groups=cfg.norm_num_groups, eps=1e-6))
    return conv2d(dec["conv_out"], h)
