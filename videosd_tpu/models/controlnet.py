"""ControlNet in NHWC JAX, sharing the UNet's block library.

Architecture the reference loads via diffusers
(``lllyasviel/control_v11p_sd15_canny``, diffusert/videopipeline.py:51-53;
called per denoise step at lcm_controlnet.py:558-566 in guess_mode with a
conditioning scale): the UNet's encoder + mid with
1) a conditioning embedder that maps the [0,1] RGB control image through a
   small conv stack into the latent grid, added after conv_in, and
2) zero-initialized 1x1 "controlnet blocks" on every skip output + mid.

Output: 12 down residuals + 1 mid residual, each scaled by
``conditioning_scale`` (traced — live slider, no recompile).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from videosd_tpu.models.layers import Params, conv2d, conv2d_init, linear_init, silu
from videosd_tpu.models.unet import (
    UNetConfig,
    compute_add_embedding,
    compute_time_embedding,
    down_block_apply,
    down_block_init,
    mid_block_apply,
    mid_block_init,
)

__all__ = ["controlnet_init", "controlnet_apply"]

_COND_CHANNELS = (16, 32, 96, 256)


def _zero_conv_init(in_ch: int, out_ch: int) -> Params:
    return {
        "kernel": jnp.zeros((1, 1, in_ch, out_ch), jnp.float32),
        "bias": jnp.zeros((out_ch,), jnp.float32),
    }


def controlnet_init(key, cfg: UNetConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 12)
    ch0 = cfg.block_out_channels[0]
    ted = cfg.time_embed_dim

    p: Params = {"conv_in": conv2d_init(ks[0], cfg.in_channels, ch0)}
    p["time_embedding"] = {
        "linear_1": linear_init(ks[1], ch0, ted),
        "linear_2": linear_init(ks[2], ted, ted),
    }
    if cfg.time_cond_proj_dim is not None:
        p["time_embedding"]["cond_proj"] = linear_init(
            ks[3], cfg.time_cond_proj_dim, ch0, bias=False
        )
    if cfg.addition_embed_type == "text_time":
        # SDXL-family ControlNet: the encoder copies the UNet encoder, so it
        # carries the same "text_time" micro-conditioning embedder (pooled
        # text embeds + 6 time_ids -> added to temb)
        add_ks = jax.random.split(ks[7], 2)
        p["add_embedding"] = {
            "linear_1": linear_init(
                add_ks[0], cfg.projection_class_embeddings_input_dim, ted
            ),
            "linear_2": linear_init(add_ks[1], ted, ted),
        }

    # conditioning embedder: RGB -> ch0 feature map at latent resolution
    cond_ks = jax.random.split(ks[4], len(_COND_CHANNELS) * 2)
    cond: Params = {"conv_in": conv2d_init(cond_ks[0], 3, _COND_CHANNELS[0])}
    blocks = []
    for i in range(len(_COND_CHANNELS) - 1):
        blocks.append(conv2d_init(cond_ks[2 * i + 1], _COND_CHANNELS[i], _COND_CHANNELS[i]))
        blocks.append(
            conv2d_init(cond_ks[2 * i + 2], _COND_CHANNELS[i], _COND_CHANNELS[i + 1])
        )
    cond["blocks"] = blocks
    # zero-initialized 3x3 conv_out
    cond["conv_out"] = {
        "kernel": jnp.zeros((3, 3, _COND_CHANNELS[-1], ch0), jnp.float32),
        "bias": jnp.zeros((ch0,), jnp.float32),
    }
    p["controlnet_cond_embedding"] = cond

    n_blocks = len(cfg.block_out_channels)
    down_keys = jax.random.split(ks[5], n_blocks)
    p["down_blocks"] = []
    zero_convs = [_zero_conv_init(ch0, ch0)]
    ch = ch0
    for i, out_ch in enumerate(cfg.block_out_channels):
        p["down_blocks"].append(
            down_block_init(down_keys[i], cfg, i, ch, out_ch, final=(i == n_blocks - 1))
        )
        for _ in range(cfg.layers_per_block):
            zero_convs.append(_zero_conv_init(out_ch, out_ch))
        if i != n_blocks - 1:
            zero_convs.append(_zero_conv_init(out_ch, out_ch))
        ch = out_ch
    p["controlnet_down_blocks"] = zero_convs

    p["mid_block"] = mid_block_init(ks[6], cfg)
    p["controlnet_mid_block"] = _zero_conv_init(ch, ch)

    if dtype != jnp.float32:
        p = jax.tree.map(lambda a: a.astype(dtype), p)
    return p


def controlnet_apply(
    params: Params,
    cfg: UNetConfig,
    sample,
    timesteps,
    encoder_hidden_states,
    controlnet_cond,
    *,
    conditioning_scale=1.0,
    timestep_cond=None,
    added_cond_kwargs=None,
    guess_mode: bool = True,
):
    """Returns (down_block_res_samples: list[13->12], mid_res).

    controlnet_cond: [B,H,W,3] control image in [0,1] at pixel resolution.
    conditioning_scale: traced scalar (reference slider `controlnet_scale`,
    applied at lcm_controlnet.py:558-566 via diffusers' output scaling).
    guess_mode: the reference calls with guess_mode=True
    (lcm_controlnet.py:402, :558-566); diffusers then ramps the residual
    scales by logspace(-1, 0) from the shallowest skip to the mid block, so
    deep features dominate — reproduced here with a static ramp.
    """
    temb = compute_time_embedding(params, cfg, timesteps, timestep_cond)
    if cfg.addition_embed_type == "text_time":
        aek = added_cond_kwargs or {}
        temb = temb + compute_add_embedding(
            params, cfg, aek["text_embeds"], aek["time_ids"]
        )
    context = encoder_hidden_states.astype(sample.dtype)

    x = conv2d(params["conv_in"], sample)

    ce = params["controlnet_cond_embedding"]
    c = silu(conv2d(ce["conv_in"], controlnet_cond.astype(sample.dtype)))
    for i in range(0, len(ce["blocks"]), 2):
        c = silu(conv2d(ce["blocks"][i], c))
        c = silu(conv2d(ce["blocks"][i + 1], c, stride=2, padding=[(1, 1), (1, 1)]))
    c = conv2d(ce["conv_out"], c)
    x = x + c

    down_res: list = [x]
    for i, blk in enumerate(params["down_blocks"]):
        x, res = down_block_apply(blk, cfg, i, x, temb, context)
        down_res.extend(res)

    x = mid_block_apply(params["mid_block"], cfg, x, temb, context)

    # scalar or per-batch [B] scale -> broadcastable over NHWC
    scale = jnp.asarray(conditioning_scale, jnp.float32)
    scale = jnp.reshape(scale, scale.shape + (1,) * (x.ndim - scale.ndim)).astype(
        x.dtype
    )
    n_out = len(down_res) + 1
    if guess_mode:
        # diffusers guess-mode ramp: logspace(-1, 0, n_outputs)
        ramp = np.logspace(-1, 0, n_out).astype(np.float32)
    else:
        ramp = np.ones((n_out,), np.float32)
    out_down = [
        conv2d(zc, r, padding=0) * (scale * float(ramp[i]))
        for i, (zc, r) in enumerate(zip(params["controlnet_down_blocks"], down_res))
    ]
    out_mid = conv2d(params["controlnet_mid_block"], x, padding=0) * (
        scale * float(ramp[-1])
    )
    return out_down, out_mid
