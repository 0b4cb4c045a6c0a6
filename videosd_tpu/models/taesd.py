"""TAESD — tiny autoencoder for Stable Diffusion latents, NHWC JAX.

The reference swaps the full KL-VAE for ``madebyollin/taesd``
(diffusert/videopipeline.py:67-69) so that per-frame encode+decode costs a
few conv layers instead of the full VAE.  Architecture re-derived from the
public TAESD design: stacks of 3-conv residual ReLU blocks with stride-2
convs (encoder) / nearest-2x upsamples (decoder); the decoder front-end
soft-clamps latents with ``tanh(x/3)*3``.

``scaling_factor`` is 1.0 (diffusers AutoencoderTiny config), so pipeline
code can scale latents uniformly for any VAE flavor.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

import functools

from videosd_tpu.models.layers import Params, conv2d_init, upsample_nearest2d
from videosd_tpu.models.layers import conv2d as _conv2d

__all__ = ["TAESDConfig", "taesd_init", "taesd_encode", "taesd_decode"]

# TAESD works at PIXEL resolution (512x512x64 activations = 32 MB bf16);
# fp32 conv outputs (layers.conv2d default) materialize 64 MB per conv
# before converting back — profiled as the dominant add_convert/copy cost
# outside the UNet.  In the UNet the fp32 epilogue measured FASTER (layout
# effects, see PERF.md), so compute-dtype outputs stay TAESD-local.  The
# MXU still accumulates fp32 internally for bf16 operands.
conv2d = functools.partial(_conv2d, f32_out=False)


@dataclasses.dataclass(frozen=True)
class TAESDConfig:
    latent_channels: int = 4
    hidden: int = 64
    num_stages: int = 3  # number of 2x down/up stages
    blocks_per_stage: int = 3
    scaling_factor: float = 1.0
    # Evaluate the residual blocks in pixel-PAIR-packed layout: [H, W, C]
    # viewed as [H, W/2, 2C] (a free contiguous reshape in NHWC), with the
    # 3x3 kernels block-packed to [3, 3, 2C, 2C].  At hidden=64 this fills
    # the MXU's 128 lanes exactly instead of half-padding them, and it IS
    # the space-to-depth transform XLA otherwise inserts for these convs —
    # minus XLA's materialized layout copies (the profiled "TAESD layout
    # shuffle" cost, PERF.md by-block profile).  The packed kernels carry
    # exact zero blocks (50% density), so results match the unpacked path
    # up to fp32 reduction-order; opt-in (config `taesd_packed`) because
    # golden tests pin the unpacked program bit-for-bit.
    # MEASURED LOSER at the XLA level (PERF.md): kept for A/B tooling.
    packed_convs: bool = False
    # Evaluate the residual blocks with the Pallas packed-conv kernel
    # (ops/pallas/taesd_conv.py): same pixel-pair-packed math, but the
    # kernel owns the layout end to end — halo-DMA'd row strips, 9
    # lane-full accumulating matmuls, fused bias/ReLU/skip epilogue.
    # Opt-in (config `taesd_pallas`); TPU-only (interpret mode in tests).
    pallas_convs: bool = False


def _block_init(key, n_in: int, n_out: int) -> Params:
    ks = jax.random.split(key, 4)
    p = {
        "conv": [
            conv2d_init(ks[0], n_in, n_out),
            conv2d_init(ks[1], n_out, n_out),
            conv2d_init(ks[2], n_out, n_out),
        ]
    }
    if n_in != n_out:
        p["skip"] = conv2d_init(ks[3], n_in, n_out, kernel=1, bias=False)
    return p


def _block_apply(p: Params, x):
    h = jax.nn.relu(conv2d(p["conv"][0], x))
    h = jax.nn.relu(conv2d(p["conv"][1], h))
    h = conv2d(p["conv"][2], h)
    skip = conv2d(p["skip"], x, padding=0) if "skip" in p else x
    return jax.nn.relu(h + skip)


# ---- pixel-pair-packed block path (TAESDConfig.packed_convs) -------------
#
# [B, H, W, C] -> [B, H, W/2, 2C] is a free reshape in NHWC (adjacent
# pixels' channels are already contiguous).  A 3x3 SAME stride-1 conv
# becomes a 3x3 conv over packed columns whose [2C, 2C] taps hold the
# original [C, C] taps block-wise: output sub-pixel i_out at packed column
# j reads input sub-pixel i_in at packed column j+dj iff the absolute
# column offset dx = 2*dj + i_in - i_out lands in {-1, 0, 1}.  6 of the 12
# (dj, i_in, i_out) slots are live -> 2x the FLOPs of the unpacked conv,
# but the MXU was only 64/128-lane utilized before, so the array work is
# identical — and the free reshape replaces XLA's space-to-depth copies.


def _pack2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def _unpack2(x):
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


def _pack2_kernel(k):
    """[3, 3, Cin, Cout] SAME-conv kernel -> [3, 3, 2Cin, 2Cout] packed."""
    kh, kw, ci, co = k.shape
    assert kh == 3 and kw == 3, "pair packing is derived for 3x3 kernels"
    wp = jnp.zeros((kh, 3, 2 * ci, 2 * co), k.dtype)
    for dj in (-1, 0, 1):
        for i_in in (0, 1):
            for i_out in (0, 1):
                dx = 2 * dj + i_in - i_out
                if -1 <= dx <= 1:
                    wp = wp.at[
                        :,
                        dj + 1,
                        i_in * ci : (i_in + 1) * ci,
                        i_out * co : (i_out + 1) * co,
                    ].set(k[:, dx + 1])
    return wp


def _conv2d_packed(params: Params, xp):
    kp = _pack2_kernel(params["kernel"].astype(xp.dtype))
    y = jax.lax.conv_general_dilated(
        xp,
        kp,
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + jnp.tile(params["bias"].astype(y.dtype), 2)
    return y.astype(xp.dtype)


def _block_apply_packed(p: Params, xp):
    assert "skip" not in p, "TAESD blocks are C->C; packed path has no skip"
    h = jax.nn.relu(_conv2d_packed(p["conv"][0], xp))
    h = jax.nn.relu(_conv2d_packed(p["conv"][1], h))
    h = _conv2d_packed(p["conv"][2], h)
    return jax.nn.relu(h + xp)


def _block_apply_pallas(p: Params, xp):
    """Residual block on packed activations via the Pallas conv kernel.

    Falls back to the XLA packed path per-resolution when the shape is
    outside the kernel's strip/lane support (e.g. H not a multiple of 16).
    """
    from videosd_tpu.ops.pallas import taesd_conv

    assert "skip" not in p, "TAESD blocks are C->C; packed path has no skip"
    if not taesd_conv.supports(xp.shape):
        return _block_apply_packed(p, xp)
    h = taesd_conv.packed_conv3x3(p["conv"][0], xp, relu=True)
    h = taesd_conv.packed_conv3x3(p["conv"][1], h, relu=True)
    return taesd_conv.packed_conv3x3(p["conv"][2], h, relu=True, skip=xp)


def taesd_init(key, cfg: TAESDConfig = TAESDConfig(), dtype=jnp.float32) -> Params:
    h = cfg.hidden
    n_enc = 2 + cfg.num_stages * (1 + cfg.blocks_per_stage) + 1
    n_dec = 2 + cfg.num_stages * (cfg.blocks_per_stage + 1) + 2
    ks = jax.random.split(key, n_enc + n_dec)
    ki = iter(range(n_enc + n_dec))

    enc: Params = {"conv_in": conv2d_init(ks[next(ki)], 3, h)}
    enc["block_in"] = _block_init(ks[next(ki)], h, h)
    enc["stages"] = []
    for _ in range(cfg.num_stages):
        stage = {
            "down": conv2d_init(ks[next(ki)], h, h, bias=False),
            "blocks": [
                _block_init(ks[next(ki)], h, h) for _ in range(cfg.blocks_per_stage)
            ],
        }
        enc["stages"].append(stage)
    enc["conv_out"] = conv2d_init(ks[next(ki)], h, cfg.latent_channels)

    dec: Params = {"conv_in": conv2d_init(ks[next(ki)], cfg.latent_channels, h)}
    dec["stages"] = []
    for _ in range(cfg.num_stages):
        stage = {
            "blocks": [
                _block_init(ks[next(ki)], h, h) for _ in range(cfg.blocks_per_stage)
            ],
            "up": conv2d_init(ks[next(ki)], h, h, bias=False),
        }
        dec["stages"].append(stage)
    dec["block_out"] = _block_init(ks[next(ki)], h, h)
    dec["conv_out"] = conv2d_init(ks[next(ki)], h, 3)

    p = {"encoder": enc, "decoder": dec}
    if dtype != jnp.float32:
        p = jax.tree.map(lambda a: a.astype(dtype), p)
    return p


def taesd_encode(params: Params, x, cfg: TAESDConfig = TAESDConfig()):
    """[B,H,W,3] image in [-1,1]... NOTE: TAESD consumes [0,1] images.

    diffusers' AutoencoderTiny wrapper rescales the pipeline's [-1,1]
    domain internally; we take [-1,1] for API uniformity with the KL VAE
    and rescale here.  Returns [B,H/8,W/8,4] latents.
    """
    enc = params["encoder"]
    h = (x + 1.0) * 0.5  # [-1,1] -> [0,1]
    h = conv2d(enc["conv_in"], h.astype(x.dtype))
    use_packed = cfg.packed_convs or cfg.pallas_convs
    block_fn = _block_apply_pallas if cfg.pallas_convs else _block_apply_packed
    packed = use_packed and h.shape[2] % (2 ** (cfg.num_stages + 1)) == 0
    if packed:
        hp = block_fn(enc["block_in"], _pack2(h))
        for stage in enc["stages"]:
            # down convs (stride 2) stay unpacked — cheap, and the
            # pack/unpack boundaries are free reshapes
            h = conv2d(
                stage["down"], _unpack2(hp), stride=2, padding=[(1, 1), (1, 1)]
            )
            hp = _pack2(h)
            for blk in stage["blocks"]:
                hp = block_fn(blk, hp)
        return conv2d(enc["conv_out"], _unpack2(hp))
    h = _block_apply(enc["block_in"], h)
    for stage in enc["stages"]:
        h = conv2d(stage["down"], h, stride=2, padding=[(1, 1), (1, 1)])
        for blk in stage["blocks"]:
            h = _block_apply(blk, h)
    return conv2d(enc["conv_out"], h)


def taesd_decode(params: Params, z, cfg: TAESDConfig = TAESDConfig()):
    """[B,h,w,4] latents -> [B,8h,8w,3] image in [-1,1]."""
    dec = params["decoder"]
    zf = jnp.tanh(z.astype(jnp.float32) / 3.0) * 3.0  # soft latent clamp
    h = jax.nn.relu(conv2d(dec["conv_in"], zf.astype(z.dtype)))
    use_packed = cfg.packed_convs or cfg.pallas_convs
    block_fn = _block_apply_pallas if cfg.pallas_convs else _block_apply_packed
    packed = use_packed and h.shape[2] % 2 == 0
    if packed:
        for stage in dec["stages"]:
            hp = _pack2(h)
            for blk in stage["blocks"]:
                hp = block_fn(blk, hp)
            h = upsample_nearest2d(_unpack2(hp))
            h = conv2d(stage["up"], h)
        h = _unpack2(block_fn(dec["block_out"], _pack2(h)))
        h = conv2d(dec["conv_out"], h)
        return h * 2.0 - 1.0
    for stage in dec["stages"]:
        for blk in stage["blocks"]:
            h = _block_apply(blk, h)
        h = upsample_nearest2d(h)
        h = conv2d(stage["up"], h)
    h = _block_apply(dec["block_out"], h)
    h = conv2d(dec["conv_out"], h)
    # [0,1] -> [-1,1] for pipeline-uniform postprocessing
    return h * 2.0 - 1.0
