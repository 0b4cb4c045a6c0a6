"""Spatial tiling for VAE encode/decode at large resolutions.

BASELINE config 4 (SDXL 1024² "with fused VAE tiling"): decoding a big
latent grid in one shot peaks activation memory at full resolution x 128+
channels; tiled decode runs the decoder over overlapping latent tiles and
feather-blends the overlap, bounding memory to one tile regardless of
output size.  Each tile call reuses ONE jitted decoder executable (static
tile shape), so tiling adds no recompiles.

The reference has no analog (it caps resolution at 768 client-side,
index.tsx:218-229); this is the TPU-native scale-out for high-res.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["tiled_decode", "tiled_encode"]


def _blend_weights(tile: int, overlap: int) -> np.ndarray:
    """1-D feathering ramp: 0..1 over `overlap`, flat 1 in the interior."""
    w = np.ones((tile,), np.float32)
    if overlap > 0:
        ramp = (np.arange(overlap, dtype=np.float32) + 1.0) / (overlap + 1.0)
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return w


def tiled_decode(decode_fn, z, *, tile: int = 64, overlap: int = 8, scale: int = 8):
    """Decode latents ``z`` [B,h,w,C] via overlapping tiles.

    decode_fn: jitted latents->image function for a [B,tile,tile,C] input.
    scale: spatial upsampling factor of the decoder (8 for SD VAEs).
    Returns [B, h*scale, w*scale, 3] float image.
    """
    b, h, w, c = z.shape
    if h <= tile and w <= tile:
        return decode_fn(z)

    step = tile - overlap
    out = np.zeros((b, h * scale, w * scale, 3), np.float32)
    acc = np.zeros((1, h * scale, w * scale, 1), np.float32)
    wt1d = _blend_weights(tile * scale, overlap * scale)

    ys = list(range(0, max(h - tile, 0) + 1, step))
    if ys[-1] != h - tile:
        ys.append(h - tile)
    xs = list(range(0, max(w - tile, 0) + 1, step))
    if xs[-1] != w - tile:
        xs.append(w - tile)

    for y0 in ys:
        for x0 in xs:
            zt = z[:, y0 : y0 + tile, x0 : x0 + tile, :]
            img = np.asarray(decode_fn(zt), np.float32)
            wy = wt1d[:, None, None]
            wx = wt1d[None, :, None]
            wgt = (wy * wx)[None]
            oy, ox = y0 * scale, x0 * scale
            out[:, oy : oy + tile * scale, ox : ox + tile * scale] += img * wgt
            acc[:, oy : oy + tile * scale, ox : ox + tile * scale] += wgt
    return jnp.asarray(out / np.maximum(acc, 1e-8))


def tiled_encode(encode_fn, img, *, tile: int = 512, overlap: int = 64, scale: int = 8):
    """Encode image [B,H,W,3] via overlapping pixel tiles -> latents."""
    b, hh, ww, _ = img.shape
    if hh <= tile and ww <= tile:
        return encode_fn(img)

    step = tile - overlap
    lh, lw = hh // scale, ww // scale
    lt = tile // scale
    out = np.zeros((b, lh, lw, 4), np.float32)
    acc = np.zeros((1, lh, lw, 1), np.float32)
    wt1d = _blend_weights(lt, overlap // scale)

    ys = list(range(0, max(hh - tile, 0) + 1, step))
    if ys[-1] != hh - tile:
        ys.append(hh - tile)
    xs = list(range(0, max(ww - tile, 0) + 1, step))
    if xs[-1] != ww - tile:
        xs.append(ww - tile)

    for y0 in ys:
        for x0 in xs:
            it = img[:, y0 : y0 + tile, x0 : x0 + tile, :]
            zt = np.asarray(encode_fn(it), np.float32)
            wgt = (wt1d[:, None, None] * wt1d[None, :, None])[None]
            oy, ox = y0 // scale, x0 // scale
            out[:, oy : oy + lt, ox : ox + lt] += zt * wgt
            acc[:, oy : oy + lt, ox : ox + lt] += wgt
    return jnp.asarray(out / np.maximum(acc, 1e-8))
