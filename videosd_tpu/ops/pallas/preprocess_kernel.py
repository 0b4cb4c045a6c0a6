"""Pallas Sobel stencil kernel + fused preprocess entry point.

The preprocessing chain (u8 -> [0,1] -> luma -> Sobel -> normalize ->
double threshold, reference canny_gpu.py:27-44) is elementwise except the
3x3 stencil and the global max.  XLA fuses the elementwise stages into
neighbors for free; the stencil is where a kernel can help, so that is the
Pallas part: row strips with a 1-row halo DMA'd from HBM (overlapping
windows aren't expressible as BlockSpecs), gradients computed in one VMEM
residency.

Layout note: the natural [H, W, 3] uint8 frame cannot be DMA-sliced on TPU
(the size-3 minor dim breaks the (8,128) tiling), so the kernel takes the
[H, W] fp32 luma plane — aligned on both axes — and the luma/normalize
math stays in the surrounding XLA program where it fuses into the VAE's
first conv anyway.

``fused_preprocess`` is a drop-in for the XLA path in ops/sobel.py;
numerics match (canny_gpu.py semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videosd_tpu.ops.sobel import rgb_to_gray

__all__ = ["sobel_magnitude_pallas", "fused_preprocess"]

_TILE = 128
_HALO = 8


def _kernel(gray_hbm, mag_ref, scratch, sem):
    i = pl.program_id(0)
    # strip + 8-row halo each side: DMA lengths must be sublane-aligned
    # (multiples of 8), so the halo is 8 rows even though the stencil only
    # needs 1 (input is pre-padded by 8 zero rows top and bottom)
    dma = pltpu.make_async_copy(
        gray_hbm.at[pl.ds(i * _TILE, _TILE + 2 * _HALO)], scratch, sem
    )
    dma.start()
    dma.wait()

    w = scratch.shape[1]
    g = jnp.pad(scratch[...], ((0, 0), (1, 1)))  # zero-pad columns

    def shift(dy, dx):
        return g[_HALO + dy : _HALO + dy + _TILE, 1 + dx : 1 + dx + w]

    tl, tc, tr = shift(-1, -1), shift(-1, 0), shift(-1, 1)
    ml, mr = shift(0, -1), shift(0, 1)
    bl, bc, br = shift(1, -1), shift(1, 0), shift(1, 1)
    gx = (tr + 2.0 * mr + br) - (tl + 2.0 * ml + bl)
    gy = (bl + 2.0 * bc + br) - (tl + 2.0 * tc + tr)
    mag_ref[...] = jnp.sqrt(gx * gx + gy * gy)


@jax.jit
def sobel_magnitude_pallas(gray):
    """[H, W] fp32 luma -> [H, W] fp32 |grad| with zero-padded 3x3 Sobel.

    H must be a multiple of 128; W a multiple of 128 (lane tiling).
    """
    h, w = gray.shape
    if h % _TILE or w % 128:
        raise ValueError(f"{h}x{w} not tile-aligned for the pallas stencil")
    padded = jnp.pad(gray.astype(jnp.float32), ((_HALO, _HALO), (0, 0)))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(h // _TILE,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((_TILE, w), lambda i: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((_TILE + 2 * _HALO, w), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
    )(padded)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def fused_preprocess(frame_u8, low=0.11, high=0.8, *, out_dtype=jnp.bfloat16):
    """[H, W, 3] uint8 -> (img [-1,1] [H,W,3] out_dtype, edge [H,W] fp32).

    Pallas-stencil variant of ops.sobel.sobel_control_image + normalize;
    thresholds traced (live-tunable).
    """
    x01 = frame_u8.astype(jnp.float32) / 255.0
    img = (x01 * 2.0 - 1.0).astype(out_dtype)
    gray = rgb_to_gray(x01)
    mag = sobel_magnitude_pallas(gray)
    edge = mag / jnp.maximum(jnp.max(mag), 1e-12)
    edge = jnp.where(edge >= jnp.asarray(high, jnp.float32), 1.0, edge)
    edge = jnp.where(edge <= jnp.asarray(low, jnp.float32), 0.0, edge)
    return img, edge
