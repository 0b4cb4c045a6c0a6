"""Pallas pixel-pair-packed 3x3 conv kernel for the TAESD conv stack.

Why this kernel exists (PERF.md "Pixel-pair-packed TAESD convs"): the
TAESD residual blocks are 64->64-channel 3x3 convs at PIXEL resolution
(up to 512x512) — reference swaps the KL VAE for exactly this tiny
autoencoder (diffusert/videopipeline.py:67-69).  64 channels half-fill
the MXU's 128 lanes, and XLA's space-to-depth rewrite of these convs
executes at ~6% of bf16 peak (~23% of the channel-padded roofline),
measured via isolated slope probes.  The source-level packed layout
(models/taesd.py ``packed_convs``) LOST at the XLA level because the 2x
nominal FLOPs of the 50%-dense packed kernels cost more than the copies
they removed.

This kernel owns the layout end to end instead:

* activations live in the dense pixel-pair-packed form ``[B, H, W/2,
  128]`` (adjacent-pixel channels concatenated on the lane dim) — a free
  row-major reshape at the HBM level and the ONLY dense layout for
  64-channel data on a 128-lane machine;
* each strip of ``R`` rows is DMA'd once (1-row halo, clamped at image
  edges) into VMEM;
* the conv is 9 accumulating ``[R*W/2, 128] x [128, 128]`` matmuls — the
  three column taps come from two in-VMEM shifted copies, the three row
  taps from free row-offset reads of the same strip.  Every matmul is
  exactly lane- and contraction-full: array work equals the half-lane
  roofline of the unpacked conv with zero K padding;
* bias, ReLU, and the residual-block skip-add (+ ReLU) fuse into the
  epilogue, so intermediate activations never widen to fp32 in HBM.

The packed tap table is the same block-sparse ``[3, 3, 128, 128]``
transform as models/taesd.py ``_pack2_kernel`` (imported from there), so
results match the XLA paths up to fp32 accumulation order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["packed_conv3x3", "supports"]

_LANES = 128
_ROWS = 16  # rows per grid strip; VMEM ~11 MB at W=512 bf16


def supports(xp_shape, rows_per_strip: int = _ROWS) -> bool:
    """Whether the kernel handles this packed activation shape."""
    if len(xp_shape) != 4:
        return False
    _, h, wp, lanes = xp_shape
    return lanes == _LANES and h % rows_per_strip == 0 and wp % 16 == 0 and wp >= 16


def _conv_kernel(
    x_hbm,
    wp_ref,
    bias_ref,
    *args,
    rows: int,
    relu: bool,
    has_skip: bool,
):
    if has_skip:
        skip_ref, out_ref, xs0, xs1, sem0, sem1 = args
    else:
        out_ref, xs0, xs1, sem0, sem1 = args
        skip_ref = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.num_programs(1)
    h = x_hbm.shape[1]
    r = rows
    wp_cols = xs0.shape[1]
    zero_row = jnp.zeros((1, wp_cols, _LANES), xs0.dtype)

    def dma(src_rows, dst_lo, length, buf, sem):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_rows, length)],
            buf.at[pl.ds(dst_lo, length)],
            sem,
        )

    # strip s geometry (1-row halo, zero-padded at the image edges):
    #   s == 0     -> src rows [0, r+1)      into buf rows [1, r+2); row 0 = 0
    #   s == n-1   -> src rows [h-r-1, h)    into buf rows [0, r+1); row r+1 = 0
    #   middle     -> src rows [s*r-1, +r+2) into buf rows [0, r+2)
    def start_strip(s, buf, sem):
        @pl.when(s == 0)
        def _():
            dma(0, 1, r + 1, buf, sem).start()

        @pl.when(s == n - 1)
        def _():
            dma(h - (r + 1), 0, r + 1, buf, sem).start()

        @pl.when(jnp.logical_and(s != 0, s != n - 1))
        def _():
            dma(s * r - 1, 0, r + 2, buf, sem).start()

    def wait_strip(s, buf, sem):
        @pl.when(s == 0)
        def _():
            buf[0:1] = zero_row
            dma(0, 1, r + 1, buf, sem).wait()

        @pl.when(s == n - 1)
        def _():
            buf[r + 1 : r + 2] = zero_row
            dma(h - (r + 1), 0, r + 1, buf, sem).wait()

        @pl.when(jnp.logical_and(s != 0, s != n - 1))
        def _():
            dma(s * r - 1, 0, r + 2, buf, sem).wait()

    def compute(buf):
        g = buf[...]
        zcol = jnp.zeros((r + 2, 1, _LANES), g.dtype)
        # kernel column c reads input column j + c - 1 (SAME, pad 1)
        variants = (
            jnp.concatenate([zcol, g[:, : wp_cols - 1]], axis=1),  # c=0: x[j-1]
            g,  # c=1
            jnp.concatenate([g[:, 1:], zcol], axis=1),  # c=2: x[j+1]
        )

        acc = None
        for dr in range(3):  # kernel row dr reads input row r + dr - 1
            for c in range(3):
                m = variants[c][dr : dr + r].reshape(r * wp_cols, _LANES)
                part = jnp.dot(m, wp_ref[dr, c], preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part

        y = acc + bias_ref[...]
        if relu and skip_ref is None:
            y = jnp.maximum(y, 0.0)
        if skip_ref is not None:
            y = y + skip_ref[...].reshape(r * wp_cols, _LANES).astype(jnp.float32)
            if relu:
                y = jnp.maximum(y, 0.0)
        out_ref[...] = y.astype(out_ref.dtype).reshape(1, r, wp_cols, _LANES)

    if n == 1:
        # whole image in one strip: both halo rows are the zero padding
        cp = dma(0, 1, r, xs0, sem0)
        cp.start()
        xs0[0:1] = zero_row
        xs0[r + 1 : r + 2] = zero_row
        cp.wait()
        compute(xs0)
        return

    # double-buffered pipeline: start strip i+1's DMA into the other
    # buffer, then wait for strip i (started during invocation i-1) and
    # compute — the halo copy rides under the 9 matmuls instead of
    # serializing before them.  Buffer parity is i % 2; branching on the
    # parity keeps every buffer reference static.
    def body(cur, nxt, cur_sem, nxt_sem):
        @pl.when(i == 0)
        def _():
            start_strip(i, cur, cur_sem)

        @pl.when(i + 1 < n)
        def _():
            start_strip(i + 1, nxt, nxt_sem)

        wait_strip(i, cur, cur_sem)
        compute(cur)

    @pl.when(i % 2 == 0)
    def _():
        body(xs0, xs1, sem0, sem1)

    @pl.when(i % 2 == 1)
    def _():
        body(xs1, xs0, sem1, sem0)


@functools.partial(
    jax.jit, static_argnames=("relu", "rows_per_strip", "has_bias")
)
def _packed_conv3x3(
    xp,
    wpk,
    bias_p,
    skip,
    *,
    relu: bool,
    rows_per_strip: int,
    has_bias: bool,
):
    del has_bias  # folded into bias_p; static arg keeps cache keys honest
    b, h, wp_cols, lanes = xp.shape
    r = rows_per_strip
    kernel = functools.partial(
        _conv_kernel, rows=r, relu=relu, has_skip=skip is not None
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((3, 3, _LANES, _LANES), lambda bb, ii: (0, 0, 0, 0)),
        pl.BlockSpec((1, _LANES), lambda bb, ii: (0, 0)),
    ]
    inputs = [xp, wpk, bias_p]
    if skip is not None:
        in_specs.append(
            pl.BlockSpec((1, r, wp_cols, lanes), lambda bb, ii: (bb, ii, 0, 0))
        )
        inputs.append(skip)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, h // r),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, r, wp_cols, lanes), lambda bb, ii: (bb, ii, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((r + 2, wp_cols, _LANES), xp.dtype),
                pltpu.VMEM((r + 2, wp_cols, _LANES), xp.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
    )(*inputs)


def packed_conv3x3(
    params,
    xp,
    *,
    relu: bool = False,
    skip=None,
    rows_per_strip: int = _ROWS,
):
    """3x3 SAME conv on pixel-pair-packed activations, fused epilogue.

    ``params``: layers.conv2d params with a ``[3, 3, C, C]`` kernel
    (C = lanes/2).  ``xp``/``skip``: ``[B, H, W/2, 2C]`` packed arrays.
    ``relu`` applies after the skip-add when ``skip`` is given (the TAESD
    residual-block epilogue), else directly.  Returns packed ``[B, H,
    W/2, 2C]`` in ``xp.dtype``.
    """
    from videosd_tpu.models.taesd import _pack2_kernel

    if not supports(xp.shape, rows_per_strip):
        raise ValueError(f"unsupported packed shape {xp.shape}")
    lanes = xp.shape[-1]
    wpk = _pack2_kernel(params["kernel"].astype(xp.dtype))
    bias = params.get("bias")
    has_bias = bias is not None
    if has_bias:
        bias_p = jnp.tile(bias.astype(jnp.float32), 2)[None]
    else:
        bias_p = jnp.zeros((1, lanes), jnp.float32)
    return _packed_conv3x3(
        xp,
        wpk,
        bias_p,
        skip,
        relu=relu,
        rows_per_strip=rows_per_strip,
        has_bias=has_bias,
    )
