"""Core NHWC layer library: functional params-as-pytrees building blocks.

Every layer is a pair of functions: ``*_init(key, ...) -> params`` and an
apply function ``f(params, x, ...) -> y``.  Params are plain nested dicts so
they pjit/shard/convert trivially; names track the diffusers module names
(kernel/bias per layer) so torch->JAX weight conversion is a rename +
transpose (see videosd_tpu/io/weights.py).

TPU conventions:
* activations NHWC, conv kernels HWIO (XLA's native TPU layouts),
* matmuls/convs run in the param dtype (bf16 by default) with fp32
  accumulation via ``preferred_element_type``,
* normalization statistics and softmax always in fp32.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

__all__ = [
    "conv2d_init",
    "conv2d",
    "linear_init",
    "linear",
    "linear_w8a8",
    "quantize_linear",
    "group_norm_init",
    "group_norm",
    "layer_norm_init",
    "layer_norm",
    "attention",
    "timestep_embedding",
    "guidance_embedding",
    "silu",
    "geglu_init",
    "geglu",
    "avg_pool2d",
    "upsample_nearest2d",
]


def silu(x):
    return jax.nn.silu(x)


# ---------------------------------------------------------------- conv / linear


def conv2d_init(
    key, in_ch: int, out_ch: int, kernel: int = 3, *, bias: bool = True
) -> Params:
    k1, _ = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    bound = 1.0 / math.sqrt(fan_in)
    p = {
        "kernel": jax.random.uniform(
            k1, (kernel, kernel, in_ch, out_ch), jnp.float32, -bound, bound
        )
    }
    if bias:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv2d(
    params: Params,
    x,
    *,
    stride: int = 1,
    padding: int | str = "SAME",
    f32_out: bool = True,
):
    """NHWC conv. ``padding`` is SAME/VALID or an explicit symmetric int.

    ``f32_out=True`` materializes fp32 outputs + fp32 bias adds (measured
    faster inside the UNet — XLA fuses the converts and picks better
    layouts); ``f32_out=False`` keeps the compute dtype end to end (wins
    for pixel-resolution tensors, see models/taesd.py).  MXU accumulation
    is fp32 either way for bf16 operands."""
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    kernel = params["kernel"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if f32_out else None,
    )
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32 if f32_out else y.dtype)
    return y.astype(x.dtype)


def linear_init(key, in_dim: int, out_dim: int, *, bias: bool = True) -> Params:
    bound = 1.0 / math.sqrt(in_dim)
    p = {"kernel": jax.random.uniform(key, (in_dim, out_dim), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def linear(params: Params, x):
    if "w8" in params:
        return linear_w8a8(params, x)
    y = jnp.dot(x, params["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_linear(params: Params) -> Params:
    """Convert a linear param dict to int8 w8a8 form.

    Symmetric per-output-channel weight scales: ``w8[k, n] =
    round(kernel[k, n] / sw[n])`` with ``sw = max|kernel[:, n]| / 127``.
    The apply path (:func:`linear_w8a8`) quantizes activations dynamically
    per tensor, so no calibration pass is needed.  Bias stays fp32.
    """
    k = params["kernel"].astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(k), axis=0), 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(k / sw[None, :]), -127, 127).astype(jnp.int8)
    q: Params = {"w8": w8, "sw": sw}
    if "bias" in params:
        q["bias"] = params["bias"]
    return q


def linear_w8a8(params: Params, x):
    """int8 x int8 -> int32 linear with dynamic per-tensor activation scale.

    NOTE on speed: the v5e MXU nominally runs int8 at 2x its bf16 rate,
    but slope-measured on this stack the full quant -> int8 dot -> dequant
    chain is SLOWER than the plain bf16 matmul at almost every flagship
    UNet shape (0.57-0.95x; one 1.24x outlier at a batch-4 GEGLU shape) —
    XLA does not engage a fast int8 MXU path here and the quant/dequant
    epilogues dominate (PERF.md "int8 w8a8 re-probe, round 2").  The mode
    exists as an opt-in memory lever (int8 halves denoiser weight HBM),
    not a compute win; ops/quant.py picks which layers use it.
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq,
        params["w8"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (params["sw"] * sx)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------- norms


def group_norm_init(num_channels: int) -> Params:
    return {
        "scale": jnp.ones((num_channels,), jnp.float32),
        "bias": jnp.zeros((num_channels,), jnp.float32),
    }


def group_norm(params: Params, x, *, groups: int = 32, eps: float = 1e-5):
    """GroupNorm over the channel (last) axis of NHWC, fp32 statistics.

    Stats via per-channel sum / sum-of-squares then a tiny group combine
    (E[x^2]-E[x]^2 in fp32): the grouped-reshape mean/var formulation made
    XLA materialize a full fp32 copy of the activation per norm (5 MB at
    SDXL's 32x32x1280 — profiled at 35 ms/frame of convert_reduce fusions;
    this form cut the SDXL 1024 frame 272 -> 254 ms).  fp32 accumulation
    over bf16 inputs keeps the cancellation error ~1e-6, well inside the
    bf16 activations' own quantization."""
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    g = groups
    cg = c // g
    n = (x.size // (b * c)) * cg  # elements per (batch, group)
    xf = x.astype(jnp.float32)
    red = tuple(range(1, x.ndim - 1))
    s1 = jnp.sum(xf, axis=red).reshape(b, g, cg).sum(-1)  # [B, g]
    s2 = jnp.sum(xf * xf, axis=red).reshape(b, g, cg).sum(-1)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
    mean_c = jnp.repeat(mean, cg, axis=1).reshape(bshape)
    inv_c = jnp.repeat(inv, cg, axis=1).reshape(bshape)
    xf = (xf - mean_c) * inv_c * params["scale"] + params["bias"]
    return xf.astype(orig_dtype)


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params: Params, x, *, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf * params["scale"] + params["bias"]
    return xf.astype(orig_dtype)


# ---------------------------------------------------------------- attention


def _default_attn_impl() -> str:
    import os

    impl = os.environ.get("VIDEOSD_ATTN_IMPL", "")
    if impl in ("xla", "pallas"):
        return impl
    return "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"


def attention(q, k, v, *, num_heads: int, mask=None, impl: str = "auto"):
    """Multi-head scaled-dot-product attention on [B, S, D] tensors.

    fp32 softmax.  impl="auto" routes unmasked lane-aligned self-attention
    to the Pallas flash kernel on TPU (A/B-benchmarked faster at every
    UNet sequence length >=256); cross-attention over the 77-token text
    context and CPU runs use the XLA einsum path.  Override with
    VIDEOSD_ATTN_IMPL=xla|pallas.
    """
    if impl == "auto":
        if (
            mask is None
            and q.shape[1] % 128 == 0
            and k.shape[1] % 128 == 0
            and k.shape[1] >= 256
            and q.shape[1] >= 128
            and _default_attn_impl() == "pallas"
        ):
            # covers plain self-attention AND the reference-attention READ
            # pass (banked K/V of length 2S); the 77-token cross-attention
            # stays on XLA (unaligned + nothing to tile)
            impl = "pallas"
        else:
            impl = "xla"
    if impl == "pallas":
        return _attention_pallas_diff(q, k, v, num_heads)
    return _attention_xla(q, k, v, num_heads, mask)


def _attention_xla(q, k, v, num_heads: int, mask=None):
    b, sq, d = q.shape
    sk = k.shape[1]
    h = num_heads
    dh = d // h
    qh = q.reshape(b, sq, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, sk, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, sk, h, dh).transpose(0, 2, 1, 3)

    scale = 1.0 / math.sqrt(dh)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh, preferred_element_type=jnp.float32)
    out = out.astype(q.dtype).transpose(0, 2, 1, 3).reshape(b, sq, d)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_pallas_diff(q, k, v, num_heads: int):
    """Pallas flash forward with an XLA-recompute backward.

    pallas_call has no autodiff rule, so training through a UNet whose
    self-attention dispatched to the flash kernel failed outright
    (round-4 finding: the sd15-family train step crashed in
    _pallas_call_jvp_rule — the tiny test family never tripped this
    because its short sequences route to XLA).  Standard remat trick:
    forward runs the fast kernel, backward differentiates the
    mathematically-identical XLA path (recomputing its forward), so
    gradients are exact for the XLA function and fwd/bwd disagree only
    at reduction-order level — same tolerance class as the kernel's own
    forward A/B (tests/test_flash_attention.py).
    """
    from videosd_tpu.ops.pallas.flash_attention import flash_attention

    return flash_attention(q, k, v, num_heads=num_heads)


def _attention_pallas_fwd(q, k, v, num_heads: int):
    return _attention_pallas_diff(q, k, v, num_heads), (q, k, v)


def _attention_pallas_bwd(num_heads: int, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _attention_xla(q_, k_, v_, num_heads), q, k, v)
    return vjp(g)


_attention_pallas_diff.defvjp(_attention_pallas_fwd, _attention_pallas_bwd)


# ---------------------------------------------------------------- embeddings


def timestep_embedding(
    timesteps,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
):
    """Sinusoidal timestep embedding, diffusers ``get_timestep_embedding``
    semantics (SD UNets use flip_sin_to_cos=True, freq_shift=0).

    timesteps: [B] int/float -> [B, dim] fp32.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = jnp.asarray(timesteps, jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def guidance_embedding(w, dim: int = 256):
    """LCM guidance-scale Fourier embedding (lcm_controlnet.py:347-368).

    w: [B] guidance scales (traced).  Note the reference scales by 1000 and
    uses sin-first ordering with log(10000)/(half-1) frequencies — this is
    NOT the same convention as :func:`timestep_embedding`.
    """
    w = jnp.asarray(w, jnp.float32) * 1000.0
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    emb = w[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# ---------------------------------------------------------------- ffn


def geglu_init(key, dim: int, inner_dim: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "proj": linear_init(k1, dim, inner_dim * 2),
        "out": linear_init(k2, inner_dim, dim),
    }


def geglu(params: Params, x):
    """GEGLU feed-forward (diffusers FeedForward default for SD UNets).

    gelu form is dtype-dependent, chosen by measurement:
    * fp32 compute (parity runs, golden fixtures): EXACT erf gelu — torch
      F.gelu defaults to erf and that is what diffusers' GEGLU runs; the
      tanh approximation deviates up to ~1e-3 per activation, which
      compounds across 16 transformer blocks and breaks the
      "bit-comparable to diffusers fp32" fidelity bar.
    * bf16 compute (production): tanh gelu — the erf/tanh delta (~1e-3)
      sits BELOW bf16 resolution (~4e-3 at |x|~1), so outputs are
      indistinguishable after the cast, while XLA's erf lowering measured
      ~3 ms/frame slower on the flagship (16.0 -> 15.2 FPS on v5e).
    """
    h = linear(params["proj"], x)
    a, b = jnp.split(h, 2, axis=-1)
    exact = x.dtype != jnp.bfloat16
    h = a * jax.nn.gelu(b.astype(jnp.float32), approximate=not exact).astype(x.dtype)
    return linear(params["out"], h)


# ---------------------------------------------------------------- resize


def avg_pool2d(x, window: int = 2):
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, window, window, 1),
        "VALID",
    ) / float(window * window)


def upsample_nearest2d(x, factor: int = 2):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def upsample_conv2d(params: Params, x, *, f32_out: bool = True):
    """Fused nearest-2x upsample + 3x3 SAME conv via phase decomposition.

    ``conv3x3(pad=1)(nearest2x(x))`` computed as four 2x2 convs at SOURCE
    resolution whose outputs interleave into the 2x-upsampled grid.  With
    nearest upsampling, the 3x3 window at output phase (a, b) ∈ {0,1}²
    only ever touches a 2x2 patch of source pixels; the effective 2x2
    kernels are sums of the 3x3 taps that land on the same source pixel
    (row taps: a=0 -> [k0, k1+k2], a=1 -> [k0+k1, k2]; columns likewise).
    EXACT re-association of the same additions — bit-level parity with
    the naive path is fp-associativity-limited only.

    2.25x fewer MACs than conv at the upsampled resolution; measured
    1.6x on v5e for the SD1.5 up-block upsamplers, which are ~6 ms/frame
    of the flagship (PERF.md).  Params stay in 3x3 HWIO form (checkpoint
    conversion untouched); the kernel transform is a pure function of the
    params so XLA computes it once per program, not per step.
    """
    k = params["kernel"].astype(x.dtype)
    r0 = jnp.stack([k[0], k[1] + k[2]])  # output rows at phase a=0
    r1 = jnp.stack([k[0] + k[1], k[2]])  # phase a=1
    phase_kernels = []
    for kr in (r0, r1):
        phase_kernels.append(jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], axis=1))
        phase_kernels.append(jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], axis=1))
    # phase (a,b) taps source rows (i-1+a, i+a) / cols (j-1+b, j+b)
    pads = [((1, 0), (1, 0)), ((1, 0), (0, 1)), ((0, 1), (1, 0)), ((0, 1), (0, 1))]
    bias = params.get("bias")
    outs = []
    for kk, pad in zip(phase_kernels, pads):
        y = jax.lax.conv_general_dilated(
            x,
            kk,
            window_strides=(1, 1),
            padding=list(pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if f32_out else None,
        )
        if bias is not None:
            y = y + bias.astype(jnp.float32 if f32_out else y.dtype)
        outs.append(y.astype(x.dtype))
    b, h, w, c = x.shape
    y = jnp.stack(
        [jnp.stack(outs[:2], axis=3), jnp.stack(outs[2:], axis=3)], axis=2
    )  # [B, h, 2, w, 2, C]
    return y.reshape(b, 2 * h, 2 * w, c)
