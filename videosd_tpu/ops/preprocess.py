"""On-device frame pre/post-processing.

The reference does all of this host-side per frame with PIL (center crop +
LANCZOS resize: diffusert/videopipeline.py:91-107; [-1,1] normalize inside
``VaeImageProcessor.preprocess``; uint8 postprocess at
lcm_controlnet.py:609-618).  Here the whole chain is a jittable function of
a device-resident uint8 NHWC frame, so it fuses into the same XLA program
as the diffusion step (BASELINE north star: "frame preprocessing fused into
the same XLA program").

Crop geometry depends only on static shapes, so it compiles per
(input-shape, output-shape) bucket; resize uses lanczos3 to approximate
PIL's LANCZOS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "center_crop_box",
    "crop_resize",
    "preprocess_frame",
    "postprocess_image",
    "yuv420_to_rgb",
    "rgb_to_i420",
    "i420_to_rgb255",
    "rgb_to_i420_host",
    "i420_to_rgb_host",
]


def center_crop_box(in_w: int, in_h: int, out_w: int, out_h: int):
    """Center-crop box matching diffusert/videopipeline.py:91-107.

    Returns (left, top, right, bottom) as ints (PIL crop floors the floats).
    """
    if in_w / in_h > out_w / out_h:
        new_w = in_h * (out_w / out_h)
        left = (in_w - new_w) / 2
        top = 0.0
        right = (in_w + new_w) / 2
        bottom = float(in_h)
    else:
        new_h = in_w * (out_h / out_w)
        left = 0.0
        top = (in_h - new_h) / 2
        right = float(in_w)
        bottom = (in_h + new_h) / 2
    return int(left), int(top), int(right), int(bottom)


def _lanczos3_kernel(x):
    """Lanczos-3 kernel, exact 1 at x=0 and 0 at nonzero integers (so an
    identity-scale resample is a bit-exact crop)."""
    ax = jnp.abs(x)
    pix = jnp.pi * x
    safe = jnp.where(ax < 1e-6, 1.0, pix)
    val = jnp.where(
        ax < 1e-6,
        1.0,
        (jnp.sin(safe) / safe) * (jnp.sin(safe / 3.0) / (safe / 3.0)),
    )
    return jnp.where(ax < 3.0, val, 0.0)


def _resample_axis(x, start, length, out_n: int, in_cap: int, axis: int):
    """Separable traced-scale lanczos3 resample of ``x`` along ``axis``.

    ``start``/``length`` (traced, integer-valued floats) bound the valid
    source interval; samples never reach outside it (edge-clamped), so
    mailbox zero-padding can NOT bleed into borders.  Tap count is a
    STATIC budget from the worst downscale the mailbox geometry allows;
    for downscales the kernel stretches by the scale factor (antialias),
    matching jax.image.resize/PIL semantics.
    """
    scale = length / out_n
    kscale = jnp.maximum(scale, 1.0)  # antialias stretch when downscaling
    support = 3.0 * kscale
    # static tap budget: worst case is the full mailbox extent mapped down
    max_scale = max(1.0, in_cap / out_n)
    taps = int(np.ceil(2.0 * 3.0 * max_scale)) + 2

    centers = start + (jnp.arange(out_n, dtype=jnp.float32) + 0.5) * scale - 0.5
    lo = jnp.floor(centers - support) + 1.0
    idx = lo[:, None] + jnp.arange(taps, dtype=jnp.float32)[None, :]
    wts = _lanczos3_kernel((idx - centers[:, None]) / kscale)
    wts = wts / jnp.sum(wts, axis=1, keepdims=True)
    last = start + length - 1.0
    idx_i = jnp.clip(idx, start, last).astype(jnp.int32)
    idx_i = jnp.clip(idx_i, 0, in_cap - 1)
    g = jnp.take(x, idx_i.reshape(-1), axis=axis)
    if axis == 0:
        g = g.reshape(out_n, taps, *x.shape[1:])
        return jnp.einsum("ot...,ot->o...", g, wts)
    g = g.reshape(x.shape[0], out_n, taps, *x.shape[2:])
    return jnp.einsum("not...,ot->no...", g, wts)


def crop_resize(
    frame_u8: jax.Array, box: jax.Array, out_h: int, out_w: int, dtype=jnp.float32
) -> jax.Array:
    """Per-element TRACED source rectangle -> fixed-size float [0,1] output.

    frame_u8: [B, Hm, Wm, 3] uint8 mailbox frames (camera frames live in
    the top-left corner of a fixed-size mailbox buffer).
    box: [B, 4] int32 (top, left, height, width) — the rectangle to
    resample.  Callers pass the host-computed :func:`center_crop_box` of
    the TRUE camera extent, so crop geometry matches the reference's
    full-resolution center crop (diffusert/videopipeline.py:91-107)
    exactly, while ONE compiled program serves every camera resolution
    that fits the mailbox — the rectangle is traced data, not a shape.

    Separable LANCZOS-3 resampling (the reference resizes with PIL
    LANCZOS, videopipeline.py:107; the static-shape path uses
    jax.image.resize lanczos3) via per-axis ``jnp.take`` + weighted
    reduction.  Samples are edge-clamped to the box, so mailbox padding
    never bleeds into borders; when the rectangle already has the output
    size every weight collapses onto the exact integer tap and the op
    degenerates to a bit-exact crop.
    """
    _, H, W, _ = frame_u8.shape

    def one(frame, b):
        bf = b.astype(jnp.float32)
        top, left, h, w = bf[0], bf[1], bf[2], bf[3]
        f = frame.astype(jnp.float32)
        rows = _resample_axis(f, top, h, out_h, H, axis=0)
        out = _resample_axis(rows, left, w, out_w, W, axis=1)
        return out / 255.0

    out = jax.vmap(one)(frame_u8, box)
    return jnp.clip(out, 0.0, 1.0).astype(dtype)


def preprocess_frame(
    frame_u8: jax.Array, out_h: int, out_w: int, dtype=jnp.float32
) -> jax.Array:
    """uint8 [..., H, W, 3] -> [..., out_h, out_w, 3] float in [0,1].

    Center-crops to the target aspect ratio then resizes (lanczos3 ~= PIL
    LANCZOS, videopipeline.py:107).  Output in [0,1]; use
    ``x * 2 - 1`` for the VAE's [-1,1] domain.
    """
    in_h, in_w = frame_u8.shape[-3], frame_u8.shape[-2]
    left, top, right, bottom = center_crop_box(in_w, in_h, out_w, out_h)
    cropped = frame_u8[..., top:bottom, left:right, :]
    x = cropped.astype(jnp.float32) / 255.0
    out_shape = x.shape[:-3] + (out_h, out_w, 3)
    if (bottom - top, right - left) != (out_h, out_w):
        x = jax.image.resize(x, out_shape, method="lanczos3")
        x = jnp.clip(x, 0.0, 1.0)
    return x.astype(dtype)


def postprocess_image(img: jax.Array) -> jax.Array:
    """[-1,1] float NHWC -> uint8 NHWC (lcm_controlnet.py:609-618 semantics:
    denormalize to [0,1], clamp, round to uint8)."""
    x = jnp.asarray(img, jnp.float32)
    x = jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)
    return jnp.round(x * 255.0).astype(jnp.uint8)


def yuv420_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Planar YUV420 (BT.601 full-range) -> float RGB in [0,1], on device.

    WebRTC decoders hand us I420 planes; the reference converts via PyAV on
    the host (``frame.to_image()``, server.py:108).  Doing it on-TPU keeps
    the host->device copy at 1.5 bytes/pixel instead of 3.

    y: [..., H, W]; u, v: [..., H/2, W/2], all uint8.
    """
    yf = y.astype(jnp.float32)
    # upsample chroma 2x (nearest, matching common swscale fast paths)
    uf = jnp.repeat(jnp.repeat(u.astype(jnp.float32), 2, axis=-2), 2, axis=-1)
    vf = jnp.repeat(jnp.repeat(v.astype(jnp.float32), 2, axis=-2), 2, axis=-1)
    uf = uf[..., : yf.shape[-2], : yf.shape[-1]] - 128.0
    vf = vf[..., : yf.shape[-2], : yf.shape[-1]] - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    rgb = jnp.stack([r, g, b], axis=-1) / 255.0
    return jnp.clip(rgb, 0.0, 1.0)


def rgb_to_i420(img_u8: jax.Array) -> jax.Array:
    """uint8 RGB ``[..., H, W, 3]`` -> packed planar I420
    ``[..., H*3//2, W]`` uint8, on device (BT.601 full-range, the inverse
    pairing of :func:`yuv420_to_rgb`; chroma is 2x2 box-averaged).

    Rationale: diffused output leaves the chip as 3 bytes/pixel RGB and is
    immediately either JPEG-encoded (libjpeg converts to YCbCr 4:2:0
    internally) or VP8-encoded for WebRTC (aiortc/libvpx consume I420 —
    the reference pays this conversion on the host inside
    ``VideoFrame.from_ndarray``, diffusert/server.py:139).  Packing on
    device halves device->host bytes AND removes the host colorspace
    conversion: the packed buffer is exactly libjpeg's raw-data layout
    and ``av.VideoFrame.from_ndarray(..., format="yuv420p")``'s layout.

    Layout (standard contiguous I420, W even, H % 4 == 0): rows
    ``[0, H)`` = Y plane; rows ``[H, H + H//4)`` = U plane (each packed
    row holds two chroma rows of W//2); rows ``[H + H//4, 3H//2)`` = V.
    """
    H, W = img_u8.shape[-3], img_u8.shape[-2]
    if H % 4 or W % 2:
        raise ValueError(f"I420 pack needs H%4==0 and W%2==0, got {H}x{W}")
    f = img_u8.astype(jnp.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def sub(c):  # 2x2 box-average to half resolution
        c = c.reshape(*c.shape[:-2], H // 2, 2, W // 2, 2)
        return (c.sum(axis=-1).sum(axis=-2)) * 0.25

    q = lambda x: jnp.round(jnp.clip(x, 0.0, 255.0)).astype(jnp.uint8)  # noqa: E731
    yq = q(y)
    # (H//2, W//2) -> (H//4, W): row-major reshape packs chroma-row pairs
    # into full-width rows — exactly the contiguous I420 plane layout
    uq = q(sub(u)).reshape(*y.shape[:-2], H // 4, W)
    vq = q(sub(v)).reshape(*y.shape[:-2], H // 4, W)
    return jnp.concatenate([yq, uq, vq], axis=-2)


def i420_to_rgb255(packed: jax.Array) -> jax.Array:
    """Packed planar I420 ``[..., H*3//2, W]`` uint8 -> float32 RGB
    ``[..., H, W, 3]`` in [0, 255], on device.

    The camera-input counterpart of :func:`rgb_to_i420`: frames upload
    host->device as packed 4:2:0 (1.5 bytes/pixel — half of RGB24) and
    unpack inside the frame program, where the conversion fuses into the
    preprocess stage for free.  Output is 0..255 float because both
    :func:`crop_resize` and :func:`preprocess_frame` accept float frames
    in that range (they divide by 255 themselves)."""
    H = (packed.shape[-2] * 2) // 3
    W = packed.shape[-1]
    lead = packed.shape[:-2]
    y = packed[..., :H, :]
    u = packed[..., H : H + H // 4, :].reshape(*lead, H // 2, W // 2)
    v = packed[..., H + H // 4 :, :].reshape(*lead, H // 2, W // 2)
    return yuv420_to_rgb(y, u, v) * 255.0


def rgb_to_i420_host(img: "np.ndarray") -> "np.ndarray":
    """uint8 RGB ``[H, W, 3]`` -> packed planar I420 ``[H*3//2, W]``
    uint8, on host (numpy) — the same BT.601 full-range math as
    :func:`rgb_to_i420`.  Fallback pack for camera inputs that arrive as
    RGB when the engine's input format is i420 (raw-RGB24 WS uploads,
    non-4:2:0 JPEGs the native raw decoder rejects)."""
    H, W = img.shape[:2]
    if H % 4 or W % 2:
        raise ValueError(f"I420 pack needs H%4==0 and W%2==0, got {H}x{W}")
    f = img.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def sub(c):
        return c.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))

    q = lambda x: np.clip(x, 0.0, 255.0).round().astype(np.uint8)  # noqa: E731
    out = np.empty((H * 3 // 2, W), np.uint8)
    out[:H] = q(y)
    out[H : H + H // 4] = q(sub(u)).reshape(H // 4, W)
    out[H + H // 4 :] = q(sub(v)).reshape(H // 4, W)
    return out


def i420_to_rgb_host(buf: "np.ndarray") -> "np.ndarray":
    """Packed I420 ``[H*3//2, W]`` uint8 -> RGB24 ``[H, W, 3]`` uint8, on
    host (numpy).  Nearest-neighbor chroma upsample, matching
    :func:`yuv420_to_rgb`.  Used where a consumer demands RGB out of an
    I420-mode engine: the raw-RGB24 WS reply path and reference-frame
    feedback (both off the device hot path)."""
    H = (buf.shape[0] * 2) // 3
    W = buf.shape[1]
    y = buf[:H].astype(np.float32)
    u = buf[H : H + H // 4].reshape(H // 2, W // 2).astype(np.float32) - 128.0
    v = buf[H + H // 4 :].reshape(H // 2, W // 2).astype(np.float32) - 128.0
    u = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)
    v = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 255.0).round().astype(np.uint8)
