"""Sobel + preprocess ops vs. independent NumPy/PIL references.

Sobel expectations re-implement the reference op's math
(diffusert/lcm/canny_gpu.py:27-44) with scipy; crop geometry expectations
re-state diffusert/videopipeline.py:91-107.
"""

import numpy as np
import pytest
from PIL import Image
from scipy.signal import convolve2d

from videosd_tpu.ops import (
    center_crop_box,
    postprocess_image,
    preprocess_frame,
    rgb_to_gray,
    sobel_control_image,
    sobel_edges,
    yuv420_to_rgb,
)

KX = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
KY = np.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]])


def ref_sobel(gray, low, high):
    # conv2d semantics (cross-correlation with zero padding), as in
    # torch.nn.Conv2d with these kernels
    ex = convolve2d(gray, KX[::-1, ::-1], mode="same", boundary="fill")
    ey = convolve2d(gray, KY[::-1, ::-1], mode="same", boundary="fill")
    edge = np.sqrt(ex**2 + ey**2)
    edge = edge / edge.max()
    edge = np.where(edge >= high, 1.0, edge)
    edge = np.where(edge <= low, 0.0, edge)
    return edge


def test_rgb_to_gray_matches_pil(rng):
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    pil_gray = np.asarray(Image.fromarray(img).convert("L"), dtype=np.float64) / 255.0
    ours = np.asarray(rgb_to_gray(img.astype(np.float32) / 255.0))
    assert np.abs(ours - pil_gray).max() <= (1.5 / 255.0)


def test_sobel_matches_reference_math(rng):
    gray = rng.random((32, 40)).astype(np.float32)
    want = ref_sobel(gray.astype(np.float64), 0.11, 0.8)
    got = np.asarray(sobel_edges(gray, 0.11, 0.8))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sobel_batched(rng):
    gray = rng.random((2, 16, 16)).astype(np.float32)
    got = np.asarray(sobel_edges(gray, 0.11, 0.8))
    for i in range(2):
        want = ref_sobel(gray[i].astype(np.float64), 0.11, 0.8)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_sobel_control_image_shape(rng):
    rgb = rng.random((1, 16, 16, 3)).astype(np.float32)
    ctrl = np.asarray(sobel_control_image(rgb))
    assert ctrl.shape == (1, 16, 16, 3)
    assert (ctrl >= 0).all() and (ctrl <= 1).all()
    # all three channels identical
    np.testing.assert_array_equal(ctrl[..., 0], ctrl[..., 1])


@pytest.mark.parametrize(
    "in_wh,out_wh",
    [((640, 360), (512, 512)), ((360, 640), (512, 512)), ((640, 480), (640, 360)),
     ((512, 512), (512, 512))],
)
def test_center_crop_box_matches_reference(in_wh, out_wh):
    in_w, in_h = in_wh
    out_w, out_h = out_wh
    # reference formula, videopipeline.py:91-106
    if in_w / in_h > out_w / out_h:
        new_w = in_h * (out_w / out_h)
        want = ((in_w - new_w) / 2, 0, (in_w + new_w) / 2, in_h)
    else:
        new_h = in_w * (out_h / out_w)
        want = (0, (in_h - new_h) / 2, in_w, (in_h + new_h) / 2)
    got = center_crop_box(in_w, in_h, out_w, out_h)
    assert got == tuple(int(v) for v in want)


def test_preprocess_frame_identity_passthrough(rng):
    img = rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)
    out = np.asarray(preprocess_frame(img, 64, 64))
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)


def test_preprocess_frame_crop_resize(rng):
    img = rng.integers(0, 256, (1, 48, 96, 3), dtype=np.uint8)
    out = np.asarray(preprocess_frame(img, 32, 32))
    assert out.shape == (1, 32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_postprocess_roundtrip(rng):
    img = rng.integers(0, 256, (1, 8, 8, 3), dtype=np.uint8)
    x = img.astype(np.float32) / 255.0 * 2.0 - 1.0
    back = np.asarray(postprocess_image(x))
    np.testing.assert_array_equal(back, img)


def test_yuv420_to_rgb_primaries():
    # gray: Y=128, U=V=128 -> RGB ~0.5
    y = np.full((4, 4), 128, np.uint8)
    u = np.full((2, 2), 128, np.uint8)
    v = np.full((2, 2), 128, np.uint8)
    rgb = np.asarray(yuv420_to_rgb(y, u, v))
    np.testing.assert_allclose(rgb, 128 / 255.0, atol=1e-3)
    # pure red-ish: V high
    v2 = np.full((2, 2), 255, np.uint8)
    rgb2 = np.asarray(yuv420_to_rgb(y, u, v2))
    assert rgb2[..., 0].mean() > 0.9 and rgb2[..., 1].mean() < 0.3


# ------------------------------------------------------------ jpeg codec


def test_jpeg_codec_roundtrip_matches_pil():
    """Native libjpeg binding: decode is bit-identical to PIL's decode of
    the same bytes; PIL-encoded streams decode; corrupt streams raise."""
    import io

    import numpy as np
    from PIL import Image

    from videosd_tpu.runtime import jpegcodec

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(x).resize((128, 128), Image.BILINEAR))

    data = jpegcodec.encode_rgb(img)
    dec = jpegcodec.decode_rgb(data)
    assert dec.shape == (128, 128, 3) and dec.dtype == np.uint8
    pil_dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(dec, pil_dec)

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=85)
    assert jpegcodec.decode_rgb(buf.getvalue()).shape == (128, 128, 3)

    import pytest

    # truly corrupt streams raise (from PIL, which is also the fallback
    # when the native path rejects a stream)
    with pytest.raises(Exception):
        jpegcodec.decode_rgb(b"\xff\xd8garbage")


def test_crop_resize_exact_when_box_matches_output():
    """A traced source box whose size equals the output degenerates to a
    bit-exact crop (integer sample positions, zero bilinear weights)."""
    import jax.numpy as jnp
    import numpy as np

    from videosd_tpu.ops import crop_resize

    rng = np.random.default_rng(0)
    mailbox = np.zeros((1, 64, 64, 3), np.uint8)
    patch = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    mailbox[0, :40, :40] = patch
    out = np.asarray(
        crop_resize(
            jnp.asarray(mailbox), jnp.asarray([[4, 4, 32, 32]], jnp.int32), 32, 32
        )
    )
    np.testing.assert_allclose(
        out[0], patch[4:36, 4:36].astype(np.float32) / 255.0, atol=1e-6
    )


def test_crop_resize_upscale_borders_clamp_to_box():
    """Upscaling a small camera box must NOT bleed mailbox zero-padding
    (black) into the borders: samples are edge-clamped to the box, so a
    uniform source stays uniform (the bilinear first cut blended ~25%
    black into the last row/col — caught in review, pinned here)."""
    import jax.numpy as jnp
    import numpy as np

    from videosd_tpu.ops import crop_resize

    mailbox = np.zeros((1, 64, 64, 3), np.uint8)
    mailbox[0, :24, :32] = 200  # 24x32 camera frame, uniform
    box = jnp.asarray([[0, 0, 24, 32]], jnp.int32)
    out = np.asarray(crop_resize(jnp.asarray(mailbox), box, 48, 64))
    np.testing.assert_allclose(out, 200.0 / 255.0, atol=2e-3)

    # gradient content: first output row equals the first source row
    grad = np.zeros((1, 64, 64, 3), np.uint8)
    grad[0, :4, :8] = np.arange(4, dtype=np.uint8)[None, :, None, None] * 60
    out = np.asarray(
        crop_resize(jnp.asarray(grad), jnp.asarray([[0, 0, 4, 8]], jnp.int32), 8, 8)
    )
    assert abs(float(out[0, 0, 0, 0]) - 0.0) < 2e-2  # row0 ~= source row0
    assert abs(float(out[0, 7, 0, 0]) - 180.0 / 255.0) < 2e-2


def test_crop_resize_downscale_matches_static_lanczos():
    """A full-frame box downscale must track the static path's
    jax.image.resize lanczos3 (reference: PIL LANCZOS,
    videopipeline.py:107) — the traced path may not silently swap the
    resampling filter."""
    import jax.numpy as jnp
    import numpy as np

    from videosd_tpu.ops import crop_resize, preprocess_frame

    rng = np.random.default_rng(3)
    # smooth-ish content (noise through a box blur) at 48x48 -> 32x32
    raw = rng.integers(0, 256, (1, 48, 48, 3)).astype(np.float32)
    k = np.ones((5, 5)) / 25.0
    sm = np.stack(
        [
            np.stack(
                [
                    np.real(
                        np.fft.ifft2(
                            np.fft.fft2(raw[0, :, :, c])
                            * np.fft.fft2(k, s=(48, 48))
                        )
                    )
                    for c in range(3)
                ],
                axis=-1,
            )
        ]
    )
    frame = np.clip(sm, 0, 255).astype(np.uint8)
    want = np.asarray(preprocess_frame(jnp.asarray(frame), 32, 32))
    box = jnp.asarray([[0, 0, 48, 48]], jnp.int32)
    got = np.asarray(crop_resize(jnp.asarray(frame), box, 32, 32))
    # same kernel family; tolerate border-handling differences
    assert np.abs(got - want).mean() < 3e-3
    assert np.abs(got[:, 2:-2, 2:-2] - want[:, 2:-2, 2:-2]).max() < 3e-2


def test_crop_resize_center_crops_true_camera_extent():
    """The VERDICT regression case: a 768x576 camera frame in a 768x768
    mailbox must center-crop the middle 576 columns (the old top-left
    mailbox fit silently lost the right third).  Geometry comes from the
    same center_crop_box as the static path (videopipeline.py:91-107)."""
    import jax.numpy as jnp
    import numpy as np

    from videosd_tpu.ops import center_crop_box, crop_resize

    frame = np.zeros((1, 768, 768, 3), np.uint8)  # mailbox, camera 576x768
    frame[0, :576, :96, 0] = 255  # left strip red
    frame[0, :576, 96:672, 1] = 255  # center green
    frame[0, :576, 672:768, 2] = 255  # right strip blue
    left, top, right, bottom = center_crop_box(768, 576, 512, 512)
    box = jnp.asarray([[top, left, bottom - top, right - left]], jnp.int32)
    out = np.asarray(crop_resize(jnp.asarray(frame), box, 512, 512))
    assert out.shape == (1, 512, 512, 3)
    inner = out[0, 2:-2, 2:-2, :]
    assert inner[..., 1].min() > 0.9  # all green: centered crop
    assert inner[..., 0].max() < 0.1  # no red (left strip cropped away)
    assert inner[..., 2].max() < 0.1  # no blue (right strip cropped away)


def test_jpeg_dims_header_parse():
    """The SOF scanner sizes decode buffers to the actual frame (a fixed
    4K bound pinned ~24 MB per executor thread); it must read dimensions
    from both baseline and progressive streams and reject non-JPEG."""
    import io

    import numpy as np
    from PIL import Image

    from videosd_tpu.runtime.jpegcodec import _jpeg_dims

    img = Image.fromarray(np.zeros((48, 64, 3), np.uint8))
    for kwargs in ({}, {"progressive": True}, {"quality": 10}):
        buf = io.BytesIO()
        img.save(buf, "JPEG", **kwargs)
        assert _jpeg_dims(buf.getvalue()) == (48, 64), kwargs

    assert _jpeg_dims(b"\xff\xd8garbage-not-a-jpeg") is None


def test_rgb_to_i420_roundtrip_and_layout():
    """Device-side I420 pack: layout must be standard contiguous I420
    (Y plane, then U, then V with chroma-row pairs packed full-width),
    and the yuv420_to_rgb/i420_to_rgb_host pairing must round-trip
    smooth content to high accuracy."""
    import jax.numpy as jnp
    import numpy as np

    from videosd_tpu.ops import i420_to_rgb_host, rgb_to_i420, yuv420_to_rgb

    H, W = 32, 48
    rng = np.random.default_rng(11)
    # smooth content: chroma subsampling is near-lossless on it
    base = rng.integers(40, 216, (4, 4, 3)).astype(np.float32)
    img = np.clip(
        np.stack(
            [
                np.kron(base[..., c], np.ones((H // 4, W // 4)))
                for c in range(3)
            ],
            axis=-1,
        ),
        0,
        255,
    ).astype(np.uint8)

    packed = np.asarray(rgb_to_i420(jnp.asarray(img)))
    assert packed.shape == (H * 3 // 2, W) and packed.dtype == np.uint8

    # gray input -> flat chroma at 128, Y == luma
    gray = np.full((H, W, 3), 77, np.uint8)
    pg = np.asarray(rgb_to_i420(jnp.asarray(gray)))
    np.testing.assert_array_equal(pg[:H], 77)
    np.testing.assert_array_equal(pg[H:], 128)

    # round-trip through the device-side unpack op
    y = jnp.asarray(packed[:H])
    u = jnp.asarray(packed[H : H + H // 4].reshape(H // 2, W // 2))
    v = jnp.asarray(packed[H + H // 4 :].reshape(H // 2, W // 2))
    back = np.asarray(yuv420_to_rgb(y, u, v)) * 255.0
    assert np.abs(back - img.astype(np.float32)).mean() < 2.0

    # and through the host-side unpack (raw-RGB reply path)
    back_h = i420_to_rgb_host(packed).astype(np.float32)
    assert np.abs(back_h - img.astype(np.float32)).mean() < 2.0

    # batched pack matches per-image pack
    batch = np.stack([img, gray])
    pb = np.asarray(rgb_to_i420(jnp.asarray(batch)))
    np.testing.assert_array_equal(pb[0], packed)
    np.testing.assert_array_equal(pb[1], pg)


def test_rgb_to_i420_matches_pil_ycbcr():
    """The Y'CbCr matrix must be the JFIF/BT.601 full-range one (what
    libjpeg and PIL use), not the limited-range TV matrix: compare the Y
    plane and 2x2-averaged chroma against PIL's YCbCr conversion."""
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from videosd_tpu.ops import rgb_to_i420

    H, W = 16, 16
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    packed = np.asarray(rgb_to_i420(jnp.asarray(img)))

    ycc = np.asarray(Image.fromarray(img).convert("YCbCr")).astype(np.float32)
    # PIL truncates the float matrix per pixel; allow 1 count of rounding
    assert np.abs(packed[:H].astype(np.float32) - ycc[..., 0]).max() <= 1.0
    cb = ycc[..., 1].reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
    cr = ycc[..., 2].reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
    u = packed[H : H + H // 4].reshape(H // 2, W // 2).astype(np.float32)
    v = packed[H + H // 4 :].reshape(H // 2, W // 2).astype(np.float32)
    assert np.abs(u - cb).max() <= 1.5
    assert np.abs(v - cr).max() <= 1.5


def test_encode_i420_matches_rgb_encoder():
    """The raw-YCbCr native encode path must be visually identical to the
    RGB encode path (same libjpeg quantization; the device already did the
    colorspace conversion + 2x2 downsample libjpeg would have done), and
    the PIL fallback (non-MCU-friendly widths) must stay close."""
    import jax.numpy as jnp
    import numpy as np

    from videosd_tpu.ops import rgb_to_i420
    from videosd_tpu.runtime import jpegcodec as jc

    rng = np.random.default_rng(5)
    base = rng.integers(30, 220, (8, 8, 3)).astype(np.float32)
    img = np.clip(
        np.stack([np.kron(base[..., c], np.ones((8, 8))) for c in range(3)], -1),
        0,
        255,
    ).astype(np.uint8)  # 64x64 smooth
    packed = np.asarray(rgb_to_i420(jnp.asarray(img)))

    err = lambda a, b: np.abs(  # noqa: E731
        a.astype(np.float32) - b.astype(np.float32)
    ).mean()
    via_i420 = jc.decode_rgb(jc.encode_i420(packed, 90))
    via_rgb = jc.decode_rgb(jc.encode_rgb(img, 90))
    assert via_i420.shape == img.shape
    # same quantization pipeline -> near-identical reconstructions
    assert err(via_i420, via_rgb) < 1.0
    assert err(via_i420, img) < 8.0

    # w=24 is not MCU-friendly: exercises the unpack+PIL fallback
    img_n = img[:32, :24]
    packed_n = np.asarray(rgb_to_i420(jnp.asarray(img_n)))
    via_fb = jc.decode_rgb(jc.encode_i420(packed_n, 90))
    assert via_fb.shape == img_n.shape
    assert err(via_fb, img_n) < 10.0


def test_i420_input_ops_roundtrip():
    """Input-side i420 ops: the host pack matches the device pack
    bit-for-bit, and the device unpack (i420_to_rgb255) recovers smooth
    content through the pack to high accuracy."""
    import jax.numpy as jnp
    import numpy as np

    from videosd_tpu.ops import i420_to_rgb255, rgb_to_i420, rgb_to_i420_host

    H, W = 32, 48
    rng = np.random.default_rng(17)
    base = rng.integers(40, 216, (4, 4, 3)).astype(np.float32)
    img = np.clip(
        np.stack(
            [np.kron(base[..., c], np.ones((H // 4, W // 4))) for c in range(3)],
            axis=-1,
        ),
        0,
        255,
    ).astype(np.uint8)

    dev = np.asarray(rgb_to_i420(jnp.asarray(img)))
    host = rgb_to_i420_host(img)
    np.testing.assert_array_equal(dev, host)

    back = np.asarray(i420_to_rgb255(jnp.asarray(dev)))
    assert back.shape == (H, W, 3)
    assert np.abs(back - img.astype(np.float32)).mean() < 2.0

    # batched unpack
    batch = np.stack([dev, dev])
    backb = np.asarray(i420_to_rgb255(jnp.asarray(batch)))
    np.testing.assert_allclose(backb[0], back, atol=1e-4)


def test_decode_i420_paths():
    """JPEG -> packed I420 decode: the native raw path (4:2:0, /16 dims)
    and the fallbacks (4:4:4 JPEG, odd sizes) all return the packed
    layout and reconstruct the image."""
    import io

    import numpy as np
    from PIL import Image

    from videosd_tpu.ops.preprocess import i420_to_rgb_host
    from videosd_tpu.runtime import jpegcodec as jc

    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    img = np.stack([yy * 2, xx * 2, yy + xx], -1).clip(0, 255).astype(np.uint8)

    def enc(im, **kw):
        buf = io.BytesIO()
        Image.fromarray(im).save(buf, "JPEG", **kw)
        return buf.getvalue()

    # 4:2:0 /16 dims: native raw path (when the lib is available)
    packed = jc.decode_i420(enc(img, quality=90))
    assert packed.shape == (96, 64) and packed.dtype == np.uint8
    back = i420_to_rgb_host(packed).astype(np.float32)
    assert np.abs(back - img.astype(np.float32)).mean() < 2.0
    # must stay near the RGB decode of the same bytes
    ref = jc.decode_rgb(enc(img, quality=90)).astype(np.float32)
    assert np.abs(back - ref).mean() < 2.0

    # 4:4:4 JPEG -> RGB decode + host pack fallback
    p2 = jc.decode_i420(enc(img, quality=96, subsampling=0))
    assert p2.shape == (96, 64)
    assert np.abs(i420_to_rgb_host(p2).astype(np.float32) - img).mean() < 2.0

    # odd size -> fallback trims to the chroma grid
    p3 = jc.decode_i420(enc(img[:50, :42], quality=90))
    assert p3.shape == (48 * 3 // 2, 42)
