"""Model-family coverage: SDXL-topology (text_time), warm-start, presets.

Validates the BASELINE stretch configs' program shapes on tiny stand-ins:
config 4's SDXL micro-conditioning path and config 5's temporal latent
warm-start.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosd_tpu.models.unet import UNET_PRESETS, unet_apply, unet_init
from videosd_tpu.pipelines.lcm_img2img import (
    FrameSpec,
    ModelBundle,
    build_frame_program,
    build_prompt_encoder,
)


def test_sdxl_preset_structure():
    cfg = UNET_PRESETS["sdxl"]
    assert cfg.block_out_channels == (320, 640, 1280)
    assert cfg.transformer_depth == (0, 2, 10)
    assert cfg.cross_attention_dim == 2048
    assert cfg.addition_embed_type == "text_time"
    assert cfg.projection_class_embeddings_input_dim == 2816
    assert cfg.num_heads(1280) == 20  # 1280 / 64 per-head dim


def test_sd21_preset_structure():
    cfg = UNET_PRESETS["sd21"]
    assert cfg.cross_attention_dim == 1024
    assert cfg.use_linear_projection and not cfg.head_dim_is_num_heads


def test_tiny_xl_unet_forward():
    cfg = UNET_PRESETS["tiny-xl"]
    p = unet_init(jax.random.PRNGKey(0), cfg)
    out = unet_apply(
        p,
        cfg,
        jnp.zeros((1, 8, 8, 4)),
        jnp.array([100], jnp.int32),
        jnp.zeros((1, 7, cfg.cross_attention_dim)),
        added_cond_kwargs={
            "text_embeds": jnp.zeros((1, 32)),
            "time_ids": jnp.zeros((1, 6)),
        },
    )
    assert out.shape == (1, 8, 8, 4)


@pytest.fixture(scope="module")
def xl_bundle():
    return ModelBundle.random("tiny-xl", dtype=jnp.float32, with_controlnet=False)


def test_tiny_xl_frame_program(xl_bundle, rng):
    spec = FrameSpec(batch=1, height=32, width=32, steps=1, use_controlnet=False)
    prog = build_frame_program(xl_bundle, spec)
    enc = build_prompt_encoder(xl_bundle)
    ids = jnp.asarray(xl_bundle.tokenizer(["hello"]), jnp.int32)
    ctx, pooled = enc(xl_bundle.params, ids)
    # dual towers: context is the concat of both (32 + 32)
    assert ctx.shape[-1] == 64
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    out, _ = prog(
        xl_bundle.params,
        frame,
        ctx,
        jnp.array([0.6], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([1.0], jnp.float32),
        jnp.array([3], jnp.int32),
        pooled_embeds=pooled,
    )
    assert out.shape == (1, 32, 32, 3)


def test_tiny_xl_frame_program_with_controlnet(rng):
    """SDXL + ControlNet: text_time conditioning threads into BOTH nets."""
    bundle = ModelBundle.random("tiny-xl", dtype=jnp.float32, with_controlnet=True)
    spec = FrameSpec(batch=1, height=32, width=32, steps=2, use_controlnet=True)
    prog = build_frame_program(bundle, spec)
    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["hello"]), jnp.int32)
    ctx, pooled = enc(bundle.params, ids)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    out, _ = prog(
        bundle.params,
        frame,
        ctx,
        jnp.array([0.6], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([1.5], jnp.float32),
        jnp.array([3], jnp.int32),
        pooled_embeds=pooled,
    )
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out).astype(np.float32)).all()


def test_warm_start_latents(rng):
    bundle = ModelBundle.random("tiny", dtype=jnp.float32)
    spec = FrameSpec(batch=1, height=32, width=32, steps=1)
    prog = build_frame_program(bundle, spec)
    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["x"]), jnp.int32)
    ctx, _ = enc(bundle.params, ids)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    args = (
        jnp.array([0.6], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([2.0], jnp.float32),
        jnp.array([23], jnp.int32),
    )
    out0, lat0 = prog(bundle.params, frame, ctx, *args)
    # alpha=0 with warm latents given == no warm start
    out1, _ = prog(
        bundle.params, frame, ctx, *args,
        warm_latents=lat0, warm_alpha=jnp.array([0.0], jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
    # alpha>0 changes the result
    out2, _ = prog(
        bundle.params, frame, ctx, *args,
        warm_latents=lat0 * 5.0, warm_alpha=jnp.array([0.8], jnp.float32),
    )
    assert np.abs(np.asarray(out2).astype(int) - np.asarray(out0).astype(int)).max() > 0


def test_control_guidance_window(rng):
    """control_guidance_start/end (lcm_controlnet.py:521-529): a window of
    [0, 0) disables ControlNet entirely -> output equals the no-CN spec."""
    import jax.numpy as jnp
    bundle = ModelBundle.random("tiny", dtype=jnp.float32)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["x"]), jnp.int32)
    ctx, _ = enc(bundle.params, ids)
    args = (
        jnp.array([0.6], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([2.0], jnp.float32),
        jnp.array([23], jnp.int32),
    )
    spec_off = FrameSpec(batch=1, height=32, width=32, steps=2,
                         control_guidance_end=0.0)
    spec_on = FrameSpec(batch=1, height=32, width=32, steps=2)
    out_off, _ = build_frame_program(bundle, spec_off)(bundle.params, frame, ctx, *args)
    out_on, _ = build_frame_program(bundle, spec_on)(bundle.params, frame, ctx, *args)
    # window [0,0): CN contributes nothing; since tiny CN has zero-init
    # output convs, both paths agree at init — exercise shape + finiteness
    assert out_off.shape == out_on.shape
    assert np.isfinite(np.asarray(out_off).astype(np.float32)).all()
