"""Model architecture smoke + structure tests on tiny configs.

Shapes and wiring (skip stack sizes, ControlNet residual counts, zero-conv
init behavior) are checked against the architecture contract the reference
relies on (lcm_controlnet.py:558-577: 12 down residuals + 1 mid for the
SD1.5 4-stage topology).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosd_tpu.models import (
    CLIP_PRESETS,
    TAESDConfig,
    UNET_PRESETS,
    clip_text_apply,
    clip_text_init,
    controlnet_apply,
    controlnet_init,
    taesd_decode,
    taesd_encode,
    taesd_init,
    vae_decode,
    vae_encode,
    vae_init,
    VAEConfig,
)
from videosd_tpu.models.unet import unet_apply, unet_init

TINY = UNET_PRESETS["tiny"]
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def tiny_unet_params():
    return unet_init(KEY, TINY)


def test_unet_forward_shape(tiny_unet_params):
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([599], jnp.int32)
    ctx = jnp.zeros((1, 7, TINY.cross_attention_dim))
    w = jnp.zeros((1, TINY.time_cond_proj_dim))
    out = unet_apply(tiny_unet_params, TINY, x, t, ctx, timestep_cond=w)
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_deepcache_split_is_exact(tiny_unet_params):
    """The DeepCache split (unet.py deep_feature/return_deep_feature) must
    reproduce the full forward BIT-EXACTLY when the shallow pass is fed
    the deep feature captured from the SAME inputs — the shallow path
    recomputes exactly conv_in/down0/up_last, so any disagreement means
    the skip accounting or residual-add placement diverged."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 4)), jnp.float32)
    t = jnp.array([10, 20], jnp.int32)
    ctx = jnp.asarray(rng.normal(0, 1, (2, 7, TINY.cross_attention_dim)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (2, TINY.time_cond_proj_dim)), jnp.float32)

    full = unet_apply(tiny_unet_params, TINY, x, t, ctx, timestep_cond=w)
    out, deep = unet_apply(
        tiny_unet_params, TINY, x, t, ctx, timestep_cond=w, return_deep_feature=True
    )
    assert np.array_equal(np.asarray(full), np.asarray(out))
    shallow = unet_apply(
        tiny_unet_params, TINY, x, t, ctx, timestep_cond=w, deep_feature=deep
    )
    assert np.array_equal(np.asarray(full), np.asarray(shallow))

    # with ControlNet residuals: the shallow pass consumes only the first
    # layers_per_block+1 entries; equality must still hold
    from videosd_tpu.models.controlnet import controlnet_apply, controlnet_init

    cn = controlnet_init(jax.random.PRNGKey(5), TINY)
    ctrl = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)), jnp.float32)
    down_res, mid_res = controlnet_apply(
        cn, TINY, x, t, ctx, ctrl, conditioning_scale=1.0, timestep_cond=w
    )
    # zero-init output convs make residuals vanish; shift them non-zero
    down_res = [r + 0.1 for r in down_res]
    mid_res = mid_res + 0.1
    full = unet_apply(
        tiny_unet_params, TINY, x, t, ctx, timestep_cond=w,
        down_block_additional_residuals=down_res,
        mid_block_additional_residual=mid_res,
    )
    _, deep = unet_apply(
        tiny_unet_params, TINY, x, t, ctx, timestep_cond=w,
        down_block_additional_residuals=down_res,
        mid_block_additional_residual=mid_res,
        return_deep_feature=True,
    )
    shallow = unet_apply(
        tiny_unet_params, TINY, x, t, ctx, timestep_cond=w,
        down_block_additional_residuals=down_res,
        deep_feature=deep,
    )
    assert np.array_equal(np.asarray(full), np.asarray(shallow))


def test_unet_deepcache_rejects_bank_modes(tiny_unet_params):
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([10], jnp.int32)
    ctx = jnp.zeros((1, 7, TINY.cross_attention_dim))
    w = jnp.zeros((1, TINY.time_cond_proj_dim))
    _, deep = unet_apply(
        tiny_unet_params, TINY, x, t, ctx, timestep_cond=w, return_deep_feature=True
    )
    with pytest.raises(ValueError):
        unet_apply(
            tiny_unet_params, TINY, x, t, ctx, timestep_cond=w,
            deep_feature=deep, adain=lambda a: a,
        )


def test_unet_batch_and_res_invariance(tiny_unet_params):
    ctx = jnp.zeros((2, 7, TINY.cross_attention_dim))
    t = jnp.array([10, 20], jnp.int32)
    out = unet_apply(
        tiny_unet_params, TINY, jnp.ones((2, 8, 8, 4)), t, ctx,
        timestep_cond=jnp.zeros((2, TINY.time_cond_proj_dim)),
    )
    assert out.shape == (2, 8, 8, 4)


def test_controlnet_residual_count_and_zero_init(tiny_unet_params):
    cn = controlnet_init(jax.random.PRNGKey(1), TINY)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([100], jnp.int32)
    ctx = jnp.ones((1, 7, TINY.cross_attention_dim))
    cond = jnp.ones((1, 64, 64, 3))  # pixel-space control image (8x latents)
    down, mid = controlnet_apply(
        cn, TINY, x, t, ctx, cond, conditioning_scale=2.0,
        timestep_cond=jnp.zeros((1, TINY.time_cond_proj_dim)),
    )
    # tiny: 2 blocks, 1 layer each -> 1 (conv_in) + 1+1 (block0+down) + 1 = 4
    assert len(down) == 4
    # zero-initialized output convs -> residuals are exactly zero at init
    for r in down:
        np.testing.assert_array_equal(np.asarray(r), 0.0)
    np.testing.assert_array_equal(np.asarray(mid), 0.0)

    # UNet must accept the residuals
    out = unet_apply(
        tiny_unet_params, TINY, x, t, ctx,
        timestep_cond=jnp.zeros((1, TINY.time_cond_proj_dim)),
        down_block_additional_residuals=down,
        mid_block_additional_residual=mid,
    )
    assert out.shape == (1, 8, 8, 4)


def test_sd15_residual_structure():
    """SD1.5 topology: 12 skip tensors + mid (without running the big model)."""
    cfg = UNET_PRESETS["sd15"]
    n = 1 + sum(
        cfg.layers_per_block + (1 if i != len(cfg.block_out_channels) - 1 else 0)
        for i in range(len(cfg.block_out_channels))
    )
    assert n == 12


def test_taesd_roundtrip_shapes():
    p = taesd_init(jax.random.PRNGKey(2), TAESDConfig(hidden=16, blocks_per_stage=1))
    cfg = TAESDConfig(hidden=16, blocks_per_stage=1)
    img = jnp.zeros((1, 32, 32, 3))
    z = taesd_encode(p, img, cfg)
    assert z.shape == (1, 4, 4, 4)
    back = taesd_decode(p, z, cfg)
    assert back.shape == (1, 32, 32, 3)


def test_taesd_packed_convs_match_unpacked():
    """packed_convs evaluates the residual blocks in pixel-pair-packed
    layout (free NHWC reshape + block-packed 3x3 kernels with exact zero
    blocks) — results must match the unpacked path to fp32
    reduction-order.  Covers both the sd15 geometry (hidden=64, the 128-
    lane-exact case the option exists for) and the tiny preset."""
    import dataclasses

    for base in (TAESDConfig(), TAESDConfig(hidden=16, blocks_per_stage=1)):
        packed = dataclasses.replace(base, packed_convs=True)
        p = taesd_init(jax.random.PRNGKey(0), base, dtype=jnp.float32)
        img = jax.random.uniform(
            jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32, -1, 1
        )
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(taesd_encode(p, img, packed)),
            np.asarray(taesd_encode(p, img, base)),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(taesd_decode(p, z, packed)),
            np.asarray(taesd_decode(p, z, base)),
            rtol=1e-5, atol=1e-5,
        )


def test_taesd_pallas_convs_match_unpacked():
    """pallas_convs evaluates the residual blocks with the Pallas
    packed-conv kernel (ops/pallas/taesd_conv.py: halo-DMA'd strips,
    lane-full accumulating matmuls, fused bias/ReLU/skip epilogue) —
    results must match the plain path to fp32 reduction-order.
    Interpreter mode on CPU; batch=2 exercises the batch grid dim."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    base = TAESDConfig()
    pallas = dataclasses.replace(base, pallas_convs=True)
    p = taesd_init(jax.random.PRNGKey(0), base, dtype=jnp.float32)
    img = jax.random.uniform(
        jax.random.PRNGKey(1), (2, 64, 96, 3), jnp.float32, -1, 1
    )
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 12, 4), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        enc_pallas = np.asarray(taesd_encode(p, img, pallas))
        dec_pallas = np.asarray(taesd_decode(p, z, pallas))
    np.testing.assert_allclose(
        enc_pallas, np.asarray(taesd_encode(p, img, base)), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        dec_pallas, np.asarray(taesd_decode(p, z, base)), rtol=1e-5, atol=1e-5
    )


def test_vae_roundtrip_shapes():
    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)
    p = vae_init(jax.random.PRNGKey(3), cfg)
    img = jnp.zeros((1, 16, 16, 3))
    z = vae_encode(p, img, cfg)
    assert z.shape == (1, 8, 8, 4)
    z2 = vae_encode(p, img, cfg, key=jax.random.PRNGKey(4), sample=True)
    assert z2.shape == (1, 8, 8, 4)
    back = vae_decode(p, z, cfg)
    assert back.shape == (1, 16, 16, 3)


def test_clip_text_shapes_and_determinism():
    cfg = CLIP_PRESETS["tiny"]
    p = clip_text_init(jax.random.PRNGKey(5), cfg)
    ids = jnp.array([[1, 5, 9, 999] + [0] * 73], jnp.int32)
    ctx, pooled = clip_text_apply(p, cfg, ids)
    assert ctx.shape == (1, 77, cfg.hidden_size)
    assert pooled.shape == (1, cfg.hidden_size)
    ctx2, _ = clip_text_apply(p, cfg, ids)
    np.testing.assert_array_equal(np.asarray(ctx), np.asarray(ctx2))


def test_clip_causal_mask():
    """A later token must not affect an earlier position's embedding."""
    cfg = CLIP_PRESETS["tiny"]
    p = clip_text_init(jax.random.PRNGKey(6), cfg)
    a = jnp.array([[3, 7, 11, 999] + [0] * 73], jnp.int32)
    b = a.at[0, 3].set(500)
    ctx_a, _ = clip_text_apply(p, cfg, a)
    ctx_b, _ = clip_text_apply(p, cfg, b)
    np.testing.assert_allclose(
        np.asarray(ctx_a[0, :3]), np.asarray(ctx_b[0, :3]), atol=1e-5
    )
    assert np.abs(np.asarray(ctx_a[0, 3]) - np.asarray(ctx_b[0, 3])).max() > 1e-4


def test_guidance_embedding_matches_reference():
    """w-embedding vs the formula at lcm_controlnet.py:347-368."""
    import math

    from videosd_tpu.models.layers import guidance_embedding

    w = np.array([5.0, 7.5], np.float32)
    got = np.asarray(guidance_embedding(w, 256))
    # fp32 throughout, matching torch's fp32 evaluation in the reference
    # (sin of O(5000) args is meaningless to compare across precisions)
    half = 128
    emb = np.float32(math.log(10000.0) / (half - 1))
    freqs = np.exp(np.arange(half, dtype=np.float32) * -emb)
    args = (w * np.float32(1000.0))[:, None] * freqs[None, :]
    want = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    # atol bounded by ulp amplification: args are O(5000) rad, so one fp32
    # ulp of the argument shifts sin by ~2.4e-4 — anything below ~1e-3
    # agreement is precision-equivalent.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)


def test_timestep_embedding_flip_convention():
    from videosd_tpu.models.layers import timestep_embedding

    e = np.asarray(timestep_embedding(jnp.array([0]), 8))
    # t=0: sin parts 0, cos parts 1; flip_sin_to_cos puts cos first
    np.testing.assert_allclose(e[0, :4], 1.0, atol=1e-6)
    np.testing.assert_allclose(e[0, 4:], 0.0, atol=1e-6)


def test_controlnet_guess_mode_ramp():
    """guess_mode ramps residual scales by logspace(-1,0) (diffusers
    semantics the reference invokes with guess_mode=True)."""
    import jax.numpy as jnp

    cn = controlnet_init(jax.random.PRNGKey(9), TINY)
    # give the zero convs nonzero weights so scaling is observable
    cn = jax.tree.map(lambda x: jnp.ones_like(x) * 0.01, cn)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([100], jnp.int32)
    ctx = jnp.ones((1, 7, TINY.cross_attention_dim))
    cond = jnp.ones((1, 64, 64, 3))
    kw = dict(conditioning_scale=1.0, timestep_cond=jnp.zeros((1, TINY.time_cond_proj_dim)))
    down_g, mid_g = controlnet_apply(cn, TINY, x, t, ctx, cond, guess_mode=True, **kw)
    down_p, mid_p = controlnet_apply(cn, TINY, x, t, ctx, cond, guess_mode=False, **kw)
    ramp0 = 10 ** (-1.0)  # first output scale
    np.testing.assert_allclose(
        np.asarray(down_g[0]), np.asarray(down_p[0]) * ramp0, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(mid_g), np.asarray(mid_p), rtol=1e-4)


def test_upsample_conv2d_matches_naive(rng):
    """Phase-decomposed nearest2x+conv3x3 is an exact re-association of the
    naive path (upsample then SAME conv) — fp32 CPU agreement to ~1e-5,
    including all edge/padding phases and bias."""
    import jax
    import jax.numpy as jnp

    from videosd_tpu.models.layers import (
        conv2d,
        conv2d_init,
        upsample_conv2d,
        upsample_nearest2d,
    )

    key = jax.random.PRNGKey(3)
    for h, w, c in ((5, 7, 8), (8, 8, 16)):
        p = conv2d_init(key, c, c)
        p = {k: v + 0.1 for k, v in p.items()}  # non-zero bias
        x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
        ref = conv2d(p, upsample_nearest2d(x))
        got = upsample_conv2d(p, x)
        assert got.shape == ref.shape == (2, 2 * h, 2 * w, c)
        import numpy as np

        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
