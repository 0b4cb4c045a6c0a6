"""int8 w8a8 quantization: numerics, walker policy, engine wiring.

The reference has no quantization path (fp16 torch, videopipeline.py:70);
this is a beyond-reference opt-in memory lever (ops/quant.py — measured
NOT a speed win on this stack, see PERF.md "int8 w8a8 re-probe").  All
tests run on the CPU mesh — the int8 dot lowers everywhere; only its
speed is TPU-specific.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosd_tpu.models.layers import (
    linear,
    linear_init,
    linear_w8a8,
    quantize_linear,
)
from videosd_tpu.models.unet import (
    UNET_PRESETS,
    cross_attn_apply,
    cross_attn_init,
    unet_apply,
    unet_init,
)
from videosd_tpu.ops.quant import (
    quant_stats,
    quantize_bundle_params,
    quantize_transformer_linears,
)

KEY = jax.random.PRNGKey(7)
TINY = UNET_PRESETS["tiny"]


# ------------------------------------------------------------------ numerics


def test_weight_reconstruction_error_bounded():
    p = linear_init(KEY, 64, 48)
    q = quantize_linear(p)
    assert q["w8"].dtype == jnp.int8
    assert q["sw"].shape == (48,)
    recon = np.asarray(q["w8"], np.float32) * np.asarray(q["sw"])[None, :]
    k = np.asarray(p["kernel"], np.float32)
    # symmetric per-channel: max error is half an int8 step of that channel
    col_max = np.abs(k).max(0)
    assert (np.abs(recon - k) <= col_max / 127.0 * 0.5 + 1e-7).all()


def test_linear_dispatches_on_w8_and_matches():
    p = linear_init(KEY, 96, 64)
    q = quantize_linear(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 17, 96), jnp.float32)
    y_ref = linear(p, x)
    y_q = linear(q, x)  # dispatch via the "w8" leaf
    assert y_q.dtype == y_ref.dtype
    rel = np.linalg.norm(np.asarray(y_q - y_ref)) / np.linalg.norm(np.asarray(y_ref))
    assert rel < 0.02, rel
    # bias must be carried through the quantized path
    assert not np.allclose(np.asarray(linear_w8a8(q, x)), 0)


def test_quantized_linear_handles_zero_input():
    q = quantize_linear(linear_init(KEY, 8, 8, bias=False))
    y = linear(q, jnp.zeros((2, 8)))
    assert np.asarray(jnp.isfinite(y)).all()
    assert np.allclose(np.asarray(y), 0)


def test_fused_qkv_quantized_self_attention_matches():
    p = cross_attn_init(KEY, 32, 32, 32)
    q = {k: quantize_linear(v) for k, v in p.items()}
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 32), jnp.float32)
    y_ref = cross_attn_apply(p, x, x, num_heads=4, impl="xla")
    y_q = cross_attn_apply(q, x, x, num_heads=4, impl="xla")
    rel = np.linalg.norm(np.asarray(y_q - y_ref)) / np.linalg.norm(np.asarray(y_ref))
    assert rel < 0.05, rel


def test_fused_kv_quantized_banked_context_matches():
    # context is NOT x -> exercises the quantized wkv branch (the
    # reference-attention READ pass shape, lcm_reference_pipeline.py:498-585)
    p = cross_attn_init(KEY, 32, 32, 32)
    q = {k: quantize_linear(v) for k, v in p.items()}
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 32), jnp.float32)
    ctx = jnp.concatenate([x, x * 0.5], axis=1)
    y_ref = cross_attn_apply(p, x, ctx, num_heads=4, impl="xla")
    y_q = cross_attn_apply(q, x, ctx, num_heads=4, impl="xla")
    rel = np.linalg.norm(np.asarray(y_q - y_ref)) / np.linalg.norm(np.asarray(y_ref))
    assert rel < 0.05, rel


# ------------------------------------------------------------------ walker


@pytest.fixture(scope="module")
def tiny_params():
    return unet_init(KEY, TINY)


def test_walker_policy_ffn_always_attn_gated(tiny_params):
    # tiny dims (32) sit below the 640 attention threshold: ff quantizes,
    # attention projections stay bf16
    q = quantize_transformer_linears(tiny_params)
    stats = quant_stats(q)
    assert stats["quantized_linears"] > 0
    flat = jax.tree_util.tree_flatten_with_path(q)[0]
    for path, _ in flat:
        names = [getattr(p, "key", "") for p in path]
        if "w8" in names or "sw" in names:
            assert "ff" in names, names  # only feed-forwards at tiny dims
    # attention quantizes once the dim threshold admits it
    q2 = quantize_transformer_linears(tiny_params, min_attn_dim=0)
    flat2 = jax.tree_util.tree_flatten_with_path(q2)[0]
    attn_q = [
        [getattr(p, "key", "") for p in path]
        for path, _ in flat2
        if "w8" in [getattr(p, "key", "") for p in path]
    ]
    assert any("attn1" in names for names in attn_q)
    # cross-attention k/v (77-token matmul) must NEVER quantize
    for names in attn_q:
        if "attn2" in names:
            assert "to_k" not in names and "to_v" not in names, names


def test_walker_idempotent_and_leaf_sharing(tiny_params):
    q1 = quantize_transformer_linears(tiny_params, min_attn_dim=0)
    q2 = quantize_transformer_linears(q1, min_attn_dim=0)
    p1 = jax.tree_util.tree_flatten_with_path(q1)[0]
    p2 = dict(jax.tree_util.tree_flatten_with_path(q2)[0])
    assert all(p2[path] is leaf for path, leaf in p1)
    # untouched leaves are shared, not copied
    assert q1["conv_in"]["kernel"] is tiny_params["conv_in"]["kernel"]


def test_quantized_tiny_unet_forward_close(tiny_params):
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    t = jnp.array([599], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(5), (1, 7, TINY.cross_attention_dim))
    w = jnp.zeros((1, TINY.time_cond_proj_dim))
    y_ref = unet_apply(tiny_params, TINY, x, t, ctx, timestep_cond=w)
    q = quantize_transformer_linears(tiny_params, min_attn_dim=0)
    y_q = unet_apply(q, TINY, x, t, ctx, timestep_cond=w)
    assert y_q.shape == y_ref.shape
    rel = np.linalg.norm(np.asarray(y_q - y_ref)) / np.linalg.norm(np.asarray(y_ref))
    assert rel < 0.05, rel


def test_bundle_quantizer_skips_vae_and_clip(tiny_params):
    params = {"unet": tiny_params, "controlnet": None, "clip": {"emb": jnp.ones((4, 4))}}
    q = quantize_bundle_params(params)
    assert q["clip"]["emb"] is params["clip"]["emb"]
    assert q["controlnet"] is None
    assert quant_stats(q["unet"])["quantized_linears"] > 0


# ------------------------------------------------------------------ config / engine


def test_config_coercion():
    from videosd_tpu.config import ServerConfig

    cfg = ServerConfig.from_dict({"quant": "INT8"})
    assert cfg.quant == "int8"
    assert ServerConfig.from_dict({}).quant == "none"
    with pytest.raises(ValueError):
        ServerConfig.from_dict({"quant": "fp4"})


def test_engine_applies_quant_to_bundle():
    from videosd_tpu.config import ServerConfig
    from videosd_tpu.runtime.engine import Engine

    cfg = ServerConfig.from_dict(
        {"family": "tiny", "weights": "random", "quant": "int8"}
    )
    eng = Engine(cfg)
    stats = quant_stats(eng.bundle.params["unet"])
    assert stats["quantized_linears"] > 0
