"""LoRA adapter loading + fusion (io/lora.py).

BASELINE config 1 is "SD-1.5 + LCM-LoRA"; the reference ships a merged
checkpoint instead (videopipeline.py:57-65).  These tests build synthetic
adapters against the tiny family in all three wire formats and verify the
fusion math, plan-driven name resolution (dotted AND kohya underscore
spellings), conv LoRA layout, partial application, and the config/engine
wiring (fuse-before-quant ordering included).
"""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosd_tpu.io import weights as W
from videosd_tpu.io.lora import (
    LoRAEntry,
    fuse_bundle_loras,
    fuse_lora,
    normalize_lora_setting,
    read_lora,
)
from videosd_tpu.io.safetensors import write_safetensors
from videosd_tpu.models.unet import UNET_PRESETS, unet_apply, unet_init

KEY = jax.random.PRNGKey(11)
TINY = UNET_PRESETS["tiny"]
RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def tiny_params():
    return unet_init(KEY, TINY)


@pytest.fixture(scope="module")
def tiny_plan():
    return W.unet_plan(TINY)


def _linear_modules(plan, n=3):
    return [t[:-7] for _, t, k in plan if k == "linear" and t.endswith(".weight")][:n]


def _conv_modules(plan, n=1):
    return [t[:-7] for _, t, k in plan if k == "conv" and t.endswith(".weight")][:n]


def _torch_shape(plan, module):
    # invert the jax leaf shape back to torch layout for delta synthesis
    for jpath, tkey, kind in plan:
        if tkey == module + ".weight":
            return jpath, kind
    raise KeyError(module)


def _make_entry(params, plan, module, rank=4):
    jpath, kind = _torch_shape(plan, module)
    node = params
    for p in jpath:
        node = node[p]
    if kind == "linear":
        in_dim, out_dim = node.shape  # jax [I, O]
        down = RNG.standard_normal((rank, in_dim), dtype=np.float32) * 0.1
        up = RNG.standard_normal((out_dim, rank), dtype=np.float32) * 0.1
    else:
        kh, kw, in_dim, out_dim = node.shape  # jax HWIO
        down = RNG.standard_normal((rank, in_dim, kh, kw), dtype=np.float32) * 0.1
        up = RNG.standard_normal((out_dim, rank, 1, 1), dtype=np.float32) * 0.1
    return down, up


# ------------------------------------------------------------------ parsing


def test_read_peft_format(tmp_path, tiny_params, tiny_plan):
    mod = _linear_modules(tiny_plan, 1)[0]
    down, up = _make_entry(tiny_params, tiny_plan, mod)
    path = str(tmp_path / "peft.safetensors")
    write_safetensors(
        path,
        {f"unet.{mod}.lora_A.weight": down, f"unet.{mod}.lora_B.weight": up},
    )
    towers = read_lora(path)
    assert set(towers) == {"unet"}
    assert set(towers["unet"]) == {mod}
    e = towers["unet"][mod]
    assert e.rank == 4 and e.alpha is None and e.scaling() == 1.0


def test_read_kohya_format_with_alpha(tmp_path, tiny_params, tiny_plan):
    mod = _linear_modules(tiny_plan, 1)[0]
    down, up = _make_entry(tiny_params, tiny_plan, mod)
    koh = "lora_unet_" + mod.replace(".", "_")
    path = str(tmp_path / "kohya.safetensors")
    write_safetensors(
        path,
        {
            f"{koh}.lora_down.weight": down,
            f"{koh}.lora_up.weight": up,
            f"{koh}.alpha": np.asarray(2.0, np.float32),
        },
    )
    towers = read_lora(path)
    e = towers["unet"][mod.replace(".", "_")]
    assert e.alpha == 2.0 and e.scaling() == pytest.approx(0.5)  # alpha/r = 2/4


def test_read_legacy_processor_format(tmp_path):
    down = RNG.standard_normal((4, 32), dtype=np.float32)
    up = RNG.standard_normal((32, 4), dtype=np.float32)
    base = "mid_block.attentions.0.transformer_blocks.0"
    path = "/tmp/legacy_lora_test.safetensors"
    write_safetensors(
        path,
        {
            f"unet.{base}.processor.to_q_lora.down.weight": down,
            f"unet.{base}.processor.to_q_lora.up.weight": up,
            f"unet.{base}.processor.to_out_lora.down.weight": down,
            f"unet.{base}.processor.to_out_lora.up.weight": up,
        },
    )
    towers = read_lora(path)
    assert f"{base}.attn1.to_q" not in towers["unet"]  # processor keys don't invent attn1
    assert f"{base}.to_q" in towers["unet"]
    assert f"{base}.to_out.0" in towers["unet"]  # to_out_lora -> to_out.0


def test_read_rejects_unknown_keys(tmp_path):
    path = str(tmp_path / "bad.safetensors")
    write_safetensors(path, {"something.weird": np.zeros((2, 2), np.float32)})
    with pytest.raises(KeyError):
        read_lora(path)


def test_read_rejects_half_modules(tmp_path):
    path = str(tmp_path / "half.safetensors")
    write_safetensors(
        path, {"unet.conv_in.lora_A.weight": np.zeros((4, 3), np.float32)}
    )
    with pytest.raises(KeyError):
        read_lora(path)


# ------------------------------------------------------------------- fusion


def test_fuse_linear_math(tiny_params, tiny_plan):
    mod = _linear_modules(tiny_plan, 2)[1]
    down, up = _make_entry(tiny_params, tiny_plan, mod)
    entry = LoRAEntry(down=down, up=up, alpha=2.0)  # scaling 0.5
    fused, unmatched = fuse_lora(
        tiny_params, tiny_plan, {mod: entry}, scale=0.7
    )
    assert unmatched == []
    jpath, _ = _torch_shape(tiny_plan, mod)
    node_old, node_new = tiny_params, fused
    for p in jpath:
        node_old, node_new = node_old[p], node_new[p]
    expect = np.asarray(node_old, np.float32) + 0.7 * 0.5 * (up @ down).T
    np.testing.assert_allclose(np.asarray(node_new, np.float32), expect, rtol=2e-5)


def test_fuse_conv_lora_layout(tiny_params, tiny_plan):
    mod = _conv_modules(tiny_plan, 1)[0]
    down, up = _make_entry(tiny_params, tiny_plan, mod)  # [r,I,kh,kw], [O,r,1,1]
    fused, unmatched = fuse_lora(
        tiny_params, tiny_plan, {mod: LoRAEntry(down=down, up=up)}, scale=1.0
    )
    assert unmatched == []
    jpath, _ = _torch_shape(tiny_plan, mod)
    node_old, node_new = tiny_params, fused
    for p in jpath:
        node_old, node_new = node_old[p], node_new[p]
    delta_t = np.einsum("or,rikl->oikl", up[:, :, 0, 0], down)  # torch OIHW
    expect = np.asarray(node_old, np.float32) + np.transpose(delta_t, (2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(node_new, np.float32), expect, rtol=2e-5)


def test_fuse_kohya_name_resolution(tiny_params, tiny_plan):
    # underscore spelling (incl. to_out.0 -> to_out_0) resolves via the plan
    mods = [m for m in _linear_modules(tiny_plan, 50) if m.endswith("to_out.0")]
    assert mods, "tiny plan should contain attention out projections"
    mod = mods[0]
    down, up = _make_entry(tiny_params, tiny_plan, mod)
    fused, unmatched = fuse_lora(
        tiny_params,
        tiny_plan,
        {mod.replace(".", "_"): LoRAEntry(down=down, up=up)},
    )
    assert unmatched == []


def test_fuse_untouched_leaves_shared(tiny_params, tiny_plan):
    mod = _linear_modules(tiny_plan, 1)[0]
    down, up = _make_entry(tiny_params, tiny_plan, mod)
    fused, _ = fuse_lora(tiny_params, tiny_plan, {mod: LoRAEntry(down=down, up=up)})
    assert fused["conv_in"]["kernel"] is tiny_params["conv_in"]["kernel"]


def test_fuse_reports_unmatched(tiny_params, tiny_plan):
    down = np.zeros((4, 8), np.float32)
    up = np.zeros((8, 4), np.float32)
    fused, unmatched = fuse_lora(
        tiny_params, tiny_plan, {"no.such.module": LoRAEntry(down=down, up=up)}
    )
    assert unmatched == ["no.such.module"]


def test_fuse_shape_mismatch_raises(tiny_params, tiny_plan):
    mod = _linear_modules(tiny_plan, 1)[0]
    with pytest.raises(ValueError):
        fuse_lora(
            tiny_params,
            tiny_plan,
            {mod: LoRAEntry(down=np.zeros((4, 5), np.float32),
                            up=np.zeros((6, 4), np.float32))},
        )


def test_forward_changes_and_zero_scale_identity(tiny_params, tiny_plan):
    mods = _linear_modules(tiny_plan, 3)
    modules = {}
    for m in mods:
        down, up = _make_entry(tiny_params, tiny_plan, m)
        modules[m] = LoRAEntry(down=down, up=up)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    t = jnp.array([500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(5), (1, 7, TINY.cross_attention_dim))
    w = jnp.zeros((1, TINY.time_cond_proj_dim))
    y0 = unet_apply(tiny_params, TINY, x, t, ctx, timestep_cond=w)
    fused, _ = fuse_lora(tiny_params, tiny_plan, modules, scale=1.0)
    y1 = unet_apply(fused, TINY, x, t, ctx, timestep_cond=w)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    same, _ = fuse_lora(tiny_params, tiny_plan, modules, scale=0.0)
    y2 = unet_apply(same, TINY, x, t, ctx, timestep_cond=w)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y0), atol=1e-6)


# --------------------------------------------------------- config / engine


def test_normalize_lora_setting():
    assert normalize_lora_setting(None) == []
    assert normalize_lora_setting("a.safetensors", 0.5) == [("a.safetensors", 0.5)]
    assert normalize_lora_setting(["a", {"path": "b", "scale": 2.0}], 1.0) == [
        ("a", 1.0),
        ("b", 2.0),
    ]
    with pytest.raises(ValueError):
        normalize_lora_setting([{"scale": 1.0}])


def _write_tiny_lora(tmp_path, tiny_params, tiny_plan, *, n=2):
    tensors = {}
    for m in _linear_modules(tiny_plan, n):
        down, up = _make_entry(tiny_params, tiny_plan, m)
        tensors[f"unet.{m}.lora_A.weight"] = down
        tensors[f"unet.{m}.lora_B.weight"] = up
    path = str(tmp_path / "tiny_lcm_lora.safetensors")
    write_safetensors(path, tensors)
    return path


def test_engine_fuses_config_lora(tmp_path, tiny_params, tiny_plan):
    from videosd_tpu.config import ServerConfig
    from videosd_tpu.pipelines.lcm_img2img import ModelBundle
    from videosd_tpu.runtime.engine import Engine

    base = ModelBundle.random("tiny")
    plan = W.unet_plan(base.unet_cfg)
    path = _write_tiny_lora(tmp_path, base.params["unet"], plan)

    cfg = ServerConfig.from_dict(
        {"family": "tiny", "weights": "random", "lora": path, "lora_scale": 0.5}
    )
    assert cfg.lora == [(path, 0.5)]
    eng = Engine(cfg)
    mod = _linear_modules(plan, 1)[0]
    jpath, _ = _torch_shape(plan, mod)
    node_eng, node_base = eng.bundle.params["unet"], base.params["unet"]
    for p in jpath:
        node_eng, node_base = node_eng[p], node_base[p]
    assert not np.allclose(np.asarray(node_eng), np.asarray(node_base))
    # the shared cached random bundle must NOT have been mutated
    again = ModelBundle.random("tiny")
    node_again = again.params["unet"]
    for p in jpath:
        node_again = node_again[p]
    np.testing.assert_array_equal(np.asarray(node_again), np.asarray(node_base))


def test_engine_lora_then_quant_ordering(tmp_path):
    from videosd_tpu.config import ServerConfig
    from videosd_tpu.ops.quant import quant_stats
    from videosd_tpu.pipelines.lcm_img2img import ModelBundle
    from videosd_tpu.runtime.engine import Engine

    base = ModelBundle.random("tiny")
    plan = W.unet_plan(base.unet_cfg)
    path = _write_tiny_lora(tmp_path, base.params["unet"], plan)
    cfg = ServerConfig.from_dict(
        {"family": "tiny", "weights": "random", "lora": path, "quant": "int8"}
    )
    eng = Engine(cfg)
    # quant applied AFTER lora: quantized linears exist and fuse succeeded
    assert quant_stats(eng.bundle.params["unet"])["quantized_linears"] > 0
    # both levers surface in /stats for observability
    s = eng.stats()
    assert s["quant"] == "int8" and s["lora"][0]["path"] == path


def test_swap_params_refuses_lora(tmp_path):
    # a hot-swapped base checkpoint keeps the configured adapters: the
    # engine re-fuses them into the incoming tree (engine.swap_params)
    from videosd_tpu.config import ServerConfig
    from videosd_tpu.pipelines.lcm_img2img import ModelBundle
    from videosd_tpu.runtime.engine import Engine

    base = ModelBundle.random("tiny")
    plan = W.unet_plan(base.unet_cfg)
    path = _write_tiny_lora(tmp_path, base.params["unet"], plan)
    cfg = ServerConfig.from_dict(
        {"family": "tiny", "weights": "random", "lora": path}
    )
    eng = Engine(cfg)
    fused_before = eng.bundle.params
    # swap in the PLAIN base tree — the engine must fuse the adapter again
    eng.swap_params({k: v for k, v in base.params.items()}, source="test")
    mod = _linear_modules(plan, 1)[0]
    jpath, _ = _torch_shape(plan, mod)
    node_new, node_base, node_old = eng.bundle.params["unet"], base.params["unet"], fused_before["unet"]
    for p in jpath:
        node_new, node_base, node_old = node_new[p], node_base[p], node_old[p]
    assert not np.allclose(np.asarray(node_new), np.asarray(node_base))
    np.testing.assert_allclose(
        np.asarray(node_new, np.float32), np.asarray(node_old, np.float32), atol=1e-6
    )


def test_bundle_lora_partial_tower_warns(tmp_path, caplog):
    from videosd_tpu.pipelines.lcm_img2img import ModelBundle

    bundle = ModelBundle.random("tiny")
    import dataclasses

    bundle = dataclasses.replace(bundle)
    # adapter targets a text_encoder module our clip tree has, plus unet
    plan_te = W.clip_plan(bundle.clip_cfg)
    te_mod = [t[:-7] for _, t, k in plan_te if k == "linear"][0]
    node = bundle.params["clip"]
    for p in [p for p, t, k in plan_te if t == te_mod + ".weight"][0]:
        node = node[p]
    in_dim, out_dim = node.shape
    tensors = {
        f"text_encoder.{te_mod}.lora_A.weight": RNG.standard_normal(
            (4, in_dim), dtype=np.float32
        ),
        f"text_encoder.{te_mod}.lora_B.weight": RNG.standard_normal(
            (out_dim, 4), dtype=np.float32
        ),
        # and a tower the bundle doesn't carry
        "text_encoder_2.text_projection.lora_A.weight": np.zeros((4, 8), np.float32),
        "text_encoder_2.text_projection.lora_B.weight": np.zeros((8, 4), np.float32),
    }
    path = str(tmp_path / "te.safetensors")
    write_safetensors(path, tensors)
    with caplog.at_level(logging.WARNING, logger="videosd_tpu.lora"):
        stats = fuse_bundle_loras(bundle, [(path, 1.0)])
    assert stats.get("text_encoder") == 1
    assert any("text_encoder_2" in r.message for r in caplog.records)
