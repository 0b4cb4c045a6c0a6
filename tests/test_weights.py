"""Weight conversion round-trip tests.

For each model: random-init -> export to torch-style state_dict (inverse
plan) -> convert back -> must be bit-identical AND cover every leaf of the
init tree (plan completeness in both directions).  Also exercises the
dependency-free safetensors reader/writer.
"""

import jax
import jax.numpy as jnp
import numpy as np

from videosd_tpu.io.safetensors import read_safetensors, write_safetensors
from videosd_tpu.io.weights import (
    clip_plan,
    controlnet_plan,
    convert,
    export,
    taesd_plan,
    unet_plan,
    vae_plan,
)
from videosd_tpu.models import (
    CLIP_PRESETS,
    TAESDConfig,
    UNET_PRESETS,
    VAEConfig,
    clip_text_init,
    controlnet_init,
    taesd_init,
    unet_init,
    vae_init,
)


def _roundtrip(params, plan):
    sd = export(params, plan)
    back = convert(sd, plan)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    paths_a = {jax.tree_util.keystr(p) for p, _ in flat_a}
    paths_b = {jax.tree_util.keystr(p) for p, _ in flat_b}
    assert paths_a == paths_b, (
        f"plan/init mismatch: only-init={sorted(paths_a - paths_b)[:5]} "
        f"only-plan={sorted(paths_b - paths_a)[:5]}"
    )
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: jax.tree_util.keystr(t[0])),
                                  sorted(flat_b, key=lambda t: jax.tree_util.keystr(t[0]))):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=jax.tree_util.keystr(pa))


def test_unet_tiny_roundtrip():
    cfg = UNET_PRESETS["tiny"]
    _roundtrip(unet_init(jax.random.PRNGKey(0), cfg), unet_plan(cfg))


def test_controlnet_tiny_roundtrip():
    cfg = UNET_PRESETS["tiny"]
    _roundtrip(controlnet_init(jax.random.PRNGKey(1), cfg), controlnet_plan(cfg))


def test_controlnet_xl_roundtrip():
    """SDXL-family ControlNet carries the text_time add_embedding."""
    cfg = UNET_PRESETS["tiny-xl"]
    params = controlnet_init(jax.random.PRNGKey(1), cfg)
    assert "add_embedding" in params
    _roundtrip(params, controlnet_plan(cfg))


def test_clip_tiny_roundtrip():
    cfg = CLIP_PRESETS["tiny"]
    _roundtrip(clip_text_init(jax.random.PRNGKey(2), cfg), clip_plan(cfg))


def test_taesd_roundtrip():
    cfg = TAESDConfig(hidden=8, blocks_per_stage=1)
    _roundtrip(taesd_init(jax.random.PRNGKey(3), cfg), taesd_plan(cfg))


def test_taesd_full_plan_matches_reference_layout():
    """Full-size TAESD plan must address the canonical AutoencoderTiny
    sequential indices (encoder.layers.0..14, decoder.layers.0..19)."""
    plan = taesd_plan(TAESDConfig())
    keys = {t for _, t, _ in plan}
    assert "encoder.layers.0.weight" in keys
    assert "encoder.layers.14.weight" in keys  # conv_out
    assert "decoder.layers.1.weight" in keys  # conv_in after Clamp
    assert "decoder.layers.19.weight" in keys  # conv_out
    assert "decoder.layers.7.weight" in keys  # post-upsample conv
    assert not any(".6.weight" in k and k.startswith("decoder") for k in keys)


def test_vae_tiny_roundtrip():
    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)
    _roundtrip(vae_init(jax.random.PRNGKey(4), cfg), vae_plan(cfg))


def test_sd15_plans_have_expected_sizes():
    """Structural check against the SD1.5 checkpoint inventory."""
    up = unet_plan(UNET_PRESETS["sd15"])
    assert len({t for _, t, _ in up}) == len(up)  # no duplicate torch keys
    cp = controlnet_plan(UNET_PRESETS["sd15"])
    zero_keys = [t for _, t, _ in cp if t.startswith("controlnet_down_blocks")]
    assert len(zero_keys) == 24  # 12 zero convs x (weight, bias)


def test_conv_transpose_orientation():
    """conv kernels: torch [O,I,H,W] <-> jax [H,W,I,O]."""
    cfg = TAESDConfig(hidden=8, blocks_per_stage=1)
    params = taesd_init(jax.random.PRNGKey(5), cfg)
    sd = export(params, taesd_plan(cfg))
    w = sd["encoder.layers.0.weight"]
    assert w.shape == (8, 3, 3, 3)  # [O=8, I=3, H, W]
    jk = np.asarray(params["encoder"]["conv_in"]["kernel"])
    np.testing.assert_array_equal(jk, np.transpose(w, (2, 3, 1, 0)))


def test_safetensors_roundtrip(tmp_path):
    tensors = {
        "a.weight": np.random.default_rng(0).standard_normal((3, 4)).astype(np.float32),
        "b.bias": np.arange(5, dtype=np.int32),
    }
    p = str(tmp_path / "t.safetensors")
    write_safetensors(p, tensors)
    back = read_safetensors(p)
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k])


def test_safetensors_bf16(tmp_path):
    """bf16 tensors widen to fp32 on read."""
    import struct, json

    arr = np.array([1.5, -2.0, 0.25], np.float32)
    u16 = (arr.view(np.uint32) >> 16).astype(np.uint16)
    header = {"x": {"dtype": "BF16", "shape": [3], "data_offsets": [0, 6]}}
    hjson = json.dumps(header).encode()
    p = tmp_path / "bf16.safetensors"
    with open(p, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        f.write(u16.tobytes())
    back = read_safetensors(str(p))
    np.testing.assert_array_equal(back["x"], arr)


# ------------------------------------------------------------- discovery


def test_find_snapshot_and_resolve_weights(tmp_path):
    """Local HF-cache discovery: newest snapshot wins; the `weights`
    config settings map to (random -> None, auto -> best-effort,
    explicit -> loud failure)."""
    import os
    import time

    import pytest

    from videosd_tpu.io.discovery import find_snapshot, resolve_weights

    cache = tmp_path / "hub"
    old = cache / "models--a--b" / "snapshots" / "oldsnap"
    new = cache / "models--a--b" / "snapshots" / "newsnap"
    old.mkdir(parents=True)
    new.mkdir(parents=True)
    past = time.time() - 1000
    os.utime(old, (past, past))

    assert find_snapshot("a/b", str(cache)) == str(new)
    assert find_snapshot("missing/repo", str(cache)) is None
    assert find_snapshot(None, str(cache)) is None

    assert resolve_weights("a/b", setting="random", cache=str(cache)) is None
    r = resolve_weights(
        "a/b", controlnet="missing/cn", taesd="missing/taesd",
        setting="auto", cache=str(cache),
    )
    assert r["model_dir"] == str(new)
    assert r["controlnet_dir"] is None and r["taesd_dir"] is None
    # auto with no model snapshot -> None (caller random-inits loudly)
    assert resolve_weights("missing/repo", setting="auto", cache=str(cache)) is None
    # explicit directory -> verbatim; explicit repo id -> cache lookup
    r2 = resolve_weights(None, setting=str(new), cache=str(cache))
    assert r2["model_dir"] == str(new)
    r3 = resolve_weights(None, setting="a/b", cache=str(cache))
    assert r3["model_dir"] == str(new)
    # explicit miss must fail loudly, never silently degrade
    with pytest.raises(FileNotFoundError):
        resolve_weights(None, setting="no/such-repo", cache=str(cache))
