"""ModelBundle.from_pretrained against a synthetic diffusers-layout dir.

Builds a fake local checkpoint (tiny config, torch-style names via the
inverse conversion plans + our safetensors writer), then loads it and
verifies the params land where they came from — the full load path minus
the real 2GB weights this zero-egress image can't have.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from videosd_tpu.io import weights as W
from videosd_tpu.io.safetensors import write_safetensors
from videosd_tpu.pipelines.lcm_img2img import ModelBundle


def _fake_checkpoint(tmp_path, bundle):
    unet_dir = tmp_path / "model" / "unet"
    te_dir = tmp_path / "model" / "text_encoder"
    cn_dir = tmp_path / "cn"
    os.makedirs(unet_dir)
    os.makedirs(te_dir)
    os.makedirs(cn_dir)
    write_safetensors(
        str(unet_dir / "diffusion_pytorch_model.safetensors"),
        W.export(bundle.params["unet"], W.unet_plan(bundle.unet_cfg)),
    )
    write_safetensors(
        str(te_dir / "model.safetensors"),
        W.export(bundle.params["clip"], W.clip_plan(bundle.clip_cfg)),
    )
    write_safetensors(
        str(cn_dir / "diffusion_pytorch_model.safetensors"),
        W.export(bundle.params["controlnet"], W.controlnet_plan(bundle.unet_cfg)),
    )
    return str(tmp_path / "model"), str(cn_dir)


def test_from_pretrained_roundtrip(tmp_path):
    src = ModelBundle.random("tiny", dtype=jnp.float32)
    model_dir, cn_dir = _fake_checkpoint(tmp_path, src)

    loaded = ModelBundle.from_pretrained(
        model_dir, family="tiny", controlnet_dir=cn_dir, dtype=jnp.float32
    )
    for name in ("unet", "clip", "controlnet"):
        a = jax.tree_util.tree_leaves(src.params[name])
        b = jax.tree_util.tree_leaves(loaded.params[name])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_from_pretrained_missing_dir_fails(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        ModelBundle.from_pretrained(str(tmp_path), family="tiny", dtype=jnp.float32)
