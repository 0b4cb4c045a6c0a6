"""Toy-training tool: a short run trains, saves, and reloads via from_dir.

tools/train_toy.py exists because zero-egress blocks real checkpoints:
quality metrics (flicker warm-start damping, turbo-ladder PSNR) need a
denoiser that contracts toward a data manifold, which random init is not
(PERF.md "Temporal warm-start stability" finding 2).  This tier pins the
machinery — loss decreases, the io/checkpoint round trip preserves the
trained tensors, ModelBundle.from_dir auto-detects the layout — so the
on-TPU measurement runs only have measurement risk.
"""

from __future__ import annotations

import json
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_train_toy_end_to_end(tmp_path, monkeypatch, capsys):
    from videosd_tpu.tools import train_toy

    out = tmp_path / "ckpt"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "train_toy",
            "--out",
            str(out),
            "--size",
            "32",
            "--ae-steps",
            "30",
            "--unet-steps",
            "8",
            "--cn-steps",
            "6",
            "--batch",
            "4",
            "--json",
            str(tmp_path / "report.json"),
        ],
    )
    train_toy.main()
    report = json.loads((tmp_path / "report.json").read_text())
    # 30 adam steps on the tiny TAESD must show learning; full convergence
    # takes ~1500 steps (the tool's default, used for any recorded runs)
    assert report["ae_final_mse"] < 0.8 * report["ae_first_mse"]
    assert (out / "bundle.json").is_file()
    meta = json.loads((out / "bundle.json").read_text())
    assert set(meta["models"]) >= {"unet", "taesd"}

    # reload through the auto-detecting loader: trained tensors survive
    from videosd_tpu.pipelines.lcm_img2img import ModelBundle

    loaded = ModelBundle.from_dir(str(out))
    assert loaded.family == "tiny"
    assert loaded.dtype == jnp.float32
    fresh = ModelBundle.random("tiny", dtype=jnp.float32)
    # trained != random init, and the reload is exact vs the saved tree
    conv_in_fresh = np.asarray(fresh.params["taesd"]["encoder"]["conv_in"]["kernel"])
    conv_in_loaded = np.asarray(loaded.params["taesd"]["encoder"]["conv_in"]["kernel"])
    assert not np.allclose(conv_in_fresh, conv_in_loaded)
    # Stage C moved the ControlNet's zero-init output convs off zero — the
    # trained ControlNet is no longer a no-op (cn-interval gating is real)
    assert "cn_final_loss" in report
    mid = np.asarray(loaded.params["controlnet"]["controlnet_mid_block"]["kernel"])
    assert np.abs(mid).max() > 0.0

    # the trained bundle drives the real frame program (the flicker /
    # turbo tools' eval path) without shape or dtype complaints
    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        build_frame_program,
        build_prompt_encoder,
    )

    prog = build_frame_program(loaded, FrameSpec(batch=1, height=32, width=32, steps=2))
    enc = build_prompt_encoder(loaded)
    ids = jnp.asarray(loaded.tokenizer(["portrait, pixar, cg"]), jnp.int32)
    embeds, _ = enc(loaded.params, ids)
    frame = np.zeros((1, 32, 32, 3), np.uint8)
    out_img, _ = prog(
        loaded.params,
        jnp.asarray(frame),
        embeds,
        jnp.array([0.6], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([2.0], jnp.float32),
        jnp.array([23], jnp.int32),
    )
    assert out_img.shape == (1, 32, 32, 3)


def test_from_dir_falls_back_to_pretrained_layout(tmp_path):
    """No bundle.json -> the diffusers-snapshot loader path is taken.

    Pin the SPECIFIC failure of that path (io.weights.load_model_dir
    listing <dir>/unet) so an unrelated bug upstream of the fallback
    cannot masquerade as a pass (ADVICE r3)."""
    from videosd_tpu.pipelines.lcm_img2img import ModelBundle

    with pytest.raises(FileNotFoundError, match="unet"):
        ModelBundle.from_dir(str(tmp_path))


def test_from_dir_bundle_branch_rejects_unknown_kwargs(tmp_path):
    """bundle.json layout: unsupported kwargs raise instead of being
    silently dropped (ADVICE r3 — e.g. a typo'd loader option)."""
    (tmp_path / "bundle.json").write_text(
        json.dumps({"family": "tiny", "models": []})
    )
    from videosd_tpu.pipelines.lcm_img2img import ModelBundle

    with pytest.raises(TypeError, match="unsupported kwargs"):
        ModelBundle.from_dir(str(tmp_path), taesd_dir="/nonexistent")
