"""Bundle checkpoint save/load (safetensors layout, dependency-free).

The reference has no checkpoint/resume at all (SURVEY.md §5: weights
stream from the HF hub every actor start).  Here a converted/fine-tuned
bundle persists as one directory of .safetensors files keyed by the
torch-compatible names from io/weights.py plans — so a saved checkpoint is
also directly loadable by diffusers-side tooling.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp

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

__all__ = ["save_bundle", "load_bundle_params"]

_PLANS = {
    "unet": lambda b: unet_plan(b.unet_cfg),
    "controlnet": lambda b: controlnet_plan(b.unet_cfg),
    "clip": lambda b: clip_plan(b.clip_cfg),
    "clip2": lambda b: clip_plan(b.clip2_cfg) if b.clip2_cfg else None,
    "taesd": lambda b: taesd_plan(b.taesd_cfg),
    "vae": lambda b: vae_plan(b.vae_cfg),
}


def save_bundle(bundle, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    meta = {"family": bundle.family, "models": []}
    for name, plan_fn in _PLANS.items():
        if name not in bundle.params:
            continue
        plan = plan_fn(bundle)
        if plan is None:
            continue
        sd = export(bundle.params[name], plan)
        write_safetensors(os.path.join(out_dir, f"{name}.safetensors"), sd)
        meta["models"].append(name)
    with open(os.path.join(out_dir, "bundle.json"), "w") as f:
        json.dump(meta, f)


def load_bundle_params(bundle, ckpt_dir: str, dtype=None) -> dict:
    """Load params for every model present in the checkpoint dir; models
    absent from the checkpoint keep the bundle's current params."""
    dtype = dtype or bundle.dtype
    with open(os.path.join(ckpt_dir, "bundle.json")) as f:
        meta = json.load(f)
    params = dict(bundle.params)
    for name in meta["models"]:
        plan = _PLANS[name](bundle)
        sd = read_safetensors(os.path.join(ckpt_dir, f"{name}.safetensors"))
        params[name] = convert(sd, plan, dtype=jnp.dtype(dtype))
    return params
