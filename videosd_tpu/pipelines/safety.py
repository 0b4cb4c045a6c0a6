"""Safety-checker seam for the frame programs.

The reference pipeline optionally runs a safety checker on the decoded
images and blacks out flagged ones before postprocess
(diffusert/lcm/lcm_controlnet.py:593-608, diffusers
StableDiffusionSafetyChecker semantics: flagged rows become zeros).  In
practice the reference ships with the checker disabled (the TAESD swap
drops it), so the default here is off too — this module provides the
SEAM: a jittable hook applied between VAE decode and postprocess inside
the same XLA program (``ModelBundle.safety_hook``), plus the blackout
combinator that turns any classifier into that hook.

A production deployment supplies a real classifier (e.g. a CLIP-vision
safety head loaded through io.weights) as ``classify``; tests use a
trivial one.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

__all__ = ["make_blackout_hook"]


def make_blackout_hook(classify: Callable) -> Callable:
    """Lift ``classify(images01 [B,H,W,3] in [0,1]) -> bool [B]`` into a
    frame-program safety hook (images_pm1 -> images_pm1) that zeroes
    flagged rows — black frames, exactly what the reference's checker
    produces for flagged outputs."""

    def hook(images_pm1):
        img01 = jnp.clip(
            images_pm1.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0
        )
        flagged = classify(img01)
        black = jnp.asarray(-1.0, images_pm1.dtype)  # pm1 black
        return jnp.where(flagged[:, None, None, None], black, images_pm1)

    return hook
