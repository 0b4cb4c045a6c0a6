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
safety head loaded through io.weights) as ``classify``; this module also
ships a small built-in one — ``skin_stats_classifier`` — wired through
the same seam via config ``safety: true`` (off by default, matching the
reference's shipped deployment where the checker is disabled).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

__all__ = ["make_blackout_hook", "skin_stats_classifier", "default_safety_hook"]


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


def skin_stats_classifier(threshold: float = 0.5) -> Callable:
    """Jittable NSFW-heuristic classifier: flag images whose skin-chroma
    pixel fraction exceeds ``threshold``.

    Uses the classic YCbCr skin-chroma box (Chai & Ngan 1999: Cb in
    [77, 127], Cr in [133, 173], BT.601 full-range) — a deterministic,
    weights-free baseline standing in for the reference's optional
    StableDiffusionSafetyChecker (lcm_controlnet.py:593-608; its shipped
    deployment also runs checker-less).  A fused handful of VPU ops —
    zero measurable cost inside the frame program.

    Returns ``classify(img01 [B,H,W,3] in [0,1]) -> bool [B]``, the
    contract :func:`make_blackout_hook` lifts into the program seam.
    """

    def classify(img01):
        x = img01.astype(jnp.float32) * 255.0
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        skin = (
            (cb >= 77.0) & (cb <= 127.0) & (cr >= 133.0) & (cr <= 173.0)
        )
        frac = jnp.mean(skin.astype(jnp.float32), axis=(1, 2))
        return frac > threshold

    return classify


def default_safety_hook(threshold: float = 0.5) -> Callable:
    """The config-gated built-in hook (config ``safety: true``)."""
    return make_blackout_hook(skin_stats_classifier(threshold))
