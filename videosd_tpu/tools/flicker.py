"""Temporal warm-start stability measurement (VERDICT round-2 item 6).

``warm_alpha`` (a StreamDiffusion-style addition of this rebuild; the
reference has no analog) blends the previous frame's denoised latents
into the current frame's encoded latents before the timestep ladder
(pipelines/lcm_img2img.py warm_latents/warm_alpha).  This tool
quantifies what that buys: frame-to-frame FLICKER — mean |delta| between
consecutive uint8 outputs — on a slowly-changing synthetic input
sequence, at warm_alpha in {0, 0.3, 0.5}, plus the FPS cost (expected
~0: the blend is one fused multiply-add on latents).

The warm path mirrors the serving engine's: frame N's warm_latents are
frame N-1's returned denoised latents (engine StreamState.last_latents),
seed held constant per stream (reference live behavior: the seed option
is per-stream constant, videopipeline.py:110-112).

Usage:
    python -m videosd_tpu.tools.flicker [--family sd15] [--size 512]
        [--frames 24] [--alphas 0,0.3,0.5] [--json OUT.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def drifting_frame(i: int, h: int, w: int) -> np.ndarray:
    """Slowly-changing synthetic camera: structured content translated by
    1 px/frame with a slow brightness drift."""
    from videosd_tpu.tools.turbo_ladder import structured_frame

    base = structured_frame(0, h, w).astype(np.float32)
    rolled = np.roll(base, shift=i, axis=1)
    drift = 1.0 + 0.02 * np.sin(2 * np.pi * i / 24.0)
    return np.clip(rolled * drift, 0, 255).astype(np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="sd15")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--alphas", default="0,0.3,0.5")
    # lower strength couples the output more tightly to the input camera
    # motion (fewer denoise steps of drift toward the prompt/noise
    # direction), giving the flicker metric dynamic range — with
    # random-init weights at high strength the output is nearly static
    # and the metric floors out
    ap.add_argument("--strength", type=float, default=0.6)
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--weights",
        default=None,
        help="checkpoint dir (diffusers snapshot or io/checkpoint bundle, "
        "e.g. tools/train_toy.py output; overrides --family)",
    )
    args = ap.parse_args()

    from videosd_tpu.compile_cache import setup as setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp

    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )

    if args.weights:
        bundle = ModelBundle.from_dir(args.weights, family=args.family)
        dtype = bundle.dtype
    else:
        dtype = jnp.float32 if args.family.startswith("tiny") else jnp.bfloat16
        bundle = ModelBundle.random(args.family, dtype=dtype)
    spec = FrameSpec(batch=1, height=args.size, width=args.size, steps=args.steps)
    program = build_frame_program(bundle, spec)
    encoder = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["portrait, pixar, cg"]), jnp.int32)
    embeds, _ = encoder(bundle.params, ids)

    strength = jnp.array([args.strength], jnp.float32)
    guidance = jnp.array([5.0], jnp.float32)
    cn_scale = jnp.array([2.0], jnp.float32)
    seed = jnp.array([23], jnp.int32)

    frames = [drifting_frame(i, args.size, args.size) for i in range(args.frames)]

    results = []
    for alpha in [float(a) for a in args.alphas.split(",")]:
        a = jnp.array([alpha], jnp.float32)
        warm = jnp.zeros(
            (1, args.size // 8, args.size // 8, 4), dtype
        )  # first frame: no history (alpha applies from frame 2)
        outs = []
        # warmup compile of the warm-signature program
        out, lat = program(
            bundle.params, jnp.asarray(frames[0][None]), embeds,
            strength, guidance, cn_scale, seed,
            warm, jnp.array([0.0], jnp.float32),
        )
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        warm_a = jnp.array([0.0], jnp.float32)  # no history on frame 0
        for fr in frames:
            out, lat = program(
                bundle.params, jnp.asarray(fr[None]), embeds,
                strength, guidance, cn_scale, seed, warm, warm_a,
            )
            warm, warm_a = lat, a
            outs.append(np.asarray(out[0]).astype(np.float32))
        dt = time.perf_counter() - t0
        flick = float(
            np.mean([np.mean(np.abs(outs[i + 1] - outs[i])) for i in range(len(outs) - 1)])
        )
        row = {
            "warm_alpha": alpha,
            "strength": args.strength,
            "flicker_mean_abs_delta": round(flick, 3),
            "fps": round(len(frames) / dt, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    print("\n| warm_alpha | flicker (mean abs du8/frame) | FPS |")
    print("|---|---|---|")
    for r in results:
        print(f"| {r['warm_alpha']} | {r['flicker_mean_abs_delta']} | {r['fps']} |")


if __name__ == "__main__":
    main()
