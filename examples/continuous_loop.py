"""Continuous single-stream 1-step loop (BASELINE config 2).

SD-Turbo-style serving shape: 1 denoise step per frame, scheduler state
and warm-start latents kept DEVICE-RESIDENT across frames (no host round
trips between frames beyond the camera frame in / uint8 frame out).

Usage:
  python examples/continuous_loop.py [--family sd21] [--size 512] [--frames 60]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="sd21", help="sd21 = SD-Turbo topology")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--warm-alpha", type=float, default=0.3)
    p.add_argument("--strength", type=float, default=0.5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # sitecustomize force-registers the TPU backend; honor JAX_PLATFORMS=cpu
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from videosd_tpu.compile_cache import setup as _setup_compile_cache; _setup_compile_cache()

    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )

    bundle = ModelBundle.random(args.family, with_controlnet=False)
    spec = FrameSpec(
        batch=1,
        height=args.size,
        width=args.size,
        steps=1,
        use_controlnet=False,
    )
    program = build_frame_program(bundle, spec)
    encoder = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["a watercolor city"]), jnp.int32)
    embeds, _ = encoder(bundle.params, ids)

    rng = np.random.default_rng(0)
    h = w = args.size
    strength = jnp.array([args.strength], jnp.float32)
    guidance = jnp.array([1.0], jnp.float32)
    cn = jnp.array([0.0], jnp.float32)
    alpha = jnp.array([args.warm_alpha], jnp.float32)
    lat = jnp.zeros((1, h // 8, w // 8, 4), jnp.float32)
    a0 = jnp.array([0.0], jnp.float32)  # first frame: no warm start
    seed = jnp.array([0], jnp.int32)

    # pre-generate "camera" frames: host-side frame synthesis isn't part
    # of the serving path being measured (a real camera delivers frames)
    cam = [
        rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8)
        for _ in range(min(args.frames, 64))
    ]

    # warmup / compile + dispatch ramp
    frame = jnp.asarray(cam[0])
    for _ in range(5):
        out, lat = program(
            bundle.params, frame, embeds, strength, guidance, cn,
            seed, warm_latents=lat, warm_alpha=a0,
        )
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    pending = []
    for i in range(args.frames):
        # new camera frame upload each iteration; latents stay on device
        frame = jnp.asarray(cam[i % len(cam)])
        out, lat = program(
            bundle.params, frame, embeds, strength, guidance, cn,
            seed, warm_latents=lat, warm_alpha=alpha,
        )
        pending.append(out)
        if len(pending) > 2:
            jax.block_until_ready(pending.pop(0))
    jax.block_until_ready(pending)
    wall = time.perf_counter() - t0
    print(
        f"{args.family} 1-step {args.size}x{args.size} continuous loop: "
        f"{args.frames / wall:.2f} FPS ({wall / args.frames * 1e3:.1f} ms/frame)"
    )


if __name__ == "__main__":
    main()
