"""Offline single-frame img2img CLI — the minimum end-to-end slice.

PNG in -> stylized PNG out on one chip, using the exact serving frame
program (SURVEY.md §7 step 3).  With no --weights, runs random-init
(useful for smoke/perf; real output needs a mounted checkpoint).

Usage:
  python examples/img2img.py input.png output.png \
      --prompt "oil painting" --steps 4 --strength 0.6 [--weights DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
from PIL import Image

# allow running straight from a repo checkout
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--prompt", default="portrait, pixar, cg")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--strength", type=float, default=0.6)
    p.add_argument("--guidance-scale", type=float, default=5.0)
    p.add_argument("--controlnet-scale", type=float, default=2.0)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--family", default="sd15")
    p.add_argument("--weights", help="local diffusers checkpoint dir")
    p.add_argument("--controlnet-weights")
    p.add_argument(
        "--lora",
        action="append",
        default=[],
        help="LoRA safetensors to fuse (repeatable; e.g. LCM-LoRA)",
    )
    p.add_argument("--lora-scale", type=float, default=1.0)
    p.add_argument(
        "--controlnet-interval",
        type=int,
        default=1,
        help="evaluate ControlNet every k-th step, reusing residuals "
        "between (1 = reference parity)",
    )
    p.add_argument(
        "--deepcache-interval",
        type=int,
        default=1,
        help="recompute the deep UNet trunk every k-th step (DeepCache), "
        "re-evaluating only the shallow blocks between (1 = parity)",
    )
    p.add_argument(
        "--taesd-packed",
        action="store_true",
        help="pixel-pair-packed TAESD conv layout (full-lane MXU convs; "
        "fp32-reduction-order parity with the default layout)",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # sitecustomize force-registers the TPU backend; honor JAX_PLATFORMS=cpu
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )

    img = Image.open(args.input).convert("RGB")
    frame = np.asarray(img, np.uint8)[None]

    if args.weights:
        bundle = ModelBundle.from_pretrained(
            args.weights, family=args.family, controlnet_dir=args.controlnet_weights
        )
    else:
        print("note: no --weights; using random init", file=sys.stderr)
        bundle = ModelBundle.random(args.family)

    if args.lora:
        import dataclasses

        from videosd_tpu.io.lora import fuse_bundle_loras

        bundle = dataclasses.replace(bundle)  # keep the shared cache pristine
        stats = fuse_bundle_loras(
            bundle, [(path, args.lora_scale) for path in args.lora]
        )
        print(f"lora: fused {stats}", file=sys.stderr)

    if args.taesd_packed:
        import dataclasses

        bundle = dataclasses.replace(
            bundle,
            taesd_cfg=dataclasses.replace(bundle.taesd_cfg, packed_convs=True),
        )

    spec = FrameSpec(
        batch=1,
        height=args.size,
        width=args.size,
        in_height=frame.shape[1],
        in_width=frame.shape[2],
        steps=args.steps,
        use_controlnet="controlnet" in bundle.params,
        controlnet_interval=args.controlnet_interval,
        deepcache_interval=args.deepcache_interval,
    )
    program = build_frame_program(bundle, spec)
    encoder = build_prompt_encoder(bundle)

    ids = jnp.asarray(bundle.tokenizer([args.prompt]), jnp.int32)
    embeds, pooled = encoder(bundle.params, ids)

    t0 = time.perf_counter()
    out, _latents = program(
        bundle.params,
        jnp.asarray(frame),
        embeds,
        jnp.array([args.strength], jnp.float32),
        jnp.array([args.guidance_scale], jnp.float32),
        jnp.array([args.controlnet_scale], jnp.float32),
        jnp.array([args.seed], jnp.int32),
        pooled_embeds=pooled if bundle.clip2_cfg else None,
    )
    out = np.asarray(out)
    print(f"generated in {time.perf_counter() - t0:.2f}s (incl. compile)")
    Image.fromarray(out[0]).save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
