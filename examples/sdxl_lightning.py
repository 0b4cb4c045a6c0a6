"""SDXL-Lightning 1024x1024 img2img sharded over the device mesh.

BASELINE stretch config: the SDXL-topology UNet (2048-dim dual-tower text
context, text_time micro-conditioning) at 1024x1024, few-step sampling,
tensor-parallel over the mesh's ``model`` axis (Megatron-style rules in
parallel/mesh.py) with the frame batch over ``data``.  TAESD decode can be
tiled (--tile) for memory headroom at high res.

Runs with random weights by default (zero-egress); pass --weights for a
local SDXL-Lightning diffusers snapshot.

Usage (8 virtual CPU devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/sdxl_lightning.py --size 256 --model-parallel 2
Real slice:
  python examples/sdxl_lightning.py in.png out.png --model-parallel 4
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
    p.add_argument("input", nargs="?", help="input PNG (default: noise)")
    p.add_argument("output", nargs="?", help="output PNG")
    p.add_argument("--prompt", default="cinematic photo, city at night")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--steps", type=int, default=4, help="Lightning-style low step count")
    p.add_argument("--strength", type=float, default=0.7)
    p.add_argument("--batch", type=int, default=0, help="default: data axis size")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument(
        "--pipe", action="store_true",
        help="pipeline-parallel: 2 UNet stages on disjoint submeshes "
        "(parallel/pipe.py) — the capacity mode when weights+activations "
        "outgrow one chip; dp x tp inside each stage",
    )
    p.add_argument("--family", default="sdxl")
    p.add_argument("--weights", help="local SDXL diffusers snapshot dir")
    p.add_argument("--tile", action="store_true", help="tiled TAESD decode")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # this image's sitecustomize force-registers a TPU backend; honor an
    # explicit JAX_PLATFORMS=cpu (e.g. virtual 8-device CPU mesh runs)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from videosd_tpu.compile_cache import setup as _setup_compile_cache; _setup_compile_cache()

    from videosd_tpu.parallel.serving import ShardedFrameEngine
    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_prompt_encoder,
    )

    if args.weights:
        bundle = ModelBundle.from_pretrained(args.weights, family=args.family)
    else:
        print("note: no --weights; random init (shape/perf validation)", file=sys.stderr)
        bundle = ModelBundle.random(args.family, with_controlnet=False)

    if args.pipe:
        from videosd_tpu.parallel.pipe import PipelinedFrameEngine

        eng = PipelinedFrameEngine(bundle, model_parallel=args.model_parallel)
    else:
        eng = ShardedFrameEngine(bundle, model_parallel=args.model_parallel)
    b = args.batch or eng.data_size
    spec = FrameSpec(
        batch=b,
        height=args.size,
        width=args.size,
        steps=args.steps,
        use_controlnet="controlnet" in bundle.params,
    )

    if args.input:
        from PIL import Image

        img = np.asarray(
            Image.open(args.input).convert("RGB").resize((args.size, args.size)),
            np.uint8,
        )
    else:
        img = np.random.default_rng(0).integers(
            0, 256, (args.size, args.size, 3), dtype=np.uint8
        )
    frames = jnp.asarray(np.broadcast_to(img, (b, *img.shape)))

    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer([args.prompt]), jnp.int32)
    ctx, pooled1 = enc(bundle.params, ids)
    embeds = jnp.concatenate([ctx] * b, axis=0)
    pooled = jnp.concatenate([pooled1] * b, axis=0)

    run_args = (
        jnp.full((b,), args.strength, jnp.float32),
        jnp.full((b,), 1.0, jnp.float32),  # Lightning: no guidance embedding
        jnp.full((b,), 0.0, jnp.float32),
        jnp.arange(b, dtype=jnp.int32),
    )
    t0 = time.perf_counter()
    out, latents = eng.run(spec, frames, embeds, *run_args, pooled_embeds=pooled)
    jax.block_until_ready(out)
    print(f"first frame (incl. compile): {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out, latents = eng.run(spec, frames, embeds, *run_args, pooled_embeds=pooled)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(
        f"sdxl {args.size}x{args.size} steps={args.steps} batch={b} "
        f"mesh=(data={eng.data_size},model={args.model_parallel}): "
        f"{dt * 1e3:.1f} ms/batch, {b / dt:.2f} frames/s"
    )

    if args.tile:
        from videosd_tpu.models import taesd_decode
        from videosd_tpu.ops.tiling import tiled_decode

        dec = lambda z: taesd_decode(  # noqa: E731
            bundle.params["taesd"], z, bundle.taesd_cfg
        )
        t0 = time.perf_counter()
        img_t = tiled_decode(dec, latents.astype(bundle.dtype), tile=64, overlap=8)
        jax.block_until_ready(img_t)
        print(f"tiled decode: {(time.perf_counter() - t0) * 1e3:.1f} ms")

    if args.output:
        from PIL import Image

        Image.fromarray(np.asarray(out[0])).save(args.output)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
