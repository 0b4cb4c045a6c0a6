"""Fidelity parity harness: this framework vs. fp32 torch/diffusers.

BASELINE config 1 gate: "images bit-comparable to the diffusers fp32
reference".  This tool runs the same img2img job through (a) our frame
program with converted weights in fp32 and (b) diffusers' LCM pipeline on
CPU, and reports PSNR/max-abs-diff.  Requires a local checkpoint directory
and the `diffusers` package — neither exists in the zero-egress build
image, so CI covers the per-layer torch parity tier
(tests/test_torch_parity.py) and this tool is the field procedure.

Usage (one command in the field — snapshots auto-discover from the
mounted HF cache, the same layout the reference's compose file mounts at
~/.cache/huggingface, docker-compose.yml:8):
  python -m videosd_tpu.tools.parity [--weights /path] [--controlnet /path]

tests/test_field_parity.py runs this automatically whenever diffusers AND
a cached snapshot are present, so the composed-fidelity gate closes by
itself on any host that has the weights.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from videosd_tpu.io.discovery import find_snapshot  # noqa: E402  (shared)

DEFAULT_MODEL = "SimianLuo/LCM_Dreamshaper_v7"  # videopipeline.py:57
DEFAULT_CONTROLNET = "lllyasviel/control_v11p_sd15_canny"  # videopipeline.py:51


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", default=None, help="snapshot dir (default: auto-discover from the HF cache)")
    p.add_argument("--controlnet", default=None)
    p.add_argument("--image")
    p.add_argument("--prompt", default="portrait, pixar, cg")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--strength", type=float, default=0.6)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args(argv)

    try:
        import diffusers  # noqa: F401
    except ImportError:
        print(
            "diffusers is not installed; composed parity is covered by "
            "tests/test_torch_parity_composed.py. Install diffusers to run "
            "the end-to-end checkpoint comparison.",
            file=sys.stderr,
        )
        return 2

    if args.weights is None:
        args.weights = find_snapshot(DEFAULT_MODEL)
        if args.weights is None:
            print(
                f"no --weights given and no cached snapshot of {DEFAULT_MODEL} "
                "found (mount ~/.cache/huggingface like the compose file does)",
                file=sys.stderr,
            )
            return 2
        print(f"auto-discovered weights: {args.weights}", file=sys.stderr)
    if args.controlnet is None:
        args.controlnet = find_snapshot(DEFAULT_CONTROLNET)
        if args.controlnet:
            print(f"auto-discovered controlnet: {args.controlnet}", file=sys.stderr)

    import jax.numpy as jnp
    import torch
    from PIL import Image

    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )

    if args.image:
        img = Image.open(args.image).convert("RGB").resize((args.size, args.size))
        frame = np.asarray(img, np.uint8)[None]
    else:
        frame = np.tile(
            np.linspace(0, 255, args.size, dtype=np.uint8)[None, :, None, None],
            (1, 1, args.size, 3),
        ).transpose(0, 2, 1, 3)

    # ---- ours (fp32 for comparability)
    bundle = ModelBundle.from_pretrained(
        args.weights,
        controlnet_dir=args.controlnet,
        dtype=jnp.float32,
    )
    spec = FrameSpec(
        batch=1,
        height=args.size,
        width=args.size,
        steps=args.steps,
        use_controlnet=bool(args.controlnet),
        vae="kl" if "vae" in bundle.params else "taesd",
    )
    program = build_frame_program(bundle, spec)
    encoder = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer([args.prompt]), jnp.int32)
    embeds, _ = encoder(bundle.params, ids)
    ours, _ = program(
        bundle.params,
        jnp.asarray(frame),
        embeds,
        jnp.array([args.strength], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([2.0], jnp.float32),
        jnp.array([args.seed], jnp.int32),
    )
    ours = np.asarray(ours)[0]

    # ---- diffusers fp32 CPU reference
    from diffusers import AutoPipelineForImage2Image

    pipe = AutoPipelineForImage2Image.from_pretrained(
        args.weights, torch_dtype=torch.float32, safety_checker=None
    )
    gen = torch.Generator().manual_seed(args.seed)
    ref = pipe(
        prompt=args.prompt,
        image=Image.fromarray(frame[0]),
        strength=args.strength,
        num_inference_steps=args.steps,
        generator=gen,
    ).images[0]
    ref = np.asarray(ref, np.uint8)

    print(f"psnr: {psnr(ours, ref):.2f} dB")
    print(f"max |diff|: {np.abs(ours.astype(int) - ref.astype(int)).max()}")
    print(
        "note: RNG streams differ by construction (torch Philox vs JAX "
        "threefry); compare at matched noise via --seed sweeps or inject "
        "identical noise tensors for bit-level work."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
