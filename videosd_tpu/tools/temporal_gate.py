"""Quality gate for temporal DeepCache (cross-frame trunk reuse).

Replays the drifting synthetic camera (tools/flicker.drifting_frame — the
same distribution tools/train_toy.py trains on, so trained-toy gates are
meaningful) through the serving cadence the engine implements for the
``deepcache_temporal`` option: refresh the per-step trunk caches every N
frames (produce mode), reuse them in between.  For every frame the
temporal output is scored against THAT frame's parity output (PSNR/SSIM),
plus consecutive-output flicker (mean |Δu8|) for temporal stability —
reuse frames lean on a stale trunk, so quality decays with distance from
the last refresh and N trades FPS for fidelity.

N=1 is all-produce and must score identity (bit-exactness is pinned by
tests/test_temporal_deepcache.py; here it validates the replay harness).

Usage:
    python -m videosd_tpu.tools.temporal_gate --weights examples/toy_tiny_ckpt \
        --size 64 [--frames 24] [--every 2 4 8] [--cn-interval 1] [--json OUT]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="sd15")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--strength", type=float, default=0.6)
    ap.add_argument("--every", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--cn-interval", type=int, default=1)
    ap.add_argument(
        "--refresh-last", action="store_true",
        help="interval_refresh_last for the cn interval (the round-4 "
        "finding: final-step residual freshness dominates quality)",
    )
    ap.add_argument("--weights", default=None, help="checkpoint dir (optional)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from videosd_tpu.compile_cache import setup as setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from videosd_tpu.ops.metrics import psnr, ssim
    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )
    from videosd_tpu.tools.flicker import drifting_frame

    if args.weights:
        bundle = ModelBundle.from_dir(args.weights)
    else:
        print("# note: random weights — orderings transfer, magnitudes do not")
        bundle = ModelBundle.random(args.family, dtype=jnp.bfloat16)

    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["portrait, pixar, cg"]), jnp.int32)
    embeds, pooled = enc(bundle.params, ids)
    # SDXL families consume the pooled embeds (text_time conditioning);
    # sd15-class programs take no pooled kwarg
    kw = {"pooled_embeds": pooled} if bundle.clip2_cfg is not None else {}
    hw = args.size
    run_args = (
        jnp.array([args.strength], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([2.0], jnp.float32),
        jnp.array([23], jnp.int32),
    )
    frames = [
        jnp.asarray(drifting_frame(i, hw, hw)[None]) for i in range(args.frames)
    ]

    spec_p = FrameSpec(batch=1, height=hw, width=hw, steps=args.steps)
    parity = build_frame_program(bundle, spec_p)
    parity_out = [
        np.asarray(parity(bundle.params, f, embeds, *run_args, **kw)[0])
        for f in frames
    ]

    spec_t = FrameSpec(
        batch=1, height=hw, width=hw, steps=args.steps,
        deepcache_temporal=True,
        controlnet_interval=max(1, args.cn_interval),
        interval_refresh_last=bool(args.refresh_last),
    )
    prog_t = build_frame_program(bundle, spec_t)

    def flicker(outs) -> float:
        return float(
            np.mean(
                [
                    np.abs(a.astype(np.int16) - b.astype(np.int16)).mean()
                    for a, b in zip(outs[1:], outs[:-1])
                ]
            )
        )

    results = []
    for n in [1] + list(args.every):
        outs, caches = [], None
        for i, f in enumerate(frames):
            if caches is None or i % n == 0:
                img, _lat, caches = prog_t(
                    bundle.params, f, embeds, *run_args, **kw
                )
            else:
                img, _lat = prog_t(
                    bundle.params, f, embeds, *run_args, deep_caches=caches,
                    **kw,
                )
            outs.append(np.asarray(img))
        ps = [psnr(o[0], p[0]) for o, p in zip(outs, parity_out)]
        ss = [ssim(o[0], p[0]) for o, p in zip(outs, parity_out)]
        # refresh frames are bit-exact (psnr inf) — the quality question
        # is the REUSE frames, so report their stats separately
        reuse_ps = [v for v in ps if np.isfinite(v)]
        reuse_ss = [s_ for v, s_ in zip(ps, ss) if np.isfinite(v)]
        row = {
            "every": n,
            "psnr_min": round(float(np.min(ps)), 2),
            "psnr_mean_reuse": (
                round(float(np.mean(reuse_ps)), 2) if reuse_ps else None
            ),
            "ssim_min": round(float(np.min(ss)), 4),
            "ssim_mean_reuse": (
                round(float(np.mean(reuse_ss)), 4) if reuse_ss else None
            ),
            "flicker": round(flicker(outs), 3),
            "parity_flicker": round(flicker(parity_out), 3),
        }
        print(json.dumps(row), flush=True)
        results.append(row)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
