"""Measure + quality-gate the turbo ladder (VERDICT round-2 item 1).

Sweeps the two opt-in approximation knobs — ``controlnet_interval`` and
``deepcache_interval`` (FrameSpec, pipelines/lcm_img2img.py) — on the
flagship 4-step 512x512 LCM img2img program, reporting for each config:

* throughput (best-of-3 pipelined 30-frame windows — same method as the
  headline bench.py, so numbers are directly comparable),
* p50 blocking frame latency,
* image quality vs the PARITY program (cn=1, dc=1 — the reference loop,
  lcm_controlnet.py:558-577, bit-exactly) as PSNR/SSIM over a fixed
  frame/seed set.

The parity config is the identity of the quality metric: both programs run
the SAME weights on the SAME inputs, so PSNR/SSIM measure exactly the
approximation error the turbo knob introduces — with random init (this
image has no checkpoint egress) the UNet is an arbitrary-but-fixed
function, which the caching approximations treat no differently than a
trained one; deltas here are the honest available proxy, re-measurable on
real weights with --weights.

Usage:
    python -m videosd_tpu.tools.turbo_ladder [--quality-frames 4]
        [--windows 3] [--json OUT.json] [--skip-fps] [--weights DIR]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def structured_frame(idx: int, h: int = 512, w: int = 512) -> np.ndarray:
    """Deterministic structured test frame: gradients + disks + stripes.

    Structured (not iid noise) so the canny edge map carries real edges and
    SSIM's local statistics vary across the image like a camera frame's.
    """
    rng = np.random.default_rng(1000 + idx)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = xx / w * 255.0
    img[..., 1] = yy / h * 255.0
    img[..., 2] = ((xx + yy) / (h + w) * 255.0 + 40 * np.sin(xx / 17.0)) % 255.0
    for _ in range(6):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        r = rng.uniform(h / 16, h / 4)
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        img[mask] = rng.uniform(0, 255, 3)
    stripes = ((xx // 24).astype(int) % 2 == 0) & (yy > h * 0.7)
    img[stripes] = 255.0 - img[stripes]
    img += rng.normal(0, 6.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


# (controlnet_interval, deepcache_interval, interval_refresh_last);
# (1, 1, False) is reference parity.  The +last rows re-evaluate both
# caches on the final denoise step (FrameSpec.interval_refresh_last) —
# round-4 trained-weight gating found final-step freshness dominates
# interval quality cost.
LADDER = [
    (1, 1, False),
    (2, 1, False),
    (4, 1, False),
    (1, 2, False),
    (1, 3, False),
    (2, 2, False),
    (4, 2, False),
    (4, 3, False),
    (2, 1, True),
    (4, 1, True),
    (2, 2, True),
    (4, 2, True),
]


def parse_ladder(text: str) -> list:
    """"cn:dc[,cn:dc+last,...]" -> [(cn, dc, refresh_last), ...]."""
    out = []
    for part in text.split(","):
        part = part.strip()
        rl = part.endswith("+last")
        if rl:
            part = part[: -len("+last")]
        cn, dc = part.split(":")
        out.append((int(cn), int(dc), rl))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality-frames", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--frames-per-window", type=int, default=30)
    ap.add_argument("--skip-fps", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--weights", default=None, help="checkpoint dir (optional)")
    ap.add_argument(
        "--ladder",
        default=None,
        help='custom sweep, e.g. "1:1,4:2,4:2+last" (cn:dc[+last]); '
        "default = the module LADDER",
    )
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    from videosd_tpu.compile_cache import setup as setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp

    from videosd_tpu.ops.metrics import psnr, ssim
    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )

    if args.weights:
        # auto-detects layout: diffusers snapshot OR an io/checkpoint
        # bundle dir (e.g. tools/train_toy.py toy weights)
        bundle = ModelBundle.from_dir(args.weights)
    else:
        bundle = ModelBundle.random("sd15", dtype=jnp.bfloat16)
    encoder = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["portrait, pixar, cg"]), jnp.int32)
    embeds, _ = encoder(bundle.params, ids)

    hw = args.size
    frames = [structured_frame(i, hw, hw) for i in range(args.quality_frames)]
    strength = jnp.array([0.6], jnp.float32)
    guidance = jnp.array([5.0], jnp.float32)
    cn_scale = jnp.array([2.0], jnp.float32)

    ladder = parse_ladder(args.ladder) if args.ladder else list(LADDER)
    if (1, 1, False) not in ladder:
        ladder.insert(0, (1, 1, False))  # the quality metric's identity
    programs = {}
    for cn_i, dc_i, rl in ladder:
        spec = FrameSpec(
            batch=1,
            height=hw,
            width=hw,
            steps=args.steps,
            controlnet_interval=cn_i,
            deepcache_interval=dc_i,
            interval_refresh_last=rl,
        )
        t0 = time.perf_counter()
        prog = build_frame_program(bundle, spec)
        # warm (compile) — retry the known tunnel flake ("response body
        # closed before all bytes were read" mid-remote-compile, BACKLOG);
        # finished compiles persist in the cache so retries are cheap
        for attempt in range(3):
            try:
                out, _ = prog(
                    bundle.params,
                    jnp.asarray(frames[0][None]),
                    embeds,
                    strength,
                    guidance,
                    cn_scale,
                    jnp.array([23], jnp.int32),
                )
                jax.block_until_ready(out)
                break
            except Exception as e:  # jax.errors.JaxRuntimeError
                if attempt == 2:
                    raise
                print(f"# compile retry cn={cn_i} dc={dc_i} rl={rl}: {e}", flush=True)
                time.sleep(5)
        programs[(cn_i, dc_i, rl)] = prog
        print(
            f"# compiled cn={cn_i} dc={dc_i} rl={int(rl)} in {time.perf_counter() - t0:.1f}s",
            flush=True,
        )

    # ---- quality: every config vs parity on the fixed frame/seed grid ----
    ref_out: dict[tuple[int, int], np.ndarray] = {}
    quality: dict[tuple, dict] = {}
    for cn_i, dc_i, rl in ladder:
        prog = programs[(cn_i, dc_i, rl)]
        psnrs, ssims = [], []
        for fi, fr in enumerate(frames):
            for si in range(args.seeds):
                seed = jnp.array([23 + 101 * si], jnp.int32)
                out, _ = prog(
                    bundle.params,
                    jnp.asarray(fr[None]),
                    embeds,
                    strength,
                    guidance,
                    cn_scale,
                    seed,
                )
                img = np.asarray(out[0])
                if (cn_i, dc_i, rl) == (1, 1, False):
                    ref_out[(fi, si)] = img
                else:
                    psnrs.append(psnr(ref_out[(fi, si)], img))
                    ssims.append(ssim(ref_out[(fi, si)], img))
        if (cn_i, dc_i, rl) != (1, 1, False):
            quality[(cn_i, dc_i, rl)] = {
                "psnr_mean": round(float(np.mean(psnrs)), 2),
                "psnr_min": round(float(np.min(psnrs)), 2),
                "ssim_mean": round(float(np.mean(ssims)), 4),
                "ssim_min": round(float(np.min(ssims)), 4),
            }
        else:
            quality[(cn_i, dc_i, rl)] = {
                "psnr_mean": float("inf"),
                "psnr_min": float("inf"),
                "ssim_mean": 1.0,
                "ssim_min": 1.0,
            }
        print(
            f"# quality cn={cn_i} dc={dc_i} rl={int(rl)}: {quality[(cn_i, dc_i, rl)]}",
            flush=True,
        )

    # ---- throughput + latency (serialized AFTER all compiles/quality) ----
    results = []
    frame0 = jnp.asarray(frames[0][None])
    for cn_i, dc_i, rl in ladder:
        prog = programs[(cn_i, dc_i, rl)]
        row = {
            "cn_interval": cn_i,
            "dc_interval": dc_i,
            "refresh_last": rl,
            **quality[(cn_i, dc_i, rl)],
        }
        if not args.skip_fps:

            def window(n: int) -> float:
                t_start = time.perf_counter()
                outs = []
                for i in range(n):
                    out, _ = prog(
                        bundle.params,
                        frame0,
                        embeds,
                        strength,
                        guidance,
                        cn_scale,
                        jnp.array([23 + i], jnp.int32),
                    )
                    outs.append(out)
                    if len(outs) > 2:
                        jax.block_until_ready(outs.pop(0))
                jax.block_until_ready(outs)
                return n / (time.perf_counter() - t_start)

            row["fps"] = round(
                max(window(args.frames_per_window) for _ in range(args.windows)), 2
            )
            lat = []
            for i in range(10):
                t0 = time.perf_counter()
                out, _ = prog(
                    bundle.params,
                    frame0,
                    embeds,
                    strength,
                    guidance,
                    cn_scale,
                    jnp.array([500 + i], jnp.int32),
                )
                jax.block_until_ready(out)
                lat.append((time.perf_counter() - t0) * 1e3)
            row["p50_ms"] = round(float(np.percentile(lat, 50)), 1)
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    # markdown Pareto table for PERF.md
    print("\n| cn | dc | +last | FPS | p50 ms | PSNR mean/min | SSIM mean/min |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['cn_interval']} | {r['dc_interval']} "
            f"| {'y' if r['refresh_last'] else ''} | {r.get('fps', '—')} "
            f"| {r.get('p50_ms', '—')} | {r['psnr_mean']}/{r['psnr_min']} "
            f"| {r['ssim_mean']}/{r['ssim_min']} |"
        )


if __name__ == "__main__":
    main()
