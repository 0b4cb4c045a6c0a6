"""A/B the pixel-pair-packed TAESD conv layout (VERDICT round-2 item 3).

PERF.md's by-block profile attributes ~2 ms/frame of plausibly
recoverable device time to TAESD layout copies (space-to-depth shuffles
XLA inserts around the 64-channel pixel-resolution convs).  The packed
layout (models/taesd.py TAESDConfig.packed_convs) does that transform as
a free NHWC reshape with block-packed kernels instead.  This tool
measures what it actually buys at FRAME level, the only level that
matters: same-window A/B pairs (alternating order, like
examples/ab_pairs.py) of the flagship program built with packed vs
unpacked TAESD, plus a PSNR check that outputs agree (the packing is
exact up to fp32 reduction order).

Also runs an isolated encode+decode slope probe (chains of K
encode(decode(z)) round trips inside ONE jit — multi-dispatch chains
would measure the tunnel's ~1.2 ms dispatch, not the device; see
PERF.md "Fused GroupNorm" closure for the method).

Usage:
    python -m videosd_tpu.tools.taesd_ab [--pairs 3] [--frames 30]
        [--size 512] [--json OUT.json] [--skip-probe]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument(
        "--variants",
        default="unpacked,pallas",
        help="comma list from {unpacked, packed, pallas}; first entry is "
        "the baseline for PSNR and win counting",
    )
    args = ap.parse_args()

    from videosd_tpu.compile_cache import setup as setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp

    from videosd_tpu.models.taesd import taesd_decode, taesd_encode
    from videosd_tpu.ops.metrics import psnr
    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )
    from videosd_tpu.tools.turbo_ladder import structured_frame

    bundle = ModelBundle.random("sd15", dtype=jnp.bfloat16)
    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    cfg_overrides = {
        "unpacked": {},
        "packed": {"packed_convs": True},
        "pallas": {"pallas_convs": True},
    }
    bundles = {
        name: dataclasses.replace(
            bundle,
            taesd_cfg=dataclasses.replace(
                bundle.taesd_cfg, **cfg_overrides[name]
            ),
        )
        for name in variants
    }
    base = variants[0]
    hw = args.size

    # ---- isolated encode+decode slope probe -----------------------------
    if not args.skip_probe:
        z0 = jax.random.normal(
            jax.random.PRNGKey(0), (1, hw // 8, hw // 8, 4), jnp.bfloat16
        )
        for name in variants:
            cfg = bundles[name].taesd_cfg

            def chain(params, z, k, cfg=cfg):
                def body(c, _):
                    img = taesd_decode(params, c, cfg)
                    return taesd_encode(params, img, cfg), None

                out, _ = jax.lax.scan(body, z, None, length=k)
                return out

            def timed(f, *a):
                # force a VALUE fetch: on the remote-TPU (axon) backend,
                # block_until_ready alone can resolve on a lazy future
                # without waiting for device compute — chains then time as
                # ~0.1 ms regardless of work (PERF.md measurement
                # pitfalls).  A scalar pulled to host cannot be faked.
                t0 = time.perf_counter()
                float(jnp.sum(f(*a).astype(jnp.float32)))
                return time.perf_counter() - t0

            times = {}
            for k in (2, 6):
                f = jax.jit(lambda p, z, k=k: chain(p, z, k))
                jax.block_until_ready(f(bundle.params["taesd"], z0))
                # DISTINCT input per timed call: repeated identical args
                # hit a remote-backend memoization (PERF.md pitfall)
                import numpy as _np

                zs = [
                    jnp.asarray(
                        _np.random.default_rng(i).standard_normal(z0.shape),
                        z0.dtype,
                    )
                    for i in range(5)
                ]
                samples = sorted(
                    timed(f, bundle.params["taesd"], zs[i]) for i in range(5)
                )
                times[k] = samples[len(samples) // 2]  # median: tunnel jitter
            slope_ms = (times[6] - times[2]) / 4 * 1e3
            print(
                f"# probe {name}: decode+encode round trip "
                f"{slope_ms:.2f} ms (k2={times[2]*1e3:.1f} k6={times[6]*1e3:.1f})",
                flush=True,
            )

    # ---- frame-level same-window A/B pairs -------------------------------
    specs = FrameSpec(batch=1, height=hw, width=hw, steps=args.steps)
    progs = {name: build_frame_program(bundles[name], specs) for name in variants}
    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["portrait, pixar, cg"]), jnp.int32)
    embeds, _ = enc(bundle.params, ids)
    frame0 = jnp.asarray(structured_frame(0, hw, hw)[None])
    sgcs = (
        jnp.array([0.6], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([2.0], jnp.float32),
        jnp.array([23], jnp.int32),
    )

    outs = {}
    for name, prog in progs.items():
        t0 = time.perf_counter()
        out, _ = prog(bundle.params, frame0, embeds, *sgcs)
        jax.block_until_ready(out)
        outs[name] = np.asarray(out[0])
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s", flush=True)
    psnrs = {}
    for name in variants[1:]:
        psnrs[name] = float(psnr(outs[base], outs[name]))
        print(f"# {name}-vs-{base} output PSNR: {psnrs[name]:.2f} dB", flush=True)

    def window(prog) -> float:
        t0 = time.perf_counter()
        last = None
        for _ in range(args.frames):
            last, _ = prog(bundle.params, frame0, embeds, *sgcs)
        jax.block_until_ready(last)
        return args.frames / (time.perf_counter() - t0)

    pairs = []
    for i in range(args.pairs):
        order = list(variants) if i % 2 == 0 else list(reversed(variants))
        row = {}
        for name in order:
            row[name] = round(window(progs[name]), 2)
        pairs.append(row)
        print(f"# pair {i}: {row}", flush=True)

    result = {
        "psnr_db": {k: round(v, 2) for k, v in psnrs.items()},
        "pairs": pairs,
        "best": {name: max(p[name] for p in pairs) for name in variants},
        "wins_vs_base": {
            name: sum(1 for p in pairs if p[name] > p[base])
            for name in variants[1:]
        },
    }
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
