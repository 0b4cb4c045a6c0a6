"""SDXL-1024² production measurement (BASELINE config 4).

Measures, on one chip, the same ladder the sd15 flagship gets: parity
FPS + p50, temporal-DeepCache steady-state cadence (the production
approximation; cn-interval axis does not apply — the SDXL config serves
without ControlNet, like examples/sdxl_lightning.py), and sizes the
multi-chip requirement for the ≥20 FPS target from the measured numbers
(dp scales frames/chip; mesh_pipe=2 is the capacity cut when
weights+activations outgrow a chip — parallel/pipe.py).

Quality note (honest): there is no trained SDXL checkpoint in this
zero-egress image and no sdxl toy training run (Stage-C at sdxl scale
costs more chip-time than it informs); the temporal-reuse quality
ordering is calibrated at the REAL sd15 family at 256²
(PERF.md "Round 5: real-family gate calibration") — N=2 trunk reuse
costs ~5 dB there and less at finer grids; magnitudes do not transfer
across families, orderings have (toy → sd15 held rank order).

Usage (real chip):
    python -m videosd_tpu.tools.sdxl_prod --size 1024 --steps 4 \
        [--json examples/sdxl_prod_1024.json]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--frames", type=int, default=16, help="per FPS window")
    ap.add_argument("--every", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from videosd_tpu.compile_cache import setup as setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from videosd_tpu.ops.flops import device_peak_flops, mfu, program_flops
    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )

    bundle = ModelBundle.random("sdxl", dtype=jnp.bfloat16)
    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["cinematic photo, city"]), jnp.int32)
    embeds, pooled = enc(bundle.params, ids)
    hw = args.size
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (1, hw, hw, 3), dtype=np.uint8))
    run = (
        jnp.array([0.7], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([1.0], jnp.float32),
        jnp.array([23], jnp.int32),
    )
    kw = {"pooled_embeds": pooled}

    def _warm(fn, *a, attempts=3, **k):
        for attempt in range(attempts):
            try:
                out = fn(*a, **k)
                jax.block_until_ready(out)
                return out
            except Exception as e:  # tunnel flake retry (BACKLOG)
                if attempt == attempts - 1:
                    raise
                print(f"# compile retry: {e}", flush=True)
                time.sleep(5)

    report: dict = {"family": "sdxl", "size": hw, "steps": args.steps}

    # ---- parity ----
    spec_p = FrameSpec(
        batch=1, height=hw, width=hw, steps=args.steps, use_controlnet=False
    )
    parity = build_frame_program(bundle, spec_p)
    print("# compiling parity...", flush=True)
    _warm(parity, bundle.params, frame, embeds, *run, **kw)

    def window(call, n):
        t0 = time.perf_counter()
        outs = []
        for i in range(n):
            outs.append(call(i))
            if len(outs) > 2:
                jax.block_until_ready(outs.pop(0))
        jax.block_until_ready(outs)
        return n / (time.perf_counter() - t0)

    fps_parity = max(
        window(
            lambda i: parity(bundle.params, frame, embeds, *run, **kw)[0],
            args.frames,
        )
        for _ in range(3)
    )
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(parity(bundle.params, frame, embeds, *run, **kw)[0])
        lat.append((time.perf_counter() - t0) * 1e3)
    report["fps_parity"] = round(fps_parity, 3)
    report["p50_ms"] = round(float(np.percentile(lat, 50)), 1)
    print(json.dumps({k: report[k] for k in ("fps_parity", "p50_ms")}), flush=True)

    # MFU at this geometry (jaxpr account; XLA attention path for the trace)
    import os

    os.environ["VIDEOSD_ATTN_IMPL"] = "xla"
    try:
        fl = program_flops(
            build_frame_program(bundle, spec_p),
            bundle.params, frame, embeds, *run, **kw,
        )
    finally:
        del os.environ["VIDEOSD_ATTN_IMPL"]
    peak = device_peak_flops()
    report["flops_per_frame_tflop_logical"] = round(fl["logical"] / 1e12, 2)
    report["mfu"] = (
        None if peak is None else round(mfu(fl["logical"], 1.0 / fps_parity, peak=peak), 4)
    )

    # ---- temporal DeepCache cadence (production approximation) ----
    spec_t = FrameSpec(
        batch=1, height=hw, width=hw, steps=args.steps, use_controlnet=False,
        deepcache_temporal=True,
    )
    prog_t = build_frame_program(bundle, spec_t)
    print("# compiling temporal produce/reuse...", flush=True)
    caches = _warm(prog_t, bundle.params, frame, embeds, *run, **kw)[2]
    _warm(prog_t, bundle.params, frame, embeds, *run, deep_caches=caches, **kw)

    for n_every in args.every:
        def cadence(_i=0):
            c = caches
            t0 = time.perf_counter()
            outs = []
            for i in range(args.frames):
                if i % n_every == 0:
                    out, _lat, c = prog_t(bundle.params, frame, embeds, *run, **kw)
                else:
                    out, _lat = prog_t(
                        bundle.params, frame, embeds, *run, deep_caches=c, **kw
                    )
                outs.append(out)
                if len(outs) > 2:
                    jax.block_until_ready(outs.pop(0))
            jax.block_until_ready(outs)
            return args.frames / (time.perf_counter() - t0)

        fps_n = max(cadence() for _ in range(3))
        report[f"fps_temporal_n{n_every}"] = round(fps_n, 3)
        print(json.dumps({f"fps_temporal_n{n_every}": report[f"fps_temporal_n{n_every}"]}), flush=True)

    # ---- multi-chip sizing for the >=20 target (from measured numbers) ----
    best = max(
        [report.get(f"fps_temporal_n{n}", 0.0) for n in args.every]
        + [fps_parity]
    )
    report["chips_for_20fps_dp"] = int(np.ceil(20.0 / best))
    report["note"] = (
        "dp replicates the program per chip (frames/chip add; serving "
        "engine batches across streams); mesh_pipe=2 halves per-chip "
        "weights+activations when a config outgrows one chip "
        "(parallel/pipe.py — correctness-verified on the CPU mesh, "
        "stage-overlap throughput projected pending hardware)"
    )
    print(json.dumps(report), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
