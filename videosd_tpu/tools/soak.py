"""Serving soak: resource stability under sustained multi-stream churn.

The fuzz tests pin the batcher's LOGIC invariants under option churn;
nothing yet pins RESOURCE stability over time (VERDICT r4 next #6).
This tool drives the real Engine for --minutes with N concurrent
simulated streams (drifting synthetic camera), churning the live options
the client exposes (temporal DeepCache, ControlNet interval, prompt,
strength, controlnet scale — geometry/steps stay fixed so the program
set is closed after warmup), and samples:

* RSS (VmRSS from /proc/self/status) — the leak check,
* compiled/ready program counts (a growing executable set under a closed
  option space would be a program-cache leak),
* frames served + rolling p50/p99 submit→reply latency.

Pass criteria (printed in the report): RSS drift over the second half
< --rss-slack MB, executable count flat after the first churn cycle.

Usage (real chip):
    python -m videosd_tpu.tools.soak --minutes 30 --streams 3 \
        --family sd15 --size 512 [--json PERF_soak.json]
CPU smoke:
    JAX_PLATFORMS=cpu python -m videosd_tpu.tools.soak --minutes 1 \
        --streams 2 --family tiny --size 64 --steps 2 --hz 4
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


async def soak(args) -> dict:
    import numpy as np

    from videosd_tpu.config import ServerConfig
    from videosd_tpu.runtime.engine import Engine
    from videosd_tpu.tools.flicker import drifting_frame

    import jax.numpy as jnp

    from videosd_tpu.pipelines.lcm_img2img import ModelBundle

    dtype = jnp.bfloat16 if args.family not in ("tiny", "tiny-xl") else jnp.float32
    bundle = ModelBundle.random(args.family, dtype=dtype)
    eng = Engine(
        ServerConfig(),
        bundle=bundle,
        max_streams=args.streams,
        max_batch=8,
        deadline_ms=8,
        frame_hw=(args.size, args.size),
    )
    # warm the closed bucket set the churn cycles through: parity,
    # cn-interval, temporal produce+reuse — live churn then never compiles
    print("# warmup...", flush=True)
    eng.warmup(
        batch_sizes=(args.streams,), steps=(args.steps,),
        height=args.size, width=args.size,
    )
    eng.warmup(
        batch_sizes=(args.streams,), steps=(args.steps,),
        height=args.size, width=args.size,
        cn_interval=2, refresh_last=True,
    )
    eng.warmup(
        batch_sizes=(args.streams,), steps=(args.steps,),
        height=args.size, width=args.size,
        cn_interval=2, refresh_last=True, temporal=True,
    )
    eng.start()

    # churn table: the public live options a client slider can flip
    churn_cycle = [
        {"deepcache_temporal": 2, "controlnet_interval": 2,
         "interval_refresh_last": True},
        {"deepcache_temporal": 0, "controlnet_interval": 2,
         "interval_refresh_last": True},
        {"deepcache_temporal": 0, "controlnet_interval": 1,
         "interval_refresh_last": False},
        {"deepcache_temporal": 4, "controlnet_interval": 2,
         "interval_refresh_last": True},
    ]
    prompts = [
        "portrait, pixar, cg", "watercolor landscape", "cyberpunk city",
        "oil painting, baroque",
    ]

    streams = [
        eng.open_stream(
            {"height": args.size, "width": args.size, "steps": args.steps}
        )
        for _ in range(args.streams)
    ]
    lat: list = []
    samples: list = []
    stop_at = time.monotonic() + args.minutes * 60.0
    frame_interval = 1.0 / args.hz
    t_start = time.monotonic()

    async def drive(si: int, st):
        i = 0
        while time.monotonic() < stop_at:
            f = drifting_frame(i + 97 * si, args.size, args.size)
            t0 = time.perf_counter()
            await eng.submit_frame(st.stream_id, f)
            lat.append((time.perf_counter() - t0) * 1e3)
            i += 1
            # churn on a per-stream cadence, desynced across streams
            if i % args.churn_every == 0:
                c = dict(churn_cycle[(i // args.churn_every + si) % len(churn_cycle)])
                c["prompt"] = prompts[(i // args.churn_every + si) % len(prompts)]
                c["strength"] = 0.5 + 0.1 * ((i // args.churn_every) % 3)
                c["controlnet_scale"] = 1.0 + 0.5 * (si % 3)
                eng.update_options(st.stream_id, c)
            await asyncio.sleep(max(0.0, frame_interval - (time.perf_counter() - t0)))

    async def sample():
        while time.monotonic() < stop_at:
            await asyncio.sleep(args.sample_every)
            s = eng.stats()
            recent = lat[-500:]
            import numpy as np

            samples.append(
                {
                    "t_s": round(time.monotonic() - t_start, 1),
                    "rss_mb": round(rss_mb(), 1),
                    "programs_compiled": s["programs_compiled"],
                    "programs_ready": s["programs_ready"],
                    "frames_out": s["frames_out"],
                    "p50_ms": round(float(np.percentile(recent, 50)), 1)
                    if recent
                    else None,
                    "p99_ms": round(float(np.percentile(recent, 99)), 1)
                    if recent
                    else None,
                }
            )
            print(json.dumps(samples[-1]), flush=True)

    await asyncio.gather(*(drive(i, st) for i, st in enumerate(streams)), sample())
    await eng.stop()

    import numpy as np

    half = len(samples) // 2
    rss_second_half = [s["rss_mb"] for s in samples[half:]]
    drift = (
        round(rss_second_half[-1] - rss_second_half[0], 1)
        if len(rss_second_half) >= 2
        else 0.0
    )
    execs = [s["programs_compiled"] for s in samples]
    report = {
        "minutes": args.minutes,
        "streams": args.streams,
        "family": args.family,
        "size": args.size,
        "frames_served": samples[-1]["frames_out"] if samples else 0,
        "p50_ms": round(float(np.percentile(lat, 50)), 1) if lat else None,
        "p99_ms": round(float(np.percentile(lat, 99)), 1) if lat else None,
        "rss_start_mb": samples[0]["rss_mb"] if samples else None,
        "rss_end_mb": samples[-1]["rss_mb"] if samples else None,
        "rss_drift_second_half_mb": drift,
        "programs_compiled_final": execs[-1] if execs else None,
        "programs_stable": bool(execs and len(set(execs[len(execs) // 2 :])) == 1),
        "rss_ok": abs(drift) < args.rss_slack,
        "samples": samples,
    }
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--streams", type=int, default=3)
    ap.add_argument("--family", default="sd15")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--hz", type=float, default=20.0, help="per-stream submit rate")
    ap.add_argument("--churn-every", type=int, default=50, help="frames between option churns")
    ap.add_argument("--sample-every", type=float, default=30.0, help="seconds between samples")
    ap.add_argument("--rss-slack", type=float, default=200.0, help="second-half RSS drift budget (MB)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from videosd_tpu.compile_cache import setup as setup_cache

    setup_cache()

    report = asyncio.run(soak(args))
    print(json.dumps({k: v for k, v in report.items() if k != "samples"}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
