"""Automated same-window A/B pair harvester for the WS serving stack.

The serving rig's tunnel throughput swings by >5x between "windows"
(PERF.md "Measurement pitfalls"), so a single A-then-B comparison is
only honest if both legs saw the same window.  This tool alternates two
option settings leg-by-leg against one warm server, records each leg's
client reply rate AND server-side generation rate (`gen_fps`, the
ground truth — see ws_load_test.py), brackets every leg with the
server's device-stage EMA, and appends one JSON line per completed pair
to --out.  Pairs whose two legs disagree on window health (device-EMA
ratio outside [1/--ema-tol, --ema-tol]) are recorded but marked
``stable: false`` — analysis should only cite stable pairs.

Usage (cn-interval turbo vs parity, the PERF.md open item):

    python examples/ab_pairs.py --url http://localhost:8876 \
        --option controlnet_interval --a 1 --b 4 \
        --pairs 10 --seconds 30 --inflight 2 --out /tmp/ab_cn.jsonl

Any per-stream option the data channel coerces works (config.py
coerce_options); the option is applied via ws_load_test's per-stream
init options.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import aiohttp

import importlib.util
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "ws_load_test",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "ws_load_test.py"),
)
_wlt = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("ws_load_test", _wlt)
_spec.loader.exec_module(_wlt)


async def _stats(url: str) -> dict | None:
    try:
        async with aiohttp.ClientSession() as s:
            async with s.get(
                url + "/stats", timeout=aiohttp.ClientTimeout(total=15)
            ) as r:
                return await r.json()
    except Exception:
        return None


async def _set_engine(args, value) -> bool:
    """Apply an engine-level toggle (POST /debug/engine) and wait until no
    program is background-compiling, so the leg measures the new layout's
    steady state rather than passthrough frames."""
    try:
        async with aiohttp.ClientSession() as s:
            async with s.post(
                args.url + "/debug/engine",
                json={args.engine_option: value},
                timeout=aiohttp.ClientTimeout(total=15),
            ) as r:
                if r.status != 200:
                    return False
    except Exception:
        return False
    deadline = time.perf_counter() + args.compile_wait
    while time.perf_counter() < deadline:
        st = await _stats(args.url)
        if st and int(st.get("programs_compiling", 0)) == 0:
            return True
        await asyncio.sleep(2.0)
    return False


async def _wait_compiles(args) -> bool:
    """Wait until the server reports no background bucket compiles, so a
    leg never measures nearest-ready fallback programs."""
    deadline = time.perf_counter() + args.compile_wait
    while time.perf_counter() < deadline:
        st = await _stats(args.url)
        if st and int(st.get("programs_compiling", 0)) == 0:
            return True
        await asyncio.sleep(2.0)
    return False


async def _leg(args, value) -> dict | None:
    """One measurement leg; returns the summary dict or None on failure."""
    opts = {}
    if args.engine_option:
        if not await _set_engine(args, value):
            return {"error": "engine toggle/compile-wait failed", "value": value}
    else:
        opts = {args.option: value}
    if not await _wait_compiles(args):
        return {"error": "background compiles never drained", "value": value}
    pre = await _stats(args.url)
    frames = _wlt.make_frames(args.size, raw=False, raw_i420=False)
    results: dict = {}
    t0 = time.perf_counter()
    try:
        await asyncio.wait_for(
            asyncio.gather(
                *[
                    _wlt.stream_worker(
                        args.url, s, frames, args.seconds, args.size, results,
                        args.inflight, False, extra_options=opts,
                    )
                    for s in range(args.streams)
                ]
            ),
            timeout=args.seconds * 4 + 60,
        )
    except Exception as e:  # noqa: BLE001 — a hung/errored leg is data
        return {"error": f"{type(e).__name__}: {e}", "value": value}
    wall = time.perf_counter() - t0
    post = await _stats(args.url)
    total = sum(n for n, _, _ in results.values())
    lat = sorted(x for _, l, _ in results.values() for x in l)
    leg = {
        "value": value,
        "wall_s": round(wall, 2),
        "reply_fps": round(total / wall, 2),
        "rtt_p50_ms": round(1e3 * lat[len(lat) // 2], 1) if lat else None,
    }
    if pre and post:
        leg["gen_fps"] = round(
            (int(post["frames_out"]) - int(pre["frames_out"])) / wall, 2
        )
        # device-stage EMA brackets window health; absent on an idle
        # server that has not generated yet (warmup leg 1)
        dev_pre = (pre.get("stages") or {}).get("device")
        dev_post = (post.get("stages") or {}).get("device")
        if dev_pre is not None:
            leg["device_ema_pre"] = round(float(dev_pre), 3)
        if dev_post is not None:
            leg["device_ema_post"] = round(float(dev_post), 3)
    return leg


async def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:8876")
    ap.add_argument("--option", default="controlnet_interval")
    ap.add_argument(
        "--engine-option",
        default=None,
        help="A/B an engine-level knob via POST /debug/engine instead of a"
        " per-stream option (e.g. output_format rgb vs i420); legs wait for"
        " background compiles to drain before measuring",
    )
    ap.add_argument("--compile-wait", type=float, default=600.0)
    ap.add_argument("--a", default="1")
    ap.add_argument("--b", default="4")
    ap.add_argument("--pairs", type=int, default=10)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--inflight", type=int, default=2)
    ap.add_argument("--warmup-seconds", type=float, default=8.0)
    ap.add_argument("--ema-tol", type=float, default=1.35)
    ap.add_argument("--out", default="/tmp/ab_pairs.jsonl")
    args = ap.parse_args()

    # one warmup leg per value: triggers any cold background compile for
    # that variant's buckets (then _wait_compiles drains it) and removes
    # ramp effects from pair 1
    wa = argparse.Namespace(**vars(args))
    wa.seconds = args.warmup_seconds
    for v in (args.a, args.b):
        w = await _leg(wa, v)
        print(json.dumps({"warmup": v, "leg": w}))

    for i in range(args.pairs):
        # alternate leg ORDER across pairs so a monotonically drifting
        # window biases A and B equally over the run
        order = (args.a, args.b) if i % 2 == 0 else (args.b, args.a)
        legs = []
        for v in order:
            legs.append(await _leg(args, v))
        rec = {
            "pair": i,
            "option": args.engine_option or args.option,
            "engine_level": bool(args.engine_option),
            "ts": time.time(),
        }
        ok = all(l and "device_ema_post" in l for l in legs)
        if ok:
            emas = [l["device_ema_post"] for l in legs]
            ratio = max(emas) / max(1e-9, min(emas))
            rec["stable"] = ratio <= args.ema_tol
            rec["ema_ratio"] = round(ratio, 2)
        else:
            rec["stable"] = False
        rec["legs"] = legs
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))


if __name__ == "__main__":
    asyncio.run(main())
