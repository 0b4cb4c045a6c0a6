"""WebSocket load test: N concurrent camera streams against a running server.

Drives the full serving stack (WS transport -> engine micro-batcher ->
jitted frame program -> JPEG reply) exactly like N browsers would, and
reports per-stream and aggregate FPS plus round-trip latency percentiles.
The reference has no load harness at all (its only metric is the gentime
EMA print, diffusert/server.py:113-114).

Usage:
    python -m videosd_tpu.server.app --config config.yaml --port 8876 &
    python examples/ws_load_test.py --url http://localhost:8876 \
        --streams 4 --seconds 30 --size 512
"""

from __future__ import annotations

import argparse
import asyncio
import io
import json
import time

import numpy as np


def make_frames(
    size: int, n: int = 16, *, raw: bool = False, raw_i420: bool = False
) -> list[bytes]:
    """Pre-encoded camera frames (synthetic moving gradient).

    ``raw``: RGB24 with the WS transport's 4-byte {u16 h, u16 w} header
    instead of JPEG — isolates the codec's contribution on localhost/LAN.
    ``raw_i420``: same header but packed planar 4:2:0 payload (half the
    upload bytes; the layout an i420-input engine consumes natively)."""
    import struct

    from PIL import Image

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
    frames = []
    for i in range(n):
        img = np.roll(base, shift=i * size // n, axis=1)
        if raw_i420:
            from videosd_tpu.ops.preprocess import rgb_to_i420_host

            frames.append(
                struct.pack("<HH", size, size) + rgb_to_i420_host(img).tobytes()
            )
        elif raw:
            frames.append(struct.pack("<HH", size, size) + img.tobytes())
        else:
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "JPEG", quality=85)
            frames.append(buf.getvalue())
    return frames


# rotating subjects for the config-5 live mode (fed to promptgen when a
# sidecar URL is given, else templated locally)
_SUBJECTS = [
    "a fox in the snow",
    "an ancient castle",
    "a cyberpunk city at night",
    "a sailboat at dawn",
    "a jazz musician",
    "a mountain monastery",
]


async def _next_prompt(session, promptgen_url: str | None, sid: int, k: int) -> str:
    subject = _SUBJECTS[(sid + k) % len(_SUBJECTS)]
    if promptgen_url:
        # langserve wire format (the client's RemoteRunnable.invoke POST,
        # reference index.tsx:20-23,370 -> promptgen.py:66-70)
        async with session.post(
            promptgen_url.rstrip("/") + "/llama-chat/invoke",
            json={"input": {"text": subject}},
        ) as r:
            body = await r.json()
            out = body.get("output", subject)
            if isinstance(out, dict):  # LLMChain output: {"text": ...}
                out = out.get("text", subject)
            return str(out).strip() or subject
    return f"{subject}, detailed, cinematic, 8k"


async def stream_worker(
    url: str,
    sid: int,
    frames: list[bytes],
    seconds: float,
    size: int,
    results: dict,
    inflight: int = 1,
    raw: bool = False,
    mutate_every: float = 0.0,
    promptgen_url: str | None = None,
    warm_alpha: float = 0.0,
    cn_interval: int = 1,
    dc_interval: int = 1,
    extra_options: dict | None = None,
):
    """One camera stream.  ``inflight``: how many frames the client keeps
    in flight (1 = strictly synchronous like the stock browser client;
    2 overlaps the upload of frame N+1 with the diffusion of frame N,
    hiding the transport round trip).

    ``mutate_every`` > 0 turns on the BASELINE config-5 shape: the worker
    swaps its prompt live every N seconds through the data-channel
    protocol (optionally asking the promptgen sidecar for it), with
    embedding crossfade (prompt_blend_frames) and temporal latent
    warm-start (warm_alpha) active — all traced, so a healthy server
    shows ZERO recompile stalls across mutations."""
    import aiohttp

    lat = []
    sent: list[float] = []
    n_out = 0
    n_mut = 0
    async with aiohttp.ClientSession() as session:
        async with session.ws_connect(url + "/ws", max_msg_size=64 * 2**20) as ws:
            opts = {
                "prompt": f"portrait, pixar, cg, stream {sid}",
                "strength": 0.6,
                "guidance_scale": 5.0,
                "steps": 4,
                "seed": 23 + sid,
                "controlnet": True,
                "controlnet_scale": 2.0,
                "width": size,
                "height": size,
                "jpeg": not raw,
            }
            if mutate_every > 0:
                opts["prompt_blend_frames"] = 8
                opts["warm_alpha"] = warm_alpha
            if cn_interval != 1:
                opts["controlnet_interval"] = cn_interval
            if dc_interval != 1:
                opts["deepcache_interval"] = dc_interval
            if extra_options:
                opts.update(extra_options)
            await ws.send_str(json.dumps({"type": "init", "options": opts}))
            t_end = time.perf_counter() + seconds
            next_mut = time.perf_counter() + mutate_every
            i = 0
            while time.perf_counter() < t_end:
                if mutate_every > 0 and time.perf_counter() >= next_mut:
                    prompt = await _next_prompt(session, promptgen_url, sid, n_mut)
                    await ws.send_str(
                        json.dumps({"type": "prompt", "prompt": prompt})
                    )
                    n_mut += 1
                    next_mut += mutate_every
                while len(sent) < inflight:
                    sent.append(time.perf_counter())
                    await ws.send_bytes(frames[i % len(frames)])
                    i += 1
                msg = await ws.receive()
                if msg.type != aiohttp.WSMsgType.BINARY:
                    break
                lat.append(time.perf_counter() - sent.pop(0))
                n_out += 1
    results[sid] = (n_out, lat, n_mut)


async def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:8876")
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--warmup-seconds", type=float, default=8.0)
    ap.add_argument("--inflight", type=int, default=1)
    ap.add_argument("--raw", action="store_true", help="RGB24 frames (no JPEG)")
    ap.add_argument(
        "--raw-i420",
        action="store_true",
        help="packed planar 4:2:0 frames (raw, half the upload bytes)",
    )
    ap.add_argument(
        "--mutate-every",
        type=float,
        default=0.0,
        help="BASELINE config-5 live mode: swap each stream's prompt every"
        " N seconds (embedding crossfade + latent warm-start active)",
    )
    ap.add_argument(
        "--promptgen-url",
        help="promptgen sidecar base URL — prompts come from the LLM loop"
        " (langserve /llama-chat/invoke wire format)",
    )
    ap.add_argument("--warm-alpha", type=float, default=0.3)
    ap.add_argument(
        "--cn-interval",
        type=int,
        default=1,
        help="controlnet_interval option for every stream (1 = reference"
        " parity; k>1 = opt-in turbo, see PERF.md)",
    )
    ap.add_argument(
        "--dc-interval",
        type=int,
        default=1,
        help="deepcache_interval option for every stream (1 = reference"
        " parity; k>1 reuses the deep UNet trunk between evals)",
    )
    args = ap.parse_args()
    args.raw = args.raw or args.raw_i420

    frames = make_frames(args.size, raw=args.raw, raw_i420=args.raw_i420)
    results: dict = {}
    # short warmup pass so compile/ramp effects don't pollute the window
    await asyncio.gather(
        *[
            stream_worker(
                args.url, s, frames, args.warmup_seconds, args.size, {},
                args.inflight, args.raw, cn_interval=args.cn_interval,
                dc_interval=args.dc_interval,
            )
            for s in range(args.streams)
        ]
    )
    async def server_stats():
        # generation-rate ground truth: at inflight>=2 the engine resolves
        # EVERY queued waiter of a stream when its batch lands (drop
        # semantics, engine.submit_frame) — client reply counts therefore
        # include passthrough duplicates.  frames_out counts only real
        # generations.
        try:
            import aiohttp

            async with aiohttp.ClientSession() as s:
                async with s.get(
                    args.url.replace("ws://", "http://") + "/stats",
                    timeout=aiohttp.ClientTimeout(total=10),
                ) as r:
                    d = await r.json()
                    return int(d["frames_out"]), int(d["frames_dropped"])
        except Exception:
            return None

    pre = await server_stats()
    t0 = time.perf_counter()
    await asyncio.gather(
        *[
            stream_worker(
                args.url, s, frames, args.seconds, args.size, results,
                args.inflight, args.raw, args.mutate_every,
                args.promptgen_url, args.warm_alpha, args.cn_interval,
                args.dc_interval,
            )
            for s in range(args.streams)
        ]
    )
    wall = time.perf_counter() - t0
    post = await server_stats()

    all_lat = sorted(x for _, l, _ in results.values() for x in l)
    total = sum(n for n, _, _ in results.values())
    mutations = sum(m for _, _, m in results.values())
    out = {
        "streams": args.streams,
        "inflight": args.inflight,
        "raw": args.raw,
        "size": args.size,
        "wall_s": round(wall, 2),
        "aggregate_fps": round(total / wall, 2),
        "per_stream_fps": round(total / wall / args.streams, 2),
        "rtt_p50_ms": round(1e3 * all_lat[len(all_lat) // 2], 1) if all_lat else None,
        "rtt_p95_ms": round(1e3 * all_lat[int(len(all_lat) * 0.95)], 1)
        if all_lat
        else None,
        "frames": total,
    }
    if pre is not None and post is not None:
        out["gen_fps"] = round((post[0] - pre[0]) / wall, 2)
        out["gen_per_stream_fps"] = round(
            (post[0] - pre[0]) / wall / args.streams, 2
        )
        # duplicates = replies beyond real generations (batch landing
        # resolves every queued waiter with the same output and does NOT
        # count those as drops); frames_dropped_delta adds the drop-loop
        # and similarity-skip resolutions
        out["duplicate_replies"] = max(0, total - (post[0] - pre[0]))
        out["frames_dropped_delta"] = post[1] - pre[1]
    if args.mutate_every > 0:
        out["prompt_mutations"] = mutations
        out["promptgen_in_loop"] = bool(args.promptgen_url)
    print(json.dumps(out))


if __name__ == "__main__":
    asyncio.run(main())
