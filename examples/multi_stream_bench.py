"""BASELINE config 3: N concurrent streams, per-stream prompts, dynamic
cross-stream batching on one chip — measured through the REAL serving
stack (WS transport -> engine micro-batcher -> jitted frame program).

Starts the server in-process, connects N WS clients pumping frames as
fast as the server returns them, and reports aggregate + per-stream FPS.

Usage:
  python examples/multi_stream_bench.py [--streams 4] [--frames 64]
      [--size 512] [--steps 4] [--family sd15]
"""

from __future__ import annotations

import argparse
import asyncio
import os
import struct
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


async def run_stream(session, url, sid, args, results, barrier):
    import aiohttp

    rng = np.random.default_rng(sid)
    h = w = args.size
    async with session.ws_connect(url, max_msg_size=256 * 1024 * 1024) as ws:
        await ws.send_json(
            {
                "type": "init",
                "options": {
                    "height": h,
                    "width": w,
                    "steps": args.steps,
                    "prompt": f"style {sid}: watercolor city",
                    "seed": sid,
                    "jpeg": bool(args.jpeg),
                },
            }
        )

        def pack(frame):
            if args.jpeg:
                import io

                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(frame).save(buf, "JPEG", quality=85)
                return buf.getvalue()
            return struct.pack("<HH", h, w) + frame.tobytes()

        # warm frames (first batch compiles / loads the executable)
        for _ in range(3):
            await ws.send_bytes(pack(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)))
            msg = await ws.receive()
            assert msg.type == aiohttp.WSMsgType.BINARY, msg
        await barrier.wait()  # steady-state window starts together

        if args.camera_fps > 0:
            # OPEN LOOP — a real webcam pushes frames at its own rate and
            # the server drops stale ones (reference semantics); replies
            # arrive decoupled from sends
            interval = 1.0 / args.camera_fps
            n_replies = 0
            done = asyncio.Event()

            async def reader():
                nonlocal n_replies
                while not done.is_set():
                    try:
                        msg = await asyncio.wait_for(ws.receive(), timeout=5)
                    except asyncio.TimeoutError:
                        continue
                    if msg.type == aiohttp.WSMsgType.BINARY:
                        n_replies += 1

            rt = asyncio.get_running_loop().create_task(reader())
            t0 = time.perf_counter()
            for i in range(args.frames):
                await ws.send_bytes(
                    pack(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
                )
                await asyncio.sleep(max(0, t0 + (i + 1) * interval - time.perf_counter()))
            await asyncio.sleep(1.0)  # drain
            wall = time.perf_counter() - t0
            done.set()
            rt.cancel()
            results[sid] = n_replies / wall
        else:
            # CLOSED LOOP — send, wait for the reply, send the next
            t0 = time.perf_counter()
            for i in range(args.frames):
                await ws.send_bytes(
                    pack(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
                )
                msg = await ws.receive()
                assert msg.type == aiohttp.WSMsgType.BINARY, msg
            results[sid] = args.frames / (time.perf_counter() - t0)


async def amain(args):
    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer

    from videosd_tpu.config import ServerConfig
    from videosd_tpu.server.app import create_app

    cfg = ServerConfig(family=args.family)
    app = create_app(cfg)
    client = TestClient(TestServer(app))
    await client.start_server()
    url = client.make_url("/ws")
    try:
        async with aiohttp.ClientSession() as session:
            results: dict[int, float] = {}
            barrier = asyncio.Barrier(args.streams)
            t0 = time.perf_counter()
            await asyncio.gather(
                *[
                    run_stream(session, url, sid, args, results, barrier)
                    for sid in range(args.streams)
                ]
            )
        total = args.streams * args.frames
        stats = app["engine"].stats()
        per = ", ".join(f"{results[s]:.2f}" for s in sorted(results))
        if args.camera_fps > 0:
            # open loop: replies track the camera rate; what matters is how
            # many REAL generations the chip delivered in the window
            window = args.frames / args.camera_fps + 1.0
            gen = stats["frames_out"] - 3 * args.streams  # minus warmup
            print(
                f"{args.streams} streams @ {args.camera_fps} cam-fps "
                f"{args.size}x{args.size} steps={args.steps} "
                f"jpeg={bool(args.jpeg)}: generated {gen / window:.2f} FPS "
                f"aggregate ({gen / window / args.streams:.2f}/stream), "
                f"dropped {stats['frames_dropped']}, "
                f"fill {stats['avg_batch_fill']:.2f}, "
                f"gen {stats['avg_gen_time_s'] * 1e3:.0f} ms/batch"
            )
        else:
            # closed loop: slowest stream bounds the shared window
            agg = total / (args.frames / min(results.values()))
            print(
                f"{args.streams} streams x {args.frames} frames "
                f"{args.size}x{args.size} steps={args.steps} "
                f"jpeg={bool(args.jpeg)}: "
                f"aggregate {agg:.2f} FPS (per-stream [{per}]); "
                f"avg batch fill {stats['avg_batch_fill']:.2f}, "
                f"gen {stats['avg_gen_time_s']*1e3:.0f} ms/batch, "
                f"batches {stats['batches']}"
            )
    finally:
        await client.close()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--streams", type=int, default=4)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--family", default="sd15")
    p.add_argument("--jpeg", action="store_true", help="JPEG WS framing")
    p.add_argument(
        "--camera-fps", type=float, default=0.0,
        help="open-loop: push frames at this rate (0 = closed-loop ping-pong)",
    )
    args = p.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from videosd_tpu.compile_cache import setup as _setup_compile_cache; _setup_compile_cache()
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()
