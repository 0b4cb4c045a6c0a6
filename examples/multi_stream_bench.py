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


async def run_stream(session, url, sid, args, results):
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
                },
            }
        )
        # one warm frame (compile happens on the first batch)
        frame = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        await ws.send_bytes(struct.pack("<HH", h, w) + frame.tobytes())
        msg = await ws.receive()
        assert msg.type == aiohttp.WSMsgType.BINARY, msg

        t0 = time.perf_counter()
        for i in range(args.frames):
            frame = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            await ws.send_bytes(struct.pack("<HH", h, w) + frame.tobytes())
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
            t0 = time.perf_counter()
            await asyncio.gather(
                *[
                    run_stream(session, url, sid, args, results)
                    for sid in range(args.streams)
                ]
            )
            wall = time.perf_counter() - t0
        total = args.streams * args.frames
        per = ", ".join(f"{results[s]:.2f}" for s in sorted(results))
        stats = app["engine"].stats()
        print(
            f"{args.streams} streams x {args.frames} frames "
            f"{args.size}x{args.size} steps={args.steps}: "
            f"aggregate {total / wall:.2f} FPS (per-stream [{per}]); "
            f"avg batch fill {stats['avg_batch_fill']:.2f}, "
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
    args = p.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()
