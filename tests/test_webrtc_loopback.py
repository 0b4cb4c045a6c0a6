"""Live WebRTC loopback: an in-process RTCPeerConnection pair drives the
REAL transport (reference's primary path, diffusert/server.py:145-264) —
synthetic camera track -> handle_offer -> VideoSDTrack -> engine ->
answer track, plus a mid-stream data-channel mutation.

Skips when aiortc is absent (this image omits it; requirements.txt ships
it for deployments) — the WS transport covers the stack end-to-end in
that case (test_server.py).  No network is needed: both peers live in one
asyncio loop and connect over host candidates.
"""

import asyncio
import json

import numpy as np
import pytest

aiortc = pytest.importorskip("aiortc")
pytestmark = pytest.mark.slow

from aiortc import (  # noqa: E402
    RTCPeerConnection,
    RTCSessionDescription,
    VideoStreamTrack,
)
from av import VideoFrame  # noqa: E402


class ColorRamp(VideoStreamTrack):
    """Synthetic camera: 48x36 frames with a changing fill value."""

    def __init__(self):
        super().__init__()
        self._n = 0

    async def recv(self):
        pts, time_base = await self.next_timestamp()
        arr = np.full((36, 48, 3), (self._n * 7) % 256, np.uint8)
        self._n += 1
        f = VideoFrame.from_ndarray(arr, format="rgb24")
        f.pts = pts
        f.time_base = time_base
        return f


def test_webrtc_loopback_roundtrip():
    import jax.numpy as jnp

    from videosd_tpu.config import ServerConfig
    from videosd_tpu.pipelines.lcm_img2img import ModelBundle
    from videosd_tpu.runtime.engine import Engine
    from videosd_tpu.server.webrtc import handle_offer

    async def run():
        bundle = ModelBundle.random("tiny", dtype=jnp.float32)
        engine = Engine(
            ServerConfig(), bundle=bundle, max_streams=2, max_batch=2,
            deadline_ms=5, frame_hw=(48, 48),
        )
        app = {
            "engine": engine,
            "config": ServerConfig(),
            "sessions": set(),
            "pc_closers": [],
        }
        engine.start()
        client = RTCPeerConnection()
        client.addTrack(ColorRamp())
        dc = client.createDataChannel("prompt")
        received: list[np.ndarray] = []

        @client.on("track")
        def on_track(track):
            async def pull():
                try:
                    while True:
                        f = await track.recv()
                        received.append(f.to_ndarray(format="rgb24"))
                except Exception:
                    pass

            asyncio.ensure_future(pull())

        offer = await client.createOffer()
        await client.setLocalDescription(offer)
        answer = await handle_offer(
            app,
            {
                "sdp": client.localDescription.sdp,
                "type": "offer",
                "options": {"height": 32, "width": 32, "steps": 1},
            },
        )
        assert set(answer) == {"sdp", "type"}  # reference schema
        await client.setRemoteDescription(RTCSessionDescription(**answer))

        loop = asyncio.get_running_loop()
        t0 = loop.time()
        while loop.time() - t0 < 180:
            if received and engine.telemetry.frames_out >= 1:
                break
            await asyncio.sleep(0.5)
        assert received, "no frames round-tripped over the peer connection"
        assert received[-1].shape == (32, 32, 3)
        assert engine.telemetry.frames_out >= 1

        # mid-stream data-channel mutation (server.py:166-197 protocol)
        dc.send(json.dumps({"strength": 0.9, "prompt": "loopback"}))
        t0 = loop.time()
        stream = next(iter(engine.streams.values()))
        while loop.time() - t0 < 30:
            if stream.options.get("strength") == 0.9:
                break
            await asyncio.sleep(0.2)
        assert stream.options["strength"] == 0.9
        assert stream.options["prompt"] == "loopback"

        for closer in list(app["pc_closers"]):
            await closer()
        await client.close()
        await engine.stop()

    asyncio.run(run())
